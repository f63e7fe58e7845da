package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main for interop checks (kept out of the library
  * surface; used during development only). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev0 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev0.printSchema()
    val ev = ev0.withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    ev.printSchema()
    ev.selectExpr("ts", "unix_micros(ts) as us", "event_id").show(3, false)
    import org.apache.spark.sql.functions._
    ev.agg(min("ts"), max("ts")).show(false)
    // hex conv check
    spark.sql("select conv(substr(md5('abc'),1,8),16,10) as h, " +
      "cast(conv(substr(md5('abc'),1,8),16,10) as bigint) as hb").show(false)
    spark.stop()
  }
}
