package graft

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/sparklogs")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    Tables.registerAll(spark, dir)
    spark.range(100000L).selectExpr("sum(id)").collect()
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 3)
      time(s"q23 run$i") { QueriesSim.q23_lsh_pairs(spark, dir).count(); () }
    spark.stop()
  }
}
