package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** tiny int-indexed frame builder */
  def frame(ts: Seq[Long], vals: Seq[Double]): DataFrame = {
    val s = spark
    import s.implicits._
    ts.zip(vals).toDF("timestamp", "value")
  }
}
