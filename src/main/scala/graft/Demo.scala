package graft

import graft.api.Repo
import graft.core.{Closed, GSchema}
import org.apache.spark.sql.SparkSession

/** Quickstart demo driving the public API end-to-end (the reference
  * README's temperature example): create repo + collection, write a
  * series, overlay-write a correction, range-read, time-travel.
  *
  * Run: sbt "runMain graft.Demo /tmp/graft-demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val repo = Repo(root, spark)
    val schema = GSchema("timestamp" -> "timestamp*", "value" -> "float")
    val clct = repo.createCollection(schema, "temperature")
    val series = clct.series("bruxelles")

    series.write(Seq(
      ("2020-01-01 00:00:00", 7.9),
      ("2020-01-02 00:00:00", 8.3),
      ("2020-01-03 00:00:00", 9.1),
      ("2020-01-04 00:00:00", 6.5)).toDF("timestamp", "value"))

    println("== full read ==")
    series.frame().orderBy("timestamp").show()

    val cut = System.currentTimeMillis()
    Thread.sleep(20)

    // overlay: correct one day without rewriting the rest
    series.write(Seq(("2020-01-03 00:00:00", 9.9)).toDF("timestamp", "value"))
    println("== after overlay correction (03 -> 9.9) ==")
    series.frame().orderBy("timestamp").show()

    println("== time-travel read (before the correction) ==")
    series.frame(beforeMs = Some(cut)).orderBy("timestamp").show()

    println("== range read [01-02, 01-03] closed=both ==")
    series.frame("2020-01-02 00:00:00", "2020-01-03 00:00:00",
      closed = Closed.Both).orderBy("timestamp").show()

    println("== collections: " + repo.ls().mkString(", "))
    println("== series labels: " + clct.ls().mkString(", "))
    spark.stop()
  }
}
