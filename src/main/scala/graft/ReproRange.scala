package graft

import graft.core.GSchema
import org.apache.spark.sql.functions._

/** Minimal repro harness for the conn_range_53m regression (round-15
  * verdict item 1): writes the identical 52.59M-row series into a
  * fresh repo root and times the one-year connector range read,
  * printing per-rep wall clock plus a per-phase breakdown (planning
  * vs execution). Run:
  * `sbt "runMain graft.ReproRange [rows-millions] [reps]"`.
  */
object ReproRange {
  def main(args: Array[String]): Unit = {
    val millions = args.headOption.map(_.toInt).getOrElse(53)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    import spark.implicits._
    val _ = spark.implicits

    val root = java.nio.file.Files
      .createTempDirectory("graft-repro").toString
    val repo = new graft.api.Repo(root, spark)
    val schema = GSchema("ts" -> "timestamp*", "value" -> "float")
    val rows = millions * 1000000L
    val ts = spark.range(0, rows, 1, cpus.toInt)
      .select(
        timestamp_seconds(col("id") * 300L).as("ts"),
        sin(col("id").cast("double")).as("value"))
    val t0 = System.nanoTime()
    repo.createCollection(schema, "ts53m_0").series("_")
      .write(ts, presorted = true)
    println(f"write: ${(System.nanoTime() - t0) / 1e9}%.3f s")

    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val t0 = new java.util.concurrent.ConcurrentHashMap[
          Int, Long]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart)
            : Unit = t0.put(js.jobId, System.nanoTime())
        override def onStageCompleted(
            sc: org.apache.spark.scheduler
              .SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          System.err.println(f"[stage] ${si.stageId}%4d " +
            f"${si.taskMetrics.executorRunTime}%6d ms-task " +
            f"${si.numTasks}%3d tasks  ${si.name.take(70)}")
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd)
            : Unit = {
          val start = Option(t0.remove(je.jobId)).getOrElse(0L)
          System.err.println(f"[job] ${je.jobId}%4d " +
            f"${(System.nanoTime() - start) / 1e6}%7.0f ms")
        }
      })
    val conn = spark.read.format("graft").option("path", root)
      .option("collection", "ts53m_0").option("series", "_").load()
    for (i <- 0 until reps) {
      val t = System.nanoTime()
      val df = conn
        .filter(col("ts") >= lit("1990-01-01").cast("timestamp")
          && col("ts") < lit("1991-01-01").cast("timestamp"))
        .agg(count(col("value")))
      val plan = df.queryExecution.executedPlan
      val tPlan = System.nanoTime()
      df.collect()
      val tEnd = System.nanoTime()
      println(f"rep $i: total ${(tEnd - t) / 1e9}%.3f s  " +
        f"plan ${(tPlan - t) / 1e9}%.3f s  " +
        f"exec ${(tEnd - tPlan) / 1e9}%.3f s  " +
        s"(${plan.getClass.getSimpleName})  " +
        s"segs=${graft.sources.GraftScanProbe.lastSegmentsScanned}/" +
        s"${graft.sources.GraftScanProbe.lastSegmentsTotal}")
    }
    spark.stop()
  }
}
