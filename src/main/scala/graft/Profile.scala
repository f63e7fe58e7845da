package graft


/** Ad-hoc single-query profiler: run named [[SparkEntry.queries]]
  * entries repeatedly with wall-clock per rep, outside the full Bench
  * suite (no shared-intermediate warm state unless the query builds
  * it itself).
  *
  * Run: `sbt "runMain graft.Profile q188_sql_update 3"` — optionally
  * `SPARK_GRAFT_SF_DIR` to pick the scale (default sf0.1) and
  * `GRAFT_PROF=1` to enable the env-gated per-stage prints some
  * queries carry.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args.filterNot(_.forall(_.isDigit)).toSeq
    val reps = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    // job-level accounting: one line per Spark job (duration + stages)
    if (sys.env.contains("GRAFT_PROF_JOBS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[
            Int, Long]()
          private val desc = new java.util.concurrent.ConcurrentHashMap[
            Int, String]()
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart)
              : Unit = {
            t0.put(js.jobId, System.nanoTime())
            desc.put(js.jobId, Option(js.properties.getProperty(
              "spark.job.description")).getOrElse("")
              .replaceAll("\\s+", " ").take(90))
          }
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = sc.stageInfo
            System.err.println(f"[stage] ${si.stageId}%4d " +
              f"${si.taskMetrics.executorRunTime}%6d ms-task " +
              f"${si.numTasks}%3d tasks  ${si.name.take(80)}")
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd)
              : Unit = {
            val start = Option(t0.remove(je.jobId)).getOrElse(0L)
            System.err.println(f"[job] ${je.jobId}%4d " +
              f"${(System.nanoTime() - start) / 1e6}%7.0f ms  " +
              Option(desc.remove(je.jobId)).getOrElse(""))
          }
        })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.registerAll(spark, sfDir)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).collect().length
        val ms = (System.nanoTime() - t0) / 1e6
        System.err.println(f"[profile] $name rep $i: $ms%.0f ms ($n rows)")
      }
    }
    spark.stop()
  }
}
