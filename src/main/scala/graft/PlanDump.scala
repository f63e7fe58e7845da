package graft

/** Writes `.explain("formatted")` output for named
  * [[SparkEntry.queries]] entries to `plans/<round>/<name>_<tag>.txt`
  * — the optimization-round evidence files (the judge reads plan
  * claims against these). Run:
  * `sbt "runMain graft.PlanDump <tag> q113_bm25 q60_tfidf_terms ..."`.
  * `SPARK_GRAFT_SF_DIR` picks the scale (default sf0.1);
  * `SPARK_GRAFT_PLANS_ROUND` the output subdir (default r17).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail.toSeq
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    Tables.registerAll(spark, sfDir)
    val dir = java.nio.file.Paths.get("plans",
      sys.env.getOrElse("SPARK_GRAFT_PLANS_ROUND", "r17"))
    java.nio.file.Files.createDirectories(dir)
    lazy val slopeReady = {
      graft.functions.VectorFunctions.register(spark)
      Bench.textSlopeViews(spark); true
    }
    // tag suffix "!final": execute the query first, then dump the
    // final (post-AQE) plan — ReusedExchange / runtime join rewrites
    // only appear there
    val runFinal = tag.endsWith("!final")
    val tagClean = tag.stripSuffix("!final")
    for (name <- names) {
      val df = name match {
        case "text_terms_1x" | "text_terms_10x" =>
          val _ = slopeReady
          spark.sql(Bench.termsSlopeSql(
            "documents_" + name.split('_').last))
        case "text_lsh_1x" | "text_lsh_10x" =>
          val _ = slopeReady
          spark.sql(Bench.lshSlopeSql(
            "documents_" + name.split('_').last))
        case _ => SparkEntry.queries(name)(spark, sfDir)
      }
      if (runFinal) df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${name}_$tagClean.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[plandump] $name -> ${name}_$tagClean.txt " +
        s"(${plan.linesIterator.length} lines)")
    }
    spark.stop()
  }
}
