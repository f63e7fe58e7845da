package graft

import graft.api.Repo
import org.apache.spark.sql.SparkSession

/** Child-PROCESS writer fleet for the multi-process concurrent-ingest
  * gate (q207). The reference's concurrency test runs its writers in
  * dask processes, not threads (tests/concurrent_test.py:31-57): what
  * that family actually exercises is the STORE protocol — atomic
  * create-if-absent and content-addressed digest names — under OS-level
  * concurrency, where no JVM memory effect (a shared lock, a common
  * cache, a volatile fence) can accidentally serialize the race the
  * way same-JVM threads (q205) might. This main is launched by
  * [[QueriesSeries.q207_multiprocess_ingest]] with the parent's own
  * classpath and writes its half of the writer grid against the same
  * file store the parent's writers and maintenance loop are mutating.
  *
  * args: storeRoot fromWriter untilWriter rowsPerWriter
  * stdout contract: prints GRAFT_CHILD_READY once its session is up
  * (the parent holds its own writers until then, so both processes
  * race from the first commit), exits 0 on success.
  */
object ConcChild {
  /** The JavaModuleOptions Spark needs on JDK 17+ when launched as a
    * bare `java -cp` child (spark-submit normally injects these;
    * build.sbt applies the same list to forked sbt JVMs — matches
    * org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions). */
  val jdkModuleOptions: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  def main(args: Array[String]): Unit = {
    val (root, fromW, untilW, perS) = (args(0), args(1), args(2), args(3))
    // optional 5th arg: the parent's embedded S3 endpoint — the
    // multi-process-over-object-store gate (q208) points this child
    // at an `s3net://` root served by the parent JVM over HTTP
    if (args.length > 4)
      graft.core.S3NetFileSystem.setDefaultEndpoint(args(4))
    val per = perS.toLong
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-conc-child")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // parent created the collection before forking; a fresh handle
      // per writer mirrors q205 (no shared changelog cache)
      println("GRAFT_CHILD_READY")
      Console.out.flush()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val done = new java.util.concurrent.CountDownLatch(
        untilW.toInt - fromW.toInt)
      (fromW.toInt until untilW.toInt).foreach { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            try {
              // companion apply: file/s3net roots go through Hadoop,
              // http:// roots open as HTTP-POD clients (q209)
              val sr = Repo(root, spark).collection("conc").get
                .series("my_label")
              sr.write(spark.range(w * per, (w + 1) * per, 1, 4)
                .selectExpr(
                  "timestamp_seconds(946684800 + id * 60) AS ts",
                  "cast(id % 997 AS int) AS value"))
            } catch { case t: Throwable => errors.add(t); () }
            finally done.countDown()
          }
        })
      }
      if (!done.await(1200, java.util.concurrent.TimeUnit.SECONDS)) {
        System.err.println("graft-conc-child: writers timed out")
        sys.exit(3)
      }
      pool.shutdown()
      if (!errors.isEmpty) {
        errors.forEach(t => t.printStackTrace())
        sys.exit(2)
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
