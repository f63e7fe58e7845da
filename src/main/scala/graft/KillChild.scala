package graft

import graft.api.Repo
import org.apache.spark.sql.SparkSession

/** Crash-recovery soak child (launched by `KillSafetySpec` with the
  * parent's classpath, like [[ConcChild]]): commits disjoint 10-row
  * batches to one series forever, announcing each DURABLE commit on
  * stdout. The parent SIGKILLs this process at random moments — the
  * only "shutdown" this main ever sees — so every run exercises the
  * store protocol's atomicity (tmp + rename writes, content-addressed
  * names, changelog entry as the commit point) under real process
  * death rather than a simulated exception.
  *
  * Restart contract: a new life derives its next batch index from the
  * rows a FRESH handle can see (visible rows are always a prefix of
  * complete batches — that is the property under test), so repeated
  * kill/restart cycles accumulate on one store without coordination.
  *
  * args: storeRoot
  * stdout: GRAFT_CHILD_READY once the session is up, then
  * `COMMITTED <k>` after batch k's commit returns.
  */
object KillChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-kill-child")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = new Repo(root, spark).collection("kill").get
    c.embedMaxSize = 0L // real chunk files: multi-op commit protocol
    val sr = c.series("_")
    var k = sr.frame().count() / 10L // resume after a previous life
    println("GRAFT_CHILD_READY")
    Console.out.flush()
    while (true) {
      val lo = k * 10L
      sr.write(spark.range(lo, lo + 10L, 1, 2)
        .selectExpr("id AS timestamp", "cast(id AS double) AS value"))
      println(s"COMMITTED $k")
      Console.out.flush()
      k += 1
    }
  }
}
