package graft

import graft.api._
import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch,
  TimeUnit}

/** Real-process crash soak: a child JVM ([[KillChild]]) commits
  * disjoint 10-row batches in a loop and the parent SIGKILLs it at
  * random moments, several lives on ONE store. After every kill a
  * cold fresh handle must see PREFIX-ATOMIC state — exactly the rows
  * of batches 0..k for some k, with every batch whose commit the
  * child ANNOUNCED durable — and the next life must resume cleanly
  * from what it reads. Unlike [[CrashConsistencySpec]]'s
  * exception-gated enumeration (which can only die BETWEEN store
  * ops), SIGKILL can land mid-write inside any file: surviving it
  * end-to-end validates the tmp+rename atomicity of
  * [[graft.core.HadoopStore.write]], the reader's indifference to
  * orphaned `.tmp-*` files, and recovery-after-recovery
  * accumulation. A final gc + parent write + full read proves the
  * store is fully serviceable after the whole ordeal. */
class KillSafetySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def clearCaches(): Unit = {
    Collection.clearManifestCache()
    ManifestCodec.clearChunkCache()
    Repo.clearRegDecodeCache()
  }

  test("SIGKILL soak: prefix-atomic visibility and clean recovery " +
      "across child lives") {
    val root = Files.createTempDirectory("graft-kill").toString
    val schema = GSchema("timestamp" -> "int*", "value" -> "float")
    clearCaches()
    new Repo(root, spark).createCollection(schema, "kill")

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ ConcChild.jdkModuleOptions ++ Seq(
      "-Xmx3g", "-cp", System.getProperty("java.class.path"),
      "graft.KillChild", root)
    val rnd = new scala.util.Random(42)
    var maxAnnounced = -1L // highest batch any life reported durable

    val lives = 5
    for (life <- 0 until lives) {
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val ready = new CountDownLatch(1)
      val announced = new ConcurrentLinkedQueue[Long]()
      val drain = new Thread(() => {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        var drainMax = -1L // highest batch this life has parsed
        var line = br.readLine()
        while (line != null) {
          if (line.contains("GRAFT_CHILD_READY")) ready.countDown()
          else if (line.startsWith("COMMITTED ")) {
            // SIGKILL can truncate the FINAL line mid-write ("COMMITTED
            // 12" read back as "COMMITTED 1" — or just "COMMITTED " —
            // at EOF). The drain stays sound because announcements are
            // strictly increasing within a life, so a parsed value
            // BELOW the running max can only be a truncated tail:
            // record via max-merge, never trust a decrease, and skip
            // unparseable tails outright.
            val tail = line.drop("COMMITTED ".length).trim
            if (tail.nonEmpty && tail.forall(_.isDigit)) {
              val k = tail.toLong
              if (k >= drainMax) { drainMax = k; announced.add(k) }
            }
          }
          line = br.readLine()
        }
      })
      drain.setDaemon(true)
      drain.start()
      try {
        assert(ready.await(120, TimeUnit.SECONDS),
          s"life $life: child never became ready")
        // let it commit at least once this life, then kill somewhere
        // inside the commit loop
        val t0 = System.nanoTime()
        while (announced.isEmpty &&
            (System.nanoTime() - t0) < 30e9) Thread.sleep(5)
        assert(!announced.isEmpty, s"life $life: no commit in 30 s")
        Thread.sleep(rnd.nextInt(400).toLong)
      } finally {
        proc.destroyForcibly()
        proc.waitFor(30, TimeUnit.SECONDS)
      }
      drain.join(5000)
      val livesMax = announced.iterator()
      while (livesMax.hasNext) maxAnnounced = maxAnnounced max
        livesMax.next()

      // cold verify: visible rows are EXACTLY batches 0..k-1 for some
      // k, and every announced-durable batch is present
      clearCaches()
      val rows = new Repo(root, spark).collection("kill").get
        .series("_").frame().select("timestamp").collect()
        .map(_.getLong(0)).sorted
      assert(rows.length % 10 == 0,
        s"life $life: ${rows.length} rows — a torn batch is visible")
      val k = rows.length / 10
      assert(rows.toSeq == (0L until k * 10L),
        s"life $life: visible rows are not the batch prefix " +
          s"(len=${rows.length}, head=${rows.take(3).mkString(",")}, " +
          s"last=${rows.takeRight(3).mkString(",")})")
      assert(k > maxAnnounced,
        s"life $life: announced batch $maxAnnounced durable but only " +
          s"$k batches visible")
      info(s"life $life: ${k} batches visible " +
        s"(announced through $maxAnnounced), prefix intact")
    }

    // the store remains fully serviceable: gc, a parent write, a
    // cold full read
    clearCaches()
    val repo = new Repo(root, spark)
    repo.gc(0L)
    val c = repo.collection("kill").get
    val before = c.series("_").frame().count()
    c.series("_").write(spark.range(1000000L, 1000010L, 1, 2)
      .selectExpr("id AS timestamp", "cast(id AS double) AS value"))
    clearCaches()
    val after = new Repo(root, spark).collection("kill").get
      .series("_").frame().count()
    assert(after == before + 10,
      s"post-soak write lost rows: $before -> $after")
  }
}
