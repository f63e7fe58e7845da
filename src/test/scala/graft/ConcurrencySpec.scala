package graft

import graft.api._
import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Concurrent-writer behavior: parallel threads writing disjoint
  * ranges against one changelog; branches are merged and all rows
  * survive (reference tests/concurrent_test.py:31-91 — thread-based
  * here instead of dask workers).
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = GSchema("timestamp" -> "int*", "value" -> "float")

  test("parallel writers on one series, then merge, then read all") {
    val root = Files.createTempDirectory("graft-conc").toString
    val repo = new Repo(root, spark)
    val clct = repo.createCollection(schema, "c")
    val nWriters = 6
    val rowsPer = 20
    val pool = Executors.newFixedThreadPool(nWriters)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(nWriters)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    (0 until nWriters).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          try {
            start.await()
            // each writer gets its own Repo handle (fresh changelog
            // cache) and a disjoint key range
            val myRepo = new Repo(root, spark)
            val s = myRepo.collection("c").get.series("_")
            val ts = (0 until rowsPer).map(i => (w * 1000 + i).toLong)
            val vs = ts.map(_ * 1.0)
            s.write(TestSpark.frame(ts, vs))
          } catch { case t: Throwable => errors.add(t) }
          finally done.countDown()
        }
      })
    }
    start.countDown()
    assert(done.await(600, TimeUnit.SECONDS), "writers timed out")
    pool.shutdown()
    assert(errors.isEmpty, s"writer errors: ${errors.peek()}")

    clct.refresh()
    // concurrent commits race on the same parent -> branches
    clct.merge()
    clct.refresh()
    // merging may need more than one round if several leaves remain
    var guard = 0
    while (clct.changelog.leafs().length > 1 && guard < 5) {
      clct.merge(); clct.refresh(); guard += 1
    }
    val got = clct.series("_").frame().count()
    assert(got == (nWriters * rowsPer).toLong,
      s"expected ${nWriters * rowsPer} rows, got $got")
  }
}
