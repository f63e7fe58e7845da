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

  test("concurrent materialize across dirs never leaves a dead view") {
    // regression for the evict-vs-rebind race: thread A pins a view
    // for dir1 while thread B pins the SAME view for dir2 — the
    // same-view eviction must not unpersist blocks another thread is
    // about to bind, and whichever binding wins must stay readable
    val pool = Executors.newFixedThreadPool(2)
    try {
      for (_ <- 1 to 5) {
        val latch = new CountDownLatch(1)
        val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
        val fs = dirs.map { d =>
          pool.submit(new Runnable {
            def run(): Unit = {
              latch.await()
              QueriesSim.materialize(spark, d,
                s"SELECT doc_id, lang FROM parquet.`$d/documents.parquet`",
                "conc_view")
            }
          })
        }
        latch.countDown()
        fs.foreach(_.get(120, TimeUnit.SECONDS))
        // the surviving binding must be fully readable (missing-block
        // errors here mean eviction freed a just-built checkpoint)
        assert(spark.table("conc_view").count() > 0)
      }
    } finally pool.shutdown()
  }

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

  test("merge keeps a sibling's rows inside a defragged segment's " +
      "interior gap") {
    // The concurrent-ingest loss mode, deterministically: branch A
    // holds writers {0,1,4} DEFRAGGED into wide segments whose span
    // bridges the [200,300) gap; branch B (forked from the empty
    // root) wrote exactly that gap. A plain manifest splice of A's
    // wide segment over the pile would cut B's rows — merge must
    // union-merge the conflicted span instead.
    val root = Files.createTempDirectory("graft-gap").toString
    val repo = new Repo(root, spark)
    repo.createCollection(schema, "gap")
    // branch A: three disjoint ranges committed separately, then
    // defrag(1) coalesces them into segments spanning [0,500)
    val cA = repo.collection("gap").get
    val sA = cA.series("_")
    Seq((0L, 100L), (100L, 200L), (400L, 500L)).foreach { case (a, b) =>
      val ts = (a until b).toSeq
      sA.write(TestSpark.frame(ts, ts.map(_ * 1.0)))
    }
    cA.refresh(); cA.defrag(1)
    // branch B: the interior gap, written in a SECOND repo whose
    // changelog starts at the same empty root — pull preserves the
    // parent edge, so it lands as a sibling branch (the same fork a
    // racing writer's commit produces)
    val rootB = Files.createTempDirectory("graft-gapB").toString
    val repoB = new Repo(rootB, spark)
    val cB = repoB.createCollection(schema, "gap")
    val ts = (200L until 300L).toSeq
    cB.series("_").write(TestSpark.frame(ts, ts.map(_ * 2.0)))
    cA.pull(cB)
    cA.refresh()
    assert(cA.changelog.leafs().length == 2,
      s"expected a fork, got ${cA.changelog.leafs().length} leaves")
    cA.merge(); cA.refresh()
    val got = cA.series("_").frame().orderBy("timestamp").collect()
    assert(got.length == 400,
      s"merge lost rows: ${got.length} of 400")
    // B's values (x2) survived inside the gap
    val gap = got.filter(r => r.getLong(0) >= 200L && r.getLong(0) < 300L)
    assert(gap.length == 100 &&
      gap.forall(r =>
        r.getAs[Number](1).doubleValue() == r.getLong(0) * 2.0),
      "sibling gap rows lost or corrupted")
  }

  test("concurrent grouped ingests fork and merge without losing groups") {
    val root = Files.createTempDirectory("graft-conc2").toString
    val repo = new Repo(root, spark)
    repo.createCollection(schema, "g")
    import spark.implicits._
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // two ingests with disjoint group sets racing on one collection:
    // each lands as ONE batched commit; racing commits become sibling
    // revisions that merge() heals
    Seq(Seq(("a", 1L), ("b", 2L)), Seq(("c", 3L), ("d", 4L)))
      .zipWithIndex.foreach { case (groups, i) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            try {
              start.await()
              val c = new Repo(root, spark).collection("g").get
              val df = groups.map { case (g, t) => (t, t.toDouble, g) }
                .toDF("timestamp", "value", "grp")
              c.ingestGrouped(df, "grp")
              ()
            } catch { case t: Throwable => errors.add(t); () }
            finally done.countDown()
          }
        })
        val _ = i
      }
    start.countDown()
    done.await()
    pool.shutdown()
    assert(errors.isEmpty, s"ingest failed: ${errors.peek()}")
    val c = repo.collection("g").get
    c.merge()
    assert(c.ls().sorted == Seq("a", "b", "c", "d"),
      s"lost groups: ${c.ls()}")
    Seq("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L).foreach {
      case (g, t) =>
        val rows = c.series(g).frame().collect()
        assert(rows.length == 1 && rows(0).getLong(0) == t,
          s"series $g corrupt")
    }
  }

  test("concurrent registry DDL across shared and separate handles " +
      "loses nothing and never poisons the decode cache") {
    // regression for ADVICE r15: unsynchronized create/delete/rename
    // could pass writeRegDelta's leaf guard with a state snapshot
    // predating a concurrent thread's commit — NoSuchElementException
    // during encode, or a committed registry document missing an
    // entry (silent loss, visible only on a COLD re-decode)
    for (iter <- 1 to 3) {
      val root = Files.createTempDirectory(s"graft-ddl$iter").toString
      val shared = new Repo(root, spark)
      val nThreads = 4
      val perThread = 12
      val pool = Executors.newFixedThreadPool(nThreads)
      val start = new CountDownLatch(1)
      val done = new CountDownLatch(nThreads)
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until nThreads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            try {
              start.await()
              // odd threads use the shared handle, even threads their
              // own — the decode cache is JVM-global either way
              val repo =
                if (t % 2 == 1) shared else new Repo(root, spark)
              for (i <- 0 until perThread) {
                val l = s"t${t}_c$i"
                repo.createCollection(schema, l)
                if (i % 4 == 3) repo.renameCollection(l, s"${l}_r")
                else if (i % 4 == 2) repo.deleteCollection(l)
              }
            } catch { case x: Throwable => errors.add(x) }
            finally done.countDown()
          }
        })
      }
      start.countDown()
      assert(done.await(300, TimeUnit.SECONDS), "DDL threads timed out")
      pool.shutdown()
      assert(errors.isEmpty, s"iter $iter DDL error: ${errors.peek()}")
      val expect = (for {
        t <- 0 until nThreads; i <- 0 until perThread
        if i % 4 != 2
      } yield if (i % 4 == 3) s"t${t}_c${i}_r" else s"t${t}_c$i").toSet
      // cold handle + cold cache: what the committed DOCUMENT holds,
      // not what a warm cache believes it holds
      graft.api.Repo.clearRegDecodeCache()
      val got = new Repo(root, spark).ls().toSet
      assert(got == expect,
        s"iter $iter: lost ${expect -- got}, extra ${got -- expect}")
    }
  }

  test("registry DDL from a stale handle survives decode-cache " +
      "eviction without forking (no delete resurrection)") {
    // the in-JVM single-chain guarantee must not depend on the
    // 256-root LRU: after eviction, a stale warm handle's DDL knows
    // (via Repo.noteLeaf) that a newer leaf exists, relists, and
    // applies its delta to the CURRENT state — instead of forking
    // from its old view, whose add-wins union heal would resurrect
    // the deleted key
    val root = Files.createTempDirectory("graft-evict").toString
    val h1 = new Repo(root, spark)
    val h2 = new Repo(root, spark)
    h1.createCollection(schema, "a")
    assert(h2.ls().toSet == Set("a")) // h2's changelog warm at leaf 1
    h1.createCollection(schema, "b")  // leaf 2 — h2 never relists
    graft.api.Repo.clearRegDecodeCache() // simulate LRU eviction
    h2.deleteCollection("a") // stale view + evicted cache
    graft.api.Repo.clearRegDecodeCache()
    val got = new Repo(root, spark).ls().toSet
    assert(got == Set("b"),
      s"expected delete of 'a' and survival of 'b'; got $got")
  }

  test("property: forked branches with disjoint shards merge " +
      "losslessly under random write order and defrag") {
    // randomized generalization of the defragged-gap regression: the
    // keyspace is tiled, tiles are assigned to 3 branches at random,
    // each branch writes its tiles in random order (so defrag later
    // coalesces across interior gaps OWNED BY OTHER BRANCHES), a
    // random subset of branches defrags, the branches land as fork
    // siblings via pull, and merge must reconstruct the exact union —
    // every key valued by its OWNER's formula, nothing lost, nothing
    // duplicated. Seeded: failures reproduce.
    val rnd = new scala.util.Random(20260815L)
    for (iter <- 1 to 4) {
      val root = Files.createTempDirectory(s"graft-prop$iter").toString
      val repo = new Repo(root, spark)
      val cA = repo.createCollection(schema, "p")
      val nTiles = 24
      val tileW = 50L
      // every branch owns >= 1 tile: fix the first three, then random
      val owner = Array.tabulate(nTiles)(i =>
        if (i < 3) i else rnd.nextInt(3))
      def writeBranch(c: Collection, b: Int): Unit = {
        val mine = rnd.shuffle(
          (0 until nTiles).filter(owner(_) == b).toList)
        mine.foreach { t =>
          val ts = (t * tileW until (t + 1) * tileW).toSeq
          c.series("_").write(
            TestSpark.frame(ts, ts.map(_ * (b + 1).toDouble)))
        }
        if (rnd.nextBoolean()) { c.refresh(); c.defrag(rnd.nextInt(3) + 1) }
      }
      writeBranch(cA, 0)
      for (b <- 1 to 2) {
        val rootB = Files
          .createTempDirectory(s"graft-prop${iter}b$b").toString
        val cB = new Repo(rootB, spark).createCollection(schema, "p")
        writeBranch(cB, b)
        cA.pull(cB)
      }
      cA.refresh()
      cA.merge(); cA.refresh()
      val got = cA.series("_").frame().collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).doubleValue())
        .sortBy(_._1)
      assert(got.length == nTiles * tileW,
        s"iter $iter: merge lost/duplicated rows — ${got.length} of " +
          s"${nTiles * tileW}")
      got.foreach { case (k, v) =>
        val expect = k * (owner((k / tileW).toInt) + 1).toDouble
        assert(v == expect, s"iter $iter: key $k = $v, expected " +
          s"$expect (owner ${owner((k / tileW).toInt)})")
      }
    }
  }
}
