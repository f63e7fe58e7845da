package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ChangelogSpec extends AnyFunSuite {

  def freshLog(): Changelog = {
    val dir = Files.createTempDirectory("graft-log").toString
    new Changelog(new HadoopStore(dir), "changelog")
  }

  test("linear commits") {
    val log = freshLog()
    log.commit("one".getBytes)
    Thread.sleep(2)
    log.commit("two".getBytes)
    val hist = log.log()
    assert(hist.length == 2)
    assert(hist.head.parent == Changelog.Phi)
    assert(hist(1).parent == hist.head.child)
    assert(new String(log.payload(log.leaf().get)) == "two")
  }

  test("double write of same payload is skipped") {
    val log = freshLog()
    log.commit("same".getBytes)
    val revs = log.commit("same".getBytes)
    assert(revs.isEmpty)
    assert(log.log().length == 1)
  }

  test("leaf() skips a trailing second-parent revisit of an " +
      "interior merge node") {
    val log = freshLog()
    val a = log.commit("a".getBytes).head
    Thread.sleep(2)
    val b = log.commit("b".getBytes, parents = Seq(a.child)).head
    Thread.sleep(2)
    val c = log.commit("c".getBytes, parents = Seq(a.child)).head
    Thread.sleep(2)
    val m = log.commit("m".getBytes, parents = Seq(b.child, c.child)).head
    Thread.sleep(2)
    val d = log.commit("d".getBytes, parents = Seq(m.child)).head
    log.refresh()
    // the DFS descends b's branch through the merge node m down to d,
    // then yields c's edge INTO m as a trailing revisit — so the last
    // yielded edge is an interior node. Reading it as the leaf served
    // a stale snapshot (the racing-writers spec saw healed commits
    // "vanish"); the winning revision must be the graph leaf d.
    assert(log.log().last.child == m.child,
      "fixture must end on the revisit edge")
    assert(log.leaf().get.child == d.child)
    assert(new String(log.payload(log.leaf().get)) == "d")
    // view-relative variant: a cut-off AFTER everything still finds d
    assert(log.leaf(Some(d.epochMs + 10)).get.child == d.child)
  }

  test("a multi-parent commit joins twin leaves even when the " +
      "payload matches both parents") {
    val log = freshLog()
    val base = log.commit("root".getBytes).head
    Thread.sleep(2)
    val a = log.commit("same".getBytes, parents = Seq(base.child)).head
    Thread.sleep(2)
    val b = log.commit("same".getBytes, parents = Seq(base.child)).head
    log.refresh()
    assert(log.leafs().length == 2)
    // the healing merge commits the (identical) union content with
    // both leaves as parents. The old per-EDGE double-write skip
    // dropped every edge of this join, so two content-identical
    // leaves could never be healed — merge() spun forever.
    val revs = log.commit("same".getBytes,
      parents = Seq(a.child, b.child))
    assert(revs.length == 2, "join node must write both edges")
    assert(revs.map(_.child).distinct.length == 1, "ONE node")
    log.refresh()
    assert(log.leafs().length == 1)
  }

  test("concurrent writers create branches; leaf wins deterministically") {
    val log = freshLog()
    val base = log.commit("root".getBytes).head
    // two children of the same parent
    Thread.sleep(2)
    log.commit("a".getBytes, parents = Seq(base.child))
    Thread.sleep(2)
    log.commit("b".getBytes, parents = Seq(base.child))
    log.refresh()
    val hist = log.log()
    assert(hist.length == 3)
    val leaves = log.leafs()
    assert(leaves.length == 2)
    // winning leaf = last in DFS linearization
    assert(log.leaf().get == hist.last)
  }

  test("before filter (time travel)") {
    val log = freshLog()
    log.commit("old".getBytes)
    Thread.sleep(10)
    val cut = System.currentTimeMillis()
    Thread.sleep(10)
    log.commit("new".getBytes)
    log.refresh()
    assert(new String(log.payload(log.leaf().get)) == "new")
    assert(new String(log.payload(log.leaf(Some(cut)).get)) == "old")
  }

  test("pull copies missing revisions") {
    val a = freshLog()
    val b = freshLog()
    a.commit("one".getBytes)
    Thread.sleep(2)
    a.commit("two".getBytes)
    b.pull(a)
    assert(b.log().map(_.path) == a.log().map(_.path))
    // second pull is a no-op
    assert(b.pull(a).isEmpty)
  }

  test("a merged-over node never reappears as a leaf (regression)") {
    val log = freshLog()
    log.commit("root".getBytes)
    val root = log.leaf().get.child
    // fork: two children of root
    log.commit("x".getBytes, parents = Seq(root)); Thread.sleep(2)
    log.commit("y".getBytes, parents = Seq(root))
    val forks = log.leafs().map(_.child)
    assert(forks.length == 2, s"expected a fork, got $forks")
    // heal with a two-parent merge, then commit ON TOP of the merge
    log.commit("merged".getBytes, parents = forks); Thread.sleep(2)
    val m = log.leafs()
    assert(m.length == 1, s"merge must leave one leaf, got $m")
    log.commit("after".getBytes, parents = Seq(m.head.child))
    // the merge node is reached twice by the DFS (once per parent
    // edge); its second visit must NOT mark it as a leaf — that fake
    // fork made every reader commit a fresh heal revision forever
    val leaves = log.leafs()
    assert(leaves.length == 1,
      s"merged-over node resurfaced as a leaf: $leaves")
    assert(new String(log.payload(leaves.head)) == "after")
  }

  test("unmerged fork: the NEWEST branch wins (reference DFS order)") {
    // reference changelog.py:91-121 descends the OLDEST sibling first,
    // so log() ends on (and leaf() returns) the newest branch's tip —
    // even when the older branch is DEEPER
    val log = freshLog()
    val r0 = log.commit("root".getBytes).head
    Thread.sleep(2)
    val rA = log.commit("branch-a".getBytes,
      parents = Seq(r0.child)).head
    Thread.sleep(2)
    val rAx = log.commit("branch-a-child".getBytes,
      parents = Seq(rA.child)).head
    Thread.sleep(2)
    val rB = log.commit("branch-b".getBytes,
      parents = Seq(r0.child)).head
    log.refresh()
    val order = log.log().map(_.child)
    assert(order == Vector(r0.child, rA.child, rAx.child, rB.child),
      order)
    assert(log.leaf().get.child == rB.child)
    assert(log.leafs().map(_.child).toSet ==
      Set(rAx.child, rB.child))
  }

  test("trim keeps the parent edge; pull after trim never duplicates") {
    val dirR = Files.createTempDirectory("graft-log-r").toString
    val remote = new Changelog(new HadoopStore(dirR), "changelog")
    remote.commit("r0".getBytes); Thread.sleep(2)
    remote.commit("r1".getBytes); Thread.sleep(2)
    remote.commit("r2".getBytes)
    val local = freshLog()
    local.pull(remote)
    assert(local.log().map(_.child) == remote.log().map(_.child))
    // trim the oldest revision: kept revisions keep their ORIGINAL
    // parent edges (implicit-root continuity, reference parity)
    val cut = remote.log()(1).epochMs + 1
    local.trim(cut)
    local.refresh()
    assert(local.log().length == 1)
    assert(local.log().head.parent != Changelog.Phi,
      "trim must not re-root the kept revision")
    // pulling from the untrimmed remote restores the trimmed history
    // (reference behavior) but must NOT duplicate any kept node
    local.pull(remote)
    local.refresh()
    val children = local.log().map(_.child)
    assert(children.distinct == children, children)
    assert(children.toSet == remote.log().map(_.child).toSet)
    assert(local.leaf().get.child == remote.leaf().get.child)
  }

  test("tree build stays interactive at 1e4 revisions") {
    // the last driver-cost path without a scale pin (manifest prune/
    // splice/encode and registry decode have theirs): computeLog
    // sorts the listing and walks the parent->children tree once —
    // O(n log n) — and a long-lived UNsquashed series accumulates
    // thousands of revisions. Entry files are synthesized directly
    // (computeLog reads only the LISTING; payloads are never touched
    // by log()/leaf()).
    val root = Files.createTempDirectory("graft-logscale")
    val dir = root.resolve("changelog")
    Files.createDirectories(dir)
    val n = 10000
    var parent = Changelog.Phi
    (0 until n).foreach { i =>
      val child = f"$i%011x-deadbeef$i%08d"
      Files.createFile(dir.resolve(s"$parent.$child"))
      parent = child
    }
    val log = new Changelog(new HadoopStore(root.toString), "changelog")
    val t0 = System.nanoTime()
    val hist = log.log()
    val buildMs = (System.nanoTime() - t0) / 1e6
    assert(hist.length == n)
    assert(hist.last.child == parent)
    assert(log.leaf().get.child == parent)
    // cached: a second read must not re-list or re-walk
    val t1 = System.nanoTime()
    (0 until 100).foreach(_ => log.leaf())
    val cachedMs = (System.nanoTime() - t1) / 1e6
    assert(buildMs < 2000, f"1e4-revision tree build $buildMs%.0f ms")
    assert(cachedMs < 200, f"100 cached leaf reads $cachedMs%.0f ms")
    info(f"1e4 revisions: build $buildMs%.0f ms, " +
      f"100 cached leafs $cachedMs%.0f ms")
  }

  test("1e5 revisions: one cold build, then warm commits are " +
      "incremental (no ls, no DFS)") {
    // CDC-per-micro-batch deployments reach 1e5+ revisions between
    // trims; the nth warm commit must not pay an O(n) relist+DFS
    // (that made a commit train O(n^2) cumulative). Counters prove
    // the shape: exactly ONE full linearization for the cold read,
    // zero more across a 1000-commit warm train.
    val root = Files.createTempDirectory("graft-logscale5")
    val dir = root.resolve("changelog")
    Files.createDirectories(dir)
    val n = 100000
    var parent = Changelog.Phi
    (0 until n).foreach { i =>
      val child = f"$i%011x-deadbeef$i%08d"
      Files.createFile(dir.resolve(s"$parent.$child"))
      parent = child
    }
    val log = new Changelog(new HadoopStore(root.toString), "changelog")
    val t0 = System.nanoTime()
    assert(log.leaf().get.child == parent)
    val coldMs = (System.nanoTime() - t0) / 1e6
    // the regime that matters at scale is a FRESH HANDLE in a warm
    // JVM (the SQL door opens one per statement): measure 3 fresh
    // linearizations after JIT warmup and pin the steady-state bound
    // (round-15 verdict #6 — was ~3.4 s when ls stat'ed every file;
    // the names-only readdir makes cold open sub-0.3 s)
    val steadyMs = (0 until 3).map { _ =>
      val h = new Changelog(new HadoopStore(root.toString), "changelog")
      val t = System.nanoTime()
      assert(h.leaf().get.child == parent)
      (System.nanoTime() - t) / 1e6
    }.min
    assert(steadyMs < 600,
      f"1e5-revision steady cold open $steadyMs%.0f ms (bound 600 " +
        "— quiet runs measure ~0.15-0.3 s)")
    val full0 = Changelog.fullComputes.get()
    val inc0 = Changelog.incAppends.get()
    val t1 = System.nanoTime()
    (0 until 1000).foreach(i => log.commit(s"p$i".getBytes))
    val trainMs = (System.nanoTime() - t1) / 1e6
    assert(Changelog.fullComputes.get() == full0,
      "warm commits must not relinearize the changelog")
    assert(Changelog.incAppends.get() - inc0 == 1000L)
    assert(log.log().length == n + 1000)
    assert(new String(log.payload(log.leaf().get)) == "p999")
    // the incremental view must MATCH a from-scratch linearization
    val warm = log.log()
    log.refresh()
    assert(log.log() == warm,
      "incremental cache must equal the canonical DFS order")
    // Wall bound + one same-process retry (round 16): these 1000
    // commits each write+fsync one REAL file, so the batch time is
    // 1000 x the disk's current fsync latency — measured 2-16 ms per
    // fsync depending on neighbor IO and parallel-suite contention
    // (the in-memory 1e6 twin does 0.02 ms/commit in the same runs).
    // The bound exists to catch a per-commit ALGORITHMIC regression,
    // which the counter pins above already catch structurally; a real
    // O(history) relinearization at 1e5 revisions costs >= 300 ms per
    // commit = >= 300 s for the batch, so 30 s separates disk weather
    // from regression with a 10x margin on both sides.
    val trainMs2 = if (trainMs < 30000) trainMs else {
      val t2 = System.nanoTime()
      (0 until 1000).foreach(i => log.commit(s"r$i".getBytes))
      val r = (System.nanoTime() - t2) / 1e6
      info(f"retry: 1000 more warm commits $r%.0f ms " +
        f"(first batch $trainMs%.0f ms)"); r
    }
    assert(trainMs2 < 30000,
      f"1000 warm commits $trainMs%.0f ms / retry $trainMs2%.0f ms")
    info(f"1e5 revisions: cold build $coldMs%.0f ms " +
      f"(steady $steadyMs%.0f ms), 1000 warm commits $trainMs%.0f ms " +
      f"(${trainMs / 1000}%.2f ms/commit)")
  }

  test("1e6 revisions (10x decade): cold build interactive, warm " +
      "commits incremental, order canonical") {
    // the 10x-decade sibling of the 1e5 pin (same treatment the
    // manifest codec got): a changelog held for a full year of
    // ~2-minute CDC micro-batches without a trim. An in-memory Store
    // stands in for the filesystem — 1e6 REAL file creates would
    // spend the test budget on syscalls, and the pin is about the
    // CHANGELOG's algorithm (one listing-sort + DFS cold, O(1)
    // splices warm), which consumes only ls/write/read.
    final class MapStore extends Store {
      val files =
        new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
      def ls(dir: String): Seq[String] = {
        val pre = dir + "/"
        import scala.jdk.CollectionConverters._
        files.keySet.asScala.iterator.filter(_.startsWith(pre))
          .map(_.drop(pre.length)).filter(!_.contains('/')).toVector
      }
      def read(path: String): Array[Byte] = {
        val b = files.get(path)
        if (b == null) throw new java.io.FileNotFoundException(path)
        b
      }
      def write(path: String, data: Array[Byte]): Boolean =
        files.putIfAbsent(path, data) == null
      def rm(path: String, recursive: Boolean): Unit = {
        files.remove(path)
        if (recursive) ls(path).foreach(c => rm(s"$path/$c", recursive))
      }
      def mv(from: String, to: String): Unit = {
        val b = files.remove(from)
        if (b == null) throw new java.io.FileNotFoundException(from)
        files.put(to, b)
      }
      def exists(path: String): Boolean = files.containsKey(path)
      def walk(prefix: String): Seq[String] = {
        import scala.jdk.CollectionConverters._
        files.keySet.asScala.iterator
          .filter(_.startsWith(prefix + "/")).toVector
      }
      def uri(path: String): String = s"memstub:///$path"
    }
    val store = new MapStore
    val n = 1000000
    var parent = Changelog.Phi
    (0 until n).foreach { i =>
      val child = f"$i%011x-deadbeef$i%08d"
      store.files.put(s"changelog/$parent.$child", Array.emptyByteArray)
      parent = child
    }
    val log = new Changelog(store, "changelog")
    val full0 = Changelog.fullComputes.get()
    val t0 = System.nanoTime()
    assert(log.leaf().get.child == parent)
    val coldMs = (System.nanoTime() - t0) / 1e6
    assert(Changelog.fullComputes.get() == full0 + 1)
    val inc0 = Changelog.incAppends.get()
    val t1 = System.nanoTime()
    (0 until 1000).foreach(i => log.commit(s"p$i".getBytes))
    val trainMs = (System.nanoTime() - t1) / 1e6
    assert(Changelog.fullComputes.get() == full0 + 1,
      "warm commits at 1e6 revisions must not relinearize")
    assert(Changelog.incAppends.get() - inc0 == 1000L)
    assert(log.log().length == n + 1000)
    assert(new String(log.payload(log.leaf().get)) == "p999")
    // the spliced view must equal a from-scratch linearization even
    // one decade up (any divergence compounds into wrong leaf wins)
    val warm = log.log()
    log.refresh()
    assert(log.log() == warm,
      "incremental cache must equal the canonical DFS order at 1e6")
    // generous interactive bounds (CI hosts jitter): the cold build
    // is one sort+DFS (~1-3 s here); each warm commit is O(1)
    assert(coldMs < 30000, f"1e6-revision cold build $coldMs%.0f ms")
    assert(trainMs < 10000,
      f"1000 warm commits at 1e6 revs $trainMs%.0f ms")
    info(f"1e6 revisions: cold build $coldMs%.0f ms, 1000 warm " +
      f"commits $trainMs%.0f ms (${trainMs / 1000}%.2f ms/commit)")
  }

  test("incremental commit after a merge heal keeps canonical order") {
    val log = freshLog()
    val a = log.commit("a".getBytes).head
    Thread.sleep(2)
    val b = log.commit("b".getBytes, parents = Seq(a.child)).head
    Thread.sleep(2)
    val c = log.commit("c".getBytes, parents = Seq(a.child)).head
    Thread.sleep(2)
    val m = log.commit("m".getBytes, parents = Seq(b.child, c.child)).head
    Thread.sleep(2)
    // MATERIALIZE the cache so the next commits take the incremental
    // path (the merge commit itself dropped it): the cached log now
    // ends with m's REVISIT edge, so the splice must land after m's
    // DESCEND edge — an append at the tail would diverge from the
    // canonical DFS
    val inc0 = Changelog.incAppends.get()
    assert(log.leaf().get.child == m.child) // builds the cache
    val d = log.commit("d".getBytes, parents = Seq(m.child)).head
    Thread.sleep(2)
    val e = log.commit("e".getBytes, parents = Seq(d.child)).head
    assert(Changelog.incAppends.get() - inc0 == 2,
      "both post-merge commits must take the incremental splice")
    val warm = log.log()
    log.refresh()
    assert(log.log() == warm,
      "post-merge commits must keep the canonical linearization")
    assert(log.leaf().get.child == e.child)
    // the trailing revisit edge of m is still yielded LAST and is not
    // a leaf (its node has children now)
    assert(!warm.last.isLeaf && warm.last.child == m.child)
    val _ = d
  }
}
