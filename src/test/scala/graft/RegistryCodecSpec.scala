package graft

import graft.api.RegistryCodec
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Chunked registry payloads (v2): canonical encoding (small repos
  * stay byte-identical v1), O(touched) DDL re-encodes, decode ==
  * plain decode, and the store lifecycle (fresh-handle reads, gc
  * two-phase sweep of registry chunks, trim) keeps every repo-level
  * behavior unchanged. */
class RegistryCodecSpec extends AnyFunSuite {
  private val target = 8 // tiny chunks exercise every boundary

  private def mkEntries(n: Int): Vector[(String, String)] =
    Vector.tabulate(n)(i =>
      f"collection\u0000t$i%05d" -> s"""{"path":"c-$i","x":$i}""")

  private def dec(e: RegistryCodec.Encoded,
      store: Map[String, Array[Byte]]): Map[String, Any] = {
    RegistryCodec.clearChunkCache()
    RegistryCodec.decode[Any](e.root,
      sha => store.getOrElse(sha, e.fresh.toMap.apply(sha)),
      m => m)._1
  }

  test("below threshold stays plain v1, byte-identical") {
    val es = mkEntries(10)
    val e = RegistryCodec.encode(es.map(_._1), i => es(i)._2,
      null, null, target)
    assert(e.refs == null && e.fresh.isEmpty)
    val expected = es.map { case (k, v) => s"${Json.str(k)}:$v" }
      .mkString("{", ",", "}")
    assert(new String(e.root, "UTF-8") == expected)
  }

  test("target<=0 disables v2 emission at any size (compat pin)") {
    // -Dgraft.registryChunkEntries=0: repos that must stay readable
    // by pre-v2 binaries keep the plain v1 document forever
    val es = mkEntries(100)
    val e = RegistryCodec.encode(es.map(_._1), i => es(i)._2,
      null, null, 0)
    assert(e.refs == null && e.fresh.isEmpty)
    val expected = es.map { case (k, v) => s"${Json.str(k)}:$v" }
      .mkString("{", ",", "}")
    assert(new String(e.root, "UTF-8") == expected)
  }

  test("target=1 forces v2 at any size (oracle-mode pin)") {
    // -Dgraft.registryChunkEntries=1: even a single-entry registry
    // commits chunked, so a full oracle pass exercises v2 everywhere
    val es = mkEntries(1)
    val e = RegistryCodec.encode(es.map(_._1), i => es(i)._2,
      null, null, 1)
    assert(e.refs != null && e.refs.length == 1)
    assert(dec(e, Map.empty).keySet == es.map(_._1).toSet)
    // and a 3-entry one round-trips with one chunk per entry
    val es3 = mkEntries(3)
    val e3 = RegistryCodec.encode(es3.map(_._1), i => es3(i)._2,
      null, null, 1)
    assert(e3.refs != null && e3.refs.iterator.map(_.n).sum == 3)
    assert(dec(e3, Map.empty).keySet == es3.map(_._1).toSet)
  }

  test("chunked encode round-trips and is canonical") {
    val es = mkEntries(100)
    val e = RegistryCodec.encode(es.map(_._1), i => es(i)._2,
      null, null, target)
    assert(e.refs != null && e.refs.length >= 10)
    assert(e.refs.iterator.map(_.n).sum == 100)
    val decoded = dec(e, Map.empty)
    assert(decoded.keySet == es.map(_._1).toSet)
    // same state + same layout re-encodes to identical root bytes
    // (double-write skip / restore no-op compares)
    val e2 = RegistryCodec.encode(es.map(_._1), i => es(i)._2,
      e.refs, Set.empty[String], target)
    assert(java.util.Arrays.equals(e.root, e2.root))
    assert(e2.fresh.isEmpty, "no-op must serialize nothing")
  }

  test("a 1-key change re-encodes O(touched) chunks") {
    val es = mkEntries(100)
    val keys = es.map(_._1)
    val e = RegistryCodec.encode(keys, i => es(i)._2, null, null, target)
    val store = e.fresh.toMap
    // modify one mid key (same key set, new value)
    val tgt = keys(47)
    val es2 = es.map { case (k, v) =>
      if (k == tgt) k -> """{"path":"c-47","x":-1}""" else k -> v }
    val before = RegistryCodec.chunkEncodes.get()
    var serialized = 0
    val vj: Int => String = i => { serialized += 1; es2(i)._2 }
    val e2 = RegistryCodec.encode(keys, vj, e.refs, Set(tgt), target)
    val freshChunks = RegistryCodec.chunkEncodes.get() - before
    assert(freshChunks <= 3, s"$freshChunks fresh chunks for 1 change")
    assert(serialized <= 3 * target,
      s"serialized $serialized entries for a 1-key change")
    assert(dec(e2, store) ==
      es2.toMap.map { case (k, v) => k -> Json.parse(v) })
    // add + remove keys at opposite ends of a span
    val es3 = (es2.filterNot(_._1 == keys(20)) :+
      ("collection\u0000t99999" -> """{"path":"new","x":0}"""))
      .sortBy(_._1)
    val changed = Set(keys(20), "collection\u0000t99999")
    val e3 = RegistryCodec.encode(es3.map(_._1), i => es3(i)._2,
      e2.refs, changed, target)
    val all = store ++ e2.fresh.toMap
    assert(dec(e3, all) ==
      es3.toMap.map { case (k, v) => k -> Json.parse(v) })
  }

  test("random add/modify/remove sequences round-trip incrementally") {
    val rnd = new scala.util.Random(13)
    (0 until 20).foreach { trial =>
      var state = scala.collection.immutable.SortedMap(
        mkEntries(60).map(identity): _*)
      var store = Map.empty[String, Array[Byte]]
      var refs: Vector[RegistryCodec.ChunkRef] = null
      (0 until 10).foreach { step =>
        val keys = state.keys.toVector
        val changed = scala.collection.mutable.Set.empty[String]
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(3) match {
            case 0 => // add
              val k = f"collection t${90000 + rnd.nextInt(9000)}%05d"
              state += k -> s"""{"path":"p$step","x":$step}"""
              changed += k
            case 1 => // modify
              val k = keys(rnd.nextInt(keys.length))
              state += k -> s"""{"path":"m$step","x":-$step}"""
              changed += k
            case 2 if state.size > 10 => // remove
              val k = keys(rnd.nextInt(keys.length))
              state -= k
              changed += k
            case _ => ()
          }
        }
        val es = state.toVector
        val e = RegistryCodec.encode(es.map(_._1), i => es(i)._2,
          refs, changed.toSet, target)
        store ++= e.fresh
        refs = e.refs
        // decode equals the reference state (possibly plain v1 when
        // removals shrink it under the threshold)
        if (e.refs != null) {
          RegistryCodec.clearChunkCache()
          val (dec, decRefs) = RegistryCodec.decode[Any](e.root,
            store, m => m)
          assert(dec == state.toMap.map { case (k, v) =>
            k -> Json.parse(v) }, s"trial $trial step $step diverged")
          assert(decRefs == e.refs)
        } else {
          assert(new String(e.root, "UTF-8") == new String(
            RegistryCodec.plainBytes(es.map(_._1), i => es(i)._2),
            "UTF-8"))
          refs = null // plain payloads carry no layout to reuse
        }
      }
    }
  }

  test("random repo DDL trains through writeRegDelta: fresh-handle " +
      "view equals the model, zero warm full sorts") {
    // drives the DELTA commit path (create/rename/delete/alterPageLen)
    // rather than the codec directly: the sorted-key splice, the
    // taken-path set and the O(touched) change-set must all stay
    // coherent across arbitrary DDL interleavings, and a cold handle
    // must decode exactly the model state
    val prev = System.getProperty("graft.registryChunkEntries")
    System.setProperty("graft.registryChunkEntries", "8")
    try {
      val spark = TestSpark.spark
      val rnd = new scala.util.Random(29)
      val schema = GSchema("ts" -> "int*", "v" -> "float")
      (0 until 5).foreach { trial =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-regddl$trial").toString
        val repo = new graft.api.Repo(root, spark)
        var model = Set.empty[String]
        (0 until 30).foreach { i =>
          repo.createCollection(schema, f"c$trial%02d-$i%03d")
          model += f"c$trial%02d-$i%03d"
        }
        val sorts0 = graft.api.Repo.regFullSorts.get()
        (0 until 40).foreach { step =>
          rnd.nextInt(4) match {
            case 0 =>
              val l = f"n$trial%02d-$step%03d"
              repo.createCollection(schema, l); model += l
            case 1 if model.nonEmpty =>
              val from = model.toVector(rnd.nextInt(model.size))
              val to = s"r-$from-$step"
              repo.renameCollection(from, to)
              model -= from; model += to
            case 2 if model.size > 5 =>
              val l = model.toVector(rnd.nextInt(model.size))
              repo.deleteCollection(l); model -= l
            case _ if model.nonEmpty =>
              val l = model.toVector(rnd.nextInt(model.size))
              repo.alterPageLen(l, Some(100L + step))
              ()
            case _ => ()
          }
        }
        assert(graft.api.Repo.regFullSorts.get() == sorts0,
          s"trial $trial: warm DDL train must never full-sort")
        // cold handle: fresh decode of the final chunked state
        graft.api.Repo.clearRegDecodeCache()
        RegistryCodec.clearChunkCache()
        val fresh = new graft.api.Repo(root, spark)
        assert(fresh.ls().toSet == model, s"trial $trial diverged")
      }
    } finally {
      if (prev == null)
        System.clearProperty("graft.registryChunkEntries")
      else System.setProperty("graft.registryChunkEntries", prev)
    }
  }

  test("repo lifecycle: chunked registry, fresh reads, O(touched) " +
      "DDL, gc sweep of registry chunks") {
    val prev = System.getProperty("graft.registryChunkEntries")
    System.setProperty("graft.registryChunkEntries", "8")
    try {
      val spark = TestSpark.spark
      val root = java.nio.file.Files
        .createTempDirectory("graft-regchunk").toString
      val repo = new graft.api.Repo(root, spark)
      val schema = GSchema("ts" -> "int*", "v" -> "float")
      (0 until 40).foreach(i =>
        repo.createCollection(schema, f"t$i%03d"))
      // payload is chunked, chunk files are content-addressed
      val leaf = repo.registry.leaf().get
      assert(RegistryCodec.isChunked(repo.registry.payload(leaf)))
      val listed = repo.store.ls("registry/chunks")
      assert(listed.nonEmpty)
      listed.filterNot(_.contains(".t")).foreach(f =>
        assert(Hash.sha1(repo.store.read(s"registry/chunks/$f")) == f))

      // a stone-cold fresh handle reads every entry
      graft.api.Repo.clearRegDecodeCache()
      RegistryCodec.clearChunkCache()
      val fresh = new graft.api.Repo(root, spark)
      assert(fresh.ls().length == 40)
      assert(fresh.collection("t007").get.schema == schema)

      // one more DDL re-encodes O(touched)
      val before = RegistryCodec.chunkEncodes.get()
      repo.createCollection(schema, "zz-new")
      assert(RegistryCodec.chunkEncodes.get() - before <= 3)
      assert(new graft.api.Repo(root, spark).ls().length == 41)

      // retire old registry revisions -> their exclusive chunks are
      // unreferenced -> two-phase gc reaps them; referenced survive
      repo.registry.trim(System.currentTimeMillis() + 1000)
      val live = RegistryCodec.chunkShas(
        repo.registry.payload(repo.registry.leaf().get)).toSet
      val allBefore =
        repo.store.ls("registry/chunks").filterNot(_.contains(".t")).toSet
      assert(live.subsetOf(allBefore) && live.size < allBefore.size)
      repo.gc(timeoutMs = 0L)
      Thread.sleep(5)
      repo.gc(timeoutMs = 0L)
      val after = repo.store.ls("registry/chunks").toSet
      assert(after == live,
        s"expected exactly the live chunks after gc, got $after")
      // and the registry still reads
      graft.api.Repo.clearRegDecodeCache()
      RegistryCodec.clearChunkCache()
      assert(new graft.api.Repo(root, spark).ls().length == 41)

      // a buried-but-referenced registry chunk self-heals on read
      val sha = live.head
      repo.store.mv(s"registry/chunks/$sha",
        s"registry/chunks/$sha.t${Hash.hextime()}")
      graft.api.Repo.clearRegDecodeCache()
      RegistryCodec.clearChunkCache()
      assert(new graft.api.Repo(root, spark).ls().length == 41)
      assert(repo.store.exists(s"registry/chunks/$sha"),
        "read must resurrect the buried referenced chunk")
    } finally if (prev == null)
      System.clearProperty("graft.registryChunkEntries")
    else System.setProperty("graft.registryChunkEntries", prev)
  }
}
