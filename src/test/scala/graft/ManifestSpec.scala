package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel tests of the manifest splice algebra, mirroring the
  * interval semantics exercised by the reference's series test matrix
  * (tests/series_test.py:86-371), but asserted at manifest level.
  */
class ManifestSpec extends AnyFunSuite {

  val schema = GSchema("timestamp" -> "int*", "value" -> "float")

  def k(vs: Any*): IndexKey = IndexKey(vs.map {
    case i: Int => i.toLong
    case other  => other
  }.toVector)

  def row(start: Long, stop: Long, closed: Closed = Closed.Both,
      label: String = "_", len: Long = 1,
      file: String = "f"): SegmentMeta =
    SegmentMeta(label, k(start), k(stop), closed, len,
      if (file == null) Vector.empty else Vector(file))

  def m(rows: SegmentMeta*): Manifest = Manifest(schema, rows.toVector)

  def spans(mf: Manifest): Seq[(Long, Long, String)] =
    mf.rows.map(r => (r.start.values(0).asInstanceOf[Long],
      r.stop.values(0).asInstanceOf[Long], r.closed.short))

  test("insert into empty") {
    val mf = Manifest.empty(schema).update(row(1, 5))
    assert(spans(mf) == Seq((1L, 5L, "b")))
  }

  test("covering write replaces everything") {
    val mf = m(row(2, 3), row(4, 6)).update(row(1, 7))
    assert(spans(mf) == Seq((1L, 7L, "b")))
  }

  test("adjacent right write keeps both") {
    val mf = m(row(1, 3)).update(row(3, 5))
    // old row truncated at 3, becomes right-open at 3
    assert(spans(mf) == Seq((1L, 3L, "l"), (3L, 5L, "b")))
  }

  test("adjacent left write truncates old left") {
    val mf = m(row(3, 5)).update(row(1, 3))
    assert(spans(mf) == Seq((1L, 3L, "b"), (3L, 5L, "r")))
  }

  test("overlap right: old stop shrinks") {
    val mf = m(row(1, 5)).update(row(4, 8))
    assert(spans(mf) == Seq((1L, 4L, "l"), (4L, 8L, "b")))
  }

  test("overlap left: old start shrinks") {
    val mf = m(row(3, 8)).update(row(1, 5))
    assert(spans(mf) == Seq((1L, 5L, "b"), (5L, 8L, "r")))
  }

  test("strictly inside: old row split in two") {
    val mf = m(row(1, 9)).update(row(4, 6))
    assert(spans(mf) == Seq((1L, 4L, "l"), (4L, 6L, "b"), (6L, 9L, "r")))
  }

  test("exact overwrite: zero-width remains dropped") {
    val mf = m(row(1, 5)).update(row(1, 5))
    assert(spans(mf) == Seq((1L, 5L, "b")))
    assert(mf.rows.length == 1)
  }

  test("open-left write keeps boundary row point") {
    // write (5, 7] over [1,5]: old row keeps its stop=5 point
    val mf = m(row(1, 5)).update(row(5, 7, Closed.Right))
    assert(spans(mf) == Seq((1L, 5L, "b"), (5L, 7L, "r")))
  }

  test("closed-left write opens old right bound") {
    val mf = m(row(1, 5)).update(row(5, 7, Closed.Both))
    assert(spans(mf) == Seq((1L, 5L, "l"), (5L, 7L, "b")))
  }

  test("multi-label isolation") {
    val mf = m(row(1, 5, label = "a")).update(row(1, 5, label = "b"))
    assert(mf.rows.map(_.label) == Vector("a", "b"))
    assert(spans(mf) == Seq((1L, 5L, "b"), (1L, 5L, "b")))
  }

  test("segments: basic clip and closed resolution") {
    val mf = m(row(1, 10))
    // query [3,5] closed both
    val s1 = mf.segments("_", Some(k(3)), Some(k(5)), Closed.Both)
    assert(s1.map(s => (s.start, s.stop, s.closed.short)) ==
      Seq((k(3), k(5), "b")))
    // query [3,5) left-closed
    val s2 = mf.segments("_", Some(k(3)), Some(k(5)), Closed.Left)
    assert(s2.head.closed.short == "l")
    // no bounds: full
    val s3 = mf.segments("_")
    assert(s3.map(s => (s.start, s.stop, s.closed.short)) ==
      Seq((k(1), k(10), "b")))
  }

  test("segments: skip when outside") {
    val mf = m(row(1, 5), row(7, 9))
    val s = mf.segments("_", Some(k(6)), Some(k(6)), Closed.Both)
    assert(s.isEmpty)
  }

  test("segments: open stored bound excludes endpoint query") {
    // stored (5,9], query touching start=5 must skip the row
    val mf = m(row(5, 9, Closed.Right))
    val s = mf.segments("_", Some(k(1)), Some(k(5)), Closed.Both)
    assert(s.isEmpty)
  }

  test("segments: query flags win over stored flags") {
    val mf = m(row(1, 10, Closed.Both))
    val s = mf.segments("_", Some(k(1)), Some(k(10)), Closed.None_)
    assert(s.head.closed == Closed.None_)
  }

  test("delete tombstone hides underlying range") {
    val mf = m(row(1, 10)).update(row(4, 6, Closed.Both, len = 0,
      file = null))
    val segs = mf.segments("_", Some(k(1)), Some(k(10)), Closed.Both)
    val withFiles = segs.filter(_.meta.files.nonEmpty)
    assert(withFiles.map(s => (s.start, s.stop)) ==
      Seq((k(1), k(4)), (k(6), k(10))))
  }

  test("rename label preserves spans") {
    val mf = m(row(1, 5, label = "a"), row(5, 9, Closed.Right, label = "a"))
      .renameLabel("a", "z")
    assert(mf.rows.map(_.label).distinct == Vector("z"))
    assert(spans(mf) == Seq((1L, 5L, "b"), (5L, 9L, "r")))
  }

  test("encode/decode round-trip") {
    val mf = m(row(1, 5), row(5, 9, Closed.Right, len = 42))
    val back = Manifest.decode(mf.encode)
    assert(back == mf)
  }

  test("multi-column index prefix semantics") {
    val s2 = GSchema("ts" -> "int*", "ver" -> "int*", "v" -> "float")
    val mf = Manifest(s2, Vector(
      SegmentMeta("_", IndexKey(Vector(1L, 1L)), IndexKey(Vector(5L, 2L)),
        Closed.Both, 10, Vector("f"))))
    // prefix query key (3) intersects
    val s = mf.segments("_", Some(IndexKey(Vector(3L))), None, Closed.Both)
    assert(s.nonEmpty)
    // prefix query key (6) does not
    val s6 = mf.segments("_", Some(IndexKey(Vector(6L))), None, Closed.Both)
    assert(s6.isEmpty)
  }
  test("partial-arity splice bound keeps the surviving remnant " +
      "(Python tuple order, not prefix-equality)") {
    // reference semantics: (5,) < (5,9), so a right-open delete bound
    // (5,) truncates the 2-col row to [(5,),(5,9)] and KEEPS it —
    // prefix-equality misread it as zero-width and dropped group 5
    val schema2 = GSchema("a" -> "int*", "b" -> "int*", "v" -> "float")
    val r = SegmentMeta("_", IndexKey(3L, 0L), IndexKey(5L, 9L),
      Closed.Both, 10L, Vector("f1"))
    val tomb = SegmentMeta("_", IndexKey(Vector[Any](3L)),
      IndexKey(Vector[Any](5L)), Closed.Left, 0L, Vector.empty)
    val out = Manifest(schema2, Vector(r)).update(tomb)
    val kept = out.rows.filter(_.hasData)
    assert(kept.length == 1, out.rows)
    assert(kept.head.start == IndexKey(Vector[Any](5L)) &&
      kept.head.stop == IndexKey(5L, 9L), kept)
    // left flag re-closed: the tombstone was right-open
    assert(kept.head.closed.left, kept)
    // and a delete whose stop EQUALS the row start prefix is a no-op
    // on the data row (reference: (5,) < (5,0))
    val r2 = SegmentMeta("_", IndexKey(5L, 0L), IndexKey(5L, 9L),
      Closed.Both, 10L, Vector("f2"))
    val out2 = Manifest(schema2, Vector(r2)).update(
      SegmentMeta("_", IndexKey(Vector[Any](5L)),
        IndexKey(Vector[Any](5L)), Closed.Left, 0L, Vector.empty))
    assert(out2.rows.filter(_.hasData).map(m => (m.start, m.stop)) ==
      Vector((IndexKey(5L, 0L), IndexKey(5L, 9L))), out2.rows)
  }

  test("zero-width tail remnant drops when head truncation did not " +
      "run (reference string-vs-enum quirk)") {
    // manifest [10,20] 'b'; splice [5,20] 'b': head truncation never
    // runs (10 > 5), the tail residual [20,20] right-closed is
    // zero-width — the reference drops it unconditionally in this
    // case (start_row closed is a raw string there, != BOTH always)
    val out = m(row(10, 20)).update(row(5, 20, file = "g"))
    assert(spans(out) == Seq((5L, 20L, "b")), spans(out))
    // the fully-shadowed old file is released from the leaf manifest
    assert(out.allFiles == Set("g"), out.allFiles)
  }
}

class ManifestPruneSpec extends AnyFunSuite {

  test("right-open stop landing on a segment start prunes it") {
    val schema = GSchema("ts" -> "int*", "v" -> "float")
    val mf = Manifest(schema, Vector(
      SegmentMeta("_", IndexKey(0L), IndexKey(10L),
        Closed.Both.setRight(false), 10, Vector("f0")),
      SegmentMeta("_", IndexKey(10L), IndexKey(20L),
        Closed.Both, 10, Vector("f1"))))
    // [null, 10) must touch only the first segment
    val segs = mf.segments("_", None, Some(IndexKey(10L)),
      Closed.Both.setRight(false))
    assert(segs.map(_.meta.files.head) == Seq("f0"))
    // [null, 10] keeps the boundary point of the second
    val incl = mf.segments("_", None, Some(IndexKey(10L)), Closed.Both)
    assert(incl.map(_.meta.files.head) == Seq("f0", "f1"))
  }

  test("mixed-arity degenerate clip on a 2-col index is NOT pruned") {
    val schema = GSchema("ts" -> "int*", "ver" -> "int*", "v" -> "float")
    val mf = Manifest(schema, Vector(
      SegmentMeta("_", IndexKey(4L, 0L), IndexKey(5L, 20L),
        Closed.Both, 30, Vector("f0"))))
    // start = prefix (5), stop = (5, 10), right-open: the clipped
    // range [(5), (5,10)) still holds rows (5,0)..(5,9) even though
    // the PREFIX compare of its endpoints is 0 — must stay
    val segs = mf.segments("_", Some(IndexKey(5L)),
      Some(IndexKey(5L, 10L)), Closed.Both.setRight(false))
    assert(segs.length == 1, s"mixed-arity clip wrongly pruned: $segs")
    // same-arity full-key degenerate half-open point IS empty
    val none = mf.segments("_", Some(IndexKey(5L, 10L)),
      Some(IndexKey(5L, 10L)), Closed.Both.setRight(false))
    assert(none.isEmpty)
  }
}
