package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized model check of the manifest splice algebra: thousands of
  * random overlay writes (including open bounds and deletes) compared
  * point-by-point against a trivially-correct last-write-wins model.
  * (Property-testing analogue of the reference's fragmented-write
  * parametrized sweeps, tests/series_test.py:551-576.)
  */
class OverlayPropertySpec extends AnyFunSuite {

  val schema = GSchema("x" -> "int*", "v" -> "float")
  val Domain = 0 to 60

  case class W(id: Int, a: Long, b: Long, closed: Closed,
      delete: Boolean) {
    def covers(p: Long): Boolean = {
      val loOk = if (closed.left) p >= a else p > a
      val hiOk = if (closed.right) p <= b else p < b
      loOk && hiOk
    }
  }

  def k(v: Long) = IndexKey(Vector(v))

  test("random overlay writes match last-write-wins model") {
    val rnd = new Random(20260812L)
    for (scenario <- 1 to 400) {
      val nWrites = 1 + rnd.nextInt(12)
      val writes = (0 until nWrites).map { i =>
        val a = rnd.nextInt(Domain.last + 1).toLong
        val b = a + rnd.nextInt((Domain.last + 1 - a).toInt + 1)
        val closed = Closed.of(rnd.nextInt(4))
        W(i, a, b, closed, delete = rnd.nextInt(10) == 0)
      }

      // model: per point, the id of the last write covering it
      val owner = scala.collection.mutable.Map.empty[Long, Int]
      writes.foreach { w =>
        Domain.map(_.toLong).foreach { p =>
          if (w.covers(p)) {
            if (w.delete) owner.remove(p) else owner(p) = w.id
          }
        }
      }

      // manifest: splice each write
      var m = Manifest.empty(schema)
      writes.foreach { w =>
        val files = if (w.delete) Vector.empty[String]
          else Vector(s"f${w.id}")
        m = m.update(SegmentMeta("_", k(w.a), k(w.b), w.closed,
          b2l(w.b - w.a + 1), files))
      }

      // invariant: rows sorted, non-overlapping (allowing shared
      // closed endpoints)
      m.rows.sliding(2).foreach {
        case Vector(r1, r2) =>
          val c = schema.cmpKey(r1.stop, r2.start)
          assert(c <= 0, s"scenario $scenario: overlap $r1 | $r2\n$m")
        case _ =>
      }

      // point-by-point visibility via segments(). Points lying exactly
      // ON some write's bound are excluded: the reference's splice is
      // interval-based, and an open-bound write can re-expose a
      // neighboring row's endpoint (see tests/series_test.py
      // test_write_open_left) — that boundary algebra is pinned by the
      // deterministic unit tests in SeriesSpec/ManifestSpec instead.
      val bounds = writes.flatMap(w => Seq(w.a, w.b)).toSet
      val segs = m.segments("_")
      Domain.map(_.toLong).filterNot(bounds.contains).foreach { p =>
        val holders = segs.filter { s =>
          val loOk = if (s.closed.left)
            schema.cmpKey(k(p), s.start) >= 0
          else schema.cmpKey(k(p), s.start) > 0
          val hiOk = if (s.closed.right)
            schema.cmpKey(k(p), s.stop) <= 0
          else schema.cmpKey(k(p), s.stop) < 0
          loOk && hiOk
        }
        // a point may fall into at most one data-bearing segment, and
        // a data row only yields the point if the WRITE that produced
        // the file actually contained it (file data = write coverage)
        val ids = holders.filter(_.meta.files.nonEmpty)
          .map(_.meta.files.head.drop(1).toInt)
          .filter(id => writes(id).covers(p))
        assert(ids.length <= 1,
          s"scenario $scenario point $p held by $ids\n$m")
        val got = ids.headOption
        val want = owner.get(p)
        assert(got == want,
          s"scenario $scenario point $p: got $got want $want\n" +
            s"writes=$writes\n$m")
      }
    }
  }

  private def b2l(x: Long): Long = math.max(x, 0L)

  test("write order does not change the final view (disjoint writes)") {
    val rnd = new Random(7L)
    for (_ <- 1 to 50) {
      // disjoint chunks in random order must produce the same view
      val chunks = (0 until 8).map(i => (i * 8L, i * 8L + 6L))
      val perm = rnd.shuffle(chunks.toList)
      var m = Manifest.empty(schema)
      perm.zipWithIndex.foreach { case ((a, b), i) =>
        m = m.update(SegmentMeta("_", k(a), k(b), Closed.Both, b - a + 1,
          Vector(s"f$i")))
      }
      val segs = m.segments("_")
      assert(segs.length == 8)
      // every chunk fully visible
      chunks.foreach { case (a, b) =>
        val s = segs.find(x => schema.cmpKey(x.start, k(a)) == 0).get
        assert(schema.cmpKey(s.stop, k(b)) == 0)
      }
    }
  }
}
