package graft

import graft.api._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.util.Random

/** Randomized model check for the SQL DML surface: a driver-side
  * Map replays every operation under the ENGINE's documented
  * semantics (INSERT = range splice over the batch's [min, max];
  * UPDATE/MERGE/value-DELETE = copy-on-write over scanned windows;
  * index-DELETE = tombstone; RESTORE = the model state at the
  * restored-to leaf, tracked through the `.history` metadata table),
  * and the full table read must equal the model after every step.
  * Fixed seeds — failures replay exactly. */
class RowLevelPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def newCatalog(): String = {
    val root = Files.createTempDirectory("graft-prop").toString
    val name = "gpr" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.path", root)
    name
  }

  /** model: ts -> v (splice-aware) */
  private def runScenario(seed: Int): Unit = {
    val rnd = new Random(seed)
    val cat = newCatalog()
    spark.sql(s"CREATE TABLE $cat.c.s (ts BIGINT, v DOUBLE) " +
      s"PARTITIONED BY (ts)")
    var model = Map.empty[Long, Double]
    var nextFree = 10000L // inserts beyond this are always free space

    def insertBatch(keys: Seq[Long], f: Long => Double): Unit = {
      if (keys.isEmpty) return
      val rows = keys.map(k => s"($k, ${f(k)})").mkString(", ")
      spark.sql(s"INSERT INTO $cat.c.s VALUES $rows")
      // engine semantics: the write SPLICES over [min, max] — model
      // rows inside the span but not in the batch disappear
      val (lo, hi) = (keys.min, keys.max)
      model = model.filterNot { case (k, _) => k >= lo && k <= hi } ++
        keys.map(k => k -> f(k))
    }

    def check(step: String): Unit = {
      val got = spark.sql(s"SELECT ts, v FROM $cat.c.s").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == model,
        s"seed=$seed after $step: " +
          s"extra=${(got.keySet -- model.keySet).toSeq.sorted.take(5)} " +
          s"missing=${(model.keySet -- got.keySet).toSeq.sorted.take(5)} " +
          s"diff=${model.keySet.intersect(got.keySet)
            .filter(k => got(k) != model(k)).take(5)}")
    }

    // snapshots for the restore op: (leaf revision id, model state)
    // after every committed step — the leaf comes from the .history
    // metadata table, so the check also exercises that surface
    var snapshots = Vector.empty[(String, Map[Long, Double])]
    def snapshot(): Unit = {
      val rev = spark.sql(s"SELECT revision FROM $cat.c.s.history " +
        "WHERE is_leaf").collect()(0).getString(0)
      snapshots :+= (rev -> model)
    }

    // seed data: three disjoint batches
    insertBatch(0L until 100L, _.toDouble)
    insertBatch(200L until 300L, k => k * 2.0)
    insertBatch(400L until 500L, k => k * 3.0)
    check("seed")
    snapshot()

    (0 until 10).foreach { step =>
      rnd.nextInt(7) match {
        case 0 => // UPDATE over a random index range
          val lo = rnd.nextInt(500)
          val hi = lo + 1 + rnd.nextInt(120)
          val add = rnd.nextInt(1000) + 1
          spark.sql(s"UPDATE $cat.c.s SET v = v + $add " +
            s"WHERE ts >= $lo AND ts < $hi")
          model = model.map { case (k, v) =>
            k -> (if (k >= lo && k < hi) v + add else v) }
        case 1 => // UPDATE with a value predicate (full-scan COW)
          val m = 2 + rnd.nextInt(5)
          spark.sql(s"UPDATE $cat.c.s SET v = v * 2 " +
            s"WHERE ts % $m = 0")
          model = model.map { case (k, v) =>
            k -> (if (k % m == 0) v * 2 else v) }
        case 2 => // DELETE an index range (metadata tombstone)
          val lo = rnd.nextInt(500)
          val hi = lo + 1 + rnd.nextInt(80)
          spark.sql(s"DELETE FROM $cat.c.s " +
            s"WHERE ts >= $lo AND ts < $hi")
          model = model.filterNot { case (k, _) => k >= lo && k < hi }
        case 3 => // DELETE with a value predicate (COW rewrite)
          val m = 3 + rnd.nextInt(4)
          spark.sql(s"DELETE FROM $cat.c.s WHERE ts % $m = 1")
          model = model.filterNot { case (k, _) => k % m == 1 }
        case 4 => // MERGE: update half the matches, insert free keys
          val existing = model.keySet.toSeq.sorted
          val upd = rnd.shuffle(existing).take(20)
          val ins = (0 until 10).map(_ => { nextFree += 2; nextFree })
          val srcRows = (upd.map(k => s"($k, -1.0)") ++
            ins.map(k => s"($k, 0.5)")).mkString(", ")
          if (srcRows.nonEmpty) {
            spark.sql(
              s"""MERGE INTO $cat.c.s t
                 |USING (SELECT * FROM VALUES $srcRows AS x(ts, v)) s
                 |ON t.ts = s.ts
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
            // MERGE replaces scanned windows + splices ONE free-space
            // file run: model = matched updates + plain inserts (the
            // inserted keys are beyond every existing key, and the
            // insert span contains only themselves)
            model = model ++ upd.map(_ -> -1.0) ++ ins.map(_ -> 0.5)
          }
        case 5 => // RESTORE to a random earlier snapshot (fwd commit)
          val (rev, snap) = snapshots(rnd.nextInt(snapshots.length))
          spark.sql(s"CALL $cat.sys.restore('c', '$rev')").collect()
          model = snap
        case 6 => // REPLACE WHERE (day-backfill): tombstone the
          // window + splice the corrected rows, one atomic commit
          import org.apache.spark.sql.functions.{col, lit}
          import spark.implicits._
          val lo = rnd.nextInt(500).toLong
          val hi = lo + 1L + rnd.nextInt(60)
          // lo always present so the replacement set is never empty
          val keys = (lo until hi).filter(k =>
            k == lo || rnd.nextBoolean())
          keys.map(k => (k, k * 0.25)).toDF("ts", "v")
            .writeTo(s"$cat.c.s")
            .overwrite(col("ts") >= lit(lo) && col("ts") < lit(hi))
          model = model.filterNot { case (k, _) =>
            k >= lo && k < hi } ++ keys.map(k => k -> k * 0.25)
      }
      check(s"step$step")
      snapshot()
    }
  }

  test("randomized DML scenarios match the model (seeds 1-6)") {
    (1 to 6).foreach(runScenario)
  }
}
