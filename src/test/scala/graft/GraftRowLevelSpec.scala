package graft

import graft.api._
import graft.sources.GraftScanProbe
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SQL UPDATE / MERGE INTO / rewrite-DELETE through the catalog —
  * group-based copy-on-write row-level operations: selective rewrites
  * via runtime group filtering, replacement correctness, the
  * free-space contract for relocated/inserted rows, and history.
  */
class GraftRowLevelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def newCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft-rl").toString
    val name = "grl" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.path", root)
    (name, root)
  }

  /** a 3-segment series: ts 0-99, 100-199, 200-299 */
  private def seeded(): (String, String) = {
    val (cat, root) = newCatalog()
    spark.sql(
      s"""CREATE TABLE $cat.c.s (ts BIGINT, v DOUBLE, tag STRING)
         |PARTITIONED BY (ts)""".stripMargin)
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO $cat.c.s SELECT id, cast(id AS DOUBLE), " +
        s"concat('t', cast(id % 3 AS STRING)) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    }
    (cat, root)
  }

  test("UPDATE with index WHERE rewrites only the touched segment") {
    val (cat, root) = seeded()
    val sr = new Repo(root, spark).collection("c").get.series("s")
    val filesBefore = sr.segments().flatMap(_.meta.files)
    assert(filesBefore.length == 3)
    spark.sql(s"UPDATE $cat.c.s SET v = v + 1000 " +
      s"WHERE ts >= 120 AND ts < 140")
    // values: exactly the 20 matched rows moved
    val bumped = spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE v >= 1000").collect()(0)
      .getLong(0)
    assert(bumped == 20L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 300L)
    assert(spark.sql(
      s"SELECT sum(v) FROM $cat.c.s").collect()(0).getDouble(0) ==
      (0 until 300).map(_.toDouble).sum + 20 * 1000)
    // group filtering: segments 0-99 and 200-299 kept their files
    val filesAfter = new Repo(root, spark).collection("c").get
      .series("s").segments().flatMap(_.meta.files)
    assert(filesAfter.contains(filesBefore(0)),
      "untouched first segment was rewritten")
    assert(filesAfter.contains(filesBefore(2)),
      "untouched last segment was rewritten")
    assert(!filesAfter.contains(filesBefore(1)),
      "touched segment must be replaced")
  }

  test("UPDATE with value-only WHERE still lands correctly") {
    val (cat, _) = seeded()
    spark.sql(s"UPDATE $cat.c.s SET tag = 'hot' WHERE v % 100 = 7")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE tag = 'hot'")
      .collect()(0).getLong(0) == 3L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 300L)
  }

  test("DELETE with value predicate takes the rewrite path") {
    val (cat, root) = seeded()
    spark.sql(s"DELETE FROM $cat.c.s WHERE tag = 't1'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 200L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE tag = 't1'")
      .collect()(0).getLong(0) == 0L)
    // index-range DELETE stays metadata-only alongside the COW path
    val sr = new Repo(root, spark).collection("c").get.series("s")
    val before = sr.segments().flatMap(_.meta.files).toSet
    spark.sql(s"DELETE FROM $cat.c.s WHERE ts >= 250")
    assert(sr.segments().flatMap(_.meta.files).toSet.subsetOf(before),
      "index-range delete must not rewrite files")
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 167L) // 200 - 33 t1-less rows >= 250
  }

  test("MERGE INTO: matched update + inserts into free index space") {
    val (cat, _) = seeded()
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW rl_src AS
         |SELECT id * 2 AS ts, cast(-1.0 AS DOUBLE) AS v,
         |  'merged' AS tag
         |FROM range(140, 160)""".stripMargin) // ts 280..318: tail
    spark.sql(
      s"""MERGE INTO $cat.c.s t USING rl_src s ON t.ts = s.ts
         |WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // ts 280..298 even (10 rows) matched; 300..318 even (10) inserted
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 310L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE tag = 'merged'")
      .collect()(0).getLong(0) == 20L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE v = -1.0")
      .collect()(0).getLong(0) == 20L)
  }

  test("MERGE with zero matches: pure inserts into free space") {
    val (cat, _) = seeded()
    // nothing matches (ts 5000+), all rows are inserts — the scan
    // plans zero groups and the write must still land
    spark.sql(
      s"""MERGE INTO $cat.c.s t USING (
         |  SELECT id AS ts, cast(-9.0 AS DOUBLE) AS v, 'new' AS tag
         |  FROM range(5000, 5020)
         |) s ON t.ts = s.ts
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 320L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE tag = 'new'")
      .collect()(0).getLong(0) == 20L)
  }

  test("MERGE inserts bracketing an untouched segment don't clobber it") {
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.c.s (ts BIGINT, v DOUBLE) " +
      s"PARTITIONED BY (ts)")
    // three islands with free space between them
    Seq((0, 100), (200, 300), (400, 500)).foreach { case (a, b) =>
      spark.sql(s"INSERT INTO $cat.c.s SELECT id, 1.0 " +
        s"FROM range($a, $b)")
    }
    // inserts at 150 and 350: free gaps, but the untouched island
    // [200, 300) sits BETWEEN them — a combined splice cover would
    // swallow it
    spark.sql(
      s"""MERGE INTO $cat.c.s t USING (
         |  SELECT * FROM VALUES (150L, 5.0), (350L, 5.0) AS x(ts, v)
         |) s ON t.ts = s.ts
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 302L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE ts >= 200 AND ts < 300")
      .collect()(0).getLong(0) == 100L,
      "the untouched middle island must survive")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE v = 5.0")
      .collect()(0).getLong(0) == 2L)
  }

  test("relocating rows onto unscanned data is refused") {
    val (cat, _) = seeded()
    // move ts 120..139 onto 220..239 — occupied space in a segment
    // the scan never read: must fail, not clobber
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.c.s SET ts = ts + 100 " +
        s"WHERE ts >= 120 AND ts < 140")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("occupied index space")),
      e.toString)
    // nothing committed: data intact
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 300L)
    assert(spark.sql(
      s"SELECT sum(ts) FROM $cat.c.s").collect()(0).getLong(0) ==
      (0 until 300).map(_.toLong).sum)
    // relocating onto FREE space (beyond the tail) is fine
    spark.sql(s"UPDATE $cat.c.s SET ts = ts + 10000 " +
      s"WHERE ts >= 120 AND ts < 140")
    assert(spark.sql(s"SELECT count(*) FROM $cat.c.s")
      .collect()(0).getLong(0) == 300L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.c.s WHERE ts >= 10000")
      .collect()(0).getLong(0) == 20L)
  }

  test("history: time travel sees pre-UPDATE values") {
    val (cat, _) = seeded()
    Thread.sleep(15)
    val cut = java.time.Instant.now()
    Thread.sleep(15)
    spark.sql(s"UPDATE $cat.c.s SET v = 0 WHERE ts < 100")
    assert(spark.sql(
      s"SELECT sum(v) FROM $cat.c.s WHERE ts < 100")
      .collect()(0).getDouble(0) == 0.0)
    assert(spark.sql(
      s"SELECT sum(v) FROM $cat.c.s TIMESTAMP AS OF '$cut' " +
        s"WHERE ts < 100").collect()(0).getDouble(0) ==
      (0 until 100).map(_.toDouble).sum)
  }

  test("COW sort width: manifest-sized for UPDATE/DELETE, open for MERGE") {
    import org.apache.spark.sql.connector.write.RowLevelOperation.Command
    val (cat, root) = newCatalog()
    spark.sql(
      s"""CREATE TABLE $cat.w.s (ts BIGINT, v DOUBLE)
         |PARTITIONED BY (ts)""".stripMargin)
    spark.sql(
      s"""INSERT INTO $cat.w.s
         |SELECT id, id * 0.5 FROM range(0, 1000)""".stripMargin)
    val table = new graft.sources.GraftTable(root, "w", "s", None)
    // a 1000-row table is one page: the UPDATE rewrite sorts in ONE
    // partition (RangePartitioner skips sampling at 1)
    val opU = new graft.sources.GraftRowLevelOperation(table,
      Command.UPDATE)
    assert(new graft.sources.GraftCowWrite(table, opU)
      .requiredNumPartitions() == 1)
    val du = new graft.sources.GraftCowWrite(table, opU)
      .requiredDistribution()
    assert(du.toString.toLowerCase.contains("ordered"),
      s"UPDATE keeps the global sort, got $du")
    // rewrite-DELETE output is a narrow subset of the scan: no
    // distribution requirement at all (no sample job, no shuffle) —
    // and a partition count is forbidden alongside it
    val opD = new graft.sources.GraftRowLevelOperation(table,
      Command.DELETE)
    val wD = new graft.sources.GraftCowWrite(table, opD)
    assert(wD.requiredNumPartitions() == 0)
    assert(wD.requiredDistribution() ==
      org.apache.spark.sql.connector.distributions.Distributions
        .unspecified())
    // MERGE inserts are bounded by the SOURCE, not the table: no
    // partition requirement (0) so AQE sizes a bulk-load MERGE
    val opM = new graft.sources.GraftRowLevelOperation(table,
      Command.MERGE)
    assert(new graft.sources.GraftCowWrite(table, opM)
      .requiredNumPartitions() == 0)
  }

  test("plan gate: rewrite-DELETE plans no exchange, UPDATE keeps " +
      "its range sort") {
    // capture each DML statement's PHYSICAL plan via the SQL
    // execution listener (DML returns a CommandResult; .explain
    // can't reach the rewrite plan)
    val plans = new java.util.concurrent.ConcurrentHashMap[
      String, String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui
              .SparkListenerSQLExecutionStart =>
            val d = s.physicalPlanDescription
            if (d.contains("ReplaceData") || d.contains("GraftCowScan"))
              plans.put(s.description.replaceAll("\\s+", " ").take(40)
                + "#" + s.executionId, d)
          case _ =>
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (cat, _) = seeded()
      spark.sql(s"DELETE FROM $cat.c.s WHERE v % 100 = 7") // rewrite
      spark.sql(s"UPDATE $cat.c.s SET v = v + 1 " +
        s"WHERE ts >= 120 AND ts < 140")
      // the listener bus is async: poll briefly until both plans land
      val deadline = System.nanoTime() + 10000000000L
      while (plans.size < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      // the description is the callsite, not the SQL text: order the
      // captured rewrite plans by executionId (DELETE ran first)
      val ordered = plans.asScala.toSeq
        .sortBy(_._1.split('#').last.toLong).map(_._2)
      assert(ordered.length == 2,
        s"expected 2 captured DML plans, got ${plans.keySet()}")
      val (del, upd) = (Some(ordered(0)), Some(ordered(1)))
      // DELETE: narrow scan -> filter -> write; any Exchange in the
      // MAIN plan would be the per-statement sample+shuffle this path
      // exists to avoid (the runtime group-filter SUBQUERY legitimately
      // aggregates — strip the subquery section before asserting)
      val delMain = del.get.split("===== Subqueries =====")(0)
      assert(!delMain.contains("Exchange"),
        s"rewrite-DELETE planned an exchange:\n${delMain.take(2000)}")
      // UPDATE keeps the global range sort (it may SET index columns)
      val updMain = upd.get.split("===== Subqueries =====")(0)
      assert(updMain.contains("Exchange") && updMain.contains("Sort"),
        s"UPDATE lost its ordered write:\n${updMain.take(2000)}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
