package graft

import graft.api._
import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Clone (zero-copy manifest transform with rename/defaults), CSV
  * import/export, period/interval helpers.
  */
class CloneCsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = GSchema("timestamp" -> "int*", "value" -> "float")

  def freshRepo(): Repo =
    new Repo(Files.createTempDirectory("graft-cc").toString, spark)

  test("clone with column rename shares segment files") {
    val repo = freshRepo()
    val clct = repo.createCollection(schema, "src")
    clct.embedMaxSize = 0L // exercise the shared-file (not inline) path
    val s = clct.series("_")
    s.write(TestSpark.frame(Seq(1L, 2L, 3L), Seq(1.0, 2.0, 3.0)))

    val nSegsBefore = repo.store.walk("seg").count(_.endsWith(".parquet"))
    val target = clct.cloneTo("dst", rename = Map("value" -> "temp"))
    assert(target.schema.names == Seq("timestamp", "temp"))
    val out = target.series("_").frame().orderBy("timestamp")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    // zero-copy: no new segment files
    assert(repo.store.walk("seg").count(_.endsWith(".parquet")) ==
      nSegsBefore)
  }

  test("clone with added default column") {
    val repo = freshRepo()
    val clct = repo.createCollection(schema, "src")
    clct.series("_").write(TestSpark.frame(Seq(1L, 2L), Seq(1.0, 2.0)))
    val target = clct.cloneTo("dst2",
      additions = Seq((ColDef("extra", GType.StrT, idx = false), "dflt")))
    val out = target.series("_").frame().orderBy("timestamp")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getString(2))).toSeq
    assert(out == Seq((1L, 1.0, "dflt"), (2L, 2.0, "dflt")))
    // reopening from the registry keeps the mapping
    val reopened = repo.collection("dst2").get
    assert(reopened.defaults.nonEmpty)
    assert(reopened.series("_").frame().count() == 2)
  }

  test("post-clone writes store real values under renamed + added columns") {
    val repo = freshRepo()
    val clct = repo.createCollection(schema, "src3")
    clct.embedMaxSize = 0L
    clct.series("_").write(
      TestSpark.frame(Seq(1L, 2L), Seq(1.0, 2.0)))
    val target = clct.cloneTo("dst3",
      rename = Map("value" -> "temp"),
      additions = Seq((ColDef("tag", GType.StrT, idx = false), "d")))
    // write THROUGH the clone: renamed column carries data, added
    // column carries an explicit (non-default) value
    import spark.implicits._
    target.series("_").write(
      Seq((5L, 50.0, "x"), (6L, 60.0, "y"))
        .toDF("timestamp", "temp", "tag"))
    val out = target.series("_").frame()
      .select("timestamp", "temp", "tag").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .sorted.toSeq
    assert(out == Seq((1L, 1.0, "d"), (2L, 2.0, "d"),
      (5L, 50.0, "x"), (6L, 60.0, "y")),
      "renamed column must read back written values (not null) and " +
        "the added column must keep explicit values over the default")
  }

  test("clone of a clone composes the column mapping and defaults") {
    val repo = freshRepo()
    val clct = repo.createCollection(schema, "src4")
    clct.embedMaxSize = 0L
    clct.series("_").write(TestSpark.frame(Seq(1L), Seq(1.5)))
    val c2 = clct.cloneTo("mid4",
      rename = Map("value" -> "temp"),
      additions = Seq((ColDef("tag", GType.StrT, idx = false), "d")))
    val c3 = c2.cloneTo("dst4", rename = Map("temp" -> "celsius"))
    val out = c3.series("_").frame()
      .select("timestamp", "celsius", "tag").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 1.5, "d")),
      "second-level rename must resolve to the ORIGINAL stored name " +
        "and the first clone's default must survive the second clone")
  }

  test("csv round-trip") {
    val repo = freshRepo()
    val clct = repo.createCollection(schema, "c")
    val s = clct.series("_")
    s.write(TestSpark.frame(Seq(1L, 2L, 3L), Seq(1.5, 2.5, 3.5)))
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    s.exportCsv(dir)
    val repo2 = freshRepo()
    val s2 = repo2.createCollection(schema, "c").series("_")
    s2.importCsv(dir)
    val got = s2.frame().orderBy("timestamp").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)))
  }

  test("period and interval sizing") {
    val repo = freshRepo()
    val tschema = GSchema("ts" -> "timestamp*", "value" -> "float")
    val clct = repo.createCollection(tschema, "t")
    val s = clct.series("_")
    val sess = spark
    import sess.implicits._
    // hourly samples over 10 hours
    val rows = (0 until 10).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 $i%02d:00:00"), i * 1.0))
    s.write(rows.toDF("ts", "value"))
    val p = s.period().get
    assert(math.abs(p - 3600.0 * 9 / 10) < 1.0)
    // ~3240s period * 10 rows = 9h -> fits in a day; * 500k -> > 1 year
    assert(s.interval(10).contains("D"))
    assert(s.interval(500000L).isEmpty)
  }
}
