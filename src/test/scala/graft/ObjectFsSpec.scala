package graft

import graft.api.Repo
import graft.core.{Closed, GSchema, ObjectFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end engine lifecycle over object-store FileSystem semantics
  * (`s3ish://` — no atomic rename, copy-then-delete moves, PUT-on-
  * close visibility, prefix-only directories): the in-JVM counterpart
  * of the reference suite's moto-S3 backend matrix
  * (tests/conftest.py:65-99). Every byte — registry, changelogs,
  * parquet segments, Spark's committer temporaries — moves through
  * [[graft.core.ObjectFileSystem]].
  */
class ObjectFsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    graft.core.MemFileSystem.install(s.sparkContext.hadoopConfiguration)
    s
  }

  val schema = GSchema("timestamp" -> "int*", "value" -> "float")

  def freshRepo(): Repo =
    Repo(s"s3ish://b${System.nanoTime()}/repo", spark)

  def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("timestamp", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted

  test("full lifecycle: write, overlay, delete, defrag, gc, read") {
    val repo = freshRepo()
    val clct = repo.createCollection(schema, "c")
    clct.embedMaxSize = 0L // force parquet segments THROUGH the fs
    val s = clct.series("_")
    // 2000 rows > the 256-row embed probe: the FULL Spark write path
    // (range-partition sample, executor parquet write into tmp/, stats
    // read-back, copy-then-delete mv into seg/) runs over s3ish://
    s.write(TestSpark.frame(51L to 2000L, (51 to 2000).map(_ * 1.0)))
    s.write(TestSpark.frame(1L to 50L, (1 to 50).map(_ * 1.0)))
    s.write(TestSpark.frame(10L to 19L, (10 to 19).map(_ => -1.0)))
    assert(s.frame().count() == 2000)
    assert(rows(s.frame(1990L, 2000L, closed = Closed.Both)) ==
      (1990L to 2000L).map(i => i -> (i * 1.0)))
    assert(rows(s.frame(10L, 19L, closed = Closed.Both)) ==
      (10L to 19L).map(_ -> -1.0))
    s.delete(40L, 2001L)
    assert(s.frame().count() == 39)
    // several fragmented writes, then defrag + squash + gc
    (60L to 80L by 5).foreach(i =>
      s.write(TestSpark.frame(Seq(i), Seq(i.toDouble))))
    clct.defrag()
    clct.squash()
    assert(repo.gc(timeoutMs = 0L) >= 0)
    assert(rows(s.frame(1L, 5L, closed = Closed.Both)) ==
      (1L to 5L).map(i => i -> i.toDouble))
    assert(rows(s.frame(60L, 80L, closed = Closed.Both)) ==
      (60L to 80L by 5).map(i => i -> i.toDouble))
  }

  test("Spark parquet write + pruned scan straight through s3ish://") {
    import spark.implicits._
    val uri = s"s3ish://spark${System.nanoTime()}/data.parquet"
    spark.range(0, 1000, 1, 4)
      .select($"id", ($"id" % 7).as("grp"))
      .write.parquet(uri) // committer renames task temp dirs: copy+delete
    val back = spark.read.parquet(uri).where($"grp" === 3)
    assert(back.count() == 143)
    assert(back.agg(org.apache.spark.sql.functions.sum($"id")).head()
      .getLong(0) == (3L until 1000L by 7).sum)
  }

  test("file rename onto an existing destination fails, not clobbers") {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(s"s3ish://sem/x")
      .getFileSystem(conf)
    assert(fs.isInstanceOf[ObjectFileSystem])
    def put(p: String, body: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(p), true)
      out.write(body.getBytes("UTF-8")); out.close()
    }
    put("s3ish://sem/a", "AAA")
    put("s3ish://sem/b", "BBB")
    assert(!fs.rename(new org.apache.hadoop.fs.Path("s3ish://sem/a"),
      new org.apache.hadoop.fs.Path("s3ish://sem/b")))
    val in = fs.open(new org.apache.hadoop.fs.Path("s3ish://sem/b"))
    val buf = new Array[Byte](3); in.readFully(0L, buf); in.close()
    assert(new String(buf, "UTF-8") == "BBB", "dst must be untouched")
  }

  test("incremental dedup pipeline with the signature index on the object store") {
    // the q118/q120 ingest shape with the versioned signature state
    // living on object storage: write the ingested half's signatures
    // through a s3ish:// repo (no atomic rename anywhere), read the
    // index back via the manifest, and dedup the new batch against it
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val repo = freshRepo()
    val gs = GSchema(Seq("doc_id" -> "int*", "fp" -> "str"): _*)
    val clct = repo.createCollection(gs, "sigidx")
    clct.embedMaxSize = 0L // parquet segments through the object fs
    val sr = clct.series("_")
    sr.write(spark.sql(
      "SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 = 0"))
    val stored = sr.frame()
    assert(stored.count() ==
      spark.sql("SELECT count(*) FROM documents WHERE doc_id % 2 = 0")
        .collect()(0).getLong(0))
    val dups = spark.sql(
      "SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 = 1")
      .join(stored.select(col("fp"),
        col("doc_id").as("match_id")), "fp")
      .collect()
    // sf0.001 has no cross-parity exact dups — the assertion is that
    // the round trip + join RUN clean over object semantics and agree
    // with the direct computation
    val direct = spark.sql(
      """SELECT count(*) FROM documents a JOIN documents b
        |ON md5(a.text) = md5(b.text)
        | AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0""".stripMargin)
      .collect()(0).getLong(0)
    assert(dups.length.toLong == direct)
  }

  test("reliable materialize checkpoints onto the object store") {
    // the likely 100 TB deployment: dynamic-allocation executors with
    // spark.graft.materialize=reliable pointing the checkpoint dir at
    // object storage — the pinned intermediates must survive executor
    // loss by living on the store, written through s3ish semantics
    val sc = spark.sparkContext
    val prevDir = sc.getCheckpointDir
    val bucket = s"s3ish://ckpt${System.nanoTime()}"
    sc.setCheckpointDir(s"$bucket/ck")
    spark.conf.set("spark.graft.materialize", "reliable")
    try {
      QueriesSim.materializeDf(spark, "objfs-rel", "mm_reliable_objfs") {
        spark.range(0, 5000, 1, 4)
          .selectExpr("id", "pmod(id, 7) AS g")
      }
      assert(spark.table("mm_reliable_objfs").count() == 5000)
      assert(spark.table("mm_reliable_objfs")
        .where("g = 3").count() == (0 until 5000).count(_ % 7 == 3))
      // the checkpoint blocks must be real objects in the bucket
      val fs = new org.apache.hadoop.fs.Path(bucket)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$bucket/ck"),
        true)
      var files = 0
      while (it.hasNext) { it.next(); files += 1 }
      assert(files > 0, "reliable blocks should be objects in the bucket")
    } finally {
      spark.conf.unset("spark.graft.materialize")
      // restore the context-global checkpoint dir (None by default) so
      // later suites' assume(getCheckpointDir.isEmpty) still holds
      sc.getClass.getMethod("checkpointDir_$eq", classOf[Option[String]])
        .invoke(sc, prevDir)
    }
  }

  test("push/pull between posix and object-store repos") {
    val local = new Repo(
      java.nio.file.Files.createTempDirectory("graft-ofs").toString, spark)
    val remote = freshRepo()
    val c = local.createCollection(schema, "c")
    c.series("_").write(TestSpark.frame(Seq(1L, 2L, 3L),
      Seq(1.0, 2.0, 3.0)))
    local.push(remote)
    val back = remote.collection("c").get.series("_")
    assert(rows(back.frame()) == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }
}
