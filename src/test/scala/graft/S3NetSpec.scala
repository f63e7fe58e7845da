package graft

import graft.api.Repo
import graft.core.{Closed, GSchema, S3NetFileSystem, S3Server}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The engine against a REAL networked S3 API: an embedded
  * [[S3Server]] (s3mock pattern — the reference suite's moto-S3
  * matrix, tests/conftest.py:65-99) on a live ephemeral TCP port, with
  * [[S3NetFileSystem]] speaking the S3 REST protocol over HTTP. Unlike
  * the in-JVM `s3ish://` blob map this exercises the parts only a wire
  * protocol can: ListObjectsV2 continuation-token pagination, multipart
  * assembly, ranged GETs for parquet footers, and server-side-copy
  * renames. maxKeysCap=7 forces every multi-object listing through the
  * pagination loop; multipart.threshold=64KB forces real segment
  * parquet files through initiate/UploadPart/complete.
  */
class S3NetSpec extends AnyFunSuite with BeforeAndAfterAll {
  // tiny page size: any real listing needs continuation tokens
  private val server = new S3Server(maxKeysCap = 7)
  private var endpoint: String = _

  lazy val spark = {
    val s = TestSpark.spark
    S3NetFileSystem.install(s.sparkContext.hadoopConfiguration, endpoint)
    s.sparkContext.hadoopConfiguration
      .setLong("fs.s3net.multipart.threshold", 64L * 1024)
    s
  }

  override def beforeAll(): Unit = {
    endpoint = server.start()
    S3NetFileSystem.setDefaultEndpoint(endpoint)
  }
  override def afterAll(): Unit = server.stop()

  val schema = GSchema("timestamp" -> "int*", "value" -> "float")

  def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("timestamp", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted

  test("full engine lifecycle over the wire protocol") {
    val repo = Repo(s"s3net://life/repo", spark)
    val clct = repo.createCollection(schema, "c")
    clct.embedMaxSize = 0L // parquet segments THROUGH the http fs
    val s = clct.series("_")
    s.write(TestSpark.frame(51L to 2000L, (51 to 2000).map(_ * 1.0)))
    s.write(TestSpark.frame(1L to 50L, (1 to 50).map(_ * 1.0)))
    s.write(TestSpark.frame(10L to 19L, (10 to 19).map(_ => -1.0)))
    assert(s.frame().count() == 2000)
    assert(rows(s.frame(10L, 19L, closed = Closed.Both)) ==
      (10L to 19L).map(_ -> -1.0))
    s.delete(40L, 2001L)
    assert(s.frame().count() == 39)
    clct.defrag()
    clct.squash()
    assert(repo.gc(timeoutMs = 0L) >= 0)
    assert(rows(s.frame(1L, 5L, closed = Closed.Both)) ==
      (1L to 5L).map(i => i -> i.toDouble))
    // the protocol paths actually ran: paginated listings (gc walks,
    // committer listings) and ranged reads (parquet footers)
    assert(server.listPagesServed.get() > 0)
    assert(server.rangedGets.get() > 0)
    assert(server.copyRequests.get() > 0, "renames must server-side copy")
  }

  test("Spark parquet write + pruned scan through s3net (multipart)") {
    import spark.implicits._
    val before = server.multipartCompletions.get()
    val uri = s"s3net://sparkpq/data.parquet"
    // ~1.2 MB of parquet per task >> the 64 KB multipart threshold
    spark.range(0, 200000, 1, 2)
      .select($"id", org.apache.spark.sql.functions.md5(
        $"id".cast("string")).as("payload"))
      .write.parquet(uri)
    val back = spark.read.parquet(uri)
      .where($"id" % 1000 === 3)
    assert(back.count() == 200)
    assert(server.multipartCompletions.get() > before,
      "large objects must go through initiate/UploadPart/complete")
  }

  test("listing pagination sees every object across pages") {
    val fs = new org.apache.hadoop.fs.Path("s3net://pages/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[S3NetFileSystem])
    // 23 objects >> the 7-key page cap: 4 pages minimum
    (0 until 23).foreach { i =>
      val out = fs.create(
        new org.apache.hadoop.fs.Path(f"s3net://pages/d/k$i%03d"), true)
      out.write(s"payload-$i".getBytes("UTF-8")); out.close()
    }
    val pagesBefore = server.listPagesServed.get()
    val listed = fs.listStatus(new org.apache.hadoop.fs.Path(
      "s3net://pages/d")).map(_.getPath.getName).sorted
    assert(listed.toSeq == (0 until 23).map(i => f"k$i%03d"))
    assert(server.listPagesServed.get() - pagesBefore >= 4,
      "23 keys at max-keys=7 must take >= 4 pages")
  }

  test("single-object rename onto an existing destination fails") {
    val fs = new org.apache.hadoop.fs.Path("s3net://sem/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(p: String, body: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(p), true)
      out.write(body.getBytes("UTF-8")); out.close()
    }
    def read(p: String): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(p), 4096)
      val b = new Array[Byte](64)
      val n = in.read(b, 0, 64); in.close()
      new String(b, 0, n, "UTF-8")
    }
    put("s3net://sem/a", "AAA")
    put("s3net://sem/b", "BBB")
    assert(!fs.rename(new org.apache.hadoop.fs.Path("s3net://sem/a"),
      new org.apache.hadoop.fs.Path("s3net://sem/b")))
    assert(read("s3net://sem/b") == "BBB", "no clobber on failed rename")
    assert(fs.rename(new org.apache.hadoop.fs.Path("s3net://sem/a"),
      new org.apache.hadoop.fs.Path("s3net://sem/c")))
    assert(read("s3net://sem/c") == "AAA")
    assert(!fs.exists(new org.apache.hadoop.fs.Path("s3net://sem/a")))
  }

  test("concurrent writers race over the wire, merge heals, no rows lost") {
    // the ConcurrencySpec race on an object store with NO atomic
    // rename and every byte over HTTP: racing commits fork the
    // changelog, merge converges it, and all rows survive
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val repo = Repo("s3net://race/repo", spark)
    val clct = repo.createCollection(schema, "c")
    val nWriters = 4
    val rowsPer = 15
    val pool = Executors.newFixedThreadPool(nWriters)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(nWriters)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until nWriters).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          try {
            start.await()
            val s = Repo("s3net://race/repo", spark)
              .collection("c").get.series("_")
            val ts = (0 until rowsPer).map(i => (w * 1000 + i).toLong)
            s.write(TestSpark.frame(ts, ts.map(_ * 1.0)))
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
    var guard = 0
    while (clct.changelog.leafs().length > 1 && guard < 6) {
      clct.merge(); clct.refresh(); guard += 1
    }
    assert(clct.series("_").frame().count() ==
      (nWriters * rowsPer).toLong)
  }

  test("transient 503 SlowDown responses are retried, not fatal") {
    val fs = new org.apache.hadoop.fs.Path("s3net://retry/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(
      "s3net://retry/obj"), true)
    out.write("payload".getBytes("UTF-8")); out.close()
    // the next two requests throttle — a HEAD+GET read path must
    // absorb them via backoff like S3A's throttle retry policy
    server.failNextRequests.set(2)
    val in = fs.open(new org.apache.hadoop.fs.Path("s3net://retry/obj"),
      4096)
    val b = new Array[Byte](7)
    in.readFully(0L, b); in.close()
    assert(new String(b, "UTF-8") == "payload")
    assert(server.failNextRequests.get() <= 0)
  }

  test("ranged GETs return exact parquet footer slices") {
    // byte-level protocol check: write a known payload, read slices
    val fs = new org.apache.hadoop.fs.Path("s3net://bytes/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val payload = (0 until 1000).map(i => (i % 251).toByte).toArray
    val out = fs.create(new org.apache.hadoop.fs.Path(
      "s3net://bytes/blob"), true)
    out.write(payload); out.close()
    val in = fs.open(new org.apache.hadoop.fs.Path("s3net://bytes/blob"),
      4096)
    val tail = new Array[Byte](8)
    in.readFully(992L, tail) // footer-style read
    assert(tail.toSeq == payload.slice(992, 1000).toSeq)
    in.seek(500L)
    assert(in.read() == (payload(500) & 0xff))
    in.close()
  }
}
