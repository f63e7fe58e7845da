package graft

import graft.api.Repo
import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Storage-backend semantics beyond the POSIX happy path:
  * object-store (S3-like) semantics with no atomic rename, the
  * two-tier read-through CacheStore, and the HTTP POD server/client.
  */
class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = GSchema("timestamp" -> "int*", "value" -> "float")

  def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("timestamp", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted

  /** S3-semantics store: writes are direct PUTs (no tmp+rename) and
    * mv is copy-then-delete — what an object store gives you. The
    * engine's write/GC protocols must not depend on atomic rename. */
  final class S3ishStore(root: String) extends Store {
    private def p(path: String) =
      if (path.isEmpty) Paths.get(root) else Paths.get(root, path)

    def ls(dir: String): Seq[String] = {
      val d = p(dir)
      if (!Files.isDirectory(d)) Seq.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        Files.list(d).forEach(f => out += f.getFileName.toString)
        out.toSeq.sorted
      }
    }

    def read(path: String): Array[Byte] = Files.readAllBytes(p(path))

    def write(path: String, data: Array[Byte]): Boolean = {
      if (Files.exists(p(path))) return false
      Files.createDirectories(p(path).getParent)
      Files.write(p(path), data) // direct PUT, no rename
      true
    }

    def rm(path: String, recursive: Boolean = false): Unit = {
      val t = p(path)
      if (!Files.exists(t)) return
      if (Files.isDirectory(t) && recursive)
        Files.walk(t).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
      else Files.deleteIfExists(t)
      ()
    }

    def mv(from: String, to: String): Unit = {
      // copy + delete: there is a window where both or neither exist
      Files.createDirectories(p(to).getParent)
      Files.write(p(to), Files.readAllBytes(p(from)))
      Files.deleteIfExists(p(from))
      ()
    }

    def exists(path: String): Boolean = Files.exists(p(path))

    def walk(prefix: String): Seq[String] = {
      val base = p(prefix)
      if (!Files.exists(base)) return Seq.empty
      val out = scala.collection.mutable.ArrayBuffer[String]()
      Files.walk(base).filter(Files.isRegularFile(_)).forEach { f =>
        out += Paths.get(root).relativize(f).toString
      }
      out.toSeq.sorted
    }

    def uri(path: String): String = p(path).toUri.toString
  }

  test("write/read/overlay/squash/gc on a store without atomic rename") {
    val root = Files.createTempDirectory("graft-s3ish").toString
    val repo = new Repo(root, spark, new S3ishStore(root))
    val clct = repo.createCollection(schema, "c")
    val s = clct.series("_")
    s.write(TestSpark.frame(Seq(1L, 2L, 3L), Seq(1.0, 2.0, 3.0)))
    Thread.sleep(3)
    s.write(TestSpark.frame(Seq(2L), Seq(9.0))) // overlay
    assert(rows(s.frame()) == Seq((1L, 1.0), (2L, 9.0), (3L, 3.0)))
    clct.squash()
    val buried = repo.gc(timeoutMs = 0L)
    assert(buried >= 0)
    assert(rows(s.frame()) == Seq((1L, 1.0), (2L, 9.0), (3L, 3.0)))
  }

  test("CacheStore reads through and survives a dead backend for cached blobs") {
    val frontRoot = Files.createTempDirectory("graft-front").toString
    val backRoot = Files.createTempDirectory("graft-back").toString
    val front = new HadoopStore(frontRoot)
    val back = new HadoopStore(backRoot)
    val store = new CacheStore(front, back)
    val repo = new Repo(backRoot, spark, store)
    val clct = repo.createCollection(schema, "c")
    val s = clct.series("_")
    s.write(TestSpark.frame(Seq(1L, 2L), Seq(1.0, 2.0)))
    assert(rows(s.frame()) == Seq((1L, 1.0), (2L, 2.0)))

    // all changelog blobs read so far are now mirrored in the front
    val blobs = back.walk("").filter(_.contains("changelog"))
    assert(blobs.nonEmpty)
    blobs.foreach(store.read) // warm every changelog blob
    assert(blobs.forall(front.exists))

    // reads of cached blobs no longer touch the back tier
    blobs.foreach(b => back.rm(b))
    blobs.foreach(b => assert(store.read(b).nonEmpty))
  }

  test("CacheStore uri prefers the cached copy for segment scans") {
    val frontRoot = Files.createTempDirectory("graft-front2").toString
    val backRoot = Files.createTempDirectory("graft-back2").toString
    val front = new HadoopStore(frontRoot)
    val back = new HadoopStore(backRoot)
    val store = new CacheStore(front, back)
    val repo = new Repo(backRoot, spark, store)
    val clct = repo.createCollection(schema, "c")
    clct.embedMaxSize = 0L // the test inspects segment files
    val s = clct.series("_")
    s.write(TestSpark.frame(Seq(1L, 2L), Seq(1.0, 2.0)))
    val seg = back.walk("seg").filter(_.endsWith(".parquet"))
    assert(seg.nonEmpty)
    // mirror the segment blob into the cache; uri must switch tiers
    seg.foreach(store.read)
    seg.foreach(f => assert(store.uri(f).startsWith(front.uri("")
      .stripSuffix("/"))))
    assert(rows(s.frame()) == Seq((1L, 1.0), (2L, 2.0)))
  }

  test("HTTP POD: serve a repo, write + read + sync through the client") {
    val servedRoot = Files.createTempDirectory("graft-served").toString
    val server = new StoreServer(new HadoopStore(servedRoot)).start()
    try {
      val url = s"http://127.0.0.1:${server.boundPort}"
      val repo = Repo(url, spark)
      val clct = repo.createCollection(schema, "c")
      clct.embedMaxSize = 0L // exercise segment upload/download over HTTP
      val s = clct.series("_")
      s.write(TestSpark.frame(Seq(1L, 2L, 3L), Seq(1.0, 2.0, 3.0)))
      // blobs actually live on the served side
      val served = new HadoopStore(servedRoot)
      assert(served.walk("seg").exists(_.endsWith(".parquet")))
      // read back over HTTP (segments spool to the client cache)
      assert(rows(s.frame()) == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
      // a second client pulls the collection down to a local repo
      val localRoot = Files.createTempDirectory("graft-local").toString
      val local = Repo(localRoot, spark)
      local.pull(Repo(url, spark))
      assert(rows(local.collection("c").get.series("_").frame()) ==
        Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    } finally server.stop()
  }

  test("HTTP spool resurrects a gc-buried blob (driver-side planning " +
      "races the gc bury window)") {
    // found by the zstd+bss oracle pass racing q209's maintenance
    // loop: HttpStore.uri downloads at PLANNING time, so a blob gc
    // buried between manifest read and spool failed the whole query
    // before the task-side self-heal could run
    val servedRoot = Files.createTempDirectory("graft-bury").toString
    val served = new HadoopStore(servedRoot)
    val server = new StoreServer(served).start()
    try {
      val st = new HttpStore(s"http://127.0.0.1:${server.boundPort}")
      st.write("seg/aa/blob.parquet", "payload".getBytes("UTF-8"))
      served.mv("seg/aa/blob.parquet",
        s"seg/aa/blob.parquet.t${Hash.hextime()}") // gc bury
      val local = st.uri("seg/aa/blob.parquet") // must resurrect
      assert(new String(Files.readAllBytes(
        java.nio.file.Paths.get(java.net.URI.create(local))),
        "UTF-8") == "payload")
      assert(served.exists("seg/aa/blob.parquet"),
        "the blob is back under its plain name")
      // a hard-deleted blob (no buried copy) still fails loudly
      intercept[java.io.FileNotFoundException](st.uri("seg/aa/ghost"))
    } finally server.stop()
  }

  test("HTTP wire errors: lost mv races stay quiet, real failures " +
      "surface, rm is idempotent") {
    val servedRoot = Files.createTempDirectory("graft-werr").toString
    val server = new StoreServer(new HadoopStore(servedRoot)).start()
    try {
      val st = new HttpStore(s"http://127.0.0.1:${server.boundPort}")
      st.write("a/blob", "x".getBytes("UTF-8"))
      // mv of a missing SOURCE (the shape of a lost bury/resurrect
      // race) maps to FileNotFoundException -> mvQuiet swallows it
      intercept[java.io.FileNotFoundException](
        st.mv("a/ghost", "a/elsewhere"))
      st.mvQuiet("a/ghost", "a/elsewhere") // must not throw
      // rm is idempotent over the wire
      st.rm("a/ghost")
      st.rm("a/blob")
      assert(!st.exists("a/blob"))
      // a DEAD server is a real failure on every mutator — never a
      // silent no-op (a vanished delete would strand gc; a vanished
      // mv would lose a resurrect)
      server.stop()
      intercept[Exception](st.mv("a/x", "a/y"))
      intercept[Exception](st.rm("a/x"))
    } finally ()
  }
}
