package graft.core

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException,
  InputStream}
import java.net.{HttpURLConnection, URI, URL}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream,
  FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Hadoop FileSystem speaking the S3 REST protocol over real HTTP
  * sockets — `s3net://bucket/…` roots against an [[S3Server]] (or any
  * endpoint honoring the same subset). Mirrors what Hadoop's S3A
  * connector does over the AWS SDK, rebuilt from the public S3 REST
  * semantics because this environment pins the dependency set (no
  * hadoop-aws/aws-sdk jars, so the stock `s3a://` scheme cannot load):
  *
  *  - reads are RANGED GETs (HEAD for length, `Range: bytes=a-b` per
  *    positioned read) — parquet footer + column-chunk access pattern
  *  - writes buffer locally and PUT on close; payloads at or above
  *    `fs.s3net.multipart.threshold` go through initiate / UploadPart /
  *    complete multipart
  *  - listings are ListObjectsV2 pages: `prefix`+`delimiter` grouping,
  *    `continuation-token` loops (pagination is exercised, not mocked)
  *  - rename is server-side copy (`x-amz-copy-source`) + delete per
  *    key; single-object rename onto an existing destination FAILS
  *    like S3A's; directory rename is the per-key copy pass
  *
  * Endpoint resolution: `fs.s3net.endpoint` conf key, else the
  * JVM-global default set by [[S3NetFileSystem.setDefaultEndpoint]]
  * (covers Hadoop conf copies Spark hands to tasks).
  */
class S3NetFileSystem extends FileSystem {
  import S3NetFileSystem._

  private var fsUri: URI = _
  private var cwd: Path = new Path("/")
  private var endpoint: String = _
  private var partThreshold: Long = _
  private var listPageSize: Int = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    fsUri = URI.create(s"$Scheme://${uri.getAuthority}")
    endpoint = Option(conf.get(s"fs.$Scheme.endpoint"))
      .orElse(Option(defaultEndpoint))
      .getOrElse(throw new IOException(
        s"fs.$Scheme.endpoint not configured and no default set"))
      .stripSuffix("/")
    partThreshold = conf.getLong(s"fs.$Scheme.multipart.threshold",
      8L * 1024 * 1024)
    listPageSize = conf.getInt(s"fs.$Scheme.list.page.size", 1000)
    setConf(conf)
  }

  override def getScheme: String = Scheme
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = cwd
  override def setWorkingDirectory(dir: Path): Unit = { cwd = dir }

  private def bucket: String = fsUri.getAuthority

  /** normalized key: absolute path minus leading slash */
  private def key(f: Path): String =
    makeQualified(f).toUri.getPath.stripPrefix("/").stripSuffix("/")

  // ---- HTTP plumbing -------------------------------------------------

  private def conn(method: String, path: String, query: String = "",
      headers: Map[String, String] = Map.empty): HttpURLConnection = {
    val q = if (query.isEmpty) "" else s"?$query"
    val c = new URL(s"$endpoint/$bucket/$path$q")
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    c
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def drain(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** One request with S3A-style transient-failure retries: 5xx (503
    * SlowDown throttling above all) and connection-level IOExceptions
    * retry with linear backoff up to fs.s3net.retries times. Every
    * call here is idempotent at the server (whole-object PUT, part-N
    * PUT, GET/HEAD/LIST, DELETE); the one at-most-once edge is a
    * multipart COMPLETE whose success response is lost — the retry
    * then sees NoSuchUpload, surfacing as an error rather than silent
    * corruption (S3A shares this completion ambiguity). */
  private def request(method: String, path: String, query: String = "",
      body: Array[Byte] = null,
      headers: Map[String, String] = Map.empty): (Int, Array[Byte]) = {
    val retries = getConf.getInt(s"fs.$Scheme.retries", 3)
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        val c = conn(method, path, query, headers)
        if (body != null) {
          c.setDoOutput(true)
          c.setFixedLengthStreamingMode(body.length)
          val o = c.getOutputStream
          o.write(body); o.close()
        }
        val code = c.getResponseCode
        if (code >= 500 && attempt <= retries) {
          Option(c.getErrorStream).foreach(drain)
          Thread.sleep(50L * attempt)
        } else {
          val data =
            if (code >= 400) {
              Option(c.getErrorStream).foreach(drain); Array.emptyByteArray
            }
            else if (method == "HEAD") Array.emptyByteArray
            else drain(c.getInputStream)
          return (code, data)
        }
      } catch {
        case _: java.io.IOException if attempt <= retries =>
          Thread.sleep(50L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ---- metadata ------------------------------------------------------

  private def headObject(k: String): Option[(Long, Long)] = {
    // same transient-retry policy as request(); separate because the
    // metadata lives in response headers, not the body
    val retries = getConf.getInt(s"fs.$Scheme.retries", 3)
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        val c = conn("HEAD", k)
        val code = c.getResponseCode
        if (code == 200)
          return Some((c.getHeaderFieldLong("Content-Length", 0L),
            Option(c.getHeaderField("Last-Modified")).map(_.toLong)
              .getOrElse(0L)))
        else if (code >= 500 && attempt <= retries)
          Thread.sleep(50L * attempt)
        else return None
      } catch {
        case _: java.io.IOException if attempt <= retries =>
          Thread.sleep(50L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** one ListObjectsV2 page */
  private def listPage(prefix: String, delimiter: Option[String],
      token: Option[String]): ListPage = {
    val q = new StringBuilder(s"list-type=2&prefix=${enc(prefix)}")
    q ++= s"&max-keys=$listPageSize"
    delimiter.foreach(d => q ++= s"&delimiter=${enc(d)}")
    token.foreach(t => q ++= s"&continuation-token=${enc(t)}")
    val (code, data) = request("GET", "", q.toString)
    if (code != 200) throw new IOException(s"list failed: HTTP $code")
    val xml = new String(data, UTF_8)
    ListPage(
      tags(xml, "Contents").map { c =>
        (unesc(tag(c, "Key")), tag(c, "Size").toLong,
          tag(c, "LastModified").toLong)
      },
      tags(xml, "CommonPrefixes").map(c => unesc(tag(c, "Prefix"))),
      if (tag(xml, "IsTruncated") == "true")
        Some(tag(xml, "NextContinuationToken")) else None)
  }

  /** all pages for a prefix, following continuation tokens */
  private def listAll(prefix: String,
      delimiter: Option[String]): (Seq[(String, Long, Long)], Seq[String]) = {
    val objs = Seq.newBuilder[(String, Long, Long)]
    val prefixes = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val p = listPage(prefix, delimiter, token)
      objs ++= p.objects
      prefixes ++= p.prefixes
      token = p.next
      more = token.isDefined
    }
    (objs.result(), prefixes.result().distinct)
  }

  private def fileStatus(k: String, size: Long, mtime: Long,
      dir: Boolean): FileStatus =
    new FileStatus(size, dir, 1, 33554432L, mtime,
      new Path(s"$fsUri/$k"))

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    if (k.isEmpty) return fileStatus("", 0L, 0L, dir = true)
    headObject(k) match {
      case Some((len, mtime)) => fileStatus(k, len, mtime, dir = false)
      case None =>
        // directory probe: anything under the prefix?
        val p = listPage(k + "/", None, None)
        if (p.objects.nonEmpty || p.prefixes.nonEmpty)
          fileStatus(k, 0L, 0L, dir = true)
        else throw new FileNotFoundException(k)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (headObject(k).isDefined) return Array(getFileStatus(f))
    val pfx = if (k.isEmpty) "" else k + "/"
    val (objs, dirs) = listAll(pfx, Some("/"))
    if (objs.isEmpty && dirs.isEmpty && k.nonEmpty)
      throw new FileNotFoundException(k)
    (objs.map { case (ok, sz, mt) => fileStatus(ok, sz, mt, dir = false) } ++
      dirs.map(d => fileStatus(d.stripSuffix("/"), 0L, 0L, dir = true)))
      .toArray
  }

  // ---- read ----------------------------------------------------------

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = key(f)
    val (len, _) = headObject(k).getOrElse(
      throw new FileNotFoundException(k))
    new FSDataInputStream(new RangedStream(k, len))
  }

  /** seekable stream issuing ranged GETs — the S3A read shape */
  private final class RangedStream(k: String, len: Long)
      extends InputStream with Seekable with PositionedReadable {
    private var pos = 0L

    private def rangedGet(from: Long, n: Int): Array[Byte] = {
      if (n == 0 || from >= len) return Array.emptyByteArray
      val to = math.min(from + n - 1, len - 1)
      val (code, data) = request("GET", k,
        headers = Map("Range" -> s"bytes=$from-$to"))
      if (code != 206 && code != 200)
        throw new IOException(s"ranged GET $k: HTTP $code")
      data
    }

    override def read(): Int = {
      val b = new Array[Byte](1)
      if (read(b, 0, 1) < 0) -1 else b(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, n: Int): Int = {
      if (pos >= len) return -1
      val data = rangedGet(pos, n)
      System.arraycopy(data, 0, b, off, data.length)
      pos += data.length
      data.length
    }
    override def seek(p: Long): Unit = {
      if (p < 0 || p > len) throw new IOException(s"seek out of range: $p")
      pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= len) return -1
      val data = rangedGet(position, length)
      System.arraycopy(data, 0, buffer, offset, data.length)
      data.length
    }
    override def readFully(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Unit = {
      var done = 0
      while (done < length) {
        val n = read(position + done, buffer, offset + done, length - done)
        if (n < 0) throw new IOException("readFully past EOF")
        done += n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }

  // ---- write ---------------------------------------------------------

  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (!overwrite && headObject(k).isDefined)
      throw new IOException(s"already exists: $k")
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(buf, statistics) {
      override def close(): Unit = {
        super.close()
        putObject(k, buf.toByteArray)
      }
    }
  }

  private def putObject(k: String, data: Array[Byte]): Unit =
    if (data.length >= partThreshold) multipartPut(k, data)
    else {
      val (code, _) = request("PUT", k, body = data)
      if (code != 200) throw new IOException(s"PUT $k: HTTP $code")
    }

  private def multipartPut(k: String, data: Array[Byte]): Unit = {
    val (c0, init) = request("POST", k, "uploads",
      body = Array.emptyByteArray)
    if (c0 != 200) throw new IOException(s"initiate multipart: HTTP $c0")
    val uploadId = tag(new String(init, UTF_8), "UploadId")
    try {
      val partSize = math.max(partThreshold, 1L).toInt
      val nParts = (data.length + partSize - 1) / partSize
      val etags = (0 until nParts).map { i =>
        val part = java.util.Arrays.copyOfRange(data, i * partSize,
          math.min((i + 1) * partSize, data.length))
        val (pc, _) = request("PUT", k,
          s"partNumber=${i + 1}&uploadId=${enc(uploadId)}", body = part)
        if (pc != 200) throw new IOException(s"UploadPart ${i + 1}: HTTP $pc")
        i + 1
      }
      val completeXml = etags.map(n =>
        s"<Part><PartNumber>$n</PartNumber></Part>")
        .mkString("<CompleteMultipartUpload>", "",
          "</CompleteMultipartUpload>")
      val (cc, _) = request("POST", k, s"uploadId=${enc(uploadId)}",
        body = completeXml.getBytes(UTF_8))
      if (cc != 200) throw new IOException(s"complete multipart: HTTP $cc")
    } catch {
      case e: Throwable =>
        request("DELETE", k, s"uploadId=${enc(uploadId)}") // abort
        throw e
    }
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append")

  // ---- mutate --------------------------------------------------------

  private def copyObject(from: String, to: String): Boolean = {
    val (code, _) = request("PUT", to, body = Array.emptyByteArray,
      headers = Map("x-amz-copy-source" -> s"/$bucket/$from"))
    code == 200
  }

  private def deleteObject(k: String): Unit = { request("DELETE", k); () }

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src); val dk = key(dst)
    if (headObject(sk).isDefined) {
      // S3A fails a single-object rename when the destination exists
      if (headObject(dk).isDefined) return false
      if (!copyObject(sk, dk)) return false
      deleteObject(sk)
      true
    } else {
      val (objs, _) = listAll(sk + "/", None)
      if (objs.isEmpty) return false
      // copy pass, then delete pass — the non-atomic object-store
      // "directory move", observable mid-flight like S3A's
      objs.foreach { case (k, _, _) =>
        if (!copyObject(k, dk + "/" + k.stripPrefix(sk + "/")))
          throw new IOException(s"copy failed during rename: $k")
      }
      objs.foreach { case (k, _, _) => deleteObject(k) }
      true
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    val had = headObject(k).isDefined
    if (had) deleteObject(k)
    val (objs, _) = listAll(k + "/", None)
    if (objs.nonEmpty && !recursive && !had)
      throw new IOException(s"directory not empty: $k")
    objs.foreach { case (ok, _, _) => deleteObject(ok) }
    had || objs.nonEmpty
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = true
}

object S3NetFileSystem {
  val Scheme = "s3net"

  @volatile private var defaultEndpoint: String = _

  /** JVM-global endpoint fallback: Spark copies Hadoop confs per task,
    * and the test server's port is only known at runtime */
  def setDefaultEndpoint(url: String): Unit = { defaultEndpoint = url }

  /** register the scheme on a Hadoop conf (idempotent) */
  def install(conf: Configuration, endpoint: String = null): Unit = {
    conf.set(s"fs.$Scheme.impl", classOf[S3NetFileSystem].getName)
    conf.set(s"fs.$Scheme.impl.disable.cache", "false")
    if (endpoint != null) conf.set(s"fs.$Scheme.endpoint", endpoint)
  }

  private final case class ListPage(objects: Seq[(String, Long, Long)],
    prefixes: Seq[String], next: Option[String])

  // minimal XML helpers for the fixed S3 response shapes (no attribute
  // or nesting ambiguity in the subset the server emits)
  private def tag(xml: String, name: String): String = {
    val open = s"<$name>"
    val i = xml.indexOf(open)
    if (i < 0) ""
    else xml.substring(i + open.length, xml.indexOf(s"</$name>", i))
  }
  private def tags(xml: String, name: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val open = s"<$name>"
    var i = xml.indexOf(open)
    while (i >= 0) {
      val end = xml.indexOf(s"</$name>", i)
      out += xml.substring(i + open.length, end)
      i = xml.indexOf(open, end)
    }
    out.result()
  }
  private def unesc(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
}
