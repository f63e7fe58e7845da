package graft.core

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Embedded S3-REST-API server (the s3mock/moto pattern — the
  * reference test suite runs against moto's fake S3 the same way,
  * tests/conftest.py:65-99). Speaks the S3 object protocol over REAL
  * HTTP sockets so the client side exercises genuine networked
  * object-store behavior that an in-JVM blob map cannot:
  *
  *  - ListObjectsV2 with `prefix`/`delimiter` grouping, `max-keys`
  *    truncation and `continuation-token` pagination
  *  - multipart upload (initiate / UploadPart / complete / abort)
  *    with out-of-order parts assembled by part number
  *  - ranged GET (`Range: bytes=a-b`) — what parquet footer reads do
  *  - server-side copy (`x-amz-copy-bucket-source` PUT), HEAD metadata
  *
  * Paths are `/bucket/key…`. No SigV4 auth — the protocol under test
  * is object semantics, not credential exchange (moto skips it too).
  * State is per-server-instance, so parallel suites don't collide.
  */
final class S3Server(maxKeysCap: Int = 1000) {
  import S3Server._

  private val buckets = scala.collection.concurrent.TrieMap
    .empty[String, scala.collection.concurrent.TrieMap[String, Obj]]
  private val uploads = scala.collection.concurrent.TrieMap
    .empty[String, scala.collection.concurrent.TrieMap[Int, Array[Byte]]]
  private val uploadSeq = new java.util.concurrent.atomic.AtomicLong()

  private def bucket(b: String) =
    buckets.getOrElseUpdate(b, scala.collection.concurrent.TrieMap.empty)

  /** observability for tests: which protocol paths actually ran */
  val multipartCompletions = new java.util.concurrent.atomic.AtomicInteger()
  val listPagesServed = new java.util.concurrent.atomic.AtomicInteger()
  val rangedGets = new java.util.concurrent.atomic.AtomicInteger()
  val copyRequests = new java.util.concurrent.atomic.AtomicInteger()
  /** fault injection: the next N requests answer 503 SlowDown (the
    * S3 throttle response clients must retry) */
  val failNextRequests = new java.util.concurrent.atomic.AtomicInteger()

  private var server: HttpServer = _

  /** start on an ephemeral port; returns the endpoint URL */
  def start(): String = synchronized {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) =>
      try handle(ex)
      catch {
        case e: Throwable =>
          respond(ex, 500, s"<Error><Message>${e.getMessage}</Message></Error>"
            .getBytes(UTF_8))
      } finally ex.close())
    server.setExecutor(java.util.concurrent.Executors
      .newFixedThreadPool(8, r => {
        // daemon: the embedded test double must never pin the JVM open
        val t = new Thread(r, "graft-s3-server")
        t.setDaemon(true); t
      }))
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def handle(ex: HttpExchange): Unit = {
    if (failNextRequests.get() > 0 &&
        failNextRequests.getAndDecrement() > 0)
      return respond(ex, 503, err("SlowDown"))
    val raw = ex.getRequestURI
    val segs = raw.getPath.stripPrefix("/").split("/", 2)
    val (b, key) = (segs(0), if (segs.length > 1) segs(1) else "")
    val q = parseQuery(raw.getRawQuery)
    (ex.getRequestMethod, key.isEmpty) match {
      case ("GET", true) => listObjectsV2(ex, b, q)
      case ("PUT", false) if q.contains("partNumber") =>
        val part = q("partNumber").toInt
        val body = readBody(ex)
        uploads.getOrElse(q("uploadId"),
          return respond(ex, 404, err("NoSuchUpload")))
          .put(part, body)
        ex.getResponseHeaders.set("ETag", "\"" + Hash.sha1(body) + "\"")
        respond(ex, 200, Array.emptyByteArray)
      case ("PUT", false) =>
        Option(ex.getRequestHeaders.getFirst("x-amz-copy-source")) match {
          case Some(src) =>
            // server-side copy: /srcBucket/srcKey
            val ss = src.stripPrefix("/").split("/", 2)
            bucket(ss(0)).get(ss(1)) match {
              case Some(o) =>
                copyRequests.incrementAndGet()
                bucket(b).put(key, Obj(o.data, System.currentTimeMillis()))
                respond(ex, 200,
                  "<CopyObjectResult></CopyObjectResult>".getBytes(UTF_8))
              case None => respond(ex, 404, err("NoSuchKey"))
            }
          case None =>
            val body = readBody(ex)
            bucket(b).put(key, Obj(body, System.currentTimeMillis()))
            ex.getResponseHeaders.set("ETag", "\"" + Hash.sha1(body) + "\"")
            respond(ex, 200, Array.emptyByteArray)
        }
      case ("POST", false) if q.contains("uploads") =>
        val id = s"up-${uploadSeq.incrementAndGet()}"
        uploads.put(id, scala.collection.concurrent.TrieMap.empty)
        respond(ex, 200,
          s"""<InitiateMultipartUploadResult><Bucket>$b</Bucket>
             |<Key>$key</Key><UploadId>$id</UploadId>
             |</InitiateMultipartUploadResult>""".stripMargin.getBytes(UTF_8))
      case ("POST", false) if q.contains("uploadId") =>
        readBody(ex) // CompleteMultipartUpload XML; parts by stored number
        uploads.remove(q("uploadId")) match {
          case Some(parts) =>
            val whole = parts.toSeq.sortBy(_._1).map(_._2)
              .foldLeft(new java.io.ByteArrayOutputStream()) {
                (o, p) => o.write(p); o }.toByteArray
            multipartCompletions.incrementAndGet()
            bucket(b).put(key, Obj(whole, System.currentTimeMillis()))
            respond(ex, 200,
              s"""<CompleteMultipartUploadResult><Key>$key</Key>
                 |</CompleteMultipartUploadResult>""".stripMargin
                .getBytes(UTF_8))
          case None => respond(ex, 404, err("NoSuchUpload"))
        }
      case ("DELETE", false) if q.contains("uploadId") =>
        uploads.remove(q("uploadId"))
        respond(ex, 204, Array.emptyByteArray)
      case ("DELETE", false) =>
        bucket(b).remove(key) // S3 DELETE is idempotent: 204 either way
        respond(ex, 204, Array.emptyByteArray)
      case ("HEAD", false) =>
        bucket(b).get(key) match {
          case Some(o) =>
            ex.getResponseHeaders.set("Content-Length", o.data.length.toString)
            ex.getResponseHeaders.set("Last-Modified", o.mtime.toString)
            // HEAD: -1 body length, headers only
            ex.sendResponseHeaders(200, -1)
          case None => ex.sendResponseHeaders(404, -1)
        }
      case ("GET", false) =>
        bucket(b).get(key) match {
          case Some(o) =>
            Option(ex.getRequestHeaders.getFirst("Range")) match {
              case Some(r) =>
                rangedGets.incrementAndGet()
                val Array(a0, b0) = r.stripPrefix("bytes=").split("-", 2)
                val from = a0.toLong.toInt
                val to = math.min(
                  if (b0.isEmpty) o.data.length - 1L else b0.toLong,
                  o.data.length - 1L).toInt
                val slice = java.util.Arrays.copyOfRange(o.data, from, to + 1)
                ex.getResponseHeaders.set("Content-Range",
                  s"bytes $from-$to/${o.data.length}")
                respond(ex, 206, slice)
              case None => respond(ex, 200, o.data)
            }
          case None => respond(ex, 404, err("NoSuchKey"))
        }
      case _ => respond(ex, 400, err("NotImplemented"))
    }
  }

  /** ListObjectsV2: sorted keys, prefix filter, optional delimiter
    * grouping, max-keys truncation with opaque continuation tokens.
    * Small `maxKeysCap` values force multi-page listings — the
    * pagination path S3A exercises on any large prefix. */
  private def listObjectsV2(ex: HttpExchange, b: String,
      q: Map[String, String]): Unit = {
    listPagesServed.incrementAndGet()
    val prefix = q.getOrElse("prefix", "")
    val delim = q.get("delimiter").filter(_.nonEmpty)
    val maxKeys = math.min(
      q.get("max-keys").map(_.toInt).getOrElse(maxKeysCap), maxKeysCap)
    val after = q.get("continuation-token")
      .map(t => new String(java.util.Base64.getDecoder.decode(t), UTF_8))
    val all = bucket(b).keys.toSeq.filter(_.startsWith(prefix)).sorted
    // roll keys up into (entry, isCommonPrefix) in one sorted pass
    val entries = scala.collection.mutable.LinkedHashSet[(String, Boolean)]()
    all.foreach { k =>
      delim.flatMap { d =>
        val rest = k.stripPrefix(prefix)
        val i = rest.indexOf(d)
        if (i >= 0) Some(prefix + rest.take(i + d.length)) else None
      } match {
        case Some(cp) => entries += ((cp, true))
        case None => entries += ((k, false))
      }
    }
    val resumed = entries.toSeq.filter(e => after.forall(e._1 > _))
    val page = resumed.take(maxKeys)
    val truncated = resumed.length > maxKeys
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= s"<ListBucketResult><Name>$b</Name>"
    sb ++= s"<Prefix>${xmlEsc(prefix)}</Prefix>"
    sb ++= s"<KeyCount>${page.length}</KeyCount>"
    sb ++= s"<MaxKeys>$maxKeys</MaxKeys>"
    sb ++= s"<IsTruncated>$truncated</IsTruncated>"
    if (truncated) {
      val tok = java.util.Base64.getEncoder
        .encodeToString(page.last._1.getBytes(UTF_8))
      sb ++= s"<NextContinuationToken>$tok</NextContinuationToken>"
    }
    page.foreach {
      case (cp, true) =>
        sb ++= s"<CommonPrefixes><Prefix>${xmlEsc(cp)}</Prefix></CommonPrefixes>"
      case (k, false) =>
        val o = bucket(b)(k)
        sb ++= s"<Contents><Key>${xmlEsc(k)}</Key>" +
          s"<Size>${o.data.length}</Size>" +
          s"<LastModified>${o.mtime}</LastModified></Contents>"
    }
    sb ++= "</ListBucketResult>"
    respond(ex, 200, sb.toString.getBytes(UTF_8))
  }

  private def readBody(ex: HttpExchange): Array[Byte] = {
    val in = ex.getRequestBody
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def respond(ex: HttpExchange, code: Int,
      body: Array[Byte]): Unit = {
    if (body.isEmpty) ex.sendResponseHeaders(code, -1)
    else {
      ex.getResponseHeaders.set("Content-Type", "application/xml")
      ex.sendResponseHeaders(code, body.length.toLong)
      ex.getResponseBody.write(body)
    }
  }

  private def err(code: String): Array[Byte] =
    s"<Error><Code>$code</Code></Error>".getBytes(UTF_8)
}

object S3Server {
  private final case class Obj(data: Array[Byte], mtime: Long)

  private def xmlEsc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def parseQuery(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").map { kv =>
      kv.split("=", 2) match {
        case Array(k) => k -> ""
        case Array(k, v) =>
          k -> java.net.URLDecoder.decode(v, "UTF-8")
      }
    }.toMap
}
