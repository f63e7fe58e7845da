package graft.core

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetSocketAddress, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths, Path => JPath}

/** HTTP blob-store protocol: a [[StoreServer]] exposes any [[Store]]
  * over plain HTTP, and [[HttpStore]] is the matching client-side
  * Store (behavioral port of reference lakota/server.py:57-135 +
  * lakota/http_pod.py:10-107 — `lakota serve` / `http+...` pods).
  *
  * Endpoints (paths URL-encoded in the query string):
  * {{{
  *   GET  /read?path=P          blob bytes (404 if absent)
  *   POST /write?path=P         body = bytes; "true"/"false" (skip)
  *   GET  /ls?dir=D             newline-separated child names
  *   GET  /walk?prefix=P        newline-separated relative paths
  *   GET  /exists?path=P        "true"/"false"
  *   POST /rm?path=P&recursive=B
  *   POST /mv?from=A&to=B
  * }}}
  *
  * Spark cannot scan `http://` parquet directly, so the client keeps a
  * local spool: `tmp/` staging writes happen locally and are uploaded
  * on the `mv` into the content-addressed area, and [[uri]] downloads
  * remote segments into the spool on first access (a one-process
  * CachePOD). This serves the reference's workflow — a repo served to
  * lightweight clients — not cluster-scale parallel scans, which
  * should mount the backing store directly.
  */
final class HttpStore(baseUrl: String,
    localRoot: String = Files.createTempDirectory("graft-http").toString)
    extends Store {

  private val base = baseUrl.stripSuffix("/")
  @transient private lazy val client: HttpClient =
    HttpClient.newHttpClient()

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  private def request(op: String, params: Seq[(String, String)],
      body: Array[Byte] = null): HttpResponse[Array[Byte]] = {
    val qs = params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    val b = HttpRequest.newBuilder(java.net.URI.create(s"$base/$op?$qs"))
    val req = (if (body == null) b.GET()
      else b.POST(HttpRequest.BodyPublishers.ofByteArray(body))).build()
    client.send(req, HttpResponse.BodyHandlers.ofByteArray())
  }

  private def isLocal(path: String): Boolean =
    path == "tmp" || path.startsWith("tmp/")
  private def lp(path: String): JPath = Paths.get(localRoot, path)

  def ls(dir: String): Seq[String] = {
    val r = request("ls", Seq("dir" -> dir))
    // the server answers 200 with an empty body for a missing dir, so
    // any other status is a REAL error. Returning Seq.empty for a 503
    // would make the changelog read as empty and the next commit
    // silently fork a new root — losing sight of all prior data.
    if (r.statusCode() != 200)
      throw new java.io.IOException(
        s"ls $base/$dir failed: HTTP ${r.statusCode()}")
    new String(r.body(), "UTF-8").split("\n").filter(_.nonEmpty).toSeq
  }

  def read(path: String): Array[Byte] =
    if (isLocal(path)) Files.readAllBytes(lp(path))
    else {
      val r = request("read", Seq("path" -> path))
      if (r.statusCode() != 200)
        throw new java.io.FileNotFoundException(s"$base/$path")
      r.body()
    }

  def write(path: String, data: Array[Byte]): Boolean = {
    val r = request("write", Seq("path" -> path), data)
    // a server error must NOT read as the benign "already exists,
    // skipped" result — that would silently drop the blob
    if (r.statusCode() != 200)
      throw new java.io.IOException(
        s"write $path failed: HTTP ${r.statusCode()} " +
          new String(r.body(), "UTF-8").take(200))
    new String(r.body(), "UTF-8").trim == "true"
  }

  def rm(path: String, recursive: Boolean = false): Unit =
    if (isLocal(path)) {
      val p = lp(path)
      if (Files.isDirectory(p)) {
        if (recursive) {
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
        } else Files.deleteIfExists(p)
      } else Files.deleteIfExists(p)
      ()
    } else {
      // 404 (already gone) is fine — rm is idempotent; anything else
      // must not vanish (a silently-failed delete strands gc)
      val r = request("rm",
        Seq("path" -> path, "recursive" -> recursive.toString),
        Array.emptyByteArray)
      if (r.statusCode() != 200 && r.statusCode() != 404)
        throw new java.io.IOException(
          s"rm $path failed: HTTP ${r.statusCode()} " +
            new String(r.body(), "UTF-8").take(200))
    }

  def mv(from: String, to: String): Unit =
    if (isLocal(from)) {
      // staged local file promoted into the remote store = upload
      write(to, Files.readAllBytes(lp(from)))
      Files.deleteIfExists(lp(from))
      ()
    } else {
      val r = request("mv", Seq("from" -> from, "to" -> to),
        Array.emptyByteArray)
      // 404 = the source is gone (a bury/resurrect race the other
      // mover won) — re-throw as FileNotFoundException so mvQuiet
      // keeps its contract; real server errors surface
      if (r.statusCode() == 404)
        throw new java.io.FileNotFoundException(s"$base/$from")
      if (r.statusCode() != 200)
        throw new java.io.IOException(
          s"mv $from -> $to failed: HTTP ${r.statusCode()} " +
            new String(r.body(), "UTF-8").take(200))
    }

  def exists(path: String): Boolean =
    if (isLocal(path)) Files.exists(lp(path))
    else {
      val r = request("exists", Seq("path" -> path))
      if (r.statusCode() != 200)
        throw new java.io.IOException(
          s"exists $path failed: HTTP ${r.statusCode()}")
      new String(r.body(), "UTF-8").trim == "true"
    }

  def walk(prefix: String): Seq[String] =
    if (isLocal(prefix)) {
      val p = lp(prefix)
      if (!Files.exists(p)) Seq.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        Files.walk(p).filter(Files.isRegularFile(_)).forEach { f =>
          out += Paths.get(localRoot).relativize(f).toString
        }
        out.toSeq.sorted
      }
    } else {
      val r = request("walk", Seq("prefix" -> prefix))
      if (r.statusCode() != 200) // see ls(): non-200 is never "empty"
        throw new java.io.IOException(
          s"walk $base/$prefix failed: HTTP ${r.statusCode()}")
      new String(r.body(), "UTF-8").split("\n")
        .filter(_.nonEmpty).toSeq
    }

  /** local spool path: staging area for tmp/, download-on-demand
    * mirror for remote blobs (so Spark can scan them as file://).
    * The download is gc-race-hardened: a concurrent gc may have
    * BURIED the blob (renamed to `name.t<hextime>`, resurrectable) —
    * on a 404 the spool resurrects over the wire and retries once,
    * the same recipe task-side segment reads and registry-chunk
    * reads use. Without it, a merge/scan PLANNED mid-bury failed at
    * the driver before the task-side self-heal could run (found by
    * the zstd+bss full-oracle pass racing q209's maintenance loop). */
  def uri(path: String): String = {
    val local = lp(path)
    if (!isLocal(path) && !Files.exists(local)) {
      Files.createDirectories(local.getParent)
      val data =
        try read(path)
        catch {
          case e: java.io.FileNotFoundException =>
            val cut = path.lastIndexOf('/')
            if (cut < 0) throw e
            val (dir, name) = (path.take(cut), path.drop(cut + 1))
            val buried = ls(dir).find(_.startsWith(name + ".t"))
            if (buried.isEmpty) throw e
            buried.foreach(b => mvQuiet(s"$dir/$b", path))
            read(path)
        }
      Files.write(local, data)
    } else if (isLocal(path)) {
      Files.createDirectories(
        if (path.contains('/')) local.getParent else local)
    }
    local.toUri.toString.stripSuffix("/")
  }
}

/** Serve a [[Store]] over HTTP (reference `lakota serve`). */
final class StoreServer(store: Store, port: Int = 0) {
  private val server =
    HttpServer.create(new InetSocketAddress(port), 0)

  private def param(ex: HttpExchange, name: String): Option[String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").iterator.map(_.split("=", 2)).collectFirst {
      case Array(k, v) if k == name => URLDecoder.decode(v, "UTF-8")
    }
  }

  private def respond(ex: HttpExchange, code: Int,
      body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val op = ex.getRequestURI.getPath.stripPrefix("/")
      op match {
        case "read" =>
          val p = param(ex, "path").get
          if (!store.exists(p)) respond(ex, 404, Array.emptyByteArray)
          else respond(ex, 200, store.read(p))
        case "write" =>
          val p = param(ex, "path").get
          val data = ex.getRequestBody.readAllBytes()
          val ok = store.write(p, data)
          respond(ex, 200, ok.toString.getBytes("UTF-8"))
        case "ls" =>
          respond(ex, 200, store.ls(param(ex, "dir").get)
            .mkString("\n").getBytes("UTF-8"))
        case "walk" =>
          respond(ex, 200, store.walk(param(ex, "prefix").get)
            .mkString("\n").getBytes("UTF-8"))
        case "exists" =>
          respond(ex, 200, store.exists(param(ex, "path").get)
            .toString.getBytes("UTF-8"))
        case "rm" =>
          store.rm(param(ex, "path").get,
            param(ex, "recursive").contains("true"))
          respond(ex, 200, "ok".getBytes("UTF-8"))
        case "mv" =>
          store.mv(param(ex, "from").get, param(ex, "to").get)
          respond(ex, 200, "ok".getBytes("UTF-8"))
        case _ =>
          respond(ex, 404, s"unknown op: $op".getBytes("UTF-8"))
      }
    } catch {
      // a missing source (rm/mv losing a bury/resurrect race) is a
      // distinct wire condition: 404 lets the client re-throw it as
      // FileNotFoundException, which mvQuiet treats as the benign
      // "the other mover already took it" — while real server errors
      // stay 500 and SURFACE client-side instead of vanishing
      case e: java.io.FileNotFoundException =>
        respond(ex, 404,
          Option(e.getMessage).getOrElse("not found").getBytes("UTF-8"))
      case e: Throwable =>
        respond(ex, 500,
          Option(e.getMessage).getOrElse("error").getBytes("UTF-8"))
    }
  })

  def start(): StoreServer = {
    // daemon workers: an embedded store server must never pin the JVM
    // open after the owning process (Verify, a test runner) is done
    server.setExecutor(java.util.concurrent.Executors
      .newFixedThreadPool(4, r => {
        val t = new Thread(r, "graft-store-server")
        t.setDaemon(true); t
      }))
    server.start(); this
  }
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort
}
