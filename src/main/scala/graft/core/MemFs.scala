package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  FileNotFoundException, IOException}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream,
  FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-memory Hadoop FileSystem backing `memory://bucket/...` repo
  * roots — the analogue of the reference's default MemPOD
  * (lakota/pod.py MemPOD; `Repo()` with no argument is memory-backed).
  *
  * Because it is a real Hadoop FileSystem, EVERYTHING works over it
  * unchanged, including Spark's parquet scans and writes of segment
  * files — in `local[*]` the executors share the JVM, so the blob map
  * is visible to every task. One static map per bucket; a bucket lives
  * for the JVM (tests and ephemeral pipelines — the reference's MemPOD
  * has the same lifetime).
  */
class MemFileSystem extends FileSystem {
  import MemFileSystem._

  /** subclasses present the same blob map under another scheme with
    * different mutation semantics (see ObjectFileSystem) */
  protected def schemeName: String = Scheme

  private var fsUri: URI = _
  private var cwd: Path = new Path("/")

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    fsUri = URI.create(s"$schemeName://${uri.getAuthority}")
    setConf(conf)
  }

  override def getScheme: String = schemeName
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = cwd
  override def setWorkingDirectory(dir: Path): Unit = { cwd = dir }

  protected def bucket: Blobs =
    blobsFor(s"$schemeName://${fsUri.getAuthority}")

  /** normalized absolute key, no trailing slash */
  private def key(f: Path): String = {
    val p = makeQualified(f).toUri.getPath
    if (p == "/") "" else p.stripSuffix("/")
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = key(f)
    val data = bucket.get(k).getOrElse(
      throw new FileNotFoundException(k))
    new FSDataInputStream(new SeekableBytes(data))
  }

  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (!overwrite && bucket.contains(k))
      throw new IOException(s"already exists: $k")
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(buf, statistics) {
      override def close(): Unit = {
        super.close()
        bucket.put(k, buf.toByteArray)
        ()
      }
    }
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append")

  /** normalized absolute key, exposed to ObjectFileSystem's rename */
  protected def keyOf(f: Path): String = key(f)

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src); val dk = key(dst)
    bucket.get(sk) match {
      case Some(data) =>
        bucket.put(dk, data); bucket.remove(sk); true
      case None =>
        // directory rename: move every key under the prefix
        val pfx = sk + "/"
        val moved = bucket.keys.filter(_.startsWith(pfx)).toList
        if (moved.isEmpty) false
        else {
          moved.foreach { k =>
            bucket.get(k).foreach(d =>
              bucket.put(dk + "/" + k.stripPrefix(pfx), d))
            bucket.remove(k)
          }
          true
        }
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    val hadFile = bucket.remove(k).isDefined
    val pfx = k + "/"
    val children = bucket.keys.filter(_.startsWith(pfx)).toList
    if (children.nonEmpty && !recursive && !hadFile)
      throw new IOException(s"directory not empty: $k")
    children.foreach(bucket.remove)
    val hadMarker = bucket.hasDirMarker(k)
    bucket.removeDirMarkers(k)
    hadFile || children.nonEmpty || hadMarker
  }

  private def fileStatus(k: String): FileStatus = {
    val qualified = new Path(
      if (k.isEmpty) fsUri.toString + "/" else fsUri.toString + k)
    bucket.get(k) match {
      case Some(data) =>
        new FileStatus(data.length.toLong, false, 1, 33554432L,
          bucket.mtime(k), qualified)
      case None =>
        val pfx = if (k.isEmpty) "" else k + "/"
        if (k.isEmpty || bucket.keys.exists(_.startsWith(pfx)) ||
            bucket.hasDirMarker(k))
          new FileStatus(0L, true, 1, 0L, 0L, qualified)
        else throw new FileNotFoundException(k)
    }
  }

  override def getFileStatus(f: Path): FileStatus = fileStatus(key(f))

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (bucket.contains(k)) return Array(fileStatus(k))
    val pfx = if (k.isEmpty) "/" else k + "/"
    val names = bucket.keys.filter(_.startsWith(pfx))
      .map(_.stripPrefix(pfx).takeWhile(_ != '/')).toSet
    if (names.isEmpty && !k.isEmpty) throw new FileNotFoundException(k)
    names.toArray.sorted.map(n => fileStatus(
      if (k.isEmpty) "/" + n else k + "/" + n))
  }

  // S3A-style zero-byte directory marker: an explicitly mkdirs'd empty
  // directory must stat as existing (SparkContext.setCheckpointDir does
  // mkdirs-then-getFileStatus) even though object stores have no real
  // directories. Keys under the prefix still define existence otherwise.
  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    bucket.putDirMarker(key(f)); true
  }
}

object MemFileSystem {
  val Scheme = "memory"

  /** per-bucket blob map with write times (for FileStatus mtimes) */
  final class Blobs {
    private val m = scala.collection.concurrent.TrieMap
      .empty[String, (Array[Byte], Long)]
    def get(k: String): Option[Array[Byte]] = m.get(k).map(_._1)
    def put(k: String, v: Array[Byte]): Unit = {
      m.put(k, (v, System.currentTimeMillis())); ()
    }
    def remove(k: String): Option[Array[Byte]] = m.remove(k).map(_._1)
    def contains(k: String): Boolean = m.contains(k)
    def keys: Iterable[String] = m.keys
    def mtime(k: String): Long = m.get(k).map(_._2).getOrElse(0L)
    private val dirMarkers = scala.collection.concurrent.TrieMap
      .empty[String, Unit]
    def putDirMarker(k: String): Unit = { dirMarkers.put(k, ()); () }
    def hasDirMarker(k: String): Boolean = dirMarkers.contains(k)
    def removeDirMarkers(pfx: String): Unit =
      dirMarkers.keys.filter(d => d == pfx || d.startsWith(pfx + "/"))
        .foreach(dirMarkers.remove)
  }

  private val buckets = scala.collection.concurrent.TrieMap
    .empty[String, Blobs]

  def blobsFor(bucket: String): Blobs =
    buckets.getOrElseUpdate(if (bucket == null) "" else bucket,
      new Blobs)

  /** register the in-JVM schemes (memory://, s3ish://) on a Spark
    * session's Hadoop conf (idempotent) */
  def install(conf: Configuration): Unit = {
    conf.set(s"fs.$Scheme.impl", classOf[MemFileSystem].getName)
    conf.set(s"fs.$Scheme.impl.disable.cache", "false")
    conf.set(s"fs.${ObjectFileSystem.Scheme}.impl",
      classOf[ObjectFileSystem].getName)
    conf.set(s"fs.${ObjectFileSystem.Scheme}.impl.disable.cache", "false")
  }

  /** seekable byte-array input for FSDataInputStream */
  private final class SeekableBytes(data: Array[Byte])
      extends ByteArrayInputStream(data)
      with Seekable with PositionedReadable {
    override def seek(pos: Long): Unit = {
      if (pos < 0 || pos > count)
        throw new IOException(s"seek out of range: $pos")
      this.pos = pos.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Int = {
      if (position >= count) return -1
      val n = math.min(length, count - position.toInt)
      System.arraycopy(data, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new IOException("readFully past EOF")
    }
    override def readFully(position: Long,
        buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
