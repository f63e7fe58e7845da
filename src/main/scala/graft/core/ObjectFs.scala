package graft.core

import org.apache.hadoop.fs.Path

/** Object-store-semantics Hadoop FileSystem backing `s3ish://bucket/…`
  * roots: the in-JVM analogue of the reference's moto-S3 test backend
  * (tests/conftest.py:65-99 runs the whole reference suite against a
  * fake S3 server). Reuses [[MemFileSystem]]'s blob map — flat keys,
  * no real directories, visibility only on close (a PUT) — but honest
  * object-store mutation semantics on top:
  *
  *  - NO atomic rename. `rename` is copy-then-delete per key (exactly
  *    what Hadoop's S3A connector emulates), so there is a window
  *    where source and destination both exist, and a file rename onto
  *    an existing destination FAILS like S3A's instead of silently
  *    clobbering — exercising HadoopStore.write's lost-race fallback.
  *  - `mkdirs` is a no-op and a "directory" exists only while keys
  *    live under its prefix (inherited).
  *
  * Spark's parquet committer drives its task/job commits through
  * directory renames, the engine's write path stages and `mv`s segment
  * files, and gc list-walks prefixes — all of it runs over these
  * semantics in ObjectFsSpec, end-to-end in one JVM.
  */
class ObjectFileSystem extends MemFileSystem {
  override protected def schemeName: String = ObjectFileSystem.Scheme

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = keyOf(src); val dk = keyOf(dst)
    bucket.get(sk) match {
      case Some(data) =>
        // S3A fails a single-object rename when the destination exists
        if (bucket.contains(dk)) return false
        // copy THEN delete: both objects are visible in between, and a
        // crash here would leak the copy — the engine's protocols must
        // (and do) tolerate that
        bucket.put(dk, data)
        bucket.remove(sk)
        true
      case None =>
        val pfx = sk + "/"
        val moved = bucket.keys.filter(_.startsWith(pfx)).toList
        if (moved.isEmpty) false
        else {
          // per-key copy pass first, then the delete pass — the
          // non-atomic shape of an object-store "directory move"
          moved.foreach { k =>
            bucket.get(k).foreach(d =>
              bucket.put(dk + "/" + k.stripPrefix(pfx), d))
          }
          moved.foreach(bucket.remove)
          true
        }
    }
  }
}

object ObjectFileSystem {
  val Scheme = "s3ish"
}
