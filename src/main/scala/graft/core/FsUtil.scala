package graft.core

import java.nio.file.{Files, Path}

/** Local-filesystem helpers shared across the engine — one
  * implementation for the recursive scratch-dir delete that used to be
  * copy-pasted into three call sites (so a fix here reaches them all).
  * Hadoop-FS paths (object stores, HDFS) use `FileSystem.delete`
  * directly; this is for `java.nio` temp/scratch paths only. */
object FsUtil {

  /** Delete `p` and everything under it, children first; a missing
    * path is a no-op. The `Files.walk` stream is CLOSED (it holds an
    * open directory handle — the copy-pasted versions leaked one per
    * call until GC). Entries already gone by deletion time are
    * skipped, so concurrent cleanup is tolerated. */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val walk = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverseIterator
        .foreach(f => Files.deleteIfExists(f))
    } finally walk.close()
  }
}
