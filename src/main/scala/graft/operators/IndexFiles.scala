package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Small-file state store shared by the three persisted index families
  * ([[DedupIndex]] markers/meta, [[TextIndex]] segment list + metas,
  * [[AnnIndex]] build marker). Two rules, applied uniformly:
  *
  *  1. **Every commit-point write is all-or-nothing.** The content is
  *     staged to a hidden temp file in the target's directory and then
  *     RENAMED over the target. An in-place truncate-then-write
  *     (`Files.writeString`) leaves a torn or empty file on a crash
  *     mid-write — for a segment list that silently serves an EMPTY
  *     index, which is worse than crashing. On the local filesystem the
  *     rename is `java.nio` `ATOMIC_MOVE` (one `rename(2)` syscall —
  *     Hadoop's own local overwrite-rename is delete-then-rename, which
  *     reopens the missing-file window); on HDFS it is
  *     `FileContext.rename(…, Rename.OVERWRITE)`, the namenode-atomic
  *     form. Object stores without atomic rename (raw S3) keep the
  *     staged-write discipline but inherit the store's weaker guarantee —
  *     same caveat as every rename-committed table format.
  *
  *  2. **Index state lives with the index data.** All paths resolve
  *     through the Hadoop `FileSystem` of the index directory itself, so
  *     on a cluster filesystem the markers/meta land NEXT TO the parquet
  *     they describe — a `java.nio` write would drop them on the driver's
  *     local disk, and attach from any other host would see data with no
  *     state (r11 ADVICE).
  */
private[graft] object IndexFiles {

  private def conf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration

  /** Write `target` all-or-nothing: stage to `.<name>.tmp` beside it,
    * commit with an atomic rename. A reader never observes a partial
    * file — it sees the old content (or absence) until the single rename
    * instant, then the complete new content. */
  def atomicWrite(spark: SparkSession, target: Path)(
      write: java.io.OutputStream => Unit): Unit = {
    val fs = target.getFileSystem(conf(spark))
    val qualified = fs.makeQualified(target)
    val tmp = new Path(qualified.getParent, s".${qualified.getName}.tmp")
    val out = fs.create(tmp, true)
    try write(out) finally out.close()
    val scheme = qualified.toUri.getScheme
    if (scheme == null || scheme == "file")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(qualified.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else
      FileContext.getFileContext(qualified.toUri, conf(spark))
        .rename(tmp, qualified, Options.Rename.OVERWRITE)
  }

  def writeString(spark: SparkSession, target: Path, content: String): Unit =
    atomicWrite(spark, target)(_.write(content.getBytes(StandardCharsets.UTF_8)))

  /** Full content of `p`, or None if absent. */
  def readString(spark: SparkSession, p: Path): Option[String] = {
    val fs = p.getFileSystem(conf(spark))
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  def exists(spark: SparkSession, p: Path): Boolean =
    p.getFileSystem(conf(spark)).exists(p)

  def mkdirs(spark: SparkSession, p: Path): Unit =
    p.getFileSystem(conf(spark)).mkdirs(p)

  def delete(spark: SparkSession, p: Path): Unit =
    p.getFileSystem(conf(spark)).delete(p, false)
}
