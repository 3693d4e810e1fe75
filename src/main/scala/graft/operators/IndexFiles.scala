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

  /** The filesystem to do state-file I/O through. On the local scheme the
    * default `LocalFileSystem` is a [[ChecksumFileSystem]] that pairs every
    * file with a `.<name>.crc` sidecar — but our commit is a bare
    * `rename(2)` of the DATA file only, so a checksum-written target would
    * keep a sidecar describing the PREVIOUS content and every subsequent
    * checksum-verified open would throw `ChecksumException` (r12 ADVICE).
    * Unwrapping to the raw filesystem keeps writes sidecar-free and reads
    * sidecar-blind; HDFS/object stores (checksums internal to the protocol)
    * pass through unchanged. */
  private def ioFs(spark: SparkSession, p: Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(conf(spark)) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  /** Write `target` all-or-nothing: stage to `.<name>.tmp` beside it,
    * commit with an atomic rename. A reader never observes a partial
    * file — it sees the old content (or absence) until the single rename
    * instant, then the complete new content. */
  def atomicWrite(spark: SparkSession, target: Path)(
      write: java.io.OutputStream => Unit): Unit = {
    val fs = ioFs(spark, target)
    val qualified = fs.makeQualified(target)
    val tmp = new Path(qualified.getParent, s".${qualified.getName}.tmp")
    val out = fs.create(tmp, true)
    try write(out) finally out.close()
    val scheme = qualified.toUri.getScheme
    if (scheme == null || scheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(qualified.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // scrub checksum sidecars left by pre-IndexFiles writers (which went
      // through ChecksumFileSystem): a stale `.<name>.crc` describing the
      // OLD content would make any checksum-verified reader of the NEW
      // content throw; same for `..<name>.tmp.crc` litter from old stages
      fs.delete(new Path(qualified.getParent, s".${qualified.getName}.crc"), false)
      fs.delete(new Path(qualified.getParent, s".${tmp.getName}.crc"), false)
    } else
      FileContext.getFileContext(qualified.toUri, conf(spark))
        .rename(tmp, qualified, Options.Rename.OVERWRITE)
  }

  def writeString(spark: SparkSession, target: Path, content: String): Unit =
    atomicWrite(spark, target)(_.write(content.getBytes(StandardCharsets.UTF_8)))

  /** Open `p` for reading (checksum-blind on local — see [[ioFs]]), or
    * None if absent. Caller closes. */
  def open(spark: SparkSession, p: Path): Option[java.io.InputStream] = {
    val fs = ioFs(spark, p)
    if (!fs.exists(p)) None else Some(fs.open(p))
  }

  /** Full content of `p`, or None if absent. */
  def readString(spark: SparkSession, p: Path): Option[String] =
    open(spark, p).map { in =>
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }

  /** Segment-list entry grammar shared by [[TextIndex]] and [[CdcStore]]:
    * space-separated entries, each `id` (untagged) or `id:tag1,tag2,…`
    * (tags carry the exactly-once batch markers; multiple appear when a
    * compaction folded several tagged segments into one). Writers
    * validate tags against the separator set before ever calling these. */
  def readSegEntries(spark: SparkSession, list: Path): Seq[(Int, Seq[String])] =
    readString(spark, list).map(_.trim) match {
      case None | Some("") => Seq.empty
      case Some(s) =>
        s.split(' ').toSeq.map { e =>
          e.split(':') match {
            case Array(i)      => (i.toInt, Seq.empty[String])
            case Array(i, tgs) => (i.toInt, tgs.split(',').toSeq)
          }
        }
    }

  /** The single commit point for every list mutation: atomic rename — a
    * reader sees the old list or the new one, never a prefix of either. */
  def writeSegEntries(spark: SparkSession, list: Path,
                      entries: Seq[(Int, Seq[String])]): Unit =
    writeString(spark, list,
      entries.map { case (i, tgs) =>
        if (tgs.isEmpty) s"$i" else s"$i:${tgs.mkString(",")}"
      }.mkString(" "))

  /** Reject a batch tag that would corrupt the segment-list grammar —
    * called BEFORE anything is written. */
  def requireValidTag(tag: String): Unit = require(
    tag.nonEmpty && !tag.exists(c => c == ':' || c == ',' || c.isWhitespace),
    s"batchTag '$tag' is empty or contains a list-entry separator " +
      "(':', ',', whitespace)")

  def exists(spark: SparkSession, p: Path): Boolean =
    p.getFileSystem(conf(spark)).exists(p)

  def mkdirs(spark: SparkSession, p: Path): Unit =
    p.getFileSystem(conf(spark)).mkdirs(p)

  def delete(spark: SparkSession, p: Path): Unit =
    p.getFileSystem(conf(spark)).delete(p, false)

  /** Byte-derived width for a bucketed segment WRITE (r17 verdict item 2,
    * promoted from the q_cdc_apply fixture into the stores so EVERY
    * caller — the streaming loops included — gets the bound). A bucketed
    * write emits one file per (task, bucket) pair, so a batch arriving at
    * the session's full shuffle width fans a few-MB delta into
    * tasks×buckets tiny files, and every later resolve pays a fixed
    * ~90-250 ms task setup per file. Every batch REPARTITIONS on the
    * bucket key at a MULTIPLE of the bucket count (floored at the bucket
    * count itself — r19, see the inline note on why the r18 small-batch
    * coalesce arm was a width cliff): Spark's shuffle hash and its
    * bucketing hash are the same pmod(murmur3(_, 42)) family, so with
    * n = m·buckets every write task holds exactly one bucket's rows and
    * the file count is exactly the non-empty (task, bucket) pairs —
    * growing with bytes (~1 file / 64 MB), never with the caller's
    * width. `statBytes` is the caller's best
    * PRE-CHECKPOINT estimate (a checkpointed plan reports the unknown
    * sentinel); unknown keeps the core count, aligned. */
  def boundBucketedWrite(out: org.apache.spark.sql.DataFrame, key: String,
                         buckets: Int, statBytes: BigInt): org.apache.spark.sql.DataFrame = {
    val spark = out.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val known = statBytes.isValidLong &&
      statBytes.toLong < spark.sessionState.conf.defaultSizeInBytes
    // CEILING at 32× the core count: plan stats on a JOIN-derived batch
    // can be a product ESTIMATE (a perfectly valid Long below the unknown
    // sentinel — the quantileWidth hazard), and an uncapped bytes/64 MB
    // would re-create the tiny-file explosion this helper exists to
    // prevent (or wrap n.toInt negative and crash the write). 32× cores
    // still gives a genuine multi-TB batch thousands of ~full files per
    // executor wave; a garbage estimate costs at most one bounded wave
    // of small files, which the next compaction folds away.
    val cap = math.max(buckets.toLong, par.toLong * 32)
    // FLOOR at the bucket count, and ALWAYS repartition-aligned — never
    // coalesce. coalesce(n) limits the width of the whole upstream
    // stage, so a Catalyst UNDER-estimate (an over-selective filter
    // guess on a join-derived batch) reaching tasks=1 would serialize
    // the entire batch computation through one task — a cliff with no
    // guard symmetric to the 32×-cores ceiling above (r18 ADVICE). An
    // aligned shuffle instead leaves the upstream at its natural width,
    // costs only the batch's own bytes (negligible exactly when the
    // batch is genuinely small), and still lands exactly one file per
    // non-empty bucket at the floor.
    val tasks =
      if (known) math.min(cap,
        math.max(buckets.toLong, statBytes.toLong / (64L << 20)))
      else math.max(par.toLong, buckets.toLong)
    val n = ((tasks + buckets - 1) / buckets * buckets)
    out.repartition(n.toInt, org.apache.spark.sql.functions.col(key))
  }

  /** Total on-disk bytes under `p` (0 if absent) — the TRUE size of a
    * stored segment, used to pick probe plans by data volume where plan
    * statistics can't see through a catalog table's bucket spec. One
    * namenode round trip; never lists file contents. */
  def dirBytes(spark: SparkSession, p: Path): Long = {
    val fs = p.getFileSystem(conf(spark))
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }
}
