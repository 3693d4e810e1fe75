package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted INVERTED TEXT INDEX — the retrieval counterpart of
  * [[DedupIndex]] (fingerprints) and [[AnnIndex]] (embeddings): tf, df,
  * and document lengths are computed from the corpus ONCE and stored as a
  * bucketed postings table; every BM25 query probes the STORED postings
  * with no corpus text rescan. At 100 TB the from-scratch
  * [[TextAnalysis.bm25Search]] pays two corpus-wide shuffles per query
  * batch (tf aggregation + df aggregation); the index pays them once at
  * build and each probe touches only the postings of the query's terms.
  *
  * Layout — ONE bucketed catalog table plus a 2-number meta file:
  *  - `<prefix>_postings(w, doc_id, tf, df, len)` bucketed AND sorted by
  *    `w`. df and len are DENORMALIZED onto every posting (two extra
  *    longs per row) so a probe joins NOTHING corpus-sized — the classic
  *    search-engine postings layout, where a posting carries everything
  *    its scorer needs.
  *  - `meta` — (nDocs, sumLen) exact longs; avgdl derives as one double
  *    division, identical to the exact-long-sum mean both the live path
  *    and the DuckDB oracle compute.
  *
  * Probe scan hygiene: the term predicate is an `isin` over the query's
  * term set, so the scan gets (a) BUCKET PRUNING — only buckets hashing a
  * probed term are listed — and (b) row-group pruning inside each bucket
  * from the sorted-by-`w` layout + pushed `In` filter. A single-term
  * probe reads 1/buckets of the index (spec-asserted via
  * SelectedBucketsCount).
  *
  * The MONOLITHIC index is build-only (unlike [[DedupIndex.appendToIndex]]
  * / [[AnnIndex]]'s append): df and avgdl are global statistics
  * denormalized onto every posting, and appending documents changes df
  * for EXISTING terms — a row-append would silently serve stale scores.
  * Incremental ingest is the SEGMENT architecture (Lucene's shape),
  * implemented below: [[appendSegment]] writes each batch as its own
  * bucketed postings table plus a 2-number meta — existing segments are
  * never touched — and [[bm25ProbeSegmented]] unions the (per-segment
  * bucket-pruned) scans, recovers each term's df with a term-keyed
  * count over the probed postings themselves (the probe already reads
  * every posting of its terms, so df needs NO stored global), and sums
  * the segment metas for N and avgdl. Segment-spec probes are
  * spec-pinned equal to the from-scratch path over the merged corpus. */
object TextIndex {

  final case class Index(postings: String, dir: String,
                         nDocs: Long, sumLen: Long) {
    def avgdl: Double = sumLen.toDouble / nDocs
  }

  private def metaPath(dir: String) =
    java.nio.file.Paths.get(dir, "text_index.meta")
  private def bucketsPath(dir: String) =
    java.nio.file.Paths.get(dir, "text_index.buckets")

  /** Record the bucket count on first write; STORED WINS on attach — a
    * re-registration with a different count would declare a bucket spec
    * the files don't satisfy, and term pruning would silently read the
    * wrong buckets (the DedupIndex meta-wins rule). */
  private def writeBucketsOnce(dir: String, buckets: Int): Unit = {
    val p = bucketsPath(dir)
    if (!java.nio.file.Files.exists(p))
      java.nio.file.Files.writeString(p, buckets.toString)
  }

  private def storedBuckets(dir: String, fallback: Int): Int = {
    val p = bucketsPath(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).trim.toInt
    else fallback
  }

  /** (doc_id, w, tf) of a corpus — the shared tokenize+count stage. */
  private def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  /** Build the index under `dir` with catalog name `<prefix>_postings`.
    * One corpus scan; df/len fold in via two bounded joins of the SAME
    * checkpointed tf table (vocabulary- and doc-cardinality sides). */
  def buildIndex(spark: SparkSession, docs: DataFrame, prefix: String,
                 dir: String, buckets: Int = 32): Index = {
    val tf = termFreqs(docs).localCheckpoint()
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val lens = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    val table = s"${prefix}_postings"
    tf.join(dfreq, "w").join(lens, "doc_id")
      .select(col("w"), col("doc_id"), col("tf"), col("df"), col("len"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "w")
      .sortBy("w")
      .option("path", new org.apache.hadoop.fs.Path(dir, table).toString)
      .saveAsTable(table)
    writeBucketsOnce(dir, buckets)
    val st = lens.agg(count(lit(1)).as("n"), sum("len").as("s")).head()
    java.nio.file.Files.writeString(metaPath(dir),
      s"${st.getLong(0)} ${st.getLong(1)}")
    Index(table, dir, st.getLong(0), st.getLong(1))
  }

  /** Attach a previously built index: registers the bucketed table from
    * its stored files when a fresh session's catalog doesn't have it
    * (same DDL re-registration as [[DedupIndex.attachIndex]] — the build
    * session's catalog dies with it; the files and meta are the truth). */
  def attachIndex(spark: SparkSession, prefix: String, dir: String,
                  buckets: Int = 32): Index = {
    val b = storedBuckets(dir, buckets)
    val table = s"${prefix}_postings"
    if (!spark.catalog.tableExists(table))
      spark.sql(
        s"""CREATE TABLE $table (w STRING, doc_id BIGINT, tf BIGINT,
           |df BIGINT, len BIGINT) USING PARQUET
           |CLUSTERED BY (w) SORTED BY (w) INTO $b BUCKETS
           |LOCATION '${new org.apache.hadoop.fs.Path(dir, table)}'""".stripMargin)
    val parts = java.nio.file.Files.readString(metaPath(dir)).trim.split(' ')
    Index(table, dir, parts(0).toLong, parts(1).toLong)
  }

  final case class Segments(prefix: String, dir: String, ids: Seq[Int]) {
    def tableOf(id: Int): String = s"${prefix}_seg$id"
  }

  private def segMetaPath(dir: String, id: Int) =
    java.nio.file.Paths.get(dir, s"seg$id.meta")
  private def segListPath(dir: String) =
    java.nio.file.Paths.get(dir, "segments.list")

  /** Append one batch as a NEW segment: its own bucketed+sorted postings
    * table `(w, doc_id, tf, len)` — no df column; df is a query-time
    * derivation — plus a per-segment (nDocs, sumLen) meta. Existing
    * segments are immutable; the segment list commits LAST, so a crash
    * mid-append leaves an unreferenced orphan table, never a torn index
    * (the DedupIndex marker-ordering discipline).
    *
    * `batchTag` makes the append EXACTLY-ONCE for replayed streaming
    * micro-batches: the tag rides the segment-list entry, i.e. the same
    * single write that commits the segment — a retried foreachBatch
    * whose tag is already listed returns without writing, and a crash
    * BEFORE the list write leaves nothing committed, so the retry's
    * append is the first one. (A separate done-marker file would leave
    * a window between commit and marker where a retry double-ingests.) */
  def appendSegment(spark: SparkSession, docs: DataFrame, prefix: String,
                    dir: String, buckets: Int = 32,
                    batchTag: Option[String] = None): Segments = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val prev = attachSegments(spark, prefix, dir, buckets)
    if (batchTag.exists(readTags(dir).contains)) return prev
    val id = prev.ids.lastOption.getOrElse(-1) + 1
    val tf = termFreqs(docs).localCheckpoint()
    val lens = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    // emptiness check BEFORE anything is written: a batch with zero
    // indexable documents (no rows, or rows whose text all tokenizes to
    // nothing) is a graceful no-op — a streaming micro-batch of
    // empty-text docs must not abort the ingest loop or leave an orphan
    // segment table
    val st = lens.agg(count(lit(1)).as("n"), sum("len").as("s")).head()
    if (st.getLong(0) == 0) return prev
    val table = s"${prefix}_seg$id"
    tf.join(lens, "doc_id")
      .select(col("w"), col("doc_id"), col("tf"), col("len"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "w")
      .sortBy("w")
      .option("path", new org.apache.hadoop.fs.Path(dir, table).toString)
      .saveAsTable(table)
    writeBucketsOnce(dir, buckets)
    java.nio.file.Files.writeString(segMetaPath(dir, id),
      s"${st.getLong(0)} ${st.getLong(1)}")
    val ids = prev.ids :+ id
    val entries = readEntries(dir) :+ (id, batchTag.getOrElse(""))
    java.nio.file.Files.writeString(segListPath(dir),
      entries.map { case (i, tg) => if (tg.isEmpty) s"$i" else s"$i:$tg" }
        .mkString(" "))
    Segments(prefix, dir, ids)
  }

  /** (segment id, batch tag) entries of the list file; tag "" = untagged. */
  private def readEntries(dir: String): Seq[(Int, String)] = {
    val lp = segListPath(dir)
    if (!java.nio.file.Files.exists(lp)) Seq.empty
    else {
      val s = java.nio.file.Files.readString(lp).trim
      if (s.isEmpty) Seq.empty
      else s.split(' ').toSeq.map { e =>
        e.split(':') match {
          case Array(i)     => (i.toInt, "")
          case Array(i, tg) => (i.toInt, tg)
        }
      }
    }
  }

  private def readTags(dir: String): Set[String] =
    readEntries(dir).map(_._2).filter(_.nonEmpty).toSet

  /** Attach the segmented index: re-registers any segment table a fresh
    * session's catalog lacks. An empty/missing list is a valid empty
    * index. */
  def attachSegments(spark: SparkSession, prefix: String, dir: String,
                     buckets: Int = 32): Segments = {
    val b = storedBuckets(dir, buckets)
    val ids = readEntries(dir).map(_._1)
    ids.foreach { id =>
      val table = s"${prefix}_seg$id"
      if (!spark.catalog.tableExists(table))
        spark.sql(
          s"""CREATE TABLE $table (w STRING, doc_id BIGINT, tf BIGINT,
             |len BIGINT) USING PARQUET
             |CLUSTERED BY (w) SORTED BY (w) INTO $b BUCKETS
             |LOCATION '${new org.apache.hadoop.fs.Path(dir, table)}'""".stripMargin)
    }
    Segments(prefix, dir, ids)
  }

  /** COMPACT a grown segmented index: a daily append loop accretes one
    * table per batch, and probe cost grows with segment count (one scan
    * + union branch each). Compaction unions every live segment into ONE
    * new segment table (a fresh id — existing segments stay immutable)
    * with the summed meta, then atomically swaps the segment list to
    * reference only it. Crash semantics mirror [[appendSegment]]: the
    * list write is the commit point, so a crash mid-compaction leaves
    * the old list serving the old segments and at worst an orphan
    * compacted table. Because df is a QUERY-TIME derivation, compaction
    * is a pure rewrite — no statistics to rebuild (the advantage of not
    * denormalizing df into segments). Old segment tables/dirs are left
    * for the caller to garbage-collect once no reader can hold the old
    * list. */
  def compactSegments(spark: SparkSession, seg: Segments,
                      buckets: Int = 32): Segments = {
    require(seg.ids.nonEmpty, "compactSegments: empty segment list")
    val b = storedBuckets(seg.dir, buckets)
    val id = seg.ids.last + 1
    val all = seg.ids.map(i => spark.table(seg.tableOf(i)))
      .reduce(_.unionByName(_))
    val table = seg.tableOf(id)
    all.write.mode(SaveMode.Overwrite)
      .bucketBy(b, "w")
      .sortBy("w")
      .option("path", new org.apache.hadoop.fs.Path(seg.dir, table).toString)
      .saveAsTable(table)
    val stats = seg.ids.map { i =>
      val p = java.nio.file.Files.readString(segMetaPath(seg.dir, i))
        .trim.split(' ')
      (p(0).toLong, p(1).toLong)
    }
    java.nio.file.Files.writeString(segMetaPath(seg.dir, id),
      s"${stats.map(_._1).sum} ${stats.map(_._2).sum}")
    java.nio.file.Files.writeString(segListPath(seg.dir), id.toString)
    Segments(seg.prefix, seg.dir, Seq(id))
  }

  /** The shared BM25 scoring + ranking tail: postings carrying
    * (w, doc_id, tf, df, len) scored against the broadcast query-term
    * table with the exact [[TextAnalysis.bm25Search]] arithmetic,
    * self-matches excluded, per-query top-k. ONE definition — both
    * probes must keep the oracle-pinned formula in lockstep. */
  private def bm25Rank(posts: DataFrame, qTerms: DataFrame, nDocs: Long,
                       avgdl: Double, topK: Int, k1: Double,
                       b: Double): DataFrame = {
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("neighbor_id").asc)
    posts.join(broadcast(qTerms), Seq("w"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("_c",
        log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + (lit(1.0 - b) + col("len") * b / avgdl) * k1))
      .groupBy(col("query_id"), col("doc_id").as("neighbor_id"))
      .agg(round(sum("_c"), 6).as("bm25"))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") <= topK)
      .select("query_id", "neighbor_id", "bm25")
      .orderBy("query_id", "neighbor_id")
  }

  /** BM25 top-k against the SEGMENTED index: per-segment term-pruned
    * scans union (each one bucket- and row-group-pruned exactly like the
    * monolithic probe), df recovers as a term-partitioned count over the
    * probed postings — the probe reads every posting of its terms by
    * construction, so the derivation is exact — and N/avgdl sum from the
    * immutable per-segment metas. Scoring arithmetic is identical to
    * [[bm25Probe]], so the same from-scratch oracle verifies it. */
  def bm25ProbeSegmented(spark: SparkSession, seg: Segments,
                         queryDocs: DataFrame, topK: Int = 5,
                         k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(seg.ids.nonEmpty, "bm25ProbeSegmented: empty segment list")
    val stats = seg.ids.map { id =>
      val parts = java.nio.file.Files.readString(segMetaPath(seg.dir, id))
        .trim.split(' ')
      (parts(0).toLong, parts(1).toLong)
    }
    val nDocs = stats.map(_._1).sum
    val avgdl = stats.map(_._2).sum.toDouble / nDocs
    val qTerms = termFreqs(queryDocs)
      .select(col("doc_id").as("query_id"), col("w"))
    val termList = qTerms.select("w").distinct().collect().map(_.getString(0))
    val posts = seg.ids.map(id => spark.table(seg.tableOf(id))
        .filter(col("w").isin(termList.toIndexedSeq: _*)))
      .reduce(_.unionByName(_))
    // df at query time: distinct docs per term over the probed postings.
    // (w, doc_id) is unique within AND across segments — segments
    // partition the corpus — so a plain count per term is the df. An
    // aggregate + equi-join (map-side partial, streaming probe) rather
    // than a term-partitioned window: a stop-word's window partition
    // would buffer its whole postings list in one task.
    val dfs = posts.groupBy("w").agg(count(lit(1)).as("df"))
    bm25Rank(posts.join(dfs, "w"), qTerms, nDocs, avgdl, topK, k1, b)
  }

  /** BM25 top-k against the STORED postings for query documents
    * (doc_id, text, …): tokenizes only the query side (bounded), prunes
    * the postings scan to the query's terms, scores each surviving
    * posting from its own denormalized (tf, df, len) — the exact
    * [[TextAnalysis.bm25Search]] arithmetic, so the same SQL oracle
    * verifies both paths — and ranks per query. Self-matches are
    * excluded, mirroring the live path. */
  def bm25Probe(spark: SparkSession, idx: Index, queryDocs: DataFrame,
                topK: Int = 5, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = termFreqs(queryDocs)
      .select(col("doc_id").as("query_id"), col("w"))
    // bounded driver set: the query batch's distinct vocabulary — this
    // literal IN is what turns into bucket + row-group pruning on the scan
    val termList = qTerms.select("w").distinct().collect().map(_.getString(0))
    val posts = spark.table(idx.postings)
      .filter(col("w").isin(termList.toIndexedSeq: _*))
    bm25Rank(posts, qTerms, idx.nDocs, idx.avgdl, topK, k1, b)
  }
}
