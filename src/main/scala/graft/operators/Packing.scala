package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sequence packing — the final assembly step of an LLM training-data
  * pipeline: greedily pack documents into fixed-size context windows
  * ("bins") so training batches waste as little padding as possible.
  *
  * Algorithm: hash-shard the corpus, then NEXT-FIT within each shard in
  * doc_id order — a document goes into the shard's current bin if it fits,
  * else it opens a new one. Next-fit (not best-fit/FFD) on purpose: it is
  * single-pass, O(1)-state, order-deterministic, and its packing quality
  * loss vs FFD is bounded and small when documents are much shorter than
  * the context (the training-corpus regime).
  *
  * Scale shape (100 TB): ONE shuffle (repartition by shard) + an in-
  * partition sort + a single sequential pass per shard with two longs of
  * state — no driver collection, no global sort, no per-bin shuffle.
  * Shard count scales with the cluster (shards ≫ executors); each shard's
  * pass is independent, so the packing parallelism is exactly the shard
  * count. Bin ids are (shard, bin_idx) pairs — globally unique without any
  * cross-shard coordination.
  *
  * Determinism: shard = hash(doc_id), order = doc_id within shard — the
  * output is a pure function of the input rows, independent of input
  * partitioning or arrival order (spec-asserted under repartitioning).
  *
  * Oversized documents (n_tokens > contextLen) get a bin of their own
  * (callers truncate or split downstream); they never block packing.
  */
object Packing {

  /** Document chunking — the embedding/retrieval prep step: split each
    * document into fixed-size token windows with overlap, so long
    * documents embed within a model's context and adjacent chunks share
    * `overlap` tokens of continuity.
    *
    * Chunk starts step by `chunkTokens − overlap`; the last chunk starts
    * at the final stride position that still adds uncovered tokens
    * (`start < n − overlap`), so every token is covered and no chunk is a
    * strict suffix of its predecessor. Documents with ≤ overlap tokens
    * yield one whole-document chunk; empty documents yield none.
    *
    * Scale shape: pure narrow projection + posexplode — per-row arithmetic
    * decides the chunk count, slices share the one materialized token
    * array, nothing shuffles but the final (oracle-only) sort. */
  def chunkDocuments(t: Tables, chunkTokens: Int = 32,
                     overlap: Int = 8): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap $overlap must be in [0, chunkTokens=$chunkTokens)")
    val stride = chunkTokens - overlap
    val chunks = t.documents
      .withColumn("_tk", TextAnalysis.tokens(col("text")))
      .withColumn("_n", size(col("_tk")))
      .filter(col("_n") > 0)
      .withColumn("_nc",
        when(col("_n") <= overlap, lit(1))
          .otherwise(lit(1) +
            floor((col("_n") - lit(overlap + 1)).cast("double") / stride).cast("int")))
      .select(col("doc_id"), col("_tk"),
        posexplode(transform(sequence(lit(0), col("_nc") - 1),
          k => k * stride)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumn("_chunk", slice(col("_tk"), col("col") + 1, lit(chunkTokens)))
    chunks.select(
      col("doc_id"),
      col("chunk_idx").cast("bigint").as("chunk_idx"),
      concat_ws(" ", col("_chunk")).as("chunk_text"),
      size(col("_chunk")).cast("bigint").as("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Content-defined chunking (FastCDC / rolling-hash lineage — public
    * technique): a chunk boundary falls AFTER every token whose 64-bit
    * fingerprint ≡ 0 (mod 2^maskBits), so expected chunk length is
    * 2^maskBits tokens and — the property fixed-size chunking lacks —
    * boundaries are decided by LOCAL content: an insertion or deletion
    * re-chunks only the chunk it touches while every downstream boundary
    * stays put (spec-asserted). That stability is what makes chunk-hash
    * dedup survive edits at corpus scale; with [[chunkDocuments]]' fixed
    * windows, a one-token insertion shifts every later chunk and defeats
    * the dedup.
    *
    * Scale shape: posexplode + the codegen'd per-token hash (narrow), one
    * per-doc window to number chunks (partitions bounded by document
    * length), one (doc, chunk) aggregation and one per-doc rollup. Emits
    * per-document chunking stats (the oracle-checkable scalar view). */
  def cdcChunks(t: Tables, maskBits: Int = 3): DataFrame = {
    val modulus = 1 << maskBits
    val toks = t.documents
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
      .withColumnRenamed("pos", "_i")
      .withColumn("_b",
        when(pmod(graft.functions.HashFunctions.rollingHash64(col("col")),
          lit(modulus.toLong)) === 0, 1L).otherwise(0L))
    val w = Window.partitionBy("doc_id").orderBy("_i")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("_cid", coalesce(sum(col("_b")).over(w), lit(0L)))
      .groupBy("doc_id", "_cid").agg(count(lit(1)).as("_clen"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max("_clen").as("max_chunk_tokens"),
        round(avg("_clen"), 6).as("avg_chunk_tokens"))
      .orderBy("doc_id")
  }

  /** Passage-level duplication scoring — the boilerplate detector: split
    * every document into NON-overlapping fixed token windows
    * ([[chunkDocuments]] with overlap 0), count how many of each
    * document's passages also occur (verbatim) in at least one OTHER
    * document, and report the shared fraction. A high shared_frac with a
    * low whole-doc duplication rate is the signature of templated
    * boilerplate — the duplication that doc-level dedup cannot see.
    *
    * Scale shape: one hash aggregation keyed on the passage text for the
    * cross-doc occurrence counts (shuffle bounded by distinct-passage
    * count), one broadcast-free equi-join back on the passage key, one
    * per-doc aggregation. No self-join, nothing quadratic. */
  def passageDupScores(t: Tables, passageTokens: Int = 32): DataFrame = {
    val passages = chunkDocuments(t, passageTokens, overlap = 0)
      .select(col("doc_id"), col("chunk_text").as("_p"))
    val shared = passages
      .groupBy("_p").agg(countDistinct(col("doc_id")).as("_docs"))
      .filter(col("_docs") >= 2)
      .select(col("_p"), lit(1).as("_shared"))
    passages.join(shared, Seq("_p"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        count(col("_shared")).as("n_shared"))
      .withColumn("shared_frac",
        round(col("n_shared").cast("double") / col("n_passages"), 6))
      .orderBy("doc_id")
  }

  def packDocuments(t: Tables, contextLen: Int = 256,
                    nShards: Int = 8): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val docs = t.documents
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      .withColumn("shard",
        pmod(xxhash64(col("doc_id")), lit(nShards.toLong)).cast("int"))
    docs.select(col("shard"), col("doc_id"), col("n_tokens"))
      .as[(Int, Long, Int)]
      // every row of a shard lands in exactly one partition, sorted by
      // doc_id; a partition may hold several whole shards — the pass below
      // resets its state at each shard boundary
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { it =>
        var shard = Int.MinValue
        var bin = -1L
        var used = 0L
        it.map { case (sh, id, nt) =>
          if (sh != shard) { shard = sh; bin = -1L; used = 0L }
          // bin < 0 = no bin open yet (NOT a sentinel `used` value, which
          // would overflow the addition); else next-fit on remaining room
          if (bin < 0L || used + nt > contextLen) { bin += 1; used = 0L }
          used += nt
          (id, sh, bin, nt.toLong)
        }
      }
      .toDF("doc_id", "shard", "bin_idx", "n_tokens")
      .orderBy("doc_id")
  }

  /** Boilerplate REMOVAL (CCNet-lineage, Wenzek et al. 2020): passages
    * repeated across ≥ `minDf` distinct documents of the SAME source are
    * navigation chrome / headers / license banners, not content — drop
    * them and reassemble each document from its surviving passages, in
    * order. This is document SURGERY, where [[passageDupScores]] only
    * scores: the output is the cleaned corpus a downstream tokenizer
    * actually consumes, plus the per-document audit counts.
    *
    * Per-source (not global) frequency on purpose: a passage ubiquitous
    * within one crawl domain is boilerplate; the same passage appearing
    * once each in many unrelated sources is legitimate duplication that
    * near-dup dedup — not this pass — should adjudicate.
    *
    * Scale shape: chunking is narrow per-document work; the hot-passage
    * table is one (source, passage) aggregation df-filtered to a tiny
    * survivor set, and the removal join keys on (source, passage) — an
    * equi-join a 1000-executor cluster shuffles once (or broadcasts, the
    * df-filter makes the hot side small by construction). Reassembly is a
    * per-document `sort_array(collect_list(struct(idx, text)))` — state
    * bounded by document length, never by corpus size.
    */
  def removeBoilerplate(t: Tables, passageTokens: Int = 16,
                        minDf: Long = 2): DataFrame = {
    val passages = chunkDocuments(t, passageTokens, overlap = 0)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
      .join(t.documents.select(col("doc_id"), col("source")), Seq("doc_id"))
    val hot = passages
      .groupBy("source", "chunk_text")
      .agg(countDistinct(col("doc_id")).as("_df"))
      .filter(col("_df") >= minDf)
      .select(col("source"), col("chunk_text"), lit(1).as("_hot"))
    passages.join(broadcast(hot), Seq("source", "chunk_text"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_passages"),
        count(col("_hot")).as("n_dropped"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("_hot").isNull,
            struct(col("chunk_idx"), col("chunk_text"))))),
          e => e.getField("chunk_text"))).as("clean_text"))
      .withColumn("clean_tokens",
        size(TextAnalysis.tokens(col("clean_text"))).cast("bigint"))
      .orderBy("doc_id")
  }

  /** PADDING-WASTE AUDIT for length-bucketed batching (the measurement
    * behind bucketed samplers — group sequences of similar length so a
    * batch pads each member only to its bucket cap, not the global max).
    * Each document lands in a fixed power-of-two length band (explicit
    * CASE banding — integer-exact, no float log2 near band edges); per
    * band: doc count, real tokens, padded slots (cap − len summed), and
    * the waste fraction. The `naive_waste_frac` column carries the
    * whole-corpus counterfactual — every doc padded to the GLOBAL max —
    * so one artifact shows what bucketing buys (typically the difference
    * between ~10% and ~60% wasted compute).
    *
    * Scale shape: one narrow projection (token count per doc), one
    * band-keyed aggregation (≤7 groups), one 1-row global aggregate
    * broadcast back. No window, no sort beyond the 7-row output. */
  def paddingWasteAudit(t: Tables): DataFrame = {
    val lens = t.documents
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("len"))
      .filter(col("len") > 0)
    val banded = lens.withColumn("bucket_cap",
      when(col("len") <= 16, 16L).when(col("len") <= 32, 32L)
        .when(col("len") <= 64, 64L).when(col("len") <= 128, 128L)
        .when(col("len") <= 256, 256L).otherwise(512L))
    val global = lens.agg(max(col("len")).as("_gmax"),
      count(lit(1)).as("_gn"), sum(col("len")).as("_gsum"))
    banded.groupBy("bucket_cap")
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_tokens"))
      .crossJoin(broadcast(global))
      .select(
        col("bucket_cap"), col("n_docs"), col("sum_tokens"),
        (col("bucket_cap") * col("n_docs") - col("sum_tokens")).as("n_padded"),
        round((col("bucket_cap") * col("n_docs") - col("sum_tokens"))
          .cast("double") / (col("bucket_cap") * col("n_docs")), 6)
          .as("waste_frac"),
        round((col("_gmax") * col("_gn") - col("_gsum")).cast("double") /
          (col("_gmax") * col("_gn")), 6).as("naive_waste_frac"))
      .orderBy("bucket_cap")
  }
}
