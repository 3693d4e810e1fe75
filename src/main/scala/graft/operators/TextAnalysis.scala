package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table. All per-document operators are embarrassingly parallel
  * narrow transformations (no shuffle); corpus-level ones (top terms) use
  * explode + partial-aggregating groupBy — never driver-side counting.
  */
object TextAnalysis {

  /** Whitespace tokenization of the normalized text. The empty-string guard
    * matters: `split("", "\\s+")` yields `[""]`, so without it empty or
    * whitespace-only documents would count one phantom token and "" could
    * rank as a top term. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** A small English stopword list (enough for ratio features). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  /** BPE-style pre-tokenization pattern (public GPT-2-style shape): letter
    * runs, digit runs, or single non-space symbols — the token count a BPE
    * tokenizer would start from, minus merges. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Per-document token/length statistics: whitespace tokens and a BPE-ish
    * regex token count. Token count is materialized once (lower projection)
    * instead of re-tokenizing for the avg_token_len denominator. */
  def textStats(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), col("text"),
        size(tokens(col("text"))).as("_nt"))
      .select(
        col("doc_id"),
        length(col("text")).cast("bigint").as("n_chars_calc"),
        col("_nt").cast("bigint").as("n_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeishPattern), lit(0)))
          .cast("bigint").as("n_tokens_bpeish"),
        round(
          length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
            col("_nt"), 6).as("avg_token_len"))
      .orderBy("doc_id")

  /** Corpus-wide top terms: explode → hash agg (map-side partial) → top-k.
    * Distributed end to end; the LIMIT is the only driver-bound step. */
  def topTerms(t: Tables, k: Int = 25): DataFrame =
    t.documents
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Quality scoring: stopword ratio, punctuation ratio, digit ratio, and a
    * blended score. Pure narrow projection — scales linearly.
    *
    * Two-stage projection on purpose: the token/regex COUNTS are
    * materialized as columns first, and the ratios/score read those
    * attributes. Inlining everything into one select re-evaluates the
    * tokenizer once per reference (~7× per row through the ratio and score
    * expressions — measured ~4× on the whole query); CollapseProject keeps
    * the split because collapsing would duplicate non-cheap expressions.
    * The arithmetic is identical, so oracle hashes are unchanged. */
  def qualityScore(t: Tables): DataFrame = {
    val toks = tokens(col("text"))
    val counted = t.documents.select(
      col("doc_id"),
      size(toks).as("_nt"),
      size(filter(toks, tk => tk.isin(Stopwords: _*))).as("_ns"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[\\.,!\\?;:]", ""))).as("_np"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", ""))).as("_nd"),
      length(col("text")).as("_nc"))
    val stopRatio = col("_ns").cast("double") / col("_nt")
    val punctRatio = col("_np").cast("double") / greatest(col("_nc"), lit(1))
    val digitRatio = col("_nd").cast("double") / greatest(col("_nc"), lit(1))
    // Heuristic quality: long-enough docs with some stopwords, few digits.
    val score =
      least(col("_nt").cast("double") / 20.0, lit(1.0)) * 0.5 +
        least(stopRatio * 5.0, lit(1.0)) * 0.3 +
        (lit(1.0) - least(digitRatio * 10.0, lit(1.0))) * 0.2
    counted
      .select(
        col("doc_id"),
        col("_nt").cast("bigint").as("n_tokens"),
        col("_ns").cast("bigint").as("n_stop"),
        round(stopRatio, 6).as("stop_ratio"),
        round(punctRatio, 6).as("punct_ratio"),
        round(score, 6).as("quality"))
      .orderBy("doc_id")
  }

  /** Language identification via a character n-gram / stopword heuristic:
    * scores each candidate language by occurrences of its characteristic
    * trigrams and function words, picks the argmax (deterministic tie-break
    * on language code). Distributed narrow op; the profile table is a literal
    * (broadcast-free). */
  def languageId(t: Tables): DataFrame = {
    // fused single-pass marker scan (see graft.functions.TextImpl — the
    // one-regexp_replace-per-marker formulation costs 25 regex passes/row)
    val best = graft.functions.TextFunctions.langId(col("text"))
    t.documents
      .select(
        col("doc_id"),
        best.getField("lang_pred").as("lang_pred"),
        round(best.getField("lang_score"), 4).as("lang_score"))
      .orderBy("doc_id")
  }

  /** Corpus-wide frequent terms via the SpaceSaving sketch — the scale path
    * for top-terms when the vocabulary is too large for an exact groupBy:
    * one partial+final aggregation pass with a bounded (capacity-sized)
    * buffer per partition, no per-term shuffle. Every term with frequency
    * > totalTokens/capacity is guaranteed present. */
  def topTermsSketch(t: Tables, capacity: Int = 64, k: Int = 25): DataFrame =
    t.documents
      .select(explode(tokens(col("text"))).as("token"))
      .agg(graft.functions.FreqItemsSketch.freqItems(col("token"), capacity).as("sketch"))
      .select(explode(slice(col("sketch"), 1, k)).as("e"))
      .select(col("e.item").as("token"), col("e.est_count").as("est_count"),
        col("e.max_err").as("max_err"))

  /** Document fingerprint: Karp–Rabin rolling hash of the normalized text
    * (custom codegen'd Catalyst expression — see
    * [[graft.functions.RollingHash64]]). */
  def fingerprints(t: Tables): DataFrame =
    t.documents
      .select(
        col("doc_id"),
        HashFunctions.rollingHash64(lower(trim(col("text")))).as("fingerprint"))
      .orderBy("doc_id")
}
