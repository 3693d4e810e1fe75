package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Whole-pipeline compositions — the integration queries a training-data
  * user actually runs, built from the graded operators unchanged.
  */
object Pipeline {

  /** End-to-end training-set filter: exact dedup (min-doc_id winner per
    * content fingerprint) ∧ Gopher quality pass ∧ per-language p5–p95
    * length band, emitting the surviving rows. Composition keeps every
    * stage's scale shape intact: the winner set is a fingerprint-keyed
    * partial+final aggregation semi-joined back (no text through the
    * shuffle), the quality metrics are a narrow projection over survivors
    * only, and the length band is a language-cardinality broadcast — the
    * corpus is scanned linearly and never shuffles twice on the same key.
    * Bands come from the FULL corpus (pre-filter), matching
    * [[TextAnalysis.lengthBandFilter]]'s population semantics. */
  def finalCorpus(t: Tables): DataFrame = {
    val withFp = t.documents.withColumn("_fp", Dedup.fingerprint(col("text")))
    val winners = withFp.groupBy(col("_fp")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = withFp.join(winners, Seq("_fp", "doc_id"), "left_semi")
    val quality = TextAnalysis.gopherMetrics(deduped).filter(col("pass") === 1)
    val bands = t.documents.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.05)").as("_lo"),
        expr("percentile(n_chars, 0.95)").as("_hi"))
    quality.join(broadcast(bands), "lang")
      .filter(col("n_chars") >= col("_lo") && col("n_chars") <= col("_hi"))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** CORPUS SNAPSHOT DIFF — the version-accounting pass between two
    * corpus generations (yesterday's crawl vs today's): per source, how
    * many documents were added, removed, modified, unchanged. The audit a
    * data-versioning workflow reads before promoting a new snapshot, and
    * the input to incremental recompute decisions (only added+modified
    * docs need re-fingerprinting downstream).
    *
    * Scale shape: each side collapses to (doc_id, source, fingerprint) —
    * the codegen'd Karp–Rabin kernel, a NARROW projection, so no document
    * text ever enters the join — then ONE doc_id-keyed full-outer join of
    * two slim tables and a source-cardinality aggregation. Modified-ness
    * is fingerprint inequality: 64-bit collisions are the standard
    * accepted trade (same as exact dedup's fingerprint stage). */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    def slim(df: DataFrame, n: String): DataFrame = df.select(
      col("doc_id"),
      col("source").as(s"_src$n"),
      graft.functions.HashFunctions
        .rollingHash64(lower(trim(col("text")))).as(s"_fp$n"))
    slim(v1, "1").join(slim(v2, "2"), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("_src2"), col("_src1")).as("source"),
        when(col("_fp1").isNull, "added")
          .when(col("_fp2").isNull, "removed")
          .when(col("_fp1") =!= col("_fp2"), "modified")
          .otherwise("unchanged").as("_st"))
      .groupBy("source")
      .agg(
        count(when(col("_st") === "added", 1)).as("n_added"),
        count(when(col("_st") === "removed", 1)).as("n_removed"),
        count(when(col("_st") === "modified", 1)).as("n_modified"),
        count(when(col("_st") === "unchanged", 1)).as("n_unchanged"))
      .orderBy("source")
  }
}
