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
}
