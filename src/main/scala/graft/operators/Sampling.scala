package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sampling and dataset-split operators for training-data pipelines.
  *
  * [[assignSplits]] is a deterministic function of row CONTENT (not of
  * partitioning, task order, or RNG state): a re-run after a failure — or on
  * a differently-partitioned copy of the data — assigns every row
  * identically, which is what makes hash-based splits the standard for
  * train/eval hygiene. [[stratifiedEvents]] is seed-deterministic but
  * partitioning/row-order dependent (`sampleBy` draws from a per-partition
  * RNG stream) — use it for statistics, not for membership that must
  * survive repartitioning; when content-stable sampling is required, filter
  * on a hash-bucket of the key instead (same trick as assignSplits).
  */
object Sampling {

  /** Deterministic split assignment: buckets the hash of `key` into [0,100)
    * and maps ranges to named splits by weight. `weights` are percentages
    * summing to ≤ 100 (any remainder goes to the last split).
    *
    * Example: `assignSplits(df, col("doc_id"), Seq("train" -> 90, "val" -> 5,
    * "test" -> 5))`. */
  def assignSplits(df: DataFrame, key: Column,
                   weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty, "assignSplits: weights must be non-empty")
    require(weights.map(_._2).sum <= 100 && weights.forall(_._2 >= 0),
      s"assignSplits: weights must be non-negative percentages summing to <= 100, got $weights")
    val bucket = pmod(xxhash64(key), lit(100))
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    // build when-chains outermost-first: the first matching range wins
    val assigned = weights.zip(bounds).reverse.foldLeft(lit(weights.last._1): Column) {
      case (acc, ((name, _), hi)) => when(bucket < hi, name).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Split the documents table 90/5/5 — the canonical pretraining split. */
  def documentSplits(t: Tables): DataFrame =
    assignSplits(t.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 6).as("avg_chars"))
      .orderBy("split")

  /** Stratified sample: per-stratum fractions with a fixed seed
    * (`DataFrameStatFunctions.sampleBy` — deterministic for a given input).
    * The scale property: sampling is a narrow map-side filter, no shuffle. */
  def stratifiedEvents(t: Tables, fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    t.events.stat.sampleBy("event_type", fractions, seed)
}
