package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sampling and dataset-split operators for training-data pipelines.
  *
  * Both are deterministic functions of row content (not of partitioning,
  * task order, or RNG state), so a 100 TB job re-run after a failure — or on
  * a differently-partitioned copy of the data — assigns every row
  * identically. That property is what makes hash-based splits the standard
  * for train/eval hygiene: membership is reproducible and auditable.
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
