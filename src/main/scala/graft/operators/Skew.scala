package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) handles most
  * runtime skew; these helpers cover the two shapes AQE can't fix:
  * a high-cardinality aggregation with a few hot keys, and a shuffle join
  * against a dimension where one fact key dominates.
  */
object Skew {

  /** Two-stage ("salted") aggregation: stage 1 aggregates on
    * (key, salt ∈ [0, salts)) so a hot key's rows spread over `salts`
    * reducers; stage 2 combines the partials per key. Use for algebraic
    * aggregates (sum/count/min/max) when one key holds a large fraction of
    * all rows — e.g. counting events per user when one bot user is 30% of
    * the stream.
    *
    * The salt column is derived from `spark_partition_id` (already random
    * w.r.t. the key after a scan, and free), not `rand()` — deterministic
    * per task, so retries don't change results. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.groupBy(key.as("key"), (spark_partition_id() % salts).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum("_partial").as("n"))

  /** Salted broadcast-free join for one dominant key set: the fact side gets
    * a random salt in [0, salts); the dimension side is exploded `salts`
    * times so every (key, salt) pair finds its match. Turns one hot reducer
    * into `salts` even ones at the cost of duplicating the (small) dimension
    * rows. Use when the dimension is too big to broadcast but the fact key
    * distribution is skewed. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      (spark_partition_id() * 31 + monotonically_increasing_id() % salts).cast("int") % salts)
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
