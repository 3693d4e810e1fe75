package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew-mitigation utilities. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) handles most
  * runtime skew; these helpers cover the two shapes AQE can't fix:
  * a high-cardinality aggregation with a few hot keys, and a shuffle join
  * against a dimension where one fact key dominates.
  */
object Skew {

  /** Two-stage exact COUNT DISTINCT per key. Plain algebraic aggregates
    * (count/sum/min/max) don't need salting — map-side partial aggregation
    * already reduces a hot key to one row per upstream partition before the
    * shuffle. Distinct aggregation is where skew actually bites: a naive
    * `groupBy(key).agg(countDistinct(value))` must co-locate every
    * (key, value) pair of the hot key on one reducer. Stage 1 here
    * deduplicates on (key, value) — hash-partitioned by BOTH columns, so the
    * hot key's values spread over the whole cluster — and stage 2 counts the
    * survivors per key (now at most #distinct-values rows per key). */
  def countDistinctPerKey(df: DataFrame, key: Column, value: Column): DataFrame =
    df.select(key.as("key"), value.as("value"))
      .distinct()
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_distinct"))

  /** Salted broadcast-free join for one dominant key set: the fact side gets
    * a random salt in [0, salts); the dimension side is exploded `salts`
    * times so every (key, salt) pair finds its match. Turns one hot reducer
    * into `salts` even ones at the cost of duplicating the (small) dimension
    * rows. Use when the dimension is too big to broadcast but the fact key
    * distribution is skewed. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    // salt = hash of the WHOLE fact row: deterministic across runs/retries
    // and provably uniform across distinct rows — a partition-id/row-index
    // derivation gives hot-key rows clustered in few partitions correlated
    // salt offsets. Identical duplicate rows share a salt (acceptable: a
    // dimension join is row-wise, so co-locating identical rows is harmless).
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col): _*), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Pre-join key-skew audit — measure before you mitigate. Reports the
    * top-k heaviest join keys with each key's row count, share of all
    * rows, and cumulative share in rank order: the numbers that decide
    * between a plain shuffle join, [[saltedJoin]], a broadcast, or
    * leaving it to AQE's skew splitting.
    *
    * The only corpus-scale operation is one map-side-combined count per
    * key; the top-k then arrives via per-partition bounded heaps
    * (TakeOrderedAndProject — no global sort), the total joins on as a
    * broadcast 1-row aggregate, and the cumulative window runs over k
    * rows (partitioned on a constant: declared single-partition by
    * construction, k-bounded). The rank order (n_rows DESC, key ASC) is
    * total, so the window's running float sum is a fixed-order sequential
    * reduction — deterministic across engines. */
  def keySkewAudit(df: DataFrame, key: Column, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = df.groupBy(key.as("key")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(k)
    val share = col("n_rows").cast("double") / col("n_total").cast("double")
    top.crossJoin(broadcast(df.agg(count(lit(1)).as("n_total"))))
      .withColumn("_share", share)
      .withColumn("_cum", sum("_share").over(
        Window.partitionBy(lit(0)).orderBy(col("n_rows").desc, col("key").asc)))
      .select(col("key"), col("n_rows"),
        round(col("_share"), 6).as("share"),
        round(col("_cum"), 6).as("cum_share"))
      .orderBy(col("n_rows").desc, col("key").asc)
  }

  /** Morton bit-interleave of the low 16 bits of two long keys — the
    * Z-order curve value (public multi-dimensional clustering technique;
    * Morton 1966). Pure integer shift/mask arithmetic, identical in any
    * engine — no hash kernel needed. */
  private[graft] def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Z-order layout audit — the data-skipping case for multi-dimensional
    * clustering, measured: bucket the fact table `buckets` ways by (a)
    * the natural orderkey ranges and (b) Z-value prefix ranges over
    * (partkey, suppkey), and report each bucket's min/max span per
    * dimension. A scan filtered on EITHER key prunes a bucket whose span
    * excludes the predicate — narrow spans = skipped IO — and the Z
    * layout's spans are narrow in BOTH dimensions at once, which no
    * single-column sort achieves. Bucketing is a pure projection against
    * a broadcast 1-row max (integer scaling, no global sort — a real
    * rewrite would `repartitionByRange` on the same value); the report is
    * one hash aggregation per layout. */
  def zOrderAudit(t: Tables, buckets: Int = 32): DataFrame = {
    val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val withZ = li.withColumn("_z", zValue(col("l_partkey"), col("l_suppkey")))
    val maxes = withZ.agg(max("l_orderkey").as("_mo"), max("_z").as("_mz"))
    val spans = withZ.crossJoin(broadcast(maxes))
      .select(col("l_partkey"), col("l_suppkey"),
        // floor-then-cast on BOTH sides: DuckDB's CAST(double AS INT)
        // rounds to nearest while Spark's truncates — floor makes the
        // bucket id the same exact integer in either engine
        floor(col("l_orderkey") * buckets / (col("_mo") + 1)).cast("int").as("nat_b"),
        floor(col("_z") * buckets / (col("_mz") + 1)).cast("int").as("z_b"))
    def report(layout: String, bucketCol: String) =
      spans.groupBy(col(bucketCol).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          (max("l_partkey") - min("l_partkey") + 1).as("pk_span"),
          (max("l_suppkey") - min("l_suppkey") + 1).as("sk_span"))
        .select(lit(layout).as("layout"), col("bucket"), col("n_rows"),
          col("pk_span"), col("sk_span"))
    report("natural", "nat_b").union(report("zorder", "z_b"))
      .orderBy("layout", "bucket")
  }
}
