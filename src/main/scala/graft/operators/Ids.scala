package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global ID assignment for training-data pipelines.
  *
  * `monotonically_increasing_id` is cheap but leaves ~2^33-sized gaps
  * between partitions; many downstream consumers (shard writers, sample
  * indices, embedding tables) need CONTIGUOUS ids. The standard distributed
  * two-pass does it without a global sort:
  *
  *  pass 1: per-partition row counts (tiny — one long per partition)
  *  pass 2: each partition adds its exclusive-prefix-sum offset to a local
  *          counter (narrow, no shuffle)
  *
  * Ordering is partition-then-position — stable for a given input
  * partitioning but NOT a semantic order; pair with a sort first if rank
  * order matters.
  */
object Ids {

  /** Add a contiguous 0-based `id` column. Two jobs (`zipWithIndex` runs the
    * partition-count pass internally), zero shuffles. One of the rare
    * justified RDD drops: the per-partition offset arithmetic has no
    * declarative equivalent that avoids a shuffle.
    *
    * Stability caveat: ids follow partition-then-position order, which is
    * only reproducible when the upstream plan is deterministic (a scan, or
    * scan+narrow ops). If `df` contains a shuffle, fetch order makes the
    * row→id mapping vary across runs/retries — sort first, or use
    * [[hashIds]], when the mapping itself must be reproducible. */
  def contiguousIds(df: DataFrame, idCol: String = "id"): DataFrame = {
    require(!df.columns.contains(idCol),
      s"contiguousIds: column '$idCol' already exists in ${df.columns.mkString(", ")}")
    val spark = df.sparkSession
    val schema = df.schema.add(idCol, org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Deterministic content-derived id: 64-bit hash of a key column — the
    * shuffle-free alternative when ids only need to be stable and unique
    * with overwhelming probability (collision odds n^2/2^65). */
  def hashIds(df: DataFrame, key: Column, idCol: String = "id"): DataFrame =
    df.withColumn(idCol, xxhash64(key))
}
