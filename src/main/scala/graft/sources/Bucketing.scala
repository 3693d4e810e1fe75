package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout: pre-shuffle a table ONCE into hash buckets on its
  * join key so every subsequent join/aggregation on that key runs with zero
  * exchange — the classic amortization for fact tables that are joined
  * constantly (lineitem⋈orders on orderkey at 100 TB).
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`); both sides
  * of a join must agree on key and bucket count for the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) catalog table at
    * `path`. The input is repartitioned on the key to exactly `buckets`
    * partitions first: without it every input task writes its own file per
    * bucket (tasks × buckets small files), and Spark only trusts the
    * in-bucket sort — letting sort-merge joins skip their Sort — when each
    * bucket is a single file. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.repartition(buckets, df.col(key))
      .write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
