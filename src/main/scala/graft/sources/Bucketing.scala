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
    * `path`. Sorting by the key lets sort-merge joins skip the sort too. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
