package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Parquet-backed table catalog.
  *
  * The reference engine loads CSV tables enumerated by a metadata file
  * (ref:public-surface — the `/root/reference` checkout is empty, see
  * SURVEY.md §1; capability reconstructed from the public repo surface).
  * The Spark-native equivalent is a columnar parquet scan per table: Catalyst
  * gets predicate pushdown, column pruning and partition pruning for free,
  * which is the scan behavior we want at 100 TB.
  */
final case class Tables(spark: SparkSession, dir: String,
                        overrides: Map[String, DataFrame] = Map.empty) {
  /** Resolve a table: an injected override wins, else the parquet scan.
    * Overrides let callers (and tests) substitute any source that yields the
    * same schema — the operators only see DataFrames. */
  def table(name: String): DataFrame =
    overrides.getOrElse(name, spark.read.parquet(s"$dir/$name.parquet"))

  /** A copy of this catalog with one table substituted. */
  def withTable(name: String, df: DataFrame): Tables =
    copy(overrides = overrides + (name -> df))

  /** Resolve a table through its typed accessor (so per-table handling like
    * the events nanos conversion applies) — use this, not [[table]], when
    * resolving by name generically. */
  def resolved(name: String): DataFrame = name match {
    case "events" => events
    case n => table(n)
  }

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  /** The events parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read it as raw nanos (legacy conf) and
    * convert to a proper TimestampType (µs) with integer division — double
    * division would lose precision above 2^53.
    *
    * Note: the nanosAsLong conf is session-level and must stay set while the
    * returned plan is alive (the scan re-reads it at execution), so it is
    * NOT restored here. Other nanos-timestamp parquet reads in the same
    * session will also see longs — acceptable for this engine's sessions,
    * surprising if the catalog is mixed into a foreign session. */
  def events: DataFrame = {
    if (!overrides.contains("events"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** All table names this catalog serves (mirrors the reference's metadata
    * file listing). */
  def names: Seq[String] = Tables.names
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
