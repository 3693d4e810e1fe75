package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingestion — the de-facto interchange format for LLM
  * training corpora (one JSON document per line).
  *
  * Implemented over the `text` source + `from_json` rather than
  * `spark.read.json`: the parse is identical (same Jackson path, PERMISSIVE
  * with a corrupt-record field), but the corrupt channel becomes an
  * ORDINARY column — the raw-file reader forbids queries that touch only
  * its internal `_corrupt_record` column, which is exactly what a
  * quarantine stream does. Text files split by byte range, so the read
  * parallelizes like any line-oriented source.
  *
  * Scale notes:
  *  - ALWAYS pass an explicit schema: inference is a full extra pass at
  *    100 TB, and drifting inferred types silently change semantics.
  *  - PERMISSIVE + quarantine beats FAILFAST (web-scale JSONL always has
  *    broken lines) and DROPMALFORMED (silent data loss) for pipelines.
  */
object JsonlCorpus {

  val CorruptCol = "_corrupt_record"

  /** Read a JSONL directory with an explicit schema. Output columns are the
    * schema's plus [[CorruptCol]], which holds the raw line for malformed
    * records (null for clean ones). Blank lines are skipped. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"JsonlCorpus.read: schema must not already contain '$CorruptCol' — " +
        "the reader adds it as the quarantine channel")
    val withCorrupt = schema.add(CorruptCol, "string")
    spark.read.text(dir)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("_r"))
      .select(col("_r.*"))
  }

  /** The well-formed rows, corrupt column dropped. */
  def clean(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine stream: raw text of every malformed line. */
  def corrupt(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
}
