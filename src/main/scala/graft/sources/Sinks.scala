package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks. The reference prints result rows to stdout; the engine's
  * equivalents are distributed file sinks (parquet/csv/json) with optional
  * hash-bucketed layout control.
  *
  * Scale notes: `partitionBy` gives hive-style directory partitioning for
  * downstream partition pruning; `repartition(n, keys)` before a write
  * controls file count and co-locates rows that will later be joined on
  * `keys` (a poor man's bucketing that works on any filesystem — real
  * bucketing via `bucketBy` needs a metastore table).
  */
object Sinks {

  final case class WriteSpec(
      format: String = "parquet", // parquet | csv | json
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil, // hive-style directory partitioning
      repartitionKeys: Seq[String] = Nil, // co-location / file-count control
      numFiles: Option[Int] = None,
      options: Map[String, String] = Map.empty)

  def write(df: DataFrame, path: String, spec: WriteSpec = WriteSpec()): Unit = {
    val arranged = (spec.numFiles, spec.repartitionKeys) match {
      case (Some(n), keys) if keys.nonEmpty =>
        df.repartition(n, keys.map(df.col): _*)
      case (Some(n), _) => df.repartition(n)
      case (None, keys) if keys.nonEmpty => df.repartition(keys.map(df.col): _*)
      case _ => df
    }
    val w = arranged.write.format(spec.format).mode(spec.mode).options(spec.options)
    (if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w)
      .save(path)
  }

  /** CSV with header — the reference's table interchange format. */
  def writeCsv(df: DataFrame, path: String): Unit =
    write(df, path, WriteSpec(format = "csv", options = Map("header" -> "true")))

  /** Line-delimited JSON. */
  def writeJson(df: DataFrame, path: String): Unit =
    write(df, path, WriteSpec(format = "json"))
}
