package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Reference-parity CSV source: the reference engine reads tables from
  * `<table>.csv` files whose schemas are declared in a single metadata file of
  * the form (ref:public-surface — checkout empty, see SURVEY.md §1):
  *
  * {{{
  * <begin_table>
  * table1
  * A
  * B
  * <end_table>
  * <begin_table>
  * table2
  * ...
  * }}}
  *
  * All reference columns are integers. This loader parses that metadata format
  * and returns Spark DataFrames backed by the distributed CSV reader, so a
  * user of the reference can point their existing data directory at this
  * engine unchanged. (The driver's testdata is parquet — see [[Tables]] — this
  * source exists for reference-format compatibility.)
  */
object CsvMetadataSource {

  final case class TableMeta(name: String, columns: Seq[String])

  /** Parse the reference's `metadata.txt` format. Tolerates surrounding
    * whitespace and blank lines. */
  def parseMetadata(text: String): Seq[TableMeta] = {
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toList
    val out = Seq.newBuilder[TableMeta]
    var cur: List[String] = Nil
    var inTable = false
    lines.foreach {
      case "<begin_table>" => inTable = true; cur = Nil
      case "<end_table>" =>
        inTable = false
        cur.reverse match {
          case name :: cols if cols.nonEmpty => out += TableMeta(name, cols)
          case _ => // malformed block: skip (reference errors; we are lenient)
        }
      case line if inTable => cur = line :: cur
      case _ => // text outside blocks is ignored
    }
    out.result()
  }

  /** Load one table: `dir/<name>.csv` with the metadata-declared integer
    * columns. Headerless, like the reference's data files. */
  def loadTable(spark: SparkSession, dir: String, meta: TableMeta): DataFrame = {
    val schema = StructType(meta.columns.map(c => StructField(c, IntegerType, nullable = true)))
    spark.read
      .schema(schema)
      .option("header", "false")
      // reference CSV values may be quoted integers ("123")
      .option("quote", "\"")
      .csv(s"$dir/${meta.name}.csv")
  }

  /** Write DataFrames of integer columns as a reference-format data
    * directory: headerless `<name>.csv` per table (a directory of part
    * files — the loader's distributed reader takes either) plus one
    * `metadata.txt` declaring every table's columns. Round-trips through
    * [[loadAll]]; the inverse of the reference's on-disk layout. */
  def writeTables(dir: String, tables: Seq[(String, DataFrame)]): Unit = {
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").option("header", "false").csv(s"$dir/$name.csv")
    }
    val meta = tables.map { case (name, df) =>
      (s"<begin_table>" +: name +: df.columns.toSeq :+ "<end_table>").mkString("\n")
    }.mkString("", "\n", "\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "metadata.txt"),
      meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load every table declared in `dir/metadata.txt` and register each as a
    * temp view so `spark.sql` serves the reference's full query surface. */
  def loadAll(spark: SparkSession, dir: String,
              metadataFile: String = "metadata.txt"): Map[String, DataFrame] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, metadataFile)),
      java.nio.charset.StandardCharsets.UTF_8)
    parseMetadata(text).map { m =>
      val df = loadTable(spark, dir, m)
      df.createOrReplaceTempView(m.name)
      m.name -> df
    }.toMap
  }
}
