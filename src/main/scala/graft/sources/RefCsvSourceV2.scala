package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 reader for the reference engine's table format — a
  * directory holding `metadata.txt` (the `<begin_table>` block list parsed
  * by [[CsvMetadataSource.parseMetadata]]) plus one `<table>.csv` of
  * integer columns per table. Usage:
  *
  * {{{
  * spark.read.format("graft.sources.RefCsvSourceV2")
  *   .option("path", dir).option("table", "t1").load()
  * }}}
  *
  * This is the connector-API counterpart of the [[CsvMetadataSource]]
  * loader: schema inference from the metadata file, a real `ScanBuilder`
  * with COLUMN PRUNING (`SupportsPushDownRequiredColumns` — a projection
  * over two of ten columns parses only those fields per line), and one
  * `InputPartition` per data file. The reference format keeps whole tables
  * in single small CSVs, so per-file partitioning is the honest split; a
  * byte-range splitter would be the next step for large files, and
  * everything downstream of [[RefCsvPartitionReader]] would be unchanged. */
class RefCsvSourceV2 extends TableProvider {

  private def metaFor(options: CaseInsensitiveStringMap): CsvMetadataSource.TableMeta = {
    val dir = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("refcsv: 'path' option required"))
    val table = Option(options.get("table"))
      .getOrElse(throw new IllegalArgumentException("refcsv: 'table' option required"))
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "metadata.txt")), "UTF-8")
    CsvMetadataSource.parseMetadata(text)
      .find(_.name == table)
      .getOrElse(throw new IllegalArgumentException(
        s"refcsv: table '$table' not in $dir/metadata.txt"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(metaFor(options).columns.map(c =>
      StructField(c, IntegerType, nullable = false)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new RefCsvTable(opts.get("path"), opts.get("table"), schema)
  }

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class RefCsvTable(dir: String, table: String,
                                   fullSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"refcsv:$dir/$table"
  override def schema(): StructType = fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RefCsvScanBuilder(s"$dir/$table.csv", fullSchema)
}

private[sources] class RefCsvScanBuilder(csvPath: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RefCsvScan(csvPath, full, required)
}

private[sources] class RefCsvScan(csvPath: String, full: StructType,
                                  required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RefCsvScan($csvPath, read=${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(RefCsvPartition(csvPath))
  override def createReaderFactory(): PartitionReaderFactory =
    new RefCsvReaderFactory(full.fieldNames, required.fieldNames)
}

private[sources] case class RefCsvPartition(path: String) extends InputPartition

private[sources] class RefCsvReaderFactory(allCols: Array[String],
                                           requiredCols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[RefCsvPartition].path
    // required-column indices into the CSV line — the pruning payoff: a
    // projection touches only its fields
    val idx = requiredCols.map(c => allCols.indexOf(c))
    new PartitionReader[InternalRow] {
      private val reader = java.nio.file.Files.newBufferedReader(
        java.nio.file.Paths.get(path))
      private var line: String = _
      override def next(): Boolean = {
        line = reader.readLine()
        while (line != null && line.trim.isEmpty) line = reader.readLine()
        line != null
      }
      override def get(): InternalRow = {
        val parts = line.split(",", -1)
        new GenericInternalRow(
          idx.map(i => parts(i).trim.toInt.asInstanceOf[Any]))
      }
      override def close(): Unit = reader.close()
    }
  }
}
