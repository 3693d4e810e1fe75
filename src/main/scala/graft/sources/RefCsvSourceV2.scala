package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
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
  * over two of ten columns parses only those fields per line) and
  * PREDICATE PUSHDOWN (`SupportsPushDownFilters` — integer
  * comparison/IN/AND filters are evaluated inside the line reader before
  * row materialization, the same scan hygiene parquet gets), and one
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Integer comparison/IN filters are evaluated EXACTLY inside the line
    * reader (parse the filtered field, compare, skip the row before any
    * other work), so they are fully consumed here: only untranslatable
    * residue comes back as a post-scan filter. IsNotNull is vacuously true
    * (every column is a non-nullable int in this format). */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (sup, unsup) = filters.partition(RefCsvFilters.supported(full.fieldNames, _))
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[sources.Filter] = pushed
  override def build(): Scan = new RefCsvScan(csvPath, full, required, pushed)
}

/** Translation of the pushable V2 filter subset into per-line predicates
  * over the split CSV fields. */
private[sources] object RefCsvFilters {
  def supported(cols: Array[String], f: sources.Filter): Boolean = f match {
    case sources.EqualTo(c, v: Int) => cols.contains(c)
    case sources.GreaterThan(c, v: Int) => cols.contains(c)
    case sources.GreaterThanOrEqual(c, v: Int) => cols.contains(c)
    case sources.LessThan(c, v: Int) => cols.contains(c)
    case sources.LessThanOrEqual(c, v: Int) => cols.contains(c)
    case sources.In(c, vs) => cols.contains(c) && vs.forall(_.isInstanceOf[Int])
    case sources.IsNotNull(c) => cols.contains(c)
    case sources.And(l, r) => supported(cols, l) && supported(cols, r)
    case _ => false
  }
  /** (field index → parsed int) predicate for one pushed filter. */
  def predicate(cols: Array[String], f: sources.Filter): (Array[String] => Boolean) = {
    def at(c: String): Int = cols.indexOf(c)
    def iv(parts: Array[String], i: Int): Int = parts(i).trim.toInt
    f match {
      case sources.EqualTo(c, v: Int) => val i = at(c); p => iv(p, i) == v
      case sources.GreaterThan(c, v: Int) => val i = at(c); p => iv(p, i) > v
      case sources.GreaterThanOrEqual(c, v: Int) => val i = at(c); p => iv(p, i) >= v
      case sources.LessThan(c, v: Int) => val i = at(c); p => iv(p, i) < v
      case sources.LessThanOrEqual(c, v: Int) => val i = at(c); p => iv(p, i) <= v
      case sources.In(c, vs) =>
        val i = at(c); val set = vs.collect { case v: Int => v }.toSet
        p => set.contains(iv(p, i))
      case sources.IsNotNull(_) => _ => true
      case sources.And(l, r) =>
        val pl = predicate(cols, l); val pr = predicate(cols, r)
        p => pl(p) && pr(p)
      case other => throw new IllegalStateException(
        s"refcsv: unsupported pushed filter $other") // guarded by supported()
    }
  }
}

private[sources] class RefCsvScan(csvPath: String, full: StructType,
                                  required: StructType,
                                  pushed: Array[sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RefCsvScan($csvPath, read=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters: [${pushed.mkString(", ")}])"
  override def planInputPartitions(): Array[InputPartition] =
    Array(RefCsvPartition(csvPath))
  override def createReaderFactory(): PartitionReaderFactory =
    new RefCsvReaderFactory(full.fieldNames, required.fieldNames, pushed)
}

private[sources] case class RefCsvPartition(path: String) extends InputPartition

private[sources] class RefCsvReaderFactory(allCols: Array[String],
                                           requiredCols: Array[String],
                                           pushed: Array[sources.Filter])
    extends PartitionReaderFactory {
  // fail at PLANNING time with the column names, not mid-task with a bare
  // ArrayIndexOutOfBounds: a required column absent from the metadata is a
  // caller/metadata mismatch, and -1 indices must never reach the reader
  {
    val missing = requiredCols.filterNot(allCols.contains)
    require(missing.isEmpty,
      s"refcsv: required column(s) ${missing.mkString(", ")} not in metadata " +
        s"columns [${allCols.mkString(", ")}]")
  }
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[RefCsvPartition].path
    // required-column indices into the CSV line — the pruning payoff: a
    // projection touches only its fields
    val idx = requiredCols.map(c => allCols.indexOf(c))
    val preds = pushed.map(RefCsvFilters.predicate(allCols, _))
    new PartitionReader[InternalRow] {
      private val reader = java.nio.file.Files.newBufferedReader(
        java.nio.file.Paths.get(path))
      private var line: String = _
      private var lineNo = 0
      private def parseContext[A](body: => A): A =
        try body catch {
          case e: RuntimeException =>
            throw new IllegalStateException(
              s"refcsv: bad row at $path:$lineNo: '$line' (${e.getMessage})", e)
        }
      override def next(): Boolean = {
        var found = false
        while (!found) {
          line = reader.readLine(); lineNo += 1
          while (line != null && line.trim.isEmpty) { line = reader.readLine(); lineNo += 1 }
          if (line == null) return false
          // pushed filters run here, BEFORE row materialization: a
          // non-matching line is skipped at parse time
          val parts = line.split(",", -1)
          found = parseContext(preds.forall(_(parts)))
        }
        true
      }
      override def get(): InternalRow = parseContext {
        val parts = line.split(",", -1)
        new GenericInternalRow(
          idx.map(i => parts(i).trim.toInt.asInstanceOf[Any]))
      }
      override def close(): Unit = reader.close()
    }
  }
}
