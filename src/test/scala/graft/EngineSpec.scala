package graft

import java.nio.file.{Files, Paths}

import graft.sources.CsvMetadataSource
import org.apache.spark.sql.functions.col

/** The reference's user API surface: SQL text over a loaded table directory
  * (parquet catalog via [[Engine]], or the reference's own CSV+metadata
  * format via [[CsvMetadataSource]]). */
class EngineSpec extends SparkSpec {

  lazy val engine: Engine = Engine(spark, sfDir)

  test("a partial data directory still serves the tables it has") {
    val dir = Files.createTempDirectory("graft_partial_")
    for (t <- Seq("nation", "region"))
      Files.copy(Paths.get(s"$sfDir/$t.parquet"), dir.resolve(s"$t.parquet"))
    // engine construction must NOT throw on the 8 missing tables
    val partial = Engine(spark, dir.toString)
    assert(partial.sql("SELECT count(*) AS n FROM nation").head().getLong(0) == 25)
    assert(partial.sql(
      "SELECT n_name FROM nation, region WHERE n_regionkey = r_regionkey").count() == 25)
    // re-register the full catalog for the other suites sharing this session
    engine.register()
  }

  test("engine runs the reference's whole query grammar") {
    // SELECT * / projection / WHERE with AND-OR / aggregate / GROUP BY /
    // ORDER BY / DISTINCT / multi-table equality join — one of each
    assert(engine.sql("SELECT * FROM region").count() == 5)
    assert(engine.sql("SELECT n_name FROM nation").columns.toSeq == Seq("n_name"))
    assert(engine.sql(
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 10 AND l_discount > 0.05"
    ).head().getLong(0) > 0)
    assert(engine.sql("SELECT DISTINCT l_returnflag FROM lineitem").count() == 3)
    val grouped = engine.sql(
      "SELECT l_returnflag, MAX(l_quantity) AS mx FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    assert(grouped.collect().map(_.getDouble(1)).forall(_ <= 50.0))
    val joined = engine.sql(
      "SELECT n_name, r_name FROM nation, region WHERE n_regionkey = r_regionkey ORDER BY n_name")
    assert(joined.count() == 25)
  }

  test("CSV+metadata source parses the reference's metadata format and reads tables") {
    val dir = Files.createDirectories(Paths.get("target/test-csv-src"))
    Files.writeString(dir.resolve("metadata.txt"),
      """<begin_table>
        |t1
        |A
        |B
        |<end_table>
        |<begin_table>
        |t2
        |B
        |C
        |<end_table>
        |""".stripMargin)
    Files.writeString(dir.resolve("t1.csv"), "1,2\n3,4\n")
    Files.writeString(dir.resolve("t2.csv"), "\"2\",\"20\"\n\"4\",\"40\"\n")
    val loaded = CsvMetadataSource.loadAll(spark, dir.toString)
    assert(loaded.keySet == Set("t1", "t2"))
    assert(loaded("t1").columns.toSeq == Seq("A", "B"))
    // the reference's join query works over the loaded views
    val j = spark.sql("SELECT A, C FROM t1, t2 WHERE t1.B = t2.B ORDER BY A").collect()
    assert(j.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 20), (3, 40)))
  }

  test("RefCsvSourceV2: schema inference, lossless read, and column pruning") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("refcsv_v2_spec").toString
    Files.write(Paths.get(dir, "metadata.txt"),
      "<begin_table>\nt1\na\nb\nc\n<end_table>\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "t1.csv"),
      "1,10,100\n2,20,200\n3,30,300\n".getBytes("UTF-8"))
    val df = spark.read.format("graft.sources.RefCsvSourceV2")
      .option("path", dir).option("table", "t1").load()
    assert(df.schema.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.IntegerType))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows == Set((1, 10, 100), (2, 20, 200), (3, 30, 300)))
    // column pruning reaches the connector: the scan's read schema is the
    // projection, not the full table
    val pruned = df.select("b")
    val plan = planOf(pruned)
    assert(plan.contains("BatchScan"), plan)
    assert(plan.contains("read=b") || plan.toLowerCase.contains("readschema: struct<b:int>"),
      s"pruning not visible in scan:\n$plan")
    assert(pruned.collect().map(_.getInt(0)).toSet == Set(10, 20, 30))
  }

  test("RefCsvSourceV2: predicate pushdown reaches the scan and filters exactly") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("refcsv_v2_pd").toString
    Files.write(Paths.get(dir, "metadata.txt"),
      "<begin_table>\nt1\na\nb\nc\n<end_table>\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "t1.csv"),
      "1,10,100\n2,20,200\n3,30,300\n4,40,400\n".getBytes("UTF-8"))
    val df = spark.read.format("graft.sources.RefCsvSourceV2")
      .option("path", dir).option("table", "t1").load()
    val filtered = df.filter(col("b") > 10 && col("a") =!= 4).select("c")
    val plan = planOf(filtered)
    assert(plan.contains("PushedFilters") && plan.contains("b"),
      s"predicate pushdown not visible in scan:\n$plan")
    assert(filtered.collect().map(_.getInt(0)).toSet == Set(200, 300))
    // IN-list and equality shapes
    val in = df.filter(col("a").isin(1, 3)).select("b")
    assert(in.collect().map(_.getInt(0)).toSet == Set(10, 30))
    // unpushable residue (e.g. arithmetic) still evaluates correctly above
    val resid = df.filter(col("b") % 20 === 0)
    assert(resid.collect().map(_.getInt(0)).toSet == Set(2, 4))
  }

  test("RefCsvSourceV2: malformed rows and missing columns fail with file/line context") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("refcsv_v2_err").toString
    Files.write(Paths.get(dir, "metadata.txt"),
      "<begin_table>\nt1\na\nb\n<end_table>\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "t1.csv"),
      "1,10\n2,oops\n".getBytes("UTF-8"))
    val df = spark.read.format("graft.sources.RefCsvSourceV2")
      .option("path", dir).option("table", "t1").load()
    val e = intercept[org.apache.spark.SparkException] { df.collect() }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("t1.csv") && msg.contains("oops"), s"no context in: $msg")
  }
}
