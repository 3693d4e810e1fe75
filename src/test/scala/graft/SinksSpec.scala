package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks

class SinksSpec extends SparkSpec {

  private val base = "target/test-sinks"

  test("parquet sink roundtrips with hive-style partitioning") {
    val df = tables.nation
    Sinks.write(df, s"$base/nation_part",
      Sinks.WriteSpec(partitionBy = Seq("n_regionkey")))
    val back = spark.read.parquet(s"$base/nation_part")
    assert(back.count() == 25)
    // partition pruning: reading one region dir touches a subset
    val one = spark.read.parquet(s"$base/nation_part")
      .filter(col("n_regionkey") === 0)
    assert(one.count() == df.filter(col("n_regionkey") === 0).count())
    val dirs = new java.io.File(s"$base/nation_part").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("n_regionkey=")) == 5)
  }

  test("partition filters prune at the scan, not post-read (plan-asserted)") {
    // the 100 TB behavior partitioned layouts exist for: a filter on the
    // partition column must reach the scan as a PartitionFilter (directory
    // pruning — 1 of 5 dirs read), not as a row-level post-filter
    Sinks.write(tables.nation, s"$base/nation_prune",
      Sinks.WriteSpec(partitionBy = Seq("n_regionkey")))
    val one = spark.read.parquet(s"$base/nation_prune")
      .filter(col("n_regionkey") === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("n_regionkey"), s"no partition filter at the scan:\n$plan")
    // structural check: the scan SELECTS one of the five hive partitions
    // (inputFiles would lie here — it reports the relation pre-pruning)
    val scans = one.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"no file scan in plan:\n$plan")
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scans.head.selectedPartitions.partitionCount}")
  }

  test("csv sink roundtrips with header") {
    val df = tables.region
    Sinks.writeCsv(df, s"$base/region_csv")
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$base/region_csv")
    assert(back.count() == 5)
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("json sink roundtrips values") {
    val df = tables.region
    Sinks.writeJson(df, s"$base/region_json")
    val back = spark.read.json(s"$base/region_json")
    assert(back.select("r_regionkey", "r_name").collect().map(_.toSeq.toList).toSet ==
      df.collect().map(r => List(r.getInt(0).toLong, r.getString(1))).toSet)
  }

  test("numFiles + repartitionKeys control the file layout") {
    Sinks.write(tables.orders, s"$base/orders_4",
      Sinks.WriteSpec(numFiles = Some(4), repartitionKeys = Seq("o_custkey")))
    val files = new java.io.File(s"$base/orders_4").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
  }
}
