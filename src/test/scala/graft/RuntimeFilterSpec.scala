package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the scan-reduction lever for
  * selective shuffle joins at cluster scale.
  *
  * When a join's build side is filtered hard (here: urgent, high-value
  * orders) and the probe side is a large fact scan, Spark's
  * InjectRuntimeFilter plants a `bloom_filter_agg` over the build side's
  * join keys and a `might_contain` predicate on the fact side, discarding
  * non-joining fact rows BEFORE the shuffle. At 100 TB this is the
  * difference between shuffling the whole lineitem table and shuffling the
  * ~1% that can actually join. The feature is on by default
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); its size
  * thresholds (`applicationSideScanSizeThreshold` 10 GB default) are what
  * keep it out of toy-scale plans, so the spec lowers them to observe the
  * cluster-scale plan shape locally.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def selectiveJoin(t: graft.sources.Tables) =
    t.lineitem
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 400000),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")

  test("a selective shuffle join gets a bloom might_contain on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ (the 100 TB shape)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      val plan = selectiveJoin(tables).queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg"), s"no bloom build:\n$plan")
      assert(plan.contains("might_contain"), s"no bloom probe:\n$plan")
      // and the pruned plan returns exactly what the unfiltered plan does
      val withBloom = selectiveJoin(tables).collect().toSeq
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10GB")
      val without = selectiveJoin(tables).collect().toSeq
      assert(withBloom == without && withBloom.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
