package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  test("split assignment is deterministic, total, and disjoint") {
    val a = Sampling.assignSplits(tables.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val b = Sampling.assignSplits(tables.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val ma = a.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mb = b.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ma == mb) // deterministic across runs
    assert(ma.size == tables.documents.count()) // total: every row assigned
    assert(ma.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("split proportions approximate the weights") {
    val counts = Sampling.assignSplits(tables.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("train") / n - 0.9) < 0.06,
      s"train fraction ${counts("train") / n}")
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
  }

  test("stratified sampling respects per-stratum fractions") {
    val fractions = Map("click" -> 0.5, "view" -> 0.2, "purchase" -> 1.0,
      "signup" -> 0.1, "error" -> 0.0)
    val sampled = Sampling.stratifiedEvents(tables, fractions)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = tables.events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!sampled.contains("error")) // fraction 0 → stratum excluded
    assert(sampled("purchase") == totals("purchase")) // fraction 1 → all rows
    val clickFrac = sampled("click").toDouble / totals("click")
    assert(math.abs(clickFrac - 0.5) < 0.15, s"click fraction $clickFrac")
  }

  test("sampling is a narrow plan (no shuffle)") {
    val plan = planOf(Sampling.stratifiedEvents(tables, Map("click" -> 0.5)))
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}
