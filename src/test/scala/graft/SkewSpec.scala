package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("countDistinctPerKey equals a plain countDistinct under heavy skew") {
    // one hot key with 90% of rows and many distinct values
    val df = spark.range(0, 10000)
      .select(
        when($"id" % 10 === 0, $"id" % 7).otherwise(lit(999L)).as("k"),
        ($"id" % 500).as("v"))
    val got = Skew.countDistinctPerKey(df, col("k"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy("k").agg(countDistinct("v").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // v % 10 == 0 values only occur on ids divisible by 10, which route to
    // the non-hot keys: 500 - 50 = 450 distinct values reach key 999
    assert(got(999L) == 450L)
    // the stage-1 exchange spreads on (key, value), not key alone
    val plan = planOf(Skew.countDistinctPerKey(df, col("k"), col("v")))
    assert(plan.contains("hashpartitioning(key") && plan.contains("value"),
      s"stage-1 not partitioned by both columns:\n$plan")
  }

  test("saltedJoin matches a plain join result under skew") {
    val fact = spark.range(0, 5000)
      .select((when($"id" % 5 === 0, $"id" % 3).otherwise(lit(2L))).as("k"), $"id".as("v"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val got = Skew.saltedJoin(fact, dim, "k").select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = fact.join(dim, "k").select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("saltedJoin spreads a hot key's rows (near-)uniformly across salts") {
    // one key carries ALL rows — the worst case the salt exists for
    val salts = 16
    val fact = spark.range(0, 10000).select(lit(7L).as("k"), $"id".as("v"))
    val perSalt = fact
      .withColumn("_salt", pmod(hash(fact.columns.map(col): _*), lit(salts)))
      .groupBy("_salt").count().collect().map(r => r.getLong(1))
    assert(perSalt.length == salts, s"only ${perSalt.length} salts used")
    val spread = perSalt.max.toDouble / perSalt.min
    assert(spread < 2.0, s"per-salt row counts too skewed (${spread}x): ${perSalt.toList}")
  }

  test("keySkewAudit reports top-k key counts, shares, and cumulative share") {
    val k = 7
    val got = Skew.keySkewAudit(tables.events, col("user_id"), k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val counts = tables.events.select("user_id").collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.length.toLong }
    val total = counts.values.sum.toDouble
    val top = counts.toSeq.sortBy { case (u, n) => (-n, u) }.take(k)
    var cum = 0.0
    val expected = top.map { case (u, n) =>
      cum += n / total
      (u, n, math.round(n / total * 1e6) / 1e6, math.round(cum * 1e6) / 1e6)
    }
    assert(got.toSeq == expected && got.length == k)
  }

  test("keySkewAudit plans per-partition heaps, not a global sort of all keys") {
    val plan = planOf(Skew.keySkewAudit(tables.events, col("user_id"), 20))
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    // partial aggregation runs map-side before the key shuffle
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"no map-side combine:\n$plan")
  }
}
