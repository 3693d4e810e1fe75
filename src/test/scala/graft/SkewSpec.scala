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

  test("zOrderAudit: z-value interleave is exact; spans match a recompute; z-layout narrows both dims") {
    // bit-interleave recompute on a few keys
    def mz(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val zdf = tables.lineitem.select(col("l_partkey"), col("l_suppkey"),
      Skew.zValue(col("l_partkey"), col("l_suppkey")).as("z")).limit(50).collect()
    zdf.foreach(r => assert(r.getLong(2) == mz(r.getLong(0), r.getLong(1))))
    // span report equals a driver-side recompute
    val li = tables.lineitem.select("l_orderkey", "l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mo = li.map(_._1).max; val mzv = li.map(t => mz(t._2, t._3)).max
    def spans(bucketOf: ((Long, Long, Long)) => Int) =
      li.groupBy(bucketOf).map { case (b, rs) =>
        b -> (rs.length.toLong, rs.map(_._2).max - rs.map(_._2).min + 1,
          rs.map(_._3).max - rs.map(_._3).min + 1)
      }
    val nat = spans(t => math.floor(t._1 * 32.0 / (mo + 1)).toInt)
    val zo = spans(t => math.floor(mz(t._2, t._3) * 32.0 / (mzv + 1)).toInt)
    val got = Skew.zOrderAudit(tables).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    nat.foreach { case (b, e) => assert(got(("natural", b)) == e, s"nat $b") }
    zo.foreach { case (b, e) => assert(got(("zorder", b)) == e, s"z $b") }
    // the clustering claim itself: mean spans narrow in BOTH dimensions
    def meanPk(l: String) = { val xs = got.filter(_._1._1 == l).values; xs.map(_._2).sum.toDouble / xs.size }
    def meanSk(l: String) = { val xs = got.filter(_._1._1 == l).values; xs.map(_._3).sum.toDouble / xs.size }
    assert(meanPk("zorder") < meanPk("natural") * 0.5, s"${meanPk("zorder")} vs ${meanPk("natural")}")
    assert(meanSk("zorder") <= meanSk("natural"), s"${meanSk("zorder")} vs ${meanSk("natural")}")
  }
}
