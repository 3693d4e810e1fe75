package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCount equals a plain count per key under heavy skew") {
    // one hot key with 90% of rows
    val df = spark.range(0, 10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(999L)).as("k"))
    val got = Skew.saltedCount(df, col("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got(999L) == 9000L)
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
}
