package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions
import graft.operators.RuntimeFilter

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prefilter revenue: audits pass and aggregates equal the exact semi join") {
    val rows = RuntimeFilter.bloomPrefilterRevenue(tables).collect()
    assert(rows.nonEmpty, "no low-balance suppliers in the fixture?")
    rows.foreach { r =>
      assert(r.getInt(3) == 1, s"${r.getString(0)}: bloom dropped a true match")
      assert(r.getInt(4) == 1, s"${r.getString(0)}: false-positive rate above bound")
    }
    // independent exact recompute of the semi-join aggregate
    val negSupp = tables.supplier.filter($"s_acctbal" < 1500)
      .select($"s_suppkey").collect().map(_.getLong(0)).toSet
    assert(negSupp.nonEmpty)
    val expect = tables.lineitem
      .select($"l_returnflag", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .collect()
      .filter(r => negSupp(r.getLong(1)))
      .groupBy(_.getString(0))
      .map { case (rf, rs) =>
        rf -> (rs.length.toLong,
          math.round(rs.map(r => r.getDouble(2) * (1 - r.getDouble(3))).sum * 100) / 100.0)
      }
    val got = rows.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect, s"got $got expect $expect")
  }

  test("might_contain is never false-negative over every inserted key") {
    // the soundness contract directly: build over one column, probe the
    // SAME values — every probe must pass
    val keys = tables.supplier.select($"s_suppkey".as("k"))
    val n = keys.count()
    val bytes = keys
      .agg(BloomFunctions.bloomAgg(xxhash64($"k"), n, n * 10).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val misses = keys
      .filter(!BloomFunctions.mightContain(lit(bytes), xxhash64($"k")))
      .count()
    assert(misses == 0, s"$misses false negatives - the build/probe hash paths split")
  }

  test("the filter actually prunes: a disjoint key set passes only at the fp rate") {
    val keys = tables.supplier.select($"s_suppkey".as("k"))
    val n = keys.count()
    val bytes = keys
      .agg(BloomFunctions.bloomAgg(xxhash64($"k"), n, n * 10).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // keys shifted far past the supplier id range: all truly absent
    val absent = keys.select(($"k" + 1000000L).as("k"))
    val passed = absent
      .filter(BloomFunctions.mightContain(lit(bytes), xxhash64($"k")))
      .count()
    assert(passed <= math.max(2L, (n * 0.03).toLong),
      s"$passed of $n absent keys passed - filter not pruning")
  }
}
