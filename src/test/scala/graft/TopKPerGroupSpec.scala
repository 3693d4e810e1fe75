package graft

import org.apache.spark.sql.functions._
import graft.plans.{TopK, TopKPerGroupExec}

class TopKPerGroupSpec extends SparkSpec {

  private def run(k: Int) = TopK.perGroup(
    tables.lineitem,
    Seq("l_returnflag"),
    Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
    k)

  test("rank-emitting mode matches the row_number window formulation exactly") {
    val ranked = TopK.perGroup(
      tables.lineitem.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
      Seq("l_returnflag"),
      Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
      3, rankCol = Some("rnk"))
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("l_orderkey"),
        r.getAs[Int]("l_linenumber"), r.getAs[Int]("rnk"))).toSet
    val window = graft.operators.Analytics.windowTopK(tables, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getAs[Int]("rnk"))).toSet
    assert(ranked == window, s"diff: ${ranked.diff(window)} / ${window.diff(ranked)}")
  }

  test("rank column name collision is rejected") {
    intercept[IllegalArgumentException] {
      TopK.perGroup(tables.lineitem, Seq("l_returnflag"),
        Seq(col("l_extendedprice").desc), 3, rankCol = Some("l_orderkey"))
    }
  }

  test("custom operator result equals the window-based top-k") {
    val got = run(3).collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("l_orderkey"),
        r.getAs[Int]("l_linenumber"))).toSet
    val want = graft.operators.Analytics.windowTopK(tables, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want, s"diff: ${got.diff(want)} / ${want.diff(got)}")
  }

  test("within-group order is the requested order") {
    val rows = run(5).collect()
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (_, rs) =>
      val prices = rs.map(_.getAs[Double]("l_extendedprice"))
      assert(prices.sameElements(prices.sortBy(-_)))
      assert(rs.length == 5)
    }
  }

  test("plan contains the custom exec pair (partial + final), no Window, no global Sort") {
    val plan = run(3).queryExecution.executedPlan.toString()
    // nodeName strips the Exec suffix in plan strings
    assert("TopKPerGroup ".r.findAllIn(plan).length >= 2, s"missing exec pair:\n$plan")
    assert(!plan.contains("Window"), s"fell back to window:\n$plan")
    assert(!plan.contains("Sort "), s"global sort crept in:\n$plan")
    assert(plan.contains("Exchange"), s"no group-key shuffle:\n$plan")
  }

  test("k larger than group size returns whole groups") {
    val got = TopK.perGroup(tables.nation, Seq("n_regionkey"), Seq(col("n_nationkey").asc), 100)
    assert(got.count() == 25)
  }

  test("physical operator composes with downstream transformations") {
    val agg = run(3).groupBy("l_returnflag").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg.values.forall(_ == 3) && agg.size == 3)
    val _ = TopKPerGroupExec // touch the symbol so an import regression fails here
  }
}
