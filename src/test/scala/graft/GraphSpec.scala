package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {

  test("pageRank conserves rank mass over the undirected trade graph") {
    val rows = Graph.pageRank(tables).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n = rows.length
    assert(n > 0)
    assert(rows.forall(_._2 > 0.0))
    // undirected edges → no dangling mass: ranks sum to 1, so rank·n sums
    // to n (up to the per-row round(6))
    assert(math.abs(rows.map(_._2).sum - n) < 1e-3 * n)
  }

  test("pageRank matches a driver-side recompute of the same fixed iteration") {
    val got = Graph.pageRank(tables).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val om = tables.orders.select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = tables.lineitem.select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => om.get(r.getLong(0)).map(ck => (s"s${r.getLong(1)}", s"c$ck")))
      .distinct
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.length }
    val nodes = deg.keys.toSeq.sorted
    val n = nodes.size
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = nodes.map(v => v -> (0.15 / n + 0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(got(v) - rank(v) * n) < 1e-4, s"node $v")
    }
  }

  test("pageRank plans no cartesian product") {
    val plan = planOf(Graph.pageRank(tables))
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
