package graft

import graft.operators.{Graph, Similarity}

/** Convergence-stopped iteration (r11 roadmap item 5): epsilon-stop with
  * a deterministic round cap for the three iterative operators. The
  * oracle queries stay fixed-iteration; these specs pin (a) eps-never-
  * triggers ⇒ EXACT equality with the fixed-iteration operator at the
  * cap, and (b) a loose eps stops EARLY and equals the fixed-iteration
  * run with the same number of rounds (the loop executes the identical
  * arithmetic, just a data-driven number of times). */
class ConvergenceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("pageRankConverged: eps=0 runs to the cap and equals fixed-iteration") {
    val (out, rounds) = Graph.pageRankConvergedWithRounds(tables, 0.0, 3, 0.85)
    assert(rounds == 3)
    assert(rows(out) == rows(Graph.pageRank(tables, iters = 3)))
  }

  test("pageRankConverged: stops early on this graph, result = fixed run of the same rounds") {
    val (out, rounds) = Graph.pageRankConvergedWithRounds(tables, 1e-3, 60, 0.85)
    assert(rounds < 60, s"no early stop: ran all $rounds rounds")
    assert(rows(out) == rows(Graph.pageRank(tables, iters = rounds)))
    // and one more round moves (on average) about eps — it really had
    // converged, the stop wasn't an artifact of the join or the metric
    val more = rows(Graph.pageRank(tables, iters = rounds + 1))
    val meanDiff = rows(out).zip(more).map { case (a, b) =>
      math.abs(a(1).asInstanceOf[Double] - b(1).asInstanceOf[Double])
    }.sum / more.size
    assert(meanDiff <= 2e-3, s"post-stop mean movement $meanDiff >> eps")
  }

  test("hitsConverged: eps=0 runs to the cap and equals fixed-iteration") {
    val (out, rounds) = Graph.hitsConvergedWithRounds(tables, 0.0, 2)
    assert(rounds == 2)
    assert(rows(out) == rows(Graph.hits(tables, iters = 2)))
  }

  test("hitsConverged: stops early, result = fixed run of the same rounds") {
    val (out, rounds) = Graph.hitsConvergedWithRounds(tables, 1e-6, 30)
    assert(rounds < 30, s"no early stop: ran all $rounds rounds")
    assert(rows(out) == rows(Graph.hits(tables, iters = rounds)))
  }

  test("kmeansConverged: negative eps (the fixed mode) equals kmeans; loose eps stops early") {
    val (fixed, r1) = Similarity.kmeansCore(tables, 8, 2, -1.0)
    assert(r1 == 2)
    assert(rows(fixed) == rows(Similarity.kmeans(tables, k = 8, iters = 2)))
    val (out, rounds) = Similarity.kmeansCore(tables, 8, 30, 1e-3)
    assert(rounds < 30, s"no early stop: ran all $rounds rounds")
    assert(rows(out) == rows(Similarity.kmeans(tables, k = 8, iters = rounds)))
  }
}
