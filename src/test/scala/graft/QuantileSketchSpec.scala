package graft

import graft.functions.{GkSummary, QuantileSketch}
import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Contracts for the primitive-buffer GK quantile sketch (the
  * `percentile_approx` replacement in groupPercentilesApprox): the
  * deterministic rank-error guarantee under every mutation path —
  * insert-only, chunk flushes, partial merges in arbitrary order, heavy
  * ties — plus the operator-level audit flag it must keep at 1. */
class QuantileSketchSpec extends SparkSpec {

  /** Max absolute rank error of the sketch's answers vs the sorted data,
    * in rank units (rank = count of elements ≤ v, the GK convention). */
  private def maxRankErr(data: Array[Double], s: GkSummary,
                         ps: Seq[Double]): Long = {
    val sorted = data.sorted
    ps.map { q =>
      val v = s.query(q)
      val target = math.max(1L, math.ceil(q * data.length).toLong)
      val rank = sorted.count(_ <= v).toLong
      math.abs(rank - target)
    }.max
  }

  test("rank error stays under n/accuracy through chunked inserts") {
    val rnd = new scala.util.Random(42)
    // > many chunk flushes (chunk = 8192) and real compression
    val data = Array.fill(100000)(rnd.nextGaussian() * 100.0)
    val acc = 100
    val s = new GkSummary(acc)
    data.foreach(s.insert)
    val err = maxRankErr(data, s, Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
    assert(err < data.length / acc,
      s"rank error $err >= ${data.length / acc} (n=${data.length}, acc=$acc)")
  }

  test("rank error survives partial merges in arbitrary order and heavy ties") {
    val rnd = new scala.util.Random(7)
    // 60% ties drawn from 20 values — the bracket math's hard case
    val pool = Array.fill(20)(rnd.nextDouble() * 10)
    val data = Array.fill(80000)(
      if (rnd.nextDouble() < 0.6) pool(rnd.nextInt(pool.length))
      else rnd.nextDouble() * 10)
    val acc = 200
    // 13 uneven partials merged pairwise left-to-right then into one
    val parts = data.grouped(data.length / 13 + 1).toSeq
    val summaries = parts.map { chunk =>
      val s = new GkSummary(acc); chunk.foreach(s.insert); s
    }
    val merged = summaries.reduceLeft { (a, b) => a.mergeSummary(b); a }
    assert(merged.count == data.length.toLong)
    // under heavy ties the guarantee is INSTANCE-form (the position
    // inside a tie run is what the sketch brackets — the same
    // convention percentile_approx uses): count(< v) ≤ qn + n/acc and
    // count(≤ v) ≥ qn − n/acc
    val n = data.length
    val sorted = data.sorted
    Seq(0.05, 0.5, 0.9, 0.95).foreach { q =>
      val v = merged.query(q)
      val lt = sorted.count(_ < v)
      val le = sorted.count(_ <= v)
      assert(lt <= q * n + n.toDouble / acc, s"q=$q: count(<v)=$lt too high")
      assert(le >= q * n - n.toDouble / acc, s"q=$q: count(<=v)=$le too low")
    }
    // the structural invariants the bound rests on: every bracket
    // intersects its value's tie run, and no span exceeds n/accuracy —
    // and the leaf/merge threshold split keeps the summary SIZE from
    // growing linearly with the merge chain
    assert(merged.maxSpan <= n.toLong / acc,
      s"span ${merged.maxSpan} > ${n / acc}")
    merged.brackets.foreach { case (v, rmin, rmax) =>
      val lo = sorted.count(_ < v).toLong + 1
      val hi = sorted.count(_ <= v).toLong
      assert(rmin <= hi && rmax >= lo,
        s"bracket [$rmin,$rmax] misses tie run [$lo,$hi] of $v")
    }
    assert(merged.brackets.length < 8 * acc,
      s"summary size ${merged.brackets.length} grew past O(accuracy) " +
        s"through ${summaries.length} chained merges")
  }

  test("small groups answer exactly; empty group evaluates to null") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 10.0)).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(QuantileSketch.sketchQuantiles(col("v"), Seq(0.5, 1.0), 10000).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // n under the compression threshold keeps every value: rank
    // ceil(0.5*5)=3 → 3.0, max → 5.0; singleton group → its value
    assert(got("a") == Seq(3.0, 5.0), got.toString)
    assert(got("b") == Seq(10.0, 10.0), got.toString)
    val nullRow = Seq(("c", Option.empty[Double])).toDF("g", "v")
      .groupBy("g")
      .agg(QuantileSketch.sketchQuantiles(col("v"), Seq(0.5), 100).as("q"))
      .collect().head
    assert(nullRow.isNullAt(1), "all-null group must evaluate to null")
  }

  test("aggregate honors the contract across shuffle partials on real data") {
    // force many map-side partials, then check the documented contract
    // (count(< v) ≤ qn + ε ∧ count(≤ v) ≥ qn − ε, ε = n/acc + 1) — the
    // exact audit groupPercentilesApprox ships
    val acc = 500
    val df = tables.lineitem.repartition(13)
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
    val sk = df.groupBy("g")
      .agg(QuantileSketch.sketchQuantiles(col("v"), Seq(0.5, 0.9), acc).as("q"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1), r.getLong(2)))
    val byG = df.collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted }
    assert(sk.nonEmpty)
    sk.foreach { case (g, qs, n) =>
      val vals = byG(g)
      val eps = n.toDouble / acc + 1
      Seq(0.5 -> qs(0), 0.9 -> qs(1)).foreach { case (q, v) =>
        val lt = vals.count(_ < v)
        val le = vals.count(_ <= v)
        assert(lt <= q * n + eps, s"$g q=$q: count(<v)=$lt > ${q * n + eps}")
        assert(le >= q * n - eps, s"$g q=$q: count(<=v)=$le < ${q * n - eps}")
      }
    }
  }

  test("groupPercentilesApprox keeps the sketch rank audit at 1") {
    val rows = Analytics.groupPercentilesApprox(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(4) == 1,
      s"sketch_rank_ok must hold: ${r.mkString(",")}"))
  }

  test("sketch-guided refinement reproduces the exact arm bit-for-bit " +
      "across accuracy extremes") {
    // the refined p50_price must equal quantilesBySort's (via
    // groupPercentiles) EXACTLY — at a coarse accuracy the rank window
    // is wide and the ±∞ clamps engage (sf0.001 groups have ~2000 rows,
    // margin ≈ 2n/50 + 2 ≈ 82); at a fine accuracy the window shrinks
    // to a handful of ranks. Both must bracket the true order statistic
    // and resolve identically.
    val exact = Analytics.groupPercentiles(tables).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    Seq(50, 1000000).foreach { acc =>
      val got = Analytics.groupPercentilesApprox(tables, accuracy = acc).collect()
      assert(got.nonEmpty)
      got.foreach { r =>
        val (q50, q90, p50) = exact(r.getString(0))
        assert(r.getDouble(1) == q50 && r.getDouble(2) == q90 &&
          r.getDouble(3) == p50,
          s"acc=$acc ${r.getString(0)}: got (${r.getDouble(1)}, " +
            s"${r.getDouble(2)}, ${r.getDouble(3)}) vs exact ($q50, $q90, $p50)")
        assert(r.getInt(4) == 1, s"acc=$acc audit flag dropped")
      }
    }
  }
}
