package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Privacy
import graft.functions.HashImpl

class PrivacySpec extends SparkSpec {

  test("kAnonymityAudit matches a local recompute; risk shrinks as k shrinks") {
    val rows = tables.documents.select("lang", "source", "n_chars").collect()
      .map { r =>
        val b = r.getLong(2) match {
          case n if n <= 100 => 100L
          case n if n <= 200 => 200L
          case n if n <= 400 => 400L
          case _             => 800L
        }
        (r.getString(0), r.getString(1), b)
      }
    val groups = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = Seq(2, 5, 10).map { k =>
      val risky = groups.filter(_._2 < k)
      (k.toLong, risky.size.toLong, risky.values.sum,
        groups.size.toLong, groups.values.sum)
    }
    val got = Privacy.kAnonymityAudit(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want, s"engine ${got.toSeq} vs local $want")
    // monotone: raising k can only put MORE groups at risk
    assert(got.sliding(2).forall(p => p(0)._2 <= p(1)._2))
  }

  test("dpNoisyCounts: hash-seeded Laplace matches a local inverse-CDF recompute") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Privacy.dpNoisyCounts(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val counts = tables.documents.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.length == counts.size)
    got.foreach { case (lang, source, nTrue, noise, noisy) =>
      assert(nTrue == counts((lang, source)))
      val h = HashImpl.rollingHash(UTF8String.fromString(s"$lang|$source"))
      val ui = java.lang.Math.floorMod(h, 1000000L)
      val u = (ui.toDouble + 0.5) / 1000000.0
      val wantNoise = if (u < 0.5) 1.0 * math.log(2.0 * u)
                      else -1.0 * math.log(2.0 * (1.0 - u))
      assert(math.abs(noise - r6(wantNoise)) < 1e-9,
        s"($lang,$source): engine noise $noise vs local $wantNoise")
      assert(math.abs(noisy - r6(nTrue + wantNoise)) < 1e-9)
    }
    // Laplace(1): noise is symmetric-ish and bounded in practice by ~ln(1e6)
    assert(got.map(_._4).max > 0 && got.map(_._4).min < 0,
      "noise never changed sign — the hash-uniform is degenerate")
    assert(got.map(_._4).forall(n => math.abs(n) <= math.log(2.0e6)))
  }

  test("lDiversityAudit matches a local distinct-sensitive recompute") {
    import org.apache.spark.sql.functions.col
    val joined = tables.orders
      .select(col("o_custkey").as("c_custkey"), col("o_orderpriority"))
      .join(tables.customer.select("c_custkey", "c_nationkey", "c_mktsegment",
        "c_acctbal"), Seq("c_custkey"))
      .collect()
      .map(r => ((r.getInt(2), r.getString(3),
        math.floor(r.getDouble(4) / 50.0).toInt), r.getString(1)))
    val groups = joined.groupBy(_._1).toSeq.map { case (_, xs) =>
      (xs.map(_._2).distinct.length, xs.length.toLong)
    }
    val got = graft.operators.Privacy.lDiversityAudit(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._1).toSeq == Seq(2L, 3L, 5L))
    got.foreach { case (l, gAtRisk, rAtRisk, gTot, rTot) =>
      val below = groups.filter(_._1 < l)
      assert(gAtRisk == below.length.toLong, s"l=$l group count")
      assert(rAtRisk == below.map(_._2).sum, s"l=$l row count")
      assert(gTot == groups.length.toLong && rTot == groups.map(_._2).sum)
    }
    // non-vacuity at this SF: some threshold must flag real groups, and
    // the audit must not flag everything
    assert(got.exists(_._2 > 0) && got.forall(g => g._2 < g._4))
  }
}
