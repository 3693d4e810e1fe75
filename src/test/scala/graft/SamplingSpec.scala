package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

class SamplingSpec extends SparkSpec {

  test("split assignment is deterministic, total, and disjoint") {
    val a = Sampling.assignSplits(tables.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val b = Sampling.assignSplits(tables.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val ma = a.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mb = b.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ma == mb) // deterministic across runs
    assert(ma.size == tables.documents.count()) // total: every row assigned
    assert(ma.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("split proportions approximate the weights") {
    val counts = Sampling.assignSplits(tables.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("train") / n - 0.9) < 0.06,
      s"train fraction ${counts("train") / n}")
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
  }

  test("stratified sampling respects per-stratum fractions") {
    val fractions = Map("click" -> 0.5, "view" -> 0.2, "purchase" -> 1.0,
      "signup" -> 0.1, "error" -> 0.0)
    val sampled = Sampling.stratifiedEvents(tables, fractions)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = tables.events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!sampled.contains("error")) // fraction 0 → stratum excluded
    assert(sampled("purchase") == totals("purchase")) // fraction 1 → all rows
    val clickFrac = sampled("click").toDouble / totals("click")
    assert(math.abs(clickFrac - 0.5) < 0.15, s"click fraction $clickFrac")
  }

  test("sampling is a narrow plan (no shuffle)") {
    val plan = planOf(Sampling.stratifiedEvents(tables, Map("click" -> 0.5)))
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("hash-stratified sampling: content-stable membership, fractions hold, no shuffle") {
    val fractions = Map("click" -> 0.5, "view" -> 0.2, "purchase" -> 1.0,
      "signup" -> 0.1, "error" -> 0.0)
    val kept = Sampling.stratifiedEventsByHash(tables, fractions)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // membership is a pure function of event_id: identical on a
    // repartitioned input (what sampleBy's per-partition RNG can't give)
    val keptRepart = Sampling.stratifiedEventsByHash(
        tables.withTable("events", tables.events.repartition(7)), fractions)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == keptRepart, "membership changed under repartitioning")
    val sampled = Sampling.stratifiedEventsByHash(tables, fractions)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = tables.events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!sampled.contains("error")) // fraction 0 → stratum excluded
    assert(sampled("purchase") == totals("purchase")) // fraction 1 → all rows
    val clickFrac = sampled("click").toDouble / totals("click")
    assert(math.abs(clickFrac - 0.5) < 0.15, s"click fraction $clickFrac")
    val plan = planOf(Sampling.stratifiedEventsByHash(tables, fractions))
    assert(!plan.contains("Exchange"), s"hash sampling must not shuffle:\n$plan")
  }

  test("mixtureBySource: binding source keeps all, realized token shares track targets") {
    val targets = Map("src0" -> 0.6, "src1" -> 0.25, "src2" -> 0.15)
    val kept = Sampling.mixtureBySource(tables, targets).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // untargeted sources are dropped entirely
    assert(kept.map(_._2).toSet == targets.keySet)
    // sources are uniform (~equal token totals), so src0 (target 0.6) binds:
    // it keeps everything, the others downsample
    val keepFrac = kept.groupBy(_._2).map { case (s, rs) => s -> rs.head._4 }
    assert(keepFrac("src0") == 1.0, s"binding source must keep all: $keepFrac")
    assert(keepFrac("src1") < 0.5 && keepFrac("src2") < 0.4, keepFrac.toString)
    // realized token shares approximate the targets (doc-level hash
    // granularity on a small corpus → loose tolerance)
    val tokBySource = kept.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum.toDouble }
    val total = tokBySource.values.sum
    targets.foreach { case (s, p) =>
      val realized = tokBySource(s) / total
      assert(math.abs(realized - p) < 0.12, s"$s realized $realized target $p")
    }
    // membership is content-deterministic: identical on a reshuffled input
    val again = Sampling.mixtureBySource(
      tables.withTable("documents", tables.documents.orderBy(rand(7)).repartition(5)),
      targets).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq == kept.toSeq)
  }

  test("mixtureBySource rejects malformed targets and missing sources") {
    intercept[IllegalArgumentException] {
      Sampling.mixtureBySource(tables, Map("src0" -> 0.5)) // doesn't sum to 1
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureBySource(tables, Map("nope" -> 1.0)) // unknown source
    }
  }

  test("weightedSample matches a driver-side A-ES recompute and is repartition-stable") {
    val k = 50
    val got = Sampling.weightedSample(tables, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == k && got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    // driver-side recompute from the engine's own hash (xxhash64 via a
    // 1-column query) — the ranking arithmetic is then re-derived locally
    val hashed = tables.documents
      .select(col("doc_id"), col("source"),
        size(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= ""))
          .cast("bigint").as("n_tokens"),
        pmod(xxhash64(col("doc_id")), lit(1L << 20)).as("bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = hashed.filter(_._3 > 0).map { case (id, src, nt, b) =>
      (id, src, nt, math.log((b + 0.5) / (1L << 20).toDouble) / nt)
    }.sortBy(r => (-r._4, r._1)).take(k)
      .map(r => (r._1, r._2, r._3)).sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    // long documents must be overrepresented vs a uniform draw
    val meanSampled = got.map(_._3).sum.toDouble / k
    val meanAll = hashed.map(_._3).sum.toDouble / hashed.length
    assert(meanSampled > meanAll, s"sampled mean $meanSampled <= corpus mean $meanAll")
    // content-determinism: identical on a reshuffled, repartitioned input
    val again = Sampling.weightedSample(
      tables.withTable("documents", tables.documents.orderBy(rand(3)).repartition(7)), k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("capPerGroup keeps the hash-minimal cap per group, content-deterministically") {
    val cap = 7
    val got = Sampling.capPerGroup(tables.documents, "lang", cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // driver-side recompute: per lang, sort by (signed xxhash64, doc_id), prefix cap
    val hashed = tables.documents
      .select(col("lang"), col("doc_id"), xxhash64(col("doc_id")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hashed.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(cap).zipWithIndex
        .map { case ((l, id, _), i) => (l, id, i + 1) }
    }.sortBy(r => (r._1, r._3))
    assert(got.toSeq == expected)
    // every group capped; under-cap groups keep everything
    val sizes = hashed.groupBy(_._1).map { case (l, rs) => l -> rs.length }
    got.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.length == math.min(cap, sizes(l)))
    }
    // the custom bounded-heap operator plans, not a row_number window
    val plan = planOf(Sampling.capPerGroup(tables.documents, "lang", cap))
    assert("TopKPerGroup ".r.findAllIn(plan).nonEmpty, s"missing TopKPerGroup exec:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in plan:\n$plan")
    // content-determinism across repartitioning (heap merge order varies)
    val again = Sampling.capPerGroup(
      tables.documents.orderBy(rand(5)).repartition(7), "lang", cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("tokenBudgetSelect keeps the maximal quality-ranked prefix within budget") {
    val budget = 1000L
    val got = Sampling.tokenBudgetSelect(tables, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // driver-side recompute of the global greedy prefix
    val all = TextAnalysis.qualityScore(tables)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val ordered = all.filter(_._3.isDefined)
      .sortBy(r => (-r._3.get, r._1))
    var cum = 0L
    val expected = ordered.takeWhile { r => cum += r._2; cum <= budget }
      .map(r => (r._1, r._2, r._3.get))
    assert(got.toSeq == expected.toSeq)
    // budget respected and selection is maximal
    val used = got.map(_._2).sum
    assert(used <= budget)
    if (got.length < ordered.length)
      assert(used + ordered(got.length)._2 > budget,
        s"selection not maximal: $used + next ${ordered(got.length)._2} <= $budget")
    // a budget larger than the corpus keeps every document
    val total = all.map(_._2).sum
    assert(Sampling.tokenBudgetSelect(tables, total + 1).count() == all.length)
  }

  test("mixtureTemperature matches an exact driver-side α=1/2 recompute") {
    val perSource = tables.documents.select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.map(r => r.getString(1).trim.toLowerCase
          .split("\\s+").count(_.nonEmpty).toLong).sum
      }
    val tot = perSource.values.sum
    val wi = perSource.map { case (s, tok) =>
      s -> math.floor(math.sqrt(tok.toDouble / tot.toDouble) * 1e9).toLong
    }
    val wtot = wi.values.sum
    val expected = perSource.keys.toSeq.sorted.map { s =>
      (s, perSource(s),
        math.round(perSource(s).toDouble / tot.toDouble * 1e6) / 1e6,
        math.round(wi(s).toDouble / wtot.toDouble * 1e6) / 1e6)
    }
    val got = Sampling.mixtureTemperature(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected && got.nonEmpty)
    // α < 1 compresses the distribution: the boost factor w/p is strictly
    // anti-monotone in the raw share (w/p = 1/(√p·Σ√pᵢ)), and any source
    // below the uniform share 1/n is boosted (p < 1/n ⟹ p < 1/(Σ√pᵢ)²
    // since Σ√pᵢ ≤ √n by Cauchy–Schwarz)
    val byP = got.sortBy(_._3)
    byP.sliding(2).foreach {
      case Seq((_, _, p1, w1), (_, _, p2, w2)) if p1 < p2 =>
        assert(w1 / p1 >= w2 / p2 - 1e-6,
          s"boost not anti-monotone: p=$p1→${w1 / p1} vs p=$p2→${w2 / p2}")
      case _ =>
    }
    byP.filter(r => r._3 < 1.0 / got.length - 1e-9).foreach { case (s, _, p, w) =>
      assert(w >= p - 1e-6, s"below-uniform source $s not boosted: p=$p w=$w")
    }
  }

  test("splitLeakage matches a driver-side cross-split shingle recompute") {
    import org.apache.spark.sql.functions.col
    def shingleSet(toks: Seq[String]): Set[String] =
      if (toks.isEmpty) Set.empty
      else if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    val got = Sampling.splitLeakage(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // the split assignment itself is pinned by its own spec — reuse it
    val docs = Sampling.assignSplits(tables.documents, col("doc_id"),
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select("doc_id", "split", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        shingleSet(r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)))
    val trainSh = docs.filter(_._2 == "train").flatMap(_._3).toSet
    val held = docs.filter(d => d._2 != "train" && d._3.nonEmpty)
    assert(held.nonEmpty, "fixture corpus must have held-out docs")
    held.groupBy(_._2).foreach { case (split, ds) =>
      val fracs = ds.map(d => (d._3 & trainSh).size.toDouble / d._3.size)
      val leaky = ds.count(d => (d._3 & trainSh).size * 2 > d._3.size)
      val (gn, gl, gf) = got(split)
      assert(gn == ds.length, s"$split n_docs")
      assert(gl == leaky, s"$split leaky")
      assert(math.abs(gf - fracs.sum / fracs.length) < 1e-6, s"$split avg frac")
    }
    assert(got.keySet == held.map(_._2).toSet)
  }

  test("skylineDocs sweep equals the textbook dominance definition; front members are mutually non-dominated") {
    import graft.operators.Sampling
    val feats = tables.documents.collect().map { r =>
      val tk = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (r.getLong(0), tk.length.toLong, tk.distinct.length.toLong)
    }
    def dominates(b: (Long, Long, Long), a: (Long, Long, Long)) =
      b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3)
    val expect = feats.filter(a => !feats.exists(b => dominates(b, a)))
      .map(f => (f._1, f._2, f._3)).toSet
    val got = Sampling.skylineDocs(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"got ${got.size} expect ${expect.size}")
    assert(got.nonEmpty)
    // front members never dominate each other
    val front = got.toSeq
    front.foreach(a => front.foreach(b =>
      assert(!dominates(b, a) || b == a, s"$b dominates $a inside the front")))
  }

  test("epochShuffle: distinct reproducible permutations per epoch, content-stable under repartitioning") {
    import graft.operators.Sampling
    val a = Sampling.epochShuffle(tables).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // reproducible: a second evaluation is identical
    val b = Sampling.epochShuffle(tables).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
    // partitioning-independent: same result on a repartitioned copy
    val t2 = tables.withTable("documents", tables.documents.repartition(7))
    val c = Sampling.epochShuffle(t2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq == c.toSeq)
    // epochs produce genuinely different orders
    val e0 = a.filter(_._1 == 0).sortBy(_._2).map(_._3).toSeq
    val e1 = a.filter(_._1 == 1).sortBy(_._2).map(_._3).toSeq
    assert(e0.length == 20 && e1.length == 20 && e0 != e1)
    // top-k plans as per-partition heaps, not a global sort
    val plan = planOf(Sampling.epochShuffle(tables))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("groupSafeSplits: clusters stay atomic, leakage is zero, totals add up") {
    import org.apache.spark.sql.functions.countDistinct
    val out = Sampling.groupSafeSplits(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet.subsetOf(Set("train", "val", "test")) && out.nonEmpty)
    assert(out.values.forall(_._3 == 0L), s"leaked pairs: $out")
    assert(out.values.map(_._1).sum == tables.documents.count())
    // atomicity re-derived independently: no near-dup group spans splits —
    // every group id maps to exactly one split
    val groups = graft.operators.Dedup.nearDupGroups(tables)
    val asg = groups.withColumn("_b",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(col("group_id")),
          org.apache.spark.sql.functions.lit(100L)))
    val perGroupSplits = asg
      .withColumn("split", org.apache.spark.sql.functions
        .when(col("_b") < 90, "train").when(col("_b") < 95, "val")
        .otherwise("test"))
      .groupBy("group_id").agg(countDistinct("split").as("ns"))
      .agg(org.apache.spark.sql.functions.max("ns")).head().getLong(0)
    assert(perGroupSplits == 1L)
    // and the plain doc-hash split DOES leak on this corpus — the defect
    // this operator exists to fix is real here, not vacuous
    val plainLeak = graft.operators.Dedup
      .minhashCandidatesCore(tables, minEstJaccard = 0.5)
      .select("doc_a", "doc_b")
      .withColumn("_sa", org.apache.spark.sql.functions
        .pmod(org.apache.spark.sql.functions.xxhash64(col("doc_a")), org.apache.spark.sql.functions.lit(100L)) < 90)
      .withColumn("_sb", org.apache.spark.sql.functions
        .pmod(org.apache.spark.sql.functions.xxhash64(col("doc_b")), org.apache.spark.sql.functions.lit(100L)) < 90)
      .filter(col("_sa") =!= col("_sb")).count()
    assert(plainLeak > 0, "fixture vacuous: plain hash split doesn't leak here")
  }
  test("quantileNormalizeLengths: rank-matched onto the global length distribution") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Sampling.quantileNormalizeLengths(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = tables.documents.select(col("doc_id"), col("source"),
        size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == docs.length)
    // driver replay: doubled tie-average source rank -> integer floor
    // position -> global value at that 0-based rank
    val globalSorted = docs.map(_._3).sorted
    val ng = globalSorted.length.toLong
    val bySrc = docs.groupBy(_._2)
    val expect = bySrc.toSeq.flatMap { case (src, rs) =>
      val ns = rs.length.toLong
      val grouped = rs.map(_._3).groupBy(identity).view
        .mapValues(_.length.toLong).toSeq.sortBy(_._1)
      var cum = 0L
      val r2 = grouped.map { case (v, c) =>
        val r = 2 * cum + c + 1; cum += c; v -> r }.toMap
      rs.map { case (id, _, x) =>
        val pos = if (ns == 1) (ng - 1) / 2
          else (r2(x) - 2) * (ng - 1) / (2 * (ns - 1))
        (id, src, x, globalSorted(pos.toInt))
      }
    }.toSet
    assert(got.toSet == expect,
      s"diff ${(got.toSet diff expect).take(3)} / ${(expect diff got.toSet).take(3)}")
    // the transform actually matches distributions: each source's
    // normalized median sits near the global median
    val gmed = globalSorted(((ng - 1) / 2).toInt)
    got.groupBy(_._2).foreach { case (src, rs) =>
      val m = rs.map(_._4).sorted.apply(rs.length / 2)
      assert(math.abs(m - gmed) <= gmed * 0.25 + 2, s"$src median $m vs global $gmed")
    }
  }
  test("negativeSamples: deterministic draws, true positives rejected, checksum pins content") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Sampling.negativeSamples(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    // driver replay: same packed keys through the engine's public
    // xxhash64 (the ORACLE replays the hash from scratch in SQL — this
    // spec pins the packing/pmod/rejection/aggregation composition)
    val pos = tables.orders.select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val posPairs = tables.lineitem.select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (pos(r.getLong(0)), r.getLong(1))).distinct
    val np = tables.part.agg(max(col("p_partkey"))).head().getLong(0)
    val keys = posPairs.flatMap { case (c, p) =>
      (0 until 2).map(i => (c, (c * (np + 1) + p) * 2 + i))
    }
    import spark.implicits._
    val hashed = keys.map(_._2).toSeq.toDF("k")
      .select(col("k"), xxhash64(col("k")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val posSet = posPairs.toSet
    val kept = keys.map { case (c, k) =>
      (c, java.lang.Math.floorMod(hashed(k), np) + 1)
    }.filterNot(posSet)
    val expNeg = kept.groupBy(_._1).map { case (c, rs) =>
      c -> (rs.length.toLong, rs.map(_._2).sum)
    }
    val expPos = posPairs.groupBy(_._1).map { case (c, rs) => c -> rs.length.toLong }
    assert(got.keySet == expPos.keySet)
    got.foreach { case (c, (nP, nN, ck)) =>
      assert(nP == expPos(c), s"cust $c n_pos")
      val (en, eck) = expNeg.getOrElse(c, (0L, 0L))
      assert(nN == en, s"cust $c n_neg $nN vs $en")
      assert(ck == eck, s"cust $c checksum $ck vs $eck")
      assert(nN <= 2 * nP)
    }
    // rejection is non-vacuous on this fixture
    assert(got.values.map(_._2).sum < 2 * got.values.map(_._1).sum,
      "no draw collided with a positive - rejection untested")
  }
}
