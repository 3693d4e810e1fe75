package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup: groups partition the corpus, keep_id is the min doc_id of each group") {
    val groups = Dedup.exactGroups(tables).collect()
    val total = groups.map(_.getLong(2)).sum
    assert(total == tables.documents.count())
    // keeper rows = number of groups
    assert(Dedup.exactRows(tables).count() == groups.length)
  }

  test("exact dedup collapses injected duplicates") {
    // inject: duplicate every doc with doc_id < 10 under a new id
    val docs = tables.documents
    val dups = docs.filter($"doc_id" < 10)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val t = tables.withTable("documents", docs.union(dups))
    val groups = Dedup.exactGroups(t).collect()
    val nDocs = docs.count()
    assert(groups.length == nDocs) // same distinct contents as before
    assert(groups.map(_.getLong(2)).sum == nDocs + 10)
    // every injected duplicate loses to its original (min doc_id wins)
    assert(groups.forall(_.getLong(1) < 1000000L))
  }

  test("minhash LSH finds injected near-duplicates") {
    val docs = tables.documents
    // near-dup: copy of each doc_id<5 with one word changed
    val near = docs.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 2000000L)
      .withColumn("text", concat($"text", lit(" extraword")))
    val t = tables.withTable("documents", docs.union(near))
    val pairs = Dedup.minhashCandidates(t, w = 2, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 5 (original, near-copy) pairs must surface as candidates
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, i + 2000000L)),
        s"near-dup pair for doc $i not found; got ${pairs.take(10)}")
    }
  }

  test("hot-bucket cap bounds mega-bucket pair explosion; off or high cap is exact") {
    import graft.sources.Tables
    // degenerate corpus: 40 byte-identical boilerplate docs (every band
    // collides in ONE 40-row bucket → 16 × 780 raw pairs) + one genuine
    // near-dup pair of unrelated text
    val boiler = (0 until 40).map(i =>
      (i.toLong, "terms of service all rights reserved contact us privacy policy", "en", "web"))
    val pair = Seq(
      (100L, "quick brown fox jumps over the lazy dog near the river bank", "en", "web"),
      (101L, "quick brown fox jumps over the lazy dog near the river bend", "en", "web"))
    val docs = (boiler ++ pair).toDF("doc_id", "text", "lang", "source")
    val t = Tables(spark, sfDir).withTable("documents", docs)
    val uncapped = Dedup.minhashCandidatesCore(t, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 40 * 39 / 2 + 1, s"got ${uncapped.size}")
    // cap below the mega-bucket size: boilerplate pairs vanish (their only
    // buckets are dropped), the genuine pair SURVIVES via its own buckets
    val capped = Dedup.minhashCandidatesCore(t, minEstJaccard = 0.5,
        maxBucketSize = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"got $capped")
    // a cap above every bucket size changes nothing (exactness restored)
    val high = Dedup.minhashCandidatesCore(t, minEstJaccard = 0.5,
        maxBucketSize = Some(1000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(high == uncapped)
  }

  test("jaccardPairs computes exact token-set jaccard") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"), // J(1,2) = 3/5 = 0.6
      (3L, "x y z w") // J with others = 0
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(docs, 0.5).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L && got(0).getDouble(2) == 0.6)
  }

  test("nearDupGroups merges transitive near-duplicates into one component") {
    val docs = tables.documents
    // A ~ B and B ~ C by construction (one-word deltas), so {A,B,C} must group
    val base = docs.filter($"doc_id" === 0)
    val b = base.withColumn("doc_id", lit(5000000L))
      .withColumn("text", concat($"text", lit(" x")))
    val c = base.withColumn("doc_id", lit(5000001L))
      .withColumn("text", concat($"text", lit(" x y")))
    val t = tables.withTable("documents", docs.union(b).union(c))
    val groups = Dedup.nearDupGroups(t, minEstJaccard = 0.4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(0L) == 0L && groups(5000000L) == 0L && groups(5000001L) == 0L,
      s"transitive group broken: ${groups.view.filterKeys(k => k == 0L || k >= 5000000L).toMap}")
    // untouched docs are singleton groups
    assert(groups(1L) == 1L)
    // total coverage: every document got a group
    assert(groups.size == docs.count() + 2)
  }

  test("decontaminate drops benchmark copies and keeps unrelated docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta") // exact copy of the benchmark doc
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val kept = Dedup.decontaminate(docs, benchmark, w = 3, maxOverlap = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(kept.keySet == Set(2L), s"got $kept")
    assert(kept(2L) == 0.0)
  }

  test("lshVerifiedPairs = exact jaccard restricted to LSH candidates") {
    val verified = Dedup.lshVerifiedPairs(tables, w = 2, minEstJaccard = 0.2, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(verified.nonEmpty)
    // recompute each pair's exact shingle jaccard locally and compare
    val sh = tables.documents
      .select($"doc_id", Dedup.shingles($"text", 2).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    verified.foreach { case (a, b, j) =>
      val expect = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      assert(expect >= 0.5 && math.abs(j - expect) < 1e-6,
        s"pair ($a,$b): reported $j, exact $expect")
    }
    // and no verified pair can beat the threshold without being a candidate —
    // every emitted pair IS a candidate by construction; check subset property
    val cand = Dedup.minhashCandidates(tables, w = 2, minEstJaccard = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.forall(p => cand.contains((p._1, p._2))))
  }

  test("lshVerifiedPairs releases its shingle cache before returning") {
    spark.catalog.clearCache() // start from a clean CacheManager
    val res = Dedup.lshVerifiedPairs(tables, w = 2, minEstJaccard = 0.2, minJaccard = 0.5)
    assert(org.apache.spark.sql.graftbridge.CacheBridge.noDatasetCaches(spark),
      "the per-doc shingle cache must be unpersisted before the call returns")
    assert(res.count() > 0)
    assert(org.apache.spark.sql.graftbridge.CacheBridge.noDatasetCaches(spark),
      "consuming the result must not leave caches behind")
  }

  test("keepMinPerFp equals the groupBy + self-semi-join form, row for row") {
    // the r20 single-aggregation rewrite of the in-batch exact pass must be
    // row-equal to the two-exchange original on a frame with real dup mix
    val docs = tables.documents.limit(200)
    val dups = docs.filter($"doc_id" < 20)
      .withColumn("doc_id", $"doc_id" + 100000L)
    val withFp = docs.unionByName(dups)
      .withColumn("fp", Dedup.fingerprint($"text"))
    val batchExact = withFp.groupBy("fp").agg(min($"doc_id").as("doc_id"))
    // the using-column semi-join reorders columns (join keys first); align
    // before comparing — downstream consumers select by name
    val joinForm = withFp.join(batchExact, Seq("fp", "doc_id"), "left_semi")
      .select(withFp.columns.map(col): _*)
    val aggForm = Dedup.keepMinPerFp(withFp)
    assert(aggForm.columns.toSeq == withFp.columns.toSeq,
      "column order must be preserved")
    val a = aggForm.collect().map(_.toSeq).toSet
    val b = joinForm.collect().map(_.toSeq).toSet
    assert(a == b, s"min_by form diverges: only-agg=${(a -- b).take(3)} " +
      s"only-join=${(b -- a).take(3)}")
  }

  test("dedupeIncrement: exact, in-batch, and near dups drop; fresh docs survive") {
    val existing = tables.documents.filter($"doc_id" < 50)
    val ex = existing.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val incoming = Seq(
      (1000L, ex(0L), "en", "batch"),                   // exact copy of corpus doc
      (1001L, "novel zebra quartz lattice prism omega", "en", "batch"), // fresh…
      (1002L, "novel zebra quartz lattice prism omega", "en", "batch"), // …in-batch dup
      (1003L, ex(1L) + " tail", "en", "batch"),         // near-dup of corpus doc
      (1004L, "utterly unrelated xylophone vortex glyph nimbus ember", "en", "batch"))
      .toDF("doc_id", "text", "lang", "source")
    val kept = Dedup.dedupeIncrement(existing, incoming)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1001L, 1004L), s"survivors: $kept")
  }

  test("dedupeIncrement hot-bucket cap: corpus-side only, near-dups of cool docs still drop") {
    import spark.implicits._
    // existing corpus: a 40-doc boilerplate mega-bucket + one ordinary doc
    val boiler = (10 until 50).map(i =>
      (i.toLong, "terms of service all rights reserved contact us privacy policy", "en", "web"))
    val cool = Seq(
      (100L, "quick brown fox jumps over the lazy dog near the river bank", "en", "web"))
    val existing = (boiler ++ cool).toDF("doc_id", "text", "lang", "source")
    val incoming = Seq(
      // near-dup of the COOL corpus doc: its band buckets are tiny, so the
      // cap must not affect it — dropped under any cap setting
      (200L, "quick brown fox jumps over the lazy dog near the river bend", "en", "batch"),
      // genuinely novel
      (201L, "novel zebra quartz lattice prism omega", "en", "batch"),
      // near-dup of the BOILERPLATE: its only corpus collisions are in the
      // dropped mega-bucket, so a low cap ADMITS it (the documented
      // admit-duplicate asymmetry of the cap on the ingest path)
      (202L, "terms of service all rights reserved contact us privacy policy extraword", "en", "batch"))
      .toDF("doc_id", "text", "lang", "source")
    val uncapped = Dedup.dedupeIncrement(existing, incoming)
      .collect().map(_.getLong(0)).toSet
    assert(uncapped == Set(201L), s"uncapped survivors: $uncapped")
    val capped = Dedup.dedupeIncrement(existing, incoming, maxBucketSize = Some(10L))
      .collect().map(_.getLong(0)).toSet
    assert(capped == Set(201L, 202L), s"capped survivors: $capped")
    // a cap above every bucket size changes nothing (exactness restored)
    val high = Dedup.dedupeIncrement(existing, incoming, maxBucketSize = Some(1000L))
      .collect().map(_.getLong(0)).toSet
    assert(high == uncapped)
  }

  test("textSimSearch hot-bucket cap: a query in a hot bucket still finds its cool neighbor") {
    import graft.sources.Tables
    import spark.implicits._
    // query doc 0 shares most bands with the 40-doc boilerplate bucket AND
    // has one genuine near-dup (doc 50) outside it; corpus band rows of the
    // mega-bucket are dropped under the cap, but the QUERY's band rows stay
    // intact, so the (0, 50) collision survives through their private bucket
    val qText = "terms of service all rights reserved contact us privacy policy plus unique suffix"
    val boiler = (10 until 50).map(i =>
      (i.toLong, "terms of service all rights reserved contact us privacy policy", "en", "web"))
    val docs = (boiler ++ Seq(
      (0L, qText, "en", "web"),
      (50L, qText + " variant", "en", "web")))
      .toDF("doc_id", "text", "lang", "source")
    val t = Tables(spark, sfDir).withTable("documents", docs)
    val uncapped = Dedup.textSimSearch(t, nQueries = 1)
      .collect().map(r => r.getLong(1)).toSet
    assert(uncapped.contains(50L), s"uncapped neighbors: $uncapped")
    assert(uncapped.exists(n => n >= 10L && n < 50L),
      s"uncapped search should surface boilerplate neighbors too: $uncapped")
    val capped = Dedup.textSimSearch(t, nQueries = 1, maxBucketSize = Some(10L))
      .collect().map(r => r.getLong(1)).toSet
    assert(capped.contains(50L),
      s"query in a hot bucket must still reach its cool neighbor: $capped")
    assert(!capped.exists(n => n >= 10L && n < 50L),
      s"mega-bucket members must not surface under the cap: $capped")
  }

  test("dedupeIncrement candidate volume is bounded by the batch (plan: no corpus self-join)") {
    val existing = tables.documents.filter($"doc_id" < 400)
    val incoming = tables.documents.filter($"doc_id" >= 400)
    val plan = planOf(Dedup.dedupeIncrement(existing, incoming))
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("simhash fingerprints: identical docs collide") {
    val docs = tables.documents
    val dups = docs.filter($"doc_id" < 3).withColumn("doc_id", $"doc_id" + 3000000L)
    val t = tables.withTable("documents", docs.union(dups))
    val fp = Dedup.simhashFingerprints(t).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 3).foreach { i => assert(fp(i.toLong) == fp(i + 3000000L)) }
  }

  test("textSimSearch ranks band-collision candidates by exact signature agreement") {
    val sigs = graft.operators.Dedup
      .minhashSigs(tables.documents.select("doc_id", "text"), 2, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = Dedup.textSimSearch(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) => assert(rows.length <= 5) }
    got.foreach { case (q, n, est) =>
      val agree = sigs(q).zip(sigs(n)).count { case (a, b) => a == b }
      assert(est == math.round(agree / 64.0 * 1e6) / 1e6, s"pair ($q,$n)")
      assert(n != q)
    }
  }

  test("dedupClusterSizes histogram covers the whole corpus") {
    val sizes = Dedup.nearDupGroups(tables).collect()
      .map(_.getLong(1)).groupBy(identity).map(_._2.length.toLong)
    val expected = sizes.groupBy(identity)
      .map { case (sz, hits) => sz -> hits.size.toLong }
    val got = Dedup.dedupClusterSizes(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    val n = tables.documents.count()
    assert(got.map { case (sz, c) => sz * c }.sum == n,
      "size-weighted sum must equal the corpus count")
  }

  test("nearDupRates is the source-pair histogram of the verified pair set") {
    val sources = tables.documents.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.lshVerifiedPairs(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.map { case (a, b) =>
      val (sa, sb) = (sources(a), sources(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.groupBy(identity).map { case (k, hits) => k -> hits.length.toLong }
    val got = Dedup.nearDupRates(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected && got.values.sum == pairs.length)
  }

  test("containmentPairs scores |A∩B|/min-size and dominates Jaccard") {
    val rows = Dedup.containmentPairs(tables).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (_, c) => assert(c >= 0.5 && c <= 1.0 + 1e-9) }
    // recompute from shingle sets for every emitted pair
    val sets = tables.documents.select(
      org.apache.spark.sql.functions.col("doc_id"),
      Dedup.shingles(org.apache.spark.sql.functions.col("text"), 2).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    rows.foreach { case ((a, b), (n, c)) =>
      val inter = (sets(a) & sets(b)).size
      assert(n == inter, s"$a/$b n_common")
      val expect = inter.toDouble / math.min(sets(a).size, sets(b).size)
      assert(math.abs(c - math.round(expect * 1e6) / 1e6) < 1e-9, s"$a/$b")
    }
    // containment ≥ Jaccard on every Jaccard-verified pair that was emitted
    Dedup.lshVerifiedPairs(tables).collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      rows.get(k).foreach { case (_, c) => assert(c >= r.getDouble(2) - 1e-9) }
    }
  }

  test("winnowed containment recovers a tiny excerpt the MinHash candidates miss") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // a 10-token excerpt (well over the winnowing guarantee of
    // wWin+kWin-1 = 6 shared tokens) buried in a ~400-token document:
    // the pair's true Jaccard is ~9/400 — far below any band estimate —
    // while its containment is 1.0
    val excerpt = "the quick brown fox jumps over the lazy sleeping dog"
    val filler = (0 until 400).map(i => s"w$i").mkString(" ")
    val big = filler.split(" ").take(200).mkString(" ") + " " + excerpt +
      " " + filler.split(" ").drop(200).mkString(" ")
    val docs = Seq((0L, excerpt), (1L, big),
      (2L, "an unrelated document about nothing shared with the others at all"))
      .toDF("doc_id", "text")
      .withColumn("source", lit("t")).withColumn("lang", lit("en"))
    val t2 = tables.withTable("documents", docs)
    val missed = Dedup.containmentPairs(t2).collect()
    assert(!missed.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      "fixture broken: MinHash candidates already surface the excerpt — " +
        "the winnowed path would not be testing anything")
    val found = Dedup.containmentPairsWinnowed(t2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(found.contains((0L, 1L)),
      s"winnowed candidates missed the planted excerpt: ${found.keySet}")
    assert(found((0L, 1L)) >= 0.99, s"containment ${found((0L, 1L))} != ~1.0")
    // the hot-fingerprint cap drops boilerplate mega-fps: capping at 1
    // doc per fp kills every shared candidate (the documented trade)
    assert(Dedup.containmentPairsWinnowed(t2, maxDocsPerFp = Some(1L))
      .collect().isEmpty)
    // and on the real corpus the winnowed pass retains the pairs the
    // MinHash pass found (same verify, strictly broader local candidates)
    val mh = Dedup.containmentPairs(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wn = Dedup.containmentPairsWinnowed(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty && wn.nonEmpty)
    assert((mh diff wn).size <= math.max(1, mh.size / 10),
      s"winnowed lost ${(mh diff wn).size} of ${mh.size} MinHash pairs")
  }

  test("sourceSignatureSimilarity merges per-doc signatures as the union minhash") {
    val rows = Dedup.sourceSignatureSimilarity(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    rows.foreach { case (a, b, e) =>
      assert(a < b)
      assert(e >= 0.0 && e <= 1.0)
    }
    val srcs = tables.documents.select("source").distinct().count().toInt
    assert(rows.length == srcs * (srcs - 1) / 2)
    // merged-min property: elementwise min of the member docs' signatures IS
    // the union's signature; agreement fraction must match exactly
    val sigs = tables.documents
      .select(org.apache.spark.sql.functions.col("source"),
        graft.functions.HashFunctions.minhashSigText(
          org.apache.spark.sql.functions.col("text"), 2, 64).as("sig"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val merged = sigs.groupBy(_._1).map { case (s, xs) =>
      s -> (0 until 64).map(j => xs.map(_._2(j)).min)
    }
    rows.foreach { case (a, b, e) =>
      val est = (0 until 64).count(j => merged(a)(j) == merged(b)(j)) / 64.0
      assert(math.abs(e - math.round(est * 1e6) / 1e6) < 1e-9, s"$a/$b")
    }
  }

  test("clusterRepresentatives keeps each group's longest member, min-id tiebreak") {
    import org.apache.spark.sql.functions.col
    val got = Dedup.clusterRepresentatives(tables)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver-side recompute from the group assignment + doc lengths
    val chars = tables.documents.select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val groups = Dedup.nearDupGroups(tables)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = groups.groupBy(_._2).toSeq.map { case (gid, members) =>
      val best = members.map(m => chars(m._1)).max
      val kept = members.filter(m => chars(m._1) == best).map(_._1).min
      (gid, kept, members.length.toLong, best)
    }.sortBy(_._1)
    assert(got.toSeq == expected)
    // every document is accounted for exactly once across clusters
    assert(got.map(_._3).sum == tables.documents.count())
    // the representative is a member of its own cluster
    val byGroup = groups.groupBy(_._2)
    got.foreach { case (gid, kept, _, _) =>
      assert(byGroup(gid).exists(_._1 == kept), s"kept $kept not in group $gid")
    }
  }

  test("sourceOverlap counts distinct shared fingerprints per source pair") {
    import org.apache.spark.sql.functions.{col, lower, md5, trim}
    def recompute(t: graft.sources.Tables): Seq[(String, String, Long)] = {
      val fpSrc = t.documents
        .select(md5(lower(trim(col("text")))).as("fp"), col("source"))
        .collect().map(r => (r.getString(0), r.getString(1))).distinct
      val bySrc = fpSrc.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).toSet }
      // full pair matrix — zero-overlap pairs are part of the report
      (for {
        (sa, fa) <- bySrc.toSeq; (sb, fb) <- bySrc.toSeq if sa < sb
      } yield (sa, sb, (fa & fb).size.toLong)).sortBy(r => (-r._3, r._1, r._2))
    }
    val got = Dedup.sourceOverlap(tables)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == recompute(tables))
    // the generated corpus may legitimately have zero cross-source dups, so
    // pin the positive behavior by INJECTING mirrors: 3 docs syndicated
    // into a new source must surface as (source, zmirror) pairs with exact
    // shared-fingerprint counts — and duplicate-group size must not
    // inflate them (each mirrored doc is copied twice under distinct ids)
    val docs = tables.documents
    val mirror = docs.filter($"doc_id" < 3)
      .withColumn("source", lit("zmirror"))
    val t2 = tables.withTable("documents",
      docs.union(mirror.withColumn("doc_id", $"doc_id" + 7000000L))
        .union(mirror.withColumn("doc_id", $"doc_id" + 8000000L)))
    val got2 = Dedup.sourceOverlap(t2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got2.toSeq == recompute(t2))
    assert(got2.exists(_._2 == "zmirror"), s"injected mirror pairs missing: ${got2.toSeq}")
  }

  test("lshRecallReport counts agree with its component operators' pair sets") {
    import graft.operators.SetSimilarity
    // the two sides have their own naive-recompute specs; this pins the
    // report to an independent driver-side intersection of their outputs
    val truth = SetSimilarity.jaccardSelfJoin(
      tables.documents.select($"doc_id",
        explode(array_distinct(Dedup.shingles($"text", 2))).as("token")), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashCandidatesCore(tables, minEstJaccard = 0.0)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = truth.intersect(cand)
    val row = Dedup.lshRecallReport(tables).collect()(0)
    assert(row.getLong(0) == truth.size && row.getLong(1) == cand.size &&
      row.getLong(2) == hit.size,
      s"counts ${(row.getLong(0), row.getLong(1), row.getLong(2))} vs " +
        s"${(truth.size, cand.size, hit.size)}")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    if (truth.nonEmpty)
      assert(row.getDouble(3) == r6(hit.size.toDouble / truth.size))
    if (cand.nonEmpty)
      assert(row.getDouble(4) == r6(hit.size.toDouble / cand.size))
    assert(hit.size <= math.min(truth.size, cand.size))
  }

  test("duplicateSpans: injected two-span doc localizes both; naive recompute agrees") {
    import org.apache.spark.sql.functions.{col, lit}
    // doc A embeds two 10-token runs from doc B, separated by >L unique
    // tokens → exactly 2 merged spans of 10 tokens each (L=8: positions
    // p..p+2 of each run are duplicated starts, covering [p, p+10))
    val runs = (0 until 10).map(i => s"runx$i").mkString(" ")
    val runy = (0 until 10).map(i => s"runy$i").mkString(" ")
    val fillA = (0 until 12).map(i => s"fila$i").mkString(" ")
    val docA = s"$runs $fillA $runy"
    val docB = s"$runs ${(0 until 12).map(i => s"filb$i").mkString(" ")} $runy"
    val injected = Seq(
      (9100000L, docA, "en", "synthA", docA.length.toLong),
      (9100001L, docB, "en", "synthB", docB.length.toLong))
    val t2 = tables.withTable("documents",
      tables.documents.unionByName(
        spark.createDataFrame(injected).toDF("doc_id", "text", "lang", "source", "n_chars")))
    val got = Dedup.duplicateSpans(t2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // both injected docs: 2 spans, 10+10 duplicated tokens of 32
    Seq(9100000L, 9100001L).foreach { id =>
      assert(got(id) == ((2L, 20L, 32L)), s"doc $id: ${got(id)}")
    }
    // full naive recompute on the base corpus
    val L = 8
    val docs = tables.documents.collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq)
    val shingleDocs = scala.collection.mutable.Map[String, Set[Long]]()
    docs.foreach { case (id, tk) =>
      tk.sliding(L).filter(_.length == L).foreach { s =>
        val key = s.mkString(" ")
        shingleDocs(key) = shingleDocs.getOrElse(key, Set.empty) + id
      }
    }
    val want = docs.flatMap { case (id, tk) =>
      if (tk.length < L) None else {
        val starts = (0 to tk.length - L)
          .filter(p => shingleDocs(tk.slice(p, p + L).mkString(" ")).size >= 2)
        if (starts.isEmpty) None else {
          // interval merge with the gap-> L rule
          var spans = List.empty[(Int, Int)]
          starts.foreach { p =>
            spans match {
              case (s0, e0) :: rest if p <= e0 => // overlap or adjacent (gap <= L)
                spans = (s0, math.max(e0, p + L)) :: rest
              case _ => spans = (p, p + L) :: spans
            }
          }
          val dupTok = spans.map { case (s0, e0) => e0 - s0 }.sum
          Some(id -> (spans.length.toLong, dupTok.toLong, tk.length.toLong))
        }
      }
    }.toMap
    val base = Dedup.duplicateSpans(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(base == want, s"${base.size} vs ${want.size}")
  }

  test("sampled recall harness: pct=100 is the full report; pct=50 restricts to the hash sample") {
    import org.apache.spark.sql.functions.{pmod, xxhash64}
    val full = Dedup.lshRecallReport(tables).collect()(0)
    // pct=100 keeps every document — identical report by construction
    val all = Dedup.lshRecallReport(tables, samplePct = Some(100)).collect()(0)
    assert(all.toSeq == full.toSeq, s"pct=100 diverged: ${all.toSeq} vs ${full.toSeq}")
    // pct=50: recompute the ground truth restricted to the sampled docs and
    // pin the sampled report's counts to it (sampling commutes with truth)
    val sampled = Dedup.lshRecallReport(tables, samplePct = Some(50)).collect()(0)
    val keep = tables.documents
      .filter(pmod(xxhash64($"doc_id"), lit(100)) < 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keep.nonEmpty && keep.size < tables.documents.count())
    val truth = graft.operators.SetSimilarity.jaccardSelfJoin(
      tables.documents.select($"doc_id",
        explode(array_distinct(Dedup.shingles($"text", 2))).as("token")), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => keep(a) && keep(b) }.toSet
    assert(sampled.getLong(0) == truth.size,
      s"sampled n_true ${sampled.getLong(0)} vs restricted truth ${truth.size}")
    assert(sampled.getLong(1) <= full.getLong(1))
  }

  test("simhash hamming pairs: banded join equals brute force over the corpus") {
    // ground truth from the fingerprints themselves: every pair within
    // Hamming 3 — the pigeonhole banding must lose NOTHING (it is exact
    // for hamming <= blocks-1, not probabilistic like minhash bands)
    val fps = Dedup.simhashFingerprints(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    val got = Dedup.simhashHammingPairs(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  test("simhash hamming pairs: identical docs pair at 0, near-identical within 3, plan has no cartesian") {
    val docs = tables.documents
    val twin = docs.filter($"doc_id" === 0L)
      .withColumn("doc_id", lit(9000000L)) // byte-identical → hamming 0
    // doubling the text doubles every bit vote without changing any sign,
    // so the simhash is IDENTICAL — the multiset-scaling invariance that
    // makes simhash a content fingerprint rather than a length fingerprint
    val doubled = docs.filter($"doc_id" === 1L)
      .withColumn("doc_id", lit(9000001L))
      .withColumn("text", concat($"text", lit(" "), $"text"))
    val t = tables.withTable("documents", docs.union(twin).union(doubled))
    val df = Dedup.simhashHammingPairs(t)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.contains((0L, 9000000L, 0)), s"identical twin missing: ${got.take(20).toSeq}")
    assert(got.contains((1L, 9000001L, 0)),
      s"doubled-text twin missing: ${got.filter(_._1 == 1L).toSeq}")
    // candidate generation must be the block equi-join, never all-pairs
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("ngramNovelty: originals are fully novel, copies contribute zero, deciles band by id") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"), // exact copy of doc 0
      (2L, "one two three four five six seven")    // all-new shingles
    ).toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(tables.withTable("documents", docs))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // deciles of ids 0,1,2 with max 2: floor(id*10/3) = 0, 3, 6
    assert(got == Map(0L -> ((1L, 1.0)), 3L -> ((1L, 0.0)), 6L -> ((1L, 1.0))),
      got.toString)
  }

  test("dupInflation: per-source accounting matches the near-dup grouping it rides on") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val groups = Dedup.nearDupGroups(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = tables.documents.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong))
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, xs) =>
      val kept = xs.filter(d => groups(d._1) == d._1)
      (src, xs.length.toLong, xs.map(_._3).sum, kept.length.toLong,
        kept.map(_._3).sum,
        if (kept.map(_._3).sum > 0) Some(r6(xs.map(_._3).sum.toDouble / kept.map(_._3).sum))
        else None)
    }
    val got = graft.operators.Dedup.dupInflation(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(got.toSeq == want, s"engine ${got.toSeq.take(3)} vs local ${want.take(3)}")
    assert(got.forall(_._6.forall(_ >= 1.0)))
    // non-vacuous whenever the grouping found any cluster (it does at the
    // verify SF; at this fixture SF the assert is conditional)
    if (groups.exists { case (d, g) => d != g })
      assert(got.exists(_._6.exists(_ > 1.0)), "clusters exist but no inflation showed")
  }

  test("bbitMinhashAudit: agreements match a local recompute; 1-bit correction is unbiased-form") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sigs = tables.documents
      .select(col("doc_id"), graft.functions.HashFunctions
        .minhashSigText(col("text"), 2, 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val pairs = Dedup.lshVerifiedPairs(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty, "need verified pairs for the audit to be non-vacuous")
    val got = Dedup.bbitMinhashAudit(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.length == pairs.length)
    got.foreach { case (a, b, j, ef, e1, errF, err1) =>
      val (sa, sb) = (sigs(a), sigs(b))
      val full = sa.zip(sb).count { case (x, y) => x == y }
      val par = sa.zip(sb).count { case (x, y) =>
        java.lang.Math.floorMod(x, 2L) == java.lang.Math.floorMod(y, 2L) }
      assert(ef == r6(full / 64.0), s"pair ($a,$b) full agreement")
      assert(e1 == r6(2.0 * (par / 64.0) - 1.0), s"pair ($a,$b) 1-bit estimate")
      assert(errF == r6(math.abs(ef - j)) && err1 == r6(math.abs(e1 - j)))
    }
    // the 1-bit estimator works at all: its mean error stays within a few
    // 1/sqrt(k) of the full-width estimator's on this pair population
    val mf = got.map(_._6).sum / got.length
    val m1 = got.map(_._7).sum / got.length
    assert(m1 < mf + 3.0 / math.sqrt(64.0), s"1-bit err $m1 vs full err $mf")
  }
}
