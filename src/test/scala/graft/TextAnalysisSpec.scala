package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("textStats counts tokens and characters") {
    val t = tables.withTable("documents",
      Seq((1L, "hello world foo"), (2L, "  one  two  ")).toDF("doc_id", "text"))
    val rows = TextAnalysis.textStats(t).collect()
    assert(rows(0).getLong(1) == 15 && rows(0).getLong(2) == 3) // chars, tokens
    assert(rows(1).getLong(2) == 2) // trim + \s+ split
  }

  test("topTerms ranks by frequency with alphabetical tie-break") {
    val t = tables.withTable("documents",
      Seq((1L, "b b b a a c"), (2L, "a z z")).toDF("doc_id", "text"))
    val got = TextAnalysis.topTerms(t, 3).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq("a" -> 3L, "b" -> 3L, "z" -> 2L))
  }

  test("qualityScore features are in range and deterministic") {
    val rows = TextAnalysis.qualityScore(tables).collect()
    assert(rows.length == tables.documents.count())
    rows.foreach { r =>
      val stop = r.getDouble(3); val punct = r.getDouble(4); val q = r.getDouble(5)
      assert(stop >= 0 && stop <= 1 && punct >= 0 && punct <= 1 && q >= 0 && q <= 1)
    }
  }

  test("languageId picks the language whose markers dominate") {
    val t = tables.withTable("documents", Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze und der vogel"),
      (3L, "le chat et les chiens et le loup"),
      (4L, "我不是的了好"),
    ).toDF("doc_id", "text"))
    val got = TextAnalysis.languageId(t).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en", s"got $got")
    assert(got(2L) == "de", s"got $got")
    assert(got(3L) == "fr", s"got $got")
    assert(got(4L) == "zh", s"got $got")
  }

  test("topTermsSketch honors the SpaceSaving guarantees against exact counts") {
    val exact = TextAnalysis.topTerms(tables, 1000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val capacity = 64
    val sketch = TextAnalysis.topTermsSketch(tables, capacity, capacity).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sketch.nonEmpty)
    val inSketch = sketch.map(_._1).toSet
    // guarantee 1: every heavy hitter (freq > n/capacity) is present
    exact.filter(_._2 > total / capacity).keys.foreach { term =>
      assert(inSketch.contains(term), s"heavy hitter '$term' missing from sketch")
    }
    // guarantee 2: est - err <= true <= est for tracked items
    sketch.foreach { case (term, est, err) =>
      val truth = exact.getOrElse(term, 0L)
      assert(truth <= est && truth >= est - err,
        s"'$term': true=$truth not in [est-err=${est - err}, est=$est]")
    }
  }

  test("topTermsSketchVerified: rows are the exact top-k and every contract flag is earned") {
    val exact = TextAnalysis.topTerms(tables, 25).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = TextAnalysis.topTermsSketchVerified(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // the output rows ARE the exact top-k (deterministic, oracle-replayable)
    assert(got.map(g => (g._1, g._2)).toSeq == exact.toSeq,
      "verified rows diverge from the exact top-k arm")
    // the SpaceSaving presence+bounds contract held for every row
    assert(got.forall(_._3 == 1),
      s"sketch contract violated: ${got.filter(_._3 != 1).mkString(", ")}")
  }

  test("freq sketch merge keeps est bounds when an item was evicted on one side") {
    import graft.functions.FreqSketchBuffer
    // capacity 2; A: x appears 100 times
    val a = new FreqSketchBuffer(2)
    (1 to 100).foreach(_ => a.add("x"))
    // B: x appears 50 times, then y and z evict it
    val b = new FreqSketchBuffer(2)
    (1 to 50).foreach(_ => b.add("x"))
    (1 to 60).foreach(_ => b.add("y"))
    (1 to 60).foreach(_ => b.add("z"))
    a.mergeIn(b)
    // true count of x is 150; a sound merge must keep true <= est and
    // est - err <= true (the naive per-item merge reported est=100, err=0)
    val estX = a.counts.getOrElse("x", 0L)
    val errX = a.errors.getOrElse("x", 0L)
    assert(estX >= 150L, s"est($estX) underestimates true count 150")
    assert(estX - errX <= 150L, s"lower bound ${estX - errX} exceeds true count 150")
  }

  test("fingerprints: equal normalized text → equal fingerprint") {
    val t = tables.withTable("documents",
      Seq((1L, "Some Text"), (2L, "  some text "), (3L, "other")).toDF("doc_id", "text"))
    val fp = TextAnalysis.fingerprints(t).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }

  test("gopherFilter: each rule rejects its violation, clean docs pass") {
    val t = tables.withTable("documents", Seq(
      (1L, "the quick brown fox jumps over a lazy dog today"), // clean → pass
      (2L, "one two"),                                         // too few tokens
      (3L, "pneumonoultramicroscopic silicovolcanoconiosis " +
        "the antidisestablishmentarianism floccinaucinihilipilification"), // mean len > 10
      (4L, "the cat sat the cat sat the cat sat the cat sat"), // dup3_frac high
      (5L, "quick brown fox jumps over lazy dog today now")    // no stopword
    ).toDF("doc_id", "text"))
    val got = TextAnalysis.gopherFilter(t).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("pass"))).toMap
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L), got.toString)
    // metric spot-check: doc 4 has 12 tokens → 10 trigrams, 3 distinct
    val d4 = TextAnalysis.gopherFilter(t).filter($"doc_id" === 4L).head()
    assert(d4.getDouble(d4.fieldIndex("dup3_frac")) == 0.7)
  }

  test("tfIdfTopTerms: corpus-wide terms score zero, distinctive terms rank first") {
    val t = tables.withTable("documents", Seq(
      (1L, "common zebra zebra common"),
      (2L, "common yak common"),
      (3L, "common common xray")).toDF("doc_id", "text"))
    val rows = TextAnalysis.tfIdfTopTerms(t, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    // "common" is in every doc → idf = ln(1) = 0 → never outranks a
    // distinctive term; each doc's rank-1 term is its unique one
    val rank1 = rows.filter(_._4 == 1L).map(r => r._1 -> r._2).toMap
    assert(rank1 == Map(1L -> "zebra", 2L -> "yak", 3L -> "xray"), rows.mkString(", "))
    assert(rows.filter(_._2 == "common").forall(_._3 == 0.0))
    // tf weighting: zebra appears twice → score 2·ln(3)
    val z = rows.find(r => r._1 == 1L && r._2 == "zebra").get._3
    assert(math.abs(z - math.round(2 * math.log(3) * 1e6) / 1e6) < 1e-9)
  }

  test("quality metrics and PII redaction stay narrow (no Exchange in the plan)") {
    val m = planOf(TextAnalysis.gopherMetrics(tables.documents))
    assert(!m.contains("Exchange"), s"gopherMetrics must not shuffle:\n$m")
    val p = planOf(TextAnalysis.redactPii(tables.documents))
    assert(!p.contains("Exchange"), s"redactPii must not shuffle:\n$p")
  }

  test("lmScore matches hand-computed smoothed bigram NLL on a tiny corpus") {
    val t = tables.withTable("documents", Seq(
      (1L, "a b a b a b"), // bigrams (a,b)×3, (b,a)×2
      (2L, "x y"),         // one rare bigram
      (3L, "q"),           // no bigrams → no row
      (4L, "")).toDF("doc_id", "text"))
    val got = TextAnalysis.lmScore(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    // c2: (a,b)=3 (b,a)=2 (x,y)=1; c1: a=3 b=2 x=1; vocab {a,b,x,y} = 4
    val nll1 = (3 * -math.log((3 + 1.0) / (3 + 4)) + 2 * -math.log((2 + 1.0) / (2 + 4))) / 5
    val nll2 = -math.log((1 + 1.0) / (1 + 4))
    assert(got(1L)._1 == 5L && got(2L)._1 == 1L)
    assert(math.abs(got(1L)._2 - math.round(nll1 * 1e6) / 1e6) < 1e-9, got(1L).toString)
    assert(math.abs(got(2L)._2 - math.round(nll2 * 1e6) / 1e6) < 1e-9, got(2L).toString)
    // the predictable template doc scores LOWER (more likely) than the rare one
    assert(got(1L)._2 < got(2L)._2)
  }

  test("redactPii replaces emails, IPs, and phones with typed placeholders") {
    val docs = Seq(
      (1L, "contact alice@example.com or bob.smith+tag@sub.domain.org now"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 responded"),
      (3L, "call +1 (555) 123-4567 or 555-867-5309 today"),
      (4L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(r.fieldIndex("text_redacted")),
        r.getLong(r.fieldIndex("n_redactions")))).toMap
    assert(got(1L) == ("contact <EMAIL> or <EMAIL> now", 2L))
    assert(got(2L) == ("server at <IP> and <IP> responded", 2L))
    assert(got(3L)._2 == 2L)
    assert(got(3L)._1 == "call <PHONE> or <PHONE> today", got(3L)._1)
    assert(got(4L) == ("nothing sensitive here at all", 0L))
  }

  test("redactPii is idempotent: placeholders match none of the patterns") {
    val docs = Seq(
      (1L, "contact alice@example.com or call +1 (555) 123-4567 at 10.0.0.1"),
      (2L, "plain text stays plain")).toDF("doc_id", "text")
    val once = TextAnalysis.redactPii(docs)
      .select(col("doc_id"), col("text_redacted").as("text"))
    val twice = TextAnalysis.redactPii(once).collect()
    assert(twice.nonEmpty)
    twice.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_redactions")) == 0L,
        "second pass must find nothing")
      assert(r.getString(r.fieldIndex("text_redacted")) ==
        r.getString(r.fieldIndex("text")), "second pass must not change text")
    }
  }

  test("redactPii: an IPv4 is redacted as <IP>, never half-eaten by the phone pass") {
    val docs = Seq((1L, "ip 172.16.254.1 logged")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(docs).head()
    assert(r.getString(r.fieldIndex("text_redacted")) == "ip <IP> logged")
    assert(r.getLong(r.fieldIndex("n_redactions")) == 1L)
  }

  test("pmiBigrams matches a driver-side PMI recompute, no shuffle before the counts") {
    val toks = tables.documents.collect().map { r =>
      r.getString(r.fieldIndex("text")).toLowerCase.trim
        .split("\\s+").filter(_.nonEmpty).toSeq
    }
    val uni = toks.flatten.groupBy(identity).map { case (w, hits) => w -> hits.length.toLong }
    val n1 = uni.values.sum.toDouble
    val big = toks.filter(_.length >= 2)
      .flatMap(tk => tk.zip(tk.tail))
      .groupBy(identity).map { case (p, hits) => p -> hits.length.toLong }
    val n2 = big.values.sum.toDouble
    // rank on the PMI-monotone ratio exactly as the operator does (ln only
    // decorates the payload), same op order
    val expected = big.toSeq.filter(_._2 >= 10).map { case ((a, b), c) =>
      val r = c.toDouble * n1 * n1 / (n2 * uni(a) * uni(b))
      (a, b, c, r,
        BigDecimal(math.log(r)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (-t._4, t._1, t._2)).take(30)
      .map { case (a, b, c, _, pmi) => (a, b, c, pmi) }
    val got = TextAnalysis.pmiBigrams(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 30)
    assert(got.toSeq == expected)
  }

  test("vocabOov: full-vocabulary coverage is zero OOV; top-1 vocab counts exactly") {
    val toks = tables.documents.collect().flatMap { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      r.getString(r.fieldIndex("text")).toLowerCase.trim
        .split("\\s+").filter(_.nonEmpty).map(id -> _)
    }
    val nVocab = toks.map(_._2).distinct.length
    val full = TextAnalysis.vocabOov(tables, vocabSize = nVocab).collect()
    assert(full.nonEmpty && full.forall(_.getDouble(3) == 0.0))
    // top-1 vocabulary: OOV = every instance of any non-modal token
    val top = toks.map(_._2).groupBy(identity).map { case (w, h) => (w, h.length) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.head._1
    val expected = toks.groupBy(_._1).map { case (d, ws) =>
      d -> (ws.length.toLong, ws.count(_._2 != top).toLong)
    }
    val got = TextAnalysis.vocabOov(tables, vocabSize = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("vocabOov plans the vocabulary boundary as TakeOrderedAndProject, not a global Window") {
    val plan = TextAnalysis.vocabOov(tables).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    // the only acceptable Window is none at all: the old single-partition
    // row_number funnelled the full unigram table through one task
    assert(!plan.contains("Window"), s"unexpected Window in plan:\n$plan")
  }

  test("longestDocPerSource picks the max-length doc with deterministic ties") {
    val rows = TextAnalysis.longestDocPerSource(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = tables.documents.select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._1)
    assert(rows.map(_._1).toSet == bySrc.keySet)
    rows.foreach { case (s, nd, mx, id) =>
      val ds = bySrc(s)
      assert(nd == ds.length)
      assert(mx == ds.map(_._3).max)
      // composite key (n_chars, doc_id): ties resolve to the LARGEST doc_id
      assert(id == ds.filter(_._3 == mx).map(_._2).max, s"source $s")
    }
  }

  test("zipfSlope is non-positive and ranks at most topV terms per source") {
    val rows = TextAnalysis.zipfSlope(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, nTerms, slope) =>
      assert(nTerms <= 100, s)
      // frequency is non-increasing in rank, so the log-log slope can't be
      // positive
      assert(slope <= 0.0, s"source $s slope $slope")
    }
  }

  test("bpeTokenStats matches a driver-side regex recompute") {
    val rows = TextAnalysis.bpeTokenStats(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = tables.documents.select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val pat = " ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+".r
    rows.foreach { case (d, nWs, nBpe, cpt) =>
      val (text, nChars) = docs(d)
      val lower = text.trim.toLowerCase
      val ws = lower.split("\\s+").count(_.nonEmpty)
      val bpe = pat.findAllIn(lower).length
      assert(nWs == ws, s"doc $d ws")
      assert(nBpe == bpe, s"doc $d bpe")
      assert(math.abs(cpt - nChars.toDouble / math.max(bpe, 1)) < 1e-5, s"doc $d cpt")
    }
  }

  test("langConfusion partitions the corpus and agrees with languageId") {
    val rows = TextAnalysis.langConfusion(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum == tables.documents.count())
    val preds = TextAnalysis.languageId(tables).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val langs = tables.documents.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = langs.toSeq.map { case (d, l) => (l, preds(d)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == expected)
  }

  test("tokenEntropy matches a driver-side recompute and is bounded by ln(n)") {
    val rows = TextAnalysis.tokenEntropy(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val docs = tables.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (d, n, h) =>
      val toks = docs(d).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(n == toks.length, s"doc $d")
      val counts = toks.groupBy(identity).map(_._2.length)
      val expect = math.log(n.toDouble) -
        counts.map(c => c * math.log(c.toDouble)).sum / n
      assert(math.abs(h - expect) < 1e-5, s"doc $d")
      // the emitted value is round(·, 6): allow the half-step of that grid
      assert(h >= -5e-7 && h <= math.log(n.toDouble) + 5e-7, s"doc $d bounds")
    }
  }

  test("tfidfSearch matches a driver-side sparse-cosine recompute") {
    val got = TextAnalysis.tfidfSearch(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val docs = tables.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_._2.nonEmpty).toMap
    val tf = docs.map { case (id, toks) =>
      id -> toks.groupBy(identity).map { case (w, hits) => w -> hits.length.toLong }
    }
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, hs) => w -> hs.size }
    val n = tf.size
    val wts = tf.map { case (id, m) =>
      id -> m.map { case (w, c) =>
        w -> c * (math.log((n + 1.0) / (dfreq(w) + 1.0)) + 1.0)
      }
    }
    val nrm = wts.map { case (id, m) => id -> math.sqrt(m.values.map(x => x * x).sum) }
    def cosine(q: Long, d: Long): Double = {
      val (a, b) = (wts(q), wts(d))
      val dot = a.keysIterator.filter(b.contains).map(w => a(w) * b(w)).sum
      dot / (nrm(q) * nrm(d))
    }
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 5, s"query $q")
      rows.foreach { case (_, nb, cos) =>
        assert(nb != q)
        assert(math.abs(cos - cosine(q, nb)) < 1e-5, s"($q,$nb)")
      }
      // top-k property on the ROUNDED cosine: no unpicked candidate may
      // strictly beat a picked one at 6-decimal resolution
      val picked = rows.map(_._2).toSet
      val worst = rows.map(r => math.round(cosine(q, r._2) * 1e6)).min
      wts.keys.filter(d => d != q && !picked(d)).foreach { d =>
        assert(math.round(cosine(q, d) * 1e6) <= worst,
          s"query $q missed better neighbor $d")
      }
    }
  }

  test("bm25Search matches a driver-side recompute") {
    val got = TextAnalysis.bm25Search(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val docs = tables.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_._2.nonEmpty).toMap
    val tf = docs.map { case (id, toks) =>
      id -> toks.groupBy(identity).map { case (w, hits) => w -> hits.length.toLong }
    }
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, hs) => w -> hs.size }
    val n = tf.size
    val avgLen = tf.values.map(_.values.sum).sum.toDouble / n
    def bm25(q: Long, d: Long): Double = {
      val (k1, b) = (1.2, 0.75)
      val len = tf(d).values.sum
      tf(q).keysIterator.filter(tf(d).contains).map { w =>
        val idf = math.log((n - dfreq(w) + 0.5) / (dfreq(w) + 0.5) + 1.0)
        idf * (tf(d)(w) * (k1 + 1.0)) / (tf(d)(w) + k1 * (1.0 - b + b * len / avgLen))
      }.sum
    }
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 5, s"query $q")
      rows.foreach { case (_, nb, s) =>
        assert(nb != q)
        assert(math.abs(s - bm25(q, nb)) < 1e-4, s"($q,$nb): $s vs ${bm25(q, nb)}")
      }
    }
  }

  test("round-10 text operators plan no cartesian products") {
    // the 1-row / source-cardinality broadcast cross joins must plan as
    // BroadcastNestedLoopJoin over a broadcast side, never CartesianProduct
    Seq(
      TextAnalysis.importanceWeights(tables),
      TextAnalysis.sourceKlDivergence(tables),
      TextAnalysis.oovCurve(tables),
      TextAnalysis.tfidfSearch(tables),
      TextAnalysis.qualityModel(tables)).foreach { df =>
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }

  test("sourceKlDivergence matches a driver-side recompute and is non-negative") {
    val got = TextAnalysis.sourceKlDivergence(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = tables.documents.select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
    val bySrc = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(_._2).groupBy(identity).map { case (w, hits) => w -> hits.length.toLong }
    }
    val corpus = bySrc.values.flatten
      .groupBy(_._1).map { case (w, cs) => w -> cs.map(_._2).sum }
    val (nc, v) = (corpus.values.sum, corpus.size.toLong)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (s, cs) =>
      val ns = cs.values.sum
      val kl = corpus.map { case (w, cw) =>
        val p = (cs.getOrElse(w, 0L) + 1.0) / (ns + v)
        val q = (cw + 1.0) / (nc + v)
        p * math.log(p / q)
      }.sum
      val (gn, gk) = got(s)
      assert(gn == ns, s"source $s totals")
      assert(math.abs(gk - kl) < 1e-4, s"source $s: $gk vs $kl")
      // Gibbs: KL of the smoothed distributions is >= 0 up to the
      // truncated smoothed tail (p sums over observed vocab only here)
      assert(gk > -0.1, s"source $s suspicious KL $gk")
    }
  }

  test("qualityModel matches a driver-side GD recompute and separates the target source") {
    val got = TextAnalysis.qualityModel(tables).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val docs = tables.documents.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
      .sortBy(_._1)
    assert(got.length == docs.length)
    // identical feature pipeline, GD loop, and scoring on the driver
    val raw = docs.map { case (id, src, toks) =>
      val y = if (src == "src0") 1.0 else 0.0
      val f1 = math.log(1.0 + toks.length)
      val f2 = toks.map(_.length).sum.toDouble / toks.length
      val f3 = toks.distinct.length.toDouble / toks.length
      (id, y, Array(f1, f2, f3))
    }
    val n = raw.length
    val ms = (0 to 2).map(j => raw.map(_._3(j)).sum / n)
    val ss = (0 to 2).map(j =>
      math.sqrt(raw.map(r => math.pow(r._3(j) - ms(j), 2)).sum / n))
    val feat = raw.map { case (id, y, f) =>
      (id, y, Array(1.0) ++ (0 to 2).map(j =>
        (f(j) - ms(j)) / (if (ss(j) == 0.0) 1.0 else ss(j))))
    }
    var w = Array(0.0, 0.0, 0.0, 0.0)
    def sig(x: Array[Double]) =
      1.0 / (1.0 + math.exp(-(x(0) * w(0) + x(1) * w(1) + x(2) * w(2) + x(3) * w(3))))
    for (_ <- 1 to 5) {
      val g = Array.tabulate(4)(i => feat.map { case (_, y, x) => (y - sig(x)) * x(i) }.sum)
      w = Array.tabulate(4)(i => w(i) + g(i) / n)
    }
    val expect = feat.map { case (id, y, x) => id -> (y.toInt, sig(x)) }.toMap
    got.foreach { case (id, lbl, score) =>
      val (ey, es) = expect(id)
      assert(lbl == ey, s"doc $id label")
      assert(math.abs(score - es) < 1e-4, s"doc $id: $score vs $es")
    }
    // the trained model must rank the weakly-supervised positives higher
    val pos = got.filter(_._2 == 1).map(_._3)
    val neg = got.filter(_._2 == 0).map(_._3)
    assert(pos.sum / pos.size > neg.sum / neg.size)
  }

  test("oovCurve is monotone in vocab size and matches a driver-side recompute") {
    val got = TextAnalysis.oovCurve(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(8, 16, 32, 64, 128))
    // more vocabulary can only lower the OOV rate
    got.sliding(2).foreach { case Array(a, b) => assert(b._3 <= a._3 + 1e-12) }
    val toks = tables.documents.select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val ranked = toks.groupBy(identity).map { case (w, hits) => (w, hits.length.toLong) }
      .toSeq.sortBy { case (w, n) => (-n, w) }
    got.foreach { case (v, inVocab, rate) =>
      val expect = ranked.take(v).map(_._2).sum
      assert(inVocab == expect, s"V=$v")
      assert(math.abs(rate - (1.0 - expect.toDouble / toks.length)) < 1e-6, s"V=$v")
    }
  }

  test("oovCurve plans the vocabulary boundary as TakeOrderedAndProject") {
    val plan = planOf(TextAnalysis.oovCurve(tables))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("importanceWeights matches a driver-side smoothed log-ratio recompute") {
    val got = TextAnalysis.importanceWeights(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = tables.documents.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
    assert(got.size == docs.length)
    val cc = scala.collection.mutable.Map.empty[String, Long]
    val ct = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, src, toks) =>
      toks.foreach { w =>
        cc(w) = cc.getOrElse(w, 0L) + 1
        if (src == "src0") ct(w) = ct.getOrElse(w, 0L) + 1
      }
    }
    val (nc, nt, v) = (cc.values.sum, ct.values.sum, cc.size.toLong)
    docs.foreach { case (id, _, toks) =>
      val expect = toks.map { w =>
        math.log((ct.getOrElse(w, 0L) + 1.0) / (nt + v)) -
          math.log((cc(w) + 1.0) / (nc + v))
      }.sum
      val (n, lw) = got(id)
      assert(n == toks.length, s"doc $id")
      assert(math.abs(lw - expect) < 1e-4, s"doc $id: $lw vs $expect")
    }
    // the target source's documents must score higher on average than the
    // rest — the property importance resampling relies on
    val bySrc = docs.map { case (id, src, _) => (src == "src0", got(id)._2) }
    val tAvg = bySrc.filter(_._1).map(_._2)
    val oAvg = bySrc.filterNot(_._1).map(_._2)
    assert(tAvg.sum / tAvg.size > oAvg.sum / oAvg.size)
  }

  test("lengthBandFilter keeps the central p5–p95 mass per language") {
    val rows = TextAnalysis.lengthBandFilter(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, kept, lo, hi) =>
      assert(lo <= hi, lang)
      assert(kept <= n, lang)
      assert(kept.toDouble / n >= 0.8, s"$lang kept $kept of $n")
      // driver-side recompute of the kept count from the emitted band
      val chars = tables.documents.filter(org.apache.spark.sql.functions.col("lang") === lang)
        .select("n_chars").collect().map(_.getLong(0))
      assert(kept == chars.count(c => c >= lo && c <= hi), lang)
    }
  }

  test("topBigramCoverage matches a driver recompute; boilerplate doc scores near its repeat share") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.topBigramCoverage(tables).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val docs = tables.documents.collect().map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length >= 2) {
        val bs = tk.sliding(2).map(a => (a(0), a(1))).toSeq
        val cnt = bs.groupBy(identity).map { case (b, xs) => b -> xs.length }
        val top = cnt.toSeq.minBy { case ((w1, w2), n) => (-n, w1, w2) }
        val cov = BigDecimal(top._2.toDouble * (top._1._1.length + top._1._2.length + 1) /
          math.max(text.length, 1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val g = got(id)
        assert(g._1 == top._1._1 + " " + top._1._2 && g._2 == top._2.toLong &&
          math.abs(g._3 - cov) < 1e-9, s"doc $id: $g vs ($top, $cov)")
      } else assert(!got.contains(id))
    }
    // injected boilerplate: one bigram repeated wall-to-wall covers ~everything
    val spark2 = spark
    import spark2.implicits._
    val boilerText = ("click here " * 30).trim
    val boiler = Seq((777000L, boilerText, "en", "web", boilerText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t2 = tables.withTable("documents", tables.documents.union(boiler))
    val row = TextAnalysis.topBigramCoverage(t2)
      .filter($"doc_id" === 777000L).collect()(0)
    assert(row.getString(1) == "click here" && row.getDouble(3) > 0.9, row.toString)
  }

  test("NFC normalization: known compositions, idempotence, SQL exposure") {
    import graft.functions.HashImpl
    import org.apache.spark.unsafe.types.UTF8String
    def nfc(x: String) = HashImpl.nfcNormalize(UTF8String.fromString(x)).toString
    assert(nfc("e\u0301") == "\u00e9")          // combining acute composes
    assert(nfc("\u212b") == "\u00c5")           // ANGSTROM -> A-with-ring
    assert(nfc("plain ascii") == "plain ascii")   // identity on ASCII
    assert(nfc(nfc("e\u0301\u212b")) == nfc("e\u0301\u212b")) // idempotent
    // exact dedup now sees the two spellings as one document
    val a = nfc("caf" + "e\u0301"); val b = nfc("caf\u00e9")
    assert(a == b)
    // SQL registration
    graft.Engine(spark, sfDir)
    val viaSql = spark.sql("SELECT nfc_normalize('e\u0301') AS n").head().getString(0)
    assert(viaSql == "\u00e9")
  }

  test("winnowFingerprints: naive recompute, density bound, and the shared-run guarantee") {
    import graft.functions.HashImpl
    import org.apache.spark.unsafe.types.UTF8String
    val K = 3; val W = 4
    def naive(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
      val sel = docs.flatMap { case (id, text) =>
        val tk = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
        if (tk.length < K) None else {
          val gh = tk.sliding(K).map(g =>
            HashImpl.rollingHash(UTF8String.fromString(g.mkString(" ")))).toArray
          val fps =
            if (gh.length >= W) (0 to gh.length - W).map(j => gh.slice(j, j + W).min).distinct
            else Seq(gh.min)
          Some(id -> (gh.length, fps))
        }
      }.toMap
      val byFp = sel.toSeq.flatMap { case (id, (_, fps)) => fps.map(_ -> id) }
        .groupBy(_._1).map { case (fp, xs) => fp -> xs.map(_._2).distinct.size }
      sel.map { case (id, (ng, fps)) =>
        id -> (ng.toLong, fps.size.toLong, fps.count(f => byFp(f) >= 2).toLong)
      }
    }
    val docs = tables.documents.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = naive(docs)
    val got = TextAnalysis.winnowFingerprints(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"${got.size} docs vs ${want.size}")
    // density concentrates near the winnowing bound 2/(w+1) and never exceeds 1
    val dens = TextAnalysis.winnowFingerprints(tables).collect()
      .filter(_.getLong(1) >= 20).map(r => r.getDouble(4))
    assert(dens.nonEmpty && dens.forall(d => d > 0.0 && d <= 1.0))
    // the guarantee: two docs sharing a run of >= w+k-1 tokens share >= 1 fingerprint
    val run = (0 until (W + K - 1)).map(i => s"guarrun$i").mkString(" ")
    val d1 = s"$run ${(0 until 10).map(i => s"lefta$i").mkString(" ")}"
    val d2 = s"${(0 until 10).map(i => s"rightb$i").mkString(" ")} $run"
    val t2 = tables.withTable("documents",
      tables.documents.unionByName(
        Seq((9200000L, d1, "en", "synthw", d1.length.toLong),
          (9200001L, d2, "en", "synthw2", d2.length.toLong))
          .toDF("doc_id", "text", "lang", "source", "n_chars")))
    val g2 = TextAnalysis.winnowFingerprints(t2).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(g2(9200000L) >= 1 && g2(9200001L) >= 1,
      s"shared-run guarantee violated: ${g2(9200000L)}, ${g2(9200001L)}")
  }

  test("bpeMerges: classic fixture learns the expected merges; naive recompute agrees") {
    // the Sennrich et al. running example shape: a tiny corpus where the
    // most frequent pair each round is known by hand
    val fix = tables.withTable("documents",
      Seq((1L, "low low low low low"), (2L, "lower lower"),
        (3L, "newest newest newest newest newest newest"),
        (4L, "widest widest widest"))
        .toDF("doc_id", "text"))
    val got = TextAnalysis.bpeMerges(fix, nMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: (e,s) appears in newest(6) + widest(3) = 9 — the max;
    // round 2: (es,t) 9; round 3: (l,o) in low(5)+lower(2) = 7;
    // round 4: (lo,w) 7
    assert(got == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)), got.toString)

    // naive driver recompute over the real corpus
    def naive(wordFreq: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
      var vocab = wordFreq.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
      val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      for (r <- 1 to n) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (sy, f) =>
          sy.sliding(2).filter(_.length == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
          }
        }
        if (counts.nonEmpty) {
          val ((a, b), c) = counts.toSeq.sortBy { case ((x, y), cnt) => (-cnt, x, y) }.head
          out += ((r, a, b, c))
          vocab = vocab.map { case (sy, f) =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < sy.length) {
              if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) { nb += a + b; i += 2 }
              else { nb += sy(i); i += 1 }
            }
            (nb.result(), f)
          }
        }
      }
      out.toSeq
    }
    val wf = tables.documents.collect()
      .flatMap(r => r.getString(1).toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val want = naive(wf, 8)
    val real = TextAnalysis.bpeMerges(tables, nMerges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(real == want, s"engine $real vs naive $want")
  }

  test("bpeEncode matches a naive driver-side merge application over the corpus") {
    def applyMerges(word: String, merges: Seq[(String, String)]): Int = {
      var sy = word.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) { nb += a + b; i += 2 }
          else { nb += sy(i); i += 1 }
        }
        sy = nb.result()
      }
      sy.length
    }
    val merges = TextAnalysis.bpeMerges(tables, nMerges = 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val expected = tables.documents.collect().flatMap { r =>
      val ws = r.getString(1).toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (ws.isEmpty) None else Some(r.getLong(0) -> (
        ws.length.toLong,
        ws.map(_.length.toLong).sum,
        ws.map(w => applyMerges(w, merges).toLong).sum))
    }.toMap
    val got = TextAnalysis.bpeEncode(tables, nMerges = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // the merge table must actually compress something on this corpus
    assert(got.values.exists { case (_, nch, nbpe) => nbpe < nch },
      "no document compressed — merge table vacuous on the fixture")
  }

  test("tokenizerFertility is the per-language rollup of bpeEncode") {
    val langOf = tables.documents.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = TextAnalysis.bpeEncode(tables).collect()
      .map(r => (langOf(r.getLong(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = perDoc.groupBy(_._1).map { case (lang, xs) =>
      val (w, c, b) = (xs.map(_._2).sum, xs.map(_._3).sum, xs.map(_._4).sum)
      lang -> (xs.length.toLong, w, b,
        BigDecimal(b.toDouble / w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(c.toDouble / b).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextAnalysis.tokenizerFertility(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got == want)
    assert(got.size > 1, "fixture should span multiple languages")
  }

  test("featureHashAudit matches a naive recompute over kernel hashes") {
    import graft.functions.HashFunctions
    val tok = tables.documents
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .withColumn("h", HashFunctions.rollingHash64(col("token")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nVocab = tok.map(_._2).distinct.length.toLong
    def dimOf(h: Long, d: Int): Long = ((h % d) + d) % d
    def cosPairs(key: ((Long, String, Long)) => Any): Map[Long, Double] = {
      val smp = tok.filter(_._1 < 10)
      val cnts = smp.groupBy(r => (r._1, key(r))).view.mapValues(_.length.toLong).toMap
      val norms = cnts.groupBy(_._1._1).view
        .mapValues(_.values.map(c => c * c).sum).toMap
      (0L until 5L).map { p =>
        val dot = cnts.collect {
          case ((d1, k), ca) if d1 == p && cnts.contains((p + 5, k)) =>
            ca * cnts((p + 5, k))
        }.sum
        p -> dot.toDouble / math.sqrt(norms(p).toDouble * norms(p + 5).toDouble)
      }.toMap
    }
    val exact = cosPairs(_._2)
    val want = Seq(64, 256, 1024).map { d =>
      val used = tok.map(r => dimOf(r._3, d)).distinct.length.toLong
      val hashed = cosPairs(r => dimOf(r._3, d))
      val maxErr = (0L until 5L).map(p => math.abs(exact(p) - hashed(p))).max
      (d, nVocab, used,
        BigDecimal(1.0 - used.toDouble / math.min(nVocab, d.toLong))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(maxErr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextAnalysis.featureHashAudit(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == want, s"engine $got vs naive $want")
    // the audit must be informative: collisions shrink as d grows
    assert(got.head._4 >= got.last._4)
  }

  test("featureHashAudit: an EMPTY corpus still emits one row per dim") {
    // the dim axis is seeded from a literal frame (r18 ADVICE): with
    // zero documents the occupancy aggregation has no rows, and a plan
    // seeded from it would emit nothing instead of the contract's
    // per-dim (n_vocab = 0, n_dims_used = 0) rows
    val empty = tables.withTable("documents",
      tables.documents.filter(lit(false)))
    val rows = TextAnalysis.featureHashAudit(empty).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(64, 256, 1024),
      s"dim axis lost on empty corpus: ${rows.mkString(";")}")
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L,
        s"empty corpus must report zero vocab/occupancy: $r")
    }
  }

  test("ccnetBuckets: per-language thirds, ordered head <= middle <= tail, full coverage") {
    val scored = TextAnalysis.lmScore(tables).collect().map(_.getLong(0)).toSet
    val rows = TextAnalysis.ccnetBuckets(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.map(_._1).toSet == scored, "every scored doc gets a bucket")
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._4).view.mapValues(_.length).toMap
      val ns = Seq("head", "middle", "tail").map(sizes.getOrElse(_, 0))
      assert(ns.max - ns.min <= 1, s"$lang thirds unbalanced: $sizes")
      def scores(b: String) = rs.filter(_._4 == b).map(_._3)
      if (scores("head").nonEmpty && scores("tail").nonEmpty) {
        assert(scores("head").max <= scores("tail").min + 1e-9,
          s"$lang: head not the most-predictable third")
      }
    }
  }

  test("ccnetBucketsThreshold: the scale path is row-identical to the ntile witness") {
    val want = TextAnalysis.ccnetBuckets(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq
    val got = TextAnalysis.ccnetBucketsThreshold(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq
    assert(got == want, "threshold banding must equal the ntile witness on the corpus")
  }

  test("tertileBandThreshold: boundary TIES band exactly like ntile (pair cut, not value cut)") {
    // two languages; language "aa" has ALL-TIED scores (the worst case for
    // a value threshold: a pure `score <= cut` would dump every doc into
    // head; the (score, doc_id) pair cut must split 4/3/3 like ntile),
    // language "bb" ties exactly AT the first tertile boundary
    val spark = tables.spark
    import spark.implicits._
    val rows =
      (1L to 10L).map(i => (i, "aa", 5.0)) ++
        (Seq(1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 5.0).zipWithIndex
          .map { case (v, i) => (100L + i, "bb", v) })
    val scored = rows.toDF("doc_id", "lang", "avg_nll")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("avg_nll").asc, col("doc_id").asc)
    val want = scored.withColumn("_nt", ntile(3).over(w))
      .select(col("doc_id"),
        when(col("_nt") === 1, "head").when(col("_nt") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.tertileBandThreshold(scored, nParts = 5)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == want, s"engine $got vs ntile $want")
    // non-vacuity: the fixture really does tie across a boundary
    assert(want.count(_._2 == "head") == 4 + 3,
      "fixture must split tied runs across bands")
  }

  test("lmScoreKneserNey matches a naive driver recompute; continuation differs from frequency") {
    val docs = tables.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
      .filter(_._2.length >= 2)
    val bis = docs.flatMap { case (id, tk) => tk.zip(tk.tail).map(b => (id, b)) }
    val c2 = bis.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nw1 = c2.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val cont = c2.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val tc = c2.size.toLong
    val n1 = c2.values.count(_ == 1L).toLong
    val n2 = c2.values.count(_ == 2L).toLong
    val d = n1.toDouble / (n1 + 2 * n2)
    def p(b: (String, String)): Double =
      (c2(b) - d) / c1(b._1) + ((d * nw1(b._1)) / c1(b._1)) * (cont(b._2).toDouble / tc)
    val want = bis.groupBy(_._1).view.mapValues { rows =>
      val nll = rows.map(r => -math.log(p(r._2)))
      (rows.length.toLong,
        BigDecimal(nll.sum / nll.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = TextAnalysis.lmScoreKneserNey(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, nll)) =>
      assert(n == want(id)._1 && math.abs(nll - want(id)._2) < 2e-6,
        s"doc $id: engine ($n, $nll) vs naive ${want(id)}")
    }
    // the KN ingredient is non-vacuous on this corpus: the continuation
    // distribution (distinct predecessors) must differ from the raw
    // frequency unigram — i.e. cont is not simply proportional to freq
    // for every pair (if it were, the interpolation would reduce to the
    // frequency unigram and the smoothing would add nothing)
    val freq = bis.groupBy(_._2._2).view.mapValues(_.length.toLong).toMap
    val ws = cont.keys.toSeq.sorted
    assert(ws.combinations(2).exists { case Seq(a, b) =>
      cont(a) * freq(b) != cont(b) * freq(a)
    }, "continuation distribution is exactly the frequency unigram — fixture vacuous")
  }

  test("lmScoreKneserNey: no-rare-types corpus takes the fixed-discount fallback (sf0.1 regression)") {
    // every bigram type occurs >= 3 times -> n1 = n2 = 0 -> the
    // Ney-Essen estimate is 0/0; the fallback D = 0.5 must apply (the
    // sf0.1 close-bench DIVIDE_BY_ZERO regression, pinned)
    val spark = tables.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y"), (2L, "x y x y"), (3L, "y x y x y x"))
      .toDF("doc_id", "text")
    val t2 = tables.withTable("documents", docs)
    val rows = TextAnalysis.lmScoreKneserNey(t2).collect()
    assert(rows.length == 3, "fallback path must score every doc, not throw")
    // naive recompute with D = 0.5, checked on doc 1
    val all = Seq("x y x y x y", "x y x y", "y x y x y x")
      .flatMap(t => { val w = t.split(" "); w.zip(w.tail) })
    val cc = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = cc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nw1 = cc.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val cont = cc.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val tc = cc.size.toLong
    val d = 0.5
    def p(b: (String, String)) =
      (cc(b) - d) / c1(b._1) + ((d * nw1(b._1)) / c1(b._1)) * (cont(b._2).toDouble / tc)
    val w1 = "x y x y x y".split(" ")
    val doc1 = w1.zip(w1.tail).map(b => -math.log(p(b)))
    val want1 = BigDecimal(doc1.sum / doc1.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got1 = rows.find(_.getLong(0) == 1L).get.getDouble(2)
    assert(math.abs(got1 - want1) < 2e-6, s"doc1: engine $got1 vs naive $want1 (D=0.5)")
  }

  test("qualityAuc equals the naive pairwise P(s+ > s-) + half-ties computation") {
    val sc = TextAnalysis.qualityModel(tables).collect()
      .map(r => (r.getAs[Number]("score").doubleValue(),
        r.getAs[Number]("label").longValue()))
    val pos = sc.filter(_._2 == 1L).map(_._1)
    val neg = sc.filter(_._2 == 0L).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture vacuous: need both classes")
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want =
      BigDecimal(wins / (pos.length.toDouble * neg.length))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.qualityAuc(tables).collect().head
    assert(got.getLong(0) == pos.length && got.getLong(1) == neg.length)
    assert(math.abs(got.getDouble(2) - want) < 2e-6,
      s"engine AUC ${got.getDouble(2)} vs naive $want")
    assert(math.abs(got.getDouble(3) - (2 * got.getDouble(2) - 1)) < 2e-6,
      "gini must be 2*AUC - 1")
  }

  test("bpeByteFallback: the byte path encodes everything; the closed char vocab cannot") {
    val rows = TextAnalysis.bpeByteFallback(tables).collect()
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    assert(byLang("en").getLong(3) == 0,
      "the training language has no unseen chars by construction")
    byLang.view.filterKeys(_ != "en").values.foreach { r =>
      assert(r.getLong(3) > 0,
        s"${r.getString(0)}: the unseen-char suffix must defeat the closed char vocab (non-vacuity)")
    }
    rows.foreach { r =>
      // structural UNK-freeness of the byte path: every word decomposed
      // into >= 1 symbols, never more symbols than bytes
      assert(r.getLong(5) >= r.getLong(2) && r.getLong(4) >= r.getLong(5),
        s"${r.getString(0)}: words=${r.getLong(2)} tokens=${r.getLong(5)} bytes=${r.getLong(4)}")
    }
  }

  test("miTerms matches a local recompute; discriminative terms outrank uniform ones") {
    val docs = tables.documents.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSet))
    val n = docs.length.toLong
    val nl = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val df = docs.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val topV = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(200)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = topV.map { case (tok, d) =>
      val langs = nl.keys.toSeq.sorted
      var mi = 0.0
      var bestLang = ""; var bestLift = -1.0
      langs.foreach { l =>
        val n1 = docs.count(x => x._2 == l && x._3(tok)).toLong
        val n0 = nl(l) - n1
        def term(c: Long, mt: Long): Double =
          if (c > 0) (c.toDouble / n) * math.log(c.toDouble * n / (mt.toDouble * nl(l))) else 0.0
        mi += term(n0, n - d) + term(n1, d)
        val lift = (n1.toDouble / nl(l)) / (d.toDouble / n)
        if (lift > bestLift) { bestLift = lift; bestLang = l }
      }
      (tok, d, r6(mi), bestLang, r6(bestLift))
    }.sortBy(_._1)
    val got = TextAnalysis.miTerms(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3), r.getDouble(4)))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gt, gd, gm, gl, gf), (wt, wd, wm, wl, wf)) =>
      assert(gt == wt && gd == wd && math.abs(gm - wm) < 2e-6 && gl == wl &&
        math.abs(gf - wf) < 2e-6, s"term $gt: engine ($gm,$gl,$gf) vs local ($wm,$wl,$wf)")
    }
    // the MI ordering is informative: some term separates languages
    assert(got.map(_._3).max > got.map(_._3).min)
  }

  test("qualityCalibration matches a local recompute from the model scores") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = TextAnalysis.qualityModel(tables).collect()
      .map(r => (r.getInt(1).toLong, r.getDouble(2)))
    val want = scored.groupBy { case (_, s) => math.min(math.floor(s * 10).toLong, 9L) }
      .toSeq.sortBy(_._1).map { case (bin, xs) =>
        val si = xs.map { case (_, s) =>
          BigDecimal(s * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }
        val np = xs.map(_._1).sum
        val sq = xs.zip(si).map { case ((y, _), v) =>
          (v - y * 1000000L) * (v - y * 1000000L) }.sum
        (bin, xs.length.toLong,
          r6(si.sum.toDouble / (xs.length.toDouble * 1000000.0)),
          r6(np.toDouble / xs.length),
          r6(sq.toDouble / (xs.length.toDouble * 1000000000000.0)))
      }
    val got = TextAnalysis.qualityCalibration(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want, s"engine ${got.toSeq} vs local $want")
    assert(got.length >= 2, "calibration collapsed to one bin")
  }

  test("heapsLaw matches a local prefix recompute; vocabulary growth is sublinear") {
    val docs = tables.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val n = docs.length
    def trigrams(tk: Array[String]): Seq[String] =
      if (tk.length < 3) Seq()
      else (0 to tk.length - 3).map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}")
    val want = (1 to 10).map { i =>
      val cut = math.floor(i.toLong * n / 10.0).toLong
      val prefix = docs.filter(_._1 < cut)
      (i.toLong, prefix.length.toLong, prefix.map(_._2.length.toLong).sum,
        prefix.flatMap(d => trigrams(d._2)).distinct.length.toLong)
    }
    val got = TextAnalysis.heapsLaw(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq == want,
      s"curve mismatch: ${got.toSeq} vs $want")
    val beta = got.head._5
    assert(beta > 0 && beta < 1, s"Heaps beta out of (0,1): $beta")
    // every row repeats the same fit
    assert(got.map(_._5).distinct.length == 1 && got.map(_._6).distinct.length == 1)
  }

  test("vocabCoverage: exact cumulative shares; the head covers most tokens") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = tables.documents.select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }
    val tot = counts.map(_._2).sum
    val want = counts.zipWithIndex.map { case ((t, n), i) =>
      (i + 1L, t, n, r6(counts.take(i + 1).map(_._2).sum.toDouble / tot))
    }
    val got = TextAnalysis.vocabCoverage(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want, "coverage curve mismatch")
    assert(got.last._4 == 1.0)
    assert(got.take(got.length / 2).last._4 > 0.5,
      "head types should cover the majority of tokens")
  }

  test("readability matches a local regex recompute; bands are non-trivial") {
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cnt(s: String, p: String) = p.r.findAllIn(s).length
    val docs = tables.documents.select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.map { case (lang, text) =>
      val w = cnt(text, "[A-Za-z]+")
      val sy = cnt(text, "[aeiouyAEIOUY]+")
      val se = math.max(cnt(text, "[.!?]+"), 1)
      (lang, 206.835 - 1.015 * (w.toDouble / se.toDouble) -
        84.6 * (sy.toDouble / w.toDouble))
    }.groupBy(_._1).map { case (lang, xs) =>
      (lang, xs.length.toLong, r4(xs.map(_._2).sum / xs.length),
        xs.count(_._2 >= 60.0).toLong, xs.count(_._2 < 30.0).toLong)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.readability(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toSeq
    got.zip(want).foreach { case ((gl, gn, ga, ge, gh), (wl, wn, wa, we, wh)) =>
      assert(gl == wl && gn == wn && ge == we && gh == wh,
        s"$gl: engine counts ($gn,$ge,$gh) vs local ($wn,$we,$wh)")
      assert(math.abs(ga - wa) < 1e-3, s"$gl: avg $ga vs $wa")
    }
    assert(got.length == want.length)
    // the corpus must exercise both bands somewhere (screen non-vacuous)
    assert(got.map(_._4).sum > 0 || got.map(_._5).sum > 0)
  }

  test("jsDivergence matches a local recompute; symmetric-bounded by ln 2") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = tables.documents.select("lang", "text").collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(w => (r.getString(0), w)))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byLang = toks.groupBy(_._1)
    val tot = byLang.view.mapValues(_.length.toLong).toMap
    val langs = byLang.keys.toSeq.sorted
    val want = (for {
      a <- langs; b <- langs if a < b
    } yield {
      val vocab = (byLang(a).map(_._2) ++ byLang(b).map(_._2)).distinct
      val terms = vocab.map { w =>
        val p = counts.getOrElse((a, w), 0L).toDouble / tot(a).toDouble
        val q = counts.getOrElse((b, w), 0L).toDouble / tot(b).toDouble
        (if (p > 0) p * math.log(2.0 * p / (p + q)) else 0.0,
          if (q > 0) q * math.log(2.0 * q / (p + q)) else 0.0)
      }
      (a, b, vocab.length.toLong,
        r6(0.5 * terms.map(_._1).sum + 0.5 * terms.map(_._2).sum))
    }).sortBy(x => (x._1, x._2))
    val got = TextAnalysis.jsDivergence(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.map(x => (x._1, x._2, x._3)) == want.map(x => (x._1, x._2, x._3)))
    got.zip(want).foreach { case ((a, b, _, gj), (_, _, _, wj)) =>
      assert(math.abs(gj - wj) < 1e-4, s"($a,$b): engine $gj vs local $wj")
      assert(gj > 0.0 && gj <= math.log(2.0) + 1e-9, s"($a,$b): out of bounds")
    }
    // divergences must discriminate between pairs
    assert(got.map(_._4).distinct.length > 1)
  }

  test("cohensKappa matches a local confusion recompute; labelers disagree") {
    val docs = tables.documents.select("n_chars", "text").collect()
      .map { r =>
        val a = if (r.getLong(0) >= 300) 1L else 0L
        val b = if (r.getString(1).trim.toLowerCase.split("\\s+")
          .count(_.nonEmpty) >= 55) 1L else 0L
        (a, b)
      }
    val n = docs.length.toLong
    val n11 = docs.count(d => d._1 == 1 && d._2 == 1).toLong
    val n10 = docs.count(d => d._1 == 1 && d._2 == 0).toLong
    val n01 = docs.count(d => d._1 == 0 && d._2 == 1).toLong
    val n00 = docs.count(d => d._1 == 0 && d._2 == 0).toLong
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble / n) * ((n11 + n01).toDouble / n) +
      ((n01 + n00).toDouble / n) * ((n10 + n00).toDouble / n)
    val row = TextAnalysis.cohensKappa(tables).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((n, n11, n10, n01, n00)))
    assert(math.abs(row.getDouble(5) - po) < 1e-6)
    assert(math.abs(row.getDouble(6) - pe) < 1e-6)
    assert(math.abs(row.getDouble(7) - (po - pe) / (1.0 - pe)) < 1e-5)
    // non-vacuity: the labelers genuinely disagree on some docs, agree on
    // others, and kappa beats chance without being perfect
    assert(n10 + n01 > 0 && n11 + n00 > 0)
    assert(row.getDouble(7) > 0.0 && row.getDouble(7) < 1.0)
  }

  test("textRank matches a local weighted-PageRank recompute") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stop = TextAnalysis.Stopwords.toSet
    val seqs = tables.documents.select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split("\\s+")
        .filter(w => w.nonEmpty && !stop(w)))
    val bigrams = seqs.flatMap(tk => tk.zip(tk.drop(1))).filter(p => p._1 != p._2)
    val und = (bigrams ++ bigrams.map(_.swap)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val wt = und.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val inEdges = und.toSeq.map { case ((s, d), w) =>
      (d, s, w.toDouble / wt(s).toDouble)
    }.groupBy(_._1)
    var rank = wt.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      rank = inEdges.view.mapValues(es =>
        0.15 + 0.85 * es.map { case (_, s, p) => rank(s) * p }.sum).toMap
    }
    val want = rank.toSeq.map { case (tok, r) => (tok, wt(tok), r6(r)) }
      .sortBy { case (tok, _, r) => (-r, tok) }.take(25)
    val got = TextAnalysis.textRank(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    got.zip(want).foreach { case ((gt, gd, gr), (wtk, wd, wr)) =>
      assert(gt == wtk && gd == wd && math.abs(gr - wr) < 2e-6,
        s"engine ($gt,$gd,$gr) vs local ($wtk,$wd,$wr)")
    }
    assert(got.length == want.length && got.nonEmpty)
    // PageRank must disagree with raw degree somewhere in the top list
    // (else the iteration is decorative)
    val byDegree = rank.keys.toSeq.sortBy(tok => (-wt(tok), tok)).take(25)
    assert(got.map(_._1) != byDegree, "textrank ordering equals raw degree")
  }

  test("rake matches a local runs/deg-freq recompute; finds multi-word phrases") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stop = TextAnalysis.Stopwords.toSet
    val seqs = tables.documents.select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    // maximal stopword-free runs per document
    val runs = seqs.flatMap { tk =>
      val out = collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      tk.foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) out += cur.reverse; cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) out += cur.reverse
      out
    }
    val freq = runs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val deg = runs.flatMap(r => r.map(w => (w, r.length.toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = runs.map(r => r.mkString(" "))
      .groupBy(identity).toSeq
      .map { case (phrase, occs) =>
        val wsCore = phrase.split(" ").map(w => deg(w).toDouble / freq(w)).sum
        (phrase, occs.length.toLong, phrase.split(" ").length, r6(wsCore))
      }
      .sortBy { case (p, _, _, s) => (-s, p) }.take(20)
    val got = TextAnalysis.rake(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    got.zip(want).foreach { case ((gp, go, gw, gs), (wp, wo, ww, wsc)) =>
      assert(gp == wp && go == wo && gw == ww && math.abs(gs - wsc) < 2e-6,
        s"engine ($gp,$go,$gw,$gs) vs local ($wp,$wo,$ww,$wsc)")
    }
    assert(got.length == want.length && got.nonEmpty)
    // RAKE's point is PHRASES: the top list must contain multi-word ones
    assert(got.exists(_._3 > 1), "no multi-word phrase in the top-20")
  }
}
