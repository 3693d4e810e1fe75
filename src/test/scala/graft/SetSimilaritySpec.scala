package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SetSimilarity}

class SetSimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** The naive reference formulation (explode + token self-join + count
    * ratio) — exactly what the DuckDB oracle computes. Quadratic in document
    * frequency; test-only. */
  private def naive(elems: DataFrame, minJaccard: Double,
                    maxDf: Option[Long]): Set[(Long, Long, Double)] = {
    val tok = maxDf match {
      case Some(m) =>
        val kept = elems.groupBy("token").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= m).select("token")
        elems.join(kept, "token").select("doc_id", "token")
      case None => elems
    }
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val j = col("n_common").cast("double") /
      (col("sa.sz") + col("sb.sz") - col("n_common"))
    tok.as("a")
      .join(tok.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(j >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def run(elems: DataFrame, minJ: Double, maxDf: Option[Long] = None,
                  denseMaxSets: Long = 200000,
                  maskMaxVocab: Int = 4096): Set[(Long, Long, Double)] =
    SetSimilarity.jaccardSelfJoin(elems, minJ, maxDf, denseMaxSets, maskMaxVocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  // fixture: identical sets (1,2), overlapping (3), disjoint (4), and a
  // stopword "hot" carried by everyone
  private def fixture: DataFrame = Seq(
    (1L, "hot a b c"),
    (2L, "c hot b a"),       // identical set as 1 → jaccard 1.0
    (3L, "hot a b d"),       // J(1,3) = 3/5 with hot, 2/4 without
    (4L, "hot x y z"),       // only shares the stopword
    (5L, "")                 // no tokens at all
  ).toDF("doc_id", "text")

  private def elemsOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      explode(array_distinct(expr(
        "filter(split(lower(trim(text)), '\\\\s+'), t -> t != '')"))).as("token"))

  test("matches the naive formulation on the fixture (identical, overlapping, disjoint, empty)") {
    val e = elemsOf(fixture)
    val expected = naive(e, 0.5, None)
    assert(run(e, 0.5) == expected)
    // sanity on content, not just equality: the identical pair is 1.0, the
    // overlap pair is 3/5, the stopword-only pairs fall under the threshold
    assert(expected.contains((1L, 2L, 1.0)))
    assert(expected.contains((1L, 3L, 0.6)) && expected.contains((2L, 3L, 0.6)))
    assert(!expected.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!expected.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("matches naive at threshold 0: every sharing pair surfaces, non-sharing pairs never do") {
    val e = elemsOf(fixture)
    assert(run(e, 0.0) == naive(e, 0.0, None))
  }

  test("maxDf cutoff drops hot tokens on both sides identically") {
    val e = elemsOf(fixture)
    // df("hot") = 4 > 3 → dropped; doc 4 then shares nothing
    val expected = naive(e, 0.4, Some(3L))
    val got = run(e, 0.4, maxDf = Some(3L))
    assert(got == expected)
    assert(got.contains((1L, 2L, 1.0)))
    assert(got.contains((1L, 3L, 0.5))) // 2/4 once "hot" is gone
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("the df cutoff is applied below the candidate join (plan shape)") {
    // eager=false: the default eagerly checkpoints, which truncates the
    // inspectable lineage to a LogicalRDD
    val df = SetSimilarity.jaccardSelfJoin(elemsOf(fixture), 0.5,
      maxDf = Some(3L), eager = false)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("_df"), s"df-cutoff filter missing from plan:\n$plan")
    spark.catalog.clearCache() // lazy mode leaves intermediates cached by design
  }

  test("prefix path (PPJoin) produces exactly the dense-path result") {
    val e = elemsOf(fixture)
    val dense = run(e, 0.5)
    val prefix = run(e, 0.5, denseMaxSets = 1) // force prefix filtering
    assert(prefix == dense)
  }

  test("sorted-array kernel (large-vocab fallback) equals the mask kernel") {
    val e = elemsOf(fixture)
    val mask = run(e, 0.5)
    val sorted = run(e, 0.5, maskMaxVocab = 0) // force sortedJaccard path
    assert(sorted == mask)
  }

  test("distributed zipWithIndex dictionary: identical ids, no single-task window") {
    val e = elemsOf(fixture)
    val kept = e.groupBy("token").agg(count(lit(1)).as("_df"))
    val win = SetSimilarity.denseTokenIds(kept, distributed = false)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val dist = SetSimilarity.denseTokenIds(kept, distributed = true)
    // the total (df asc, token asc) order makes both paths assign the same id
    assert(dist.collect().map(r => (r.getString(0), r.getInt(1))).toSet == win)
    // the scale property itself: no Window operator anywhere in the
    // distributed path's plan (an unpartitioned Window is a single task)
    val plan = dist.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in distributed dict:\n$plan")
    // end-to-end: forcing every vocabulary through zipWithIndex leaves the
    // join result unchanged
    assert(SetSimilarity.jaccardSelfJoin(e, 0.5, windowVocabMax = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      == run(e, 0.5))
  }

  test("prefix path never plans a cartesian product") {
    val df = SetSimilarity.jaccardSelfJoin(elemsOf(fixture), 0.5, denseMaxSets = 1)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("Zipfian corpus differential: skewed dfs, all paths, with and without maxDf") {
    // the large-corpus regime the length filter + prefix path target:
    // a few corpus-scale stopwords, a long rare tail, varied doc lengths
    val rnd = new scala.util.Random(20260813L)
    val vocabSize = 60
    // Zipf: token v has weight 1/(v+1); sample by inverse CDF
    val weights = (0 until vocabSize).map(v => 1.0 / (v + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): String = {
      val x = rnd.nextDouble() * total
      s"t${cum.indexWhere(x <= _)}"
    }
    val docs = (0 until 50).map { i =>
      val n = 3 + rnd.nextInt(15) // varied lengths → length filter exercised
      (i.toLong, Seq.fill(n)(draw()).mkString(" "))
    }.toDF("doc_id", "text")
    val e = elemsOf(docs)
    for (maxDf <- Seq(None, Some(20L)); minJ <- Seq(0.3, 0.6)) {
      val expected = naive(e, minJ, maxDf)
      assert(run(e, minJ, maxDf) == expected,
        s"dense path diverged (maxDf=$maxDf τ=$minJ)")
      assert(run(e, minJ, maxDf, denseMaxSets = 1) == expected,
        s"prefix path diverged (maxDf=$maxDf τ=$minJ)")
      assert(run(e, minJ, maxDf, maskMaxVocab = 0) == expected,
        s"sorted path diverged (maxDf=$maxDf τ=$minJ)")
    }
  }

  test("randomized differential: dense, prefix, and sorted paths all equal naive") {
    val rnd = new scala.util.Random(20260812L)
    val alphabet = ('a' to 'j').map(_.toString)
    // degenerate-ish corpus on purpose: tiny alphabet, heavy overlap —
    // the regime the real documents table is in
    val docs = (0 until 40).map { i =>
      val n = 2 + rnd.nextInt(8)
      (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val e = elemsOf(docs)
    for (minJ <- Seq(0.3, 0.5, 0.8)) {
      val expected = naive(e, minJ, None)
      assert(run(e, minJ) == expected, s"dense path diverged at τ=$minJ")
      assert(run(e, minJ, denseMaxSets = 1) == expected, s"prefix path diverged at τ=$minJ")
      assert(run(e, minJ, maskMaxVocab = 0) == expected, s"sorted path diverged at τ=$minJ")
    }
  }

  test("eager mode releases every Dataset cache before returning") {
    spark.catalog.clearCache() // start from a clean CacheManager
    val res = SetSimilarity.jaccardSelfJoin(elemsOf(fixture), 0.5)
    assert(org.apache.spark.sql.graftbridge.CacheBridge.noDatasetCaches(spark),
      "intermediate caches must be unpersisted before the call returns")
    // consuming the streamed expansion must not re-register anything either
    assert(res.count() > 0)
    assert(org.apache.spark.sql.graftbridge.CacheBridge.noDatasetCaches(spark),
      "consuming the result must not leave caches behind")
  }

  test("empty element input yields an empty result, not a failure") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "token")
    assert(SetSimilarity.jaccardSelfJoin(empty, 0.5).count() == 0)
  }

  test("char-ngram variant matches its naive formulation on real docs") {
    val docs = tables.documents.filter(col("doc_id") < 40)
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.HashFunctions.charNgrams(col("text"), 3)).as("token"))
    assert(Dedup.charNgramJaccardPairs(docs, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      == naive(grams, 0.5, None))
  }

  test("fuzzyNameJoin equals a naive token-blocked levenshtein recompute; finds injected variant") {
    import graft.operators.SetSimilarity
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    def naive(names: Map[String, Long]): Set[(String, String, Int, Long, Long)] = {
      val ks = names.keys.toSeq.sorted
      (for {
        a <- ks; b <- ks if a < b
        if a.split(" ").toSet.intersect(b.split(" ").toSet).nonEmpty
        d = lev(a, b) if d <= 2
      } yield (a, b, d, names(a), names(b))).toSet
    }
    val base = tables.part.collect().map(_.getString(1))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = SetSimilarity.fuzzyNameJoin(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(got.toSet == naive(base))
    assert(got.nonEmpty, "corpus yields no fuzzy pairs — test is vacuous")
    // injected one-edit variant of an existing name must pair with it
    val spark2 = spark
    import spark2.implicits._
    val variant = tables.part.limit(1)
      .withColumn("p_partkey", $"p_partkey" + 900000L)
      .withColumn("p_name", concat($"p_name", lit("x")))
    val t2 = tables.withTable("part", tables.part.union(variant))
    val vname = variant.collect()(0).getString(1)
    val orig = vname.dropRight(1)
    val got2 = SetSimilarity.fuzzyNameJoin(t2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val expectPair =
      (if (orig < vname) orig else vname, if (orig < vname) vname else orig, 1)
    assert(got2.contains(expectPair),
      s"injected variant pair missing: ${got2.filter(p => p._1.contains(orig.take(5))).toSeq}")
    // candidate generation is the token equi-join — never all-pairs
    val plan = planOf(SetSimilarity.fuzzyNameJoin(tables))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("fuzzyNameJoin on an empty catalog returns empty, schema intact") {
    import graft.operators.SetSimilarity
    import graft.sources.Tables
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String, String, Int, Double)]
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val t = Tables(spark, sfDir).withTable("part", empty)
    val df = SetSimilarity.fuzzyNameJoin(t)
    assert(df.columns.toSeq ==
      Seq("name_a", "name_b", "dist", "n_parts_a", "n_parts_b"))
    assert(df.collect().isEmpty)
  }
}
