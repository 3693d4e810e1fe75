package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sampling and dataset-split operators for training-data pipelines.
  *
  * [[assignSplits]] is a deterministic function of row CONTENT (not of
  * partitioning, task order, or RNG state): a re-run after a failure — or on
  * a differently-partitioned copy of the data — assigns every row
  * identically, which is what makes hash-based splits the standard for
  * train/eval hygiene. [[stratifiedEvents]] is seed-deterministic but
  * partitioning/row-order dependent (`sampleBy` draws from a per-partition
  * RNG stream) — use it for statistics, not for membership that must
  * survive repartitioning; when content-stable sampling is required, filter
  * on a hash-bucket of the key instead (same trick as assignSplits).
  */
object Sampling {

  /** Deterministic split assignment: buckets the hash of `key` into [0,100)
    * and maps ranges to named splits by weight. `weights` are percentages
    * summing to ≤ 100 (any remainder goes to the last split).
    *
    * Example: `assignSplits(df, col("doc_id"), Seq("train" -> 90, "val" -> 5,
    * "test" -> 5))`. */
  def assignSplits(df: DataFrame, key: Column,
                   weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty, "assignSplits: weights must be non-empty")
    require(weights.map(_._2).sum <= 100 && weights.forall(_._2 >= 0),
      s"assignSplits: weights must be non-negative percentages summing to <= 100, got $weights")
    val bucket = pmod(xxhash64(key), lit(100))
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    // build when-chains outermost-first: the first matching range wins
    val assigned = weights.zip(bounds).reverse.foldLeft(lit(weights.last._1): Column) {
      case (acc, ((name, _), hi)) => when(bucket < hi, name).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Split the documents table 90/5/5 — the canonical pretraining split. */
  def documentSplits(t: Tables): DataFrame =
    assignSplits(t.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 6).as("avg_chars"))
      .orderBy("split")

  /** Train/val/test LEAKAGE audit — the hygiene check a hash-split pipeline
    * must run, because [[assignSplits]] is near-dup-UNAWARE: two
    * near-identical documents routinely land in different splits, and
    * evaluation on the val/test side then measures memorization. For every
    * held-out document, the fraction of its word w-shingles that also
    * occur anywhere in the train split; a document with majority-shared
    * shingles is counted leaky (the [[graft.operators.Dedup.decontaminate]]
    * thresholding convention, applied between splits).
    *
    * Scale shape: one corpus shingle explode per side, a distinct on the
    * train shingle set (shuffle bounded by distinct-shingle count), one
    * shingle-keyed join of the (tiny) held-out side against it, then doc-
    * and split-keyed aggregations. Shingles cross the shuffles as 64-BIT
    * KARP–RABIN FINGERPRINTS, never as strings — the overlap test only
    * needs membership, and 8-byte keys hash, compare, and ship a
    * multiple cheaper than ~20-byte shingle text (the exact-dedup
    * fingerprint trade, applied to the shingle domain; the oracle
    * re-derives the same kernel, so collisions — ~n²/2⁶⁴ — are shared
    * semantics, not drift). The leaky-doc test is exact integer
    * arithmetic (shared·2 > n). Held-out documents with zero shingles
    * (empty text) have no overlap to measure and are absent, as in
    * [[graft.operators.TextAnalysis.textStats]]. */
  def splitLeakage(t: Tables, w: Int = 3): DataFrame = {
    val assigned = assignSplits(t.documents, col("doc_id"),
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val sh = assigned
      .select(col("doc_id"), col("split"),
        graft.operators.TextAnalysis.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), col("split"),
        explode(Dedup.shinglesOfTokens(col("_tk"), w)).as("s"))
      .select(col("doc_id"), col("split"),
        graft.functions.HashFunctions.rollingHash64(col("s")).as("f"))
    val trainSh = sh.filter(col("split") === "train")
      .select("f").distinct()
      .withColumn("_hit", lit(1))
    sh.filter(col("split") =!= "train")
      .join(trainSh, Seq("f"), "left")
      .groupBy("split", "doc_id")
      .agg(count(lit(1)).as("_n"), count(col("_hit")).as("_shared"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_shared") * 2 > col("_n"), 1L).otherwise(0L))
          .as("n_leaky_docs"),
        round(avg(col("_shared").cast("double") / col("_n")), 6)
          .as("avg_shared_frac"))
      .orderBy("split")
  }

  /** Stratified sample: per-stratum fractions with a fixed seed
    * (`DataFrameStatFunctions.sampleBy` — deterministic for a given input).
    * The scale property: sampling is a narrow map-side filter, no shuffle. */
  def stratifiedEvents(t: Tables, fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    t.events.stat.sampleBy("event_type", fractions, seed)

  /** CONTENT-STABLE stratified sample (r16 verdict item 5 — the
    * [[assignSplits]]/[[negativeSamples]] hash discipline applied to
    * stratification): keep an event iff
    * `pmod(xxhash64(event_id), 10^6) < round(frac(event_type) · 10^6)`.
    * Membership is a pure function of the row's key — identical on any
    * partitioning, row order, or re-run (what `sampleBy`'s per-partition
    * RNG stream can never give), which makes the sample REPLAYABLE as
    * plain SQL: the DuckDB oracle recomputes the same hash chain and the
    * same membership, row for row. Event types absent from `fractions`
    * drop, matching `sampleBy`. Still a narrow map-side filter — no
    * shuffle, no RNG state. */
  def stratifiedEventsByHash(t: Tables, fractions: Map[String, Double]): DataFrame = {
    require(fractions.nonEmpty && fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"stratifiedEventsByHash: fractions must be in [0, 1], got $fractions")
    val denom = 1000000L
    val thr = fractions.foldLeft(lit(-1L): Column) { case (acc, (tpe, f)) =>
      when(col("event_type") === tpe, lit(math.round(f * denom))).otherwise(acc)
    }
    t.events.filter(pmod(xxhash64(col("event_id")), lit(denom)) < thr)
  }

  /** Token-weighted source-mixture rebalancing — the data-mixture step of
    * a pretraining pipeline ("web 60%, books 30%, code 10%" BY TOKENS, not
    * by documents): downsample each source so kept-token shares match
    * `targets`, keeping as much data as the targets allow.
    *
    * Water-filling: the largest achievable token total is N* = min over
    * targeted sources of tokens_s / p_s (the scarcest source relative to
    * its target binds everything); each source then keeps the fraction
    * p_s · N* ÷ tokens_s of its tokens — the binding source keeps 100%,
    * sources with no target are dropped. Membership is a deterministic
    * content-hash filter (same doc set on any partitioning or re-run —
    * the [[assignSplits]] property), so realized shares approximate the
    * targets at document granularity.
    *
    * Scale shape: one partial+final aggregation over sources (output =
    * one row per source — driver-bounded by construction), then a narrow
    * hash filter; no other shuffle.
    *
    * @return kept documents as (doc_id, source, n_tokens) plus the
    *         per-source keep fraction applied
    */
  def mixtureBySource(t: Tables, targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(p => p > 0 && p <= 1.0) &&
      math.abs(targets.values.sum - 1.0) < 1e-9,
      s"mixtureBySource: targets must be positive proportions summing to 1, got $targets")
    val withTokens = t.documents
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens"))
    val avail = withTokens.groupBy("source")
      .agg(sum("n_tokens").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = targets.keySet.diff(avail.keySet)
    require(missing.isEmpty, s"mixtureBySource: no documents for source(s) $missing")
    val nStar = targets.map { case (s, p) => avail(s) / p }.min
    val keep = targets.map { case (s, p) => s -> math.min(1.0, p * nStar / avail(s)) }
    // deterministic content-hash membership, per-source threshold
    val denom = 1000000L
    val bucket = pmod(xxhash64(col("doc_id")), lit(denom))
    val keepExpr = keep.foldLeft(lit(-1L)) { case (acc, (s, f)) =>
      when(col("source") === s, lit((f * denom).round)).otherwise(acc)
    }
    withTokens
      .withColumn("keep_frac",
        round(keepExpr.cast("double") / denom, 6))
      .filter(bucket < keepExpr)
      .select("doc_id", "source", "n_tokens", "keep_frac")
      .orderBy("doc_id")
  }

  /** Deterministic weighted sample WITHOUT replacement, k documents with
    * probability ∝ token count — Efraimidis–Spirakis A-ES keyed on a
    * CONTENT hash instead of an RNG: u = uniform(0,1) derived from
    * xxhash64(doc_id), key = ln(u)/w, global top-k by key. Like
    * [[assignSplits]], membership is a pure function of content —
    * partition-count- and task-order-independent, reproducible across
    * re-runs and engines (the SQL oracle re-derives the identical
    * arithmetic). One narrow scan + TakeOrdered per-partition heaps; no
    * corpus shuffle at any scale. Zero-token documents carry zero weight
    * and are excluded (ln(u)/0 is undefined — they can never win). */
  def weightedSample(t: Tables, k: Int = 50,
                     denom: Int = 1 << 20): DataFrame = {
    val nTokens = size(filter(
      split(lower(trim(col("text"))), "\\s+"), tk => tk =!= ""))
    val u = (pmod(xxhash64(col("doc_id")), lit(denom.toLong)).cast("double") +
      lit(0.5)) / lit(denom.toDouble)
    t.documents
      .select(col("doc_id"), col("source"), nTokens.cast("bigint").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("_key", log(u) / col("n_tokens"))
      .orderBy(col("_key").desc, col("doc_id").asc)
      .limit(k)
      .select("doc_id", "source", "n_tokens")
      .orderBy("doc_id")
  }

  /** Deterministic per-group document capping — the doc-COUNT twin of
    * [[mixtureBySource]]'s token water-filling: each group (language,
    * source, …) keeps at most `cap` documents, chosen by ascending
    * `xxhash64(doc_id)` with a doc_id tiebreak. Like [[assignSplits]],
    * membership is a pure function of content — a re-run, a repartitioned
    * copy, or another engine selects the identical cap-sized "reservoir"
    * (the SQL oracle re-derives the hash ranking).
    *
    * Scale shape: runs on the [[graft.plans.TopKPerGroup]] custom operator
    * — bounded cap-row heaps per group on the map side, one shuffle of
    * ≤ groups·cap pre-filtered rows, never a per-group sort of the corpus.
    * The row_number-window form would single-task each group's full
    * membership (a dominant language IS the corpus at 100 TB); the heap
    * form's per-partition state is O(groups · cap). */
  def capPerGroup(docs: DataFrame, groupCol: String, cap: Int): DataFrame =
    graft.plans.TopK.perGroup(
      docs.select(col(groupCol), col("doc_id"), col("n_chars"),
        xxhash64(col("doc_id")).as("_h")),
      Seq(groupCol), Seq(col("_h").asc, col("doc_id").asc), cap,
      rankCol = Some("rank"))
      .select(col(groupCol), col("doc_id"), col("rank"), col("n_chars"))
      .orderBy(col(groupCol), col("rank"))

  /** Budget-bounded quality selection: rank documents by (quality DESC,
    * doc_id ASC) — quality is [[TextAnalysis.qualityScore]]'s blended
    * score — and keep the maximal prefix whose running token total stays
    * within `budgetTokens` (inclusive). The standard "best data under a
    * token budget" pass of a pretraining pipeline.
    *
    * Semantically this is one global cumulative-sum window over the
    * quality-sorted corpus (exactly what the SQL oracle runs) — but a
    * global window is a single-task sort at scale, so the implementation
    * is two-phase: (1) per-SCORE-bucket token totals (the 6-dp-rounded
    * score has bounded cardinality ≤ ~10⁶ independent of corpus size)
    * aggregate distributed and prefix-scan on the driver to find the
    * boundary score; (2) every doc strictly above the boundary is kept
    * with NO ordering work at all, and only the boundary bucket — corpus
    * size / score cardinality in expectation — runs a cumulative window
    * (partitioned on the constant score column, so the plan stays a
    * declared-partition window). Skew caveat: a corpus where one exact
    * rounded score dominates re-concentrates the boundary bucket; the
    * mitigation is finer rounding of the score, not a different plan. */
  def tokenBudgetSelect(t: Tables, budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // slim (doc_id, n_tokens, quality) projection, materialized ONCE —
    // the bucket scan and the output filters both read it; without the
    // checkpoint each re-runs the corpus-wide quality scoring
    val scored = TextAnalysis.qualityScore(t)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .localCheckpoint()
    // bounded collect: one row per distinct rounded score, not per doc
    val buckets = scored.filter(col("quality").isNotNull)
      .groupBy("quality").agg(sum("n_tokens").as("_bt"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
    var cum = 0L
    var boundary: Option[(Double, Long)] = None // (score, budget left for it)
    for ((q, bt) <- buckets if boundary.isEmpty) {
      if (cum + bt > budgetTokens) boundary = Some((q, budgetTokens - cum))
      else cum += bt
    }
    val out = boundary match {
      case None => scored // everything fits (null-quality rows included)
      case Some((qStar, r)) =>
        val whole = scored.filter(col("quality") > qStar)
        val edge = scored.filter(col("quality") === qStar)
          .withColumn("_cum", sum("n_tokens").over(
            Window.partitionBy("quality").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("_cum") <= r)
          .drop("_cum")
        whole.union(edge)
    }
    out.orderBy(col("quality").desc, col("doc_id").asc)
  }

  /** Temperature-scaled source mixture weights — the multilingual-LM
    * α-sampling scheme (w_s ∝ p_s^α, α = 1/2): low-resource sources are
    * up-weighted relative to their raw token share, high-resource sources
    * damped. Complements [[mixtureBySource]]: that op ENFORCES given
    * targets; this op DERIVES the targets from the corpus itself.
    *
    * Engine-portability is the design constraint here: every value is an
    * IEEE-exact expression DAG — BIGINT token sums (associative, exact),
    * ONE double division, `sqrt` (correctly rounded per IEEE 754, unlike
    * `pow`/`ln` whose libm results differ across engines), a floor-scale
    * to BIGINT — and the normalizing constant sums those INTEGER weights,
    * so no cross-row float reduction exists anywhere and the SQL oracle
    * reproduces the output bit-for-bit.
    *
    * Scale shape: one partial+final aggregation over the corpus; every
    * later step runs on the source-catalog-bounded per-source frame
    * (broadcast 1-row totals, no corpus shuffle). */
  def mixtureTemperature(t: Tables): DataFrame = {
    val perSource = t.documents
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("n_tokens"))
    val weighted = perSource
      .crossJoin(broadcast(perSource.agg(sum("n_tokens").as("_tot"))))
      .withColumn("_p", col("n_tokens").cast("double") / col("_tot").cast("double"))
      .withColumn("_w", floor(sqrt(col("_p")) * lit(1e9)).cast("bigint"))
    weighted
      .crossJoin(broadcast(weighted.agg(sum("_w").as("_wtot"))))
      .select(col("source"), col("n_tokens"),
        round(col("_p"), 6).as("p_raw"),
        round(col("_w").cast("double") / col("_wtot").cast("double"), 6)
          .as("alpha_share"))
      .orderBy("source")
  }

  /** Deterministic multi-epoch shuffle order — training-data shuffling as
    * a pure FUNCTION of (content key, epoch), not of RNG state: epoch e
    * orders the corpus by `xxhash64(doc_id·2 + e)`, so every epoch is a
    * different-but-reproducible permutation (a failed job re-runs to the
    * identical order, and any shard can be regenerated independently —
    * the property partition-RNG shuffles lack). Emits each epoch's first
    * `topK` positions as the verifiable fingerprint of the permutation.
    *
    * Scale shape: one branch per epoch (bounded list), each a narrow
    * hash projection + TakeOrderedAndProject (per-partition heaps — the
    * full permutation is never materialized, let alone sorted); the
    * position window runs over the already-bounded topK rows. */
  def epochShuffle(t: Tables, epochs: Seq[Int] = Seq(0, 1),
                   topK: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch").orderBy("h", "doc_id")
    epochs.map { ep =>
      t.documents
        .select(lit(ep).as("epoch"), col("doc_id"),
          xxhash64(col("doc_id") * 2 + lit(ep.toLong)).as("h"))
        .orderBy(col("h"), col("doc_id"))
        .limit(topK)
    }.reduce(_ unionByName _)
      .withColumn("pos", row_number().over(w))
      .select("epoch", "pos", "doc_id", "h")
      .orderBy("epoch", "pos")
  }

  /** 2-D skyline (Pareto front) data selection — keep every document not
    * DOMINATED on (length, lexical diversity): b dominates a iff b ≥ a on
    * both dimensions and > on at least one. The multi-criteria selection
    * primitive ("longest AND most diverse frontier") that single-score
    * ranking can't express.
    *
    * Scale shape — the sort-sweep, not the quadratic dominance self-join:
    * (1) per-x maxima collapse the corpus to the distinct-x table (hash
    * agg; bounded by the x value domain — for length-like dimensions a few
    * thousand rows at any corpus size); (2) one window over THAT bounded
    * table takes the strictly-preceding running max of y in x-descending
    * order — an x-value survives iff its max-y strictly exceeds every
    * higher-x max-y; (3) a semi-join brings back every document achieving
    * a surviving (x, max-y) pair (equal points don't dominate each other,
    * so ALL of them are on the front). The quadratic NOT-EXISTS form
    * exists only in the oracle — the hash match proves the sweep
    * equivalent to the textbook dominance definition. */
  def skylineDocs(t: Tables): DataFrame = {
    val f = t.documents
      .select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("_tk"))
      .select(col("doc_id"),
        size(col("_tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("_tk"))).cast("long").as("n_distinct"))
      // feeds the per-x aggregation AND the member join — one token pass
      .localCheckpoint()
    val perX = f.groupBy("n_tokens").agg(max("n_distinct").as("_my"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("_rmax", max(col("_my")).over(w))
      .filter(col("_rmax").isNull || col("_my") > col("_rmax"))
      .select(col("n_tokens"), col("_my").as("n_distinct"))
    f.join(frontier, Seq("n_tokens", "n_distinct"), "left_semi")
      .select("doc_id", "n_tokens", "n_distinct")
      .orderBy("doc_id")
  }

  /** GROUP-SAFE train/val/test split — the leakage fix for plain hash
    * splits (`q_split_leakage` MEASURES the defect: near-duplicate pairs
    * straddling hash splits leak training text into eval). Every
    * [[Dedup.nearDupGroups]] near-dup cluster is assigned ATOMICALLY:
    * the split bucket hashes the GROUP id (the component's min doc_id),
    * so two near-duplicates can never land in different splits — the
    * emitted `n_leaked_pairs` audit (candidate pairs whose endpoints'
    * splits differ) is zero BY CONSTRUCTION, and the oracle re-derives
    * it as zero rather than trusting the claim. Singleton groups hash
    * exactly like [[documentSplits]] would hash the doc itself (group_id
    * = doc_id), so the two splits agree wherever grouping doesn't bind.
    * Cost over the plain split: the near-dup grouping itself (LSH-edge
    * bounded + O(log n) CC rounds) plus one group-cardinality hash join. */
  def groupSafeSplits(t: Tables): DataFrame = {
    val groups = Dedup.nearDupGroups(t)
    val gb = groups.select("group_id").distinct()
      .withColumn("_b", pmod(xxhash64(col("group_id")), lit(100L)))
      .withColumn("split",
        when(col("_b") < 90, lit("train"))
          .when(col("_b") < 95, lit("val"))
          .otherwise(lit("test")))
      .select("group_id", "split")
    val asg = groups.join(gb, "group_id").localCheckpoint()
    val pairs = Dedup.minhashCandidatesCore(t, minEstJaccard = 0.5)
      .select("doc_a", "doc_b")
    val leaked = pairs
      .join(asg.select(col("doc_id").as("doc_a"), col("split").as("_sa")), "doc_a")
      .join(asg.select(col("doc_id").as("doc_b"), col("split").as("_sb")), "doc_b")
      .filter(col("_sa") =!= col("_sb"))
      .count()
    val out = asg.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("group_id").as("n_groups"))
      .withColumn("n_leaked_pairs", lit(leaked))
      .orderBy("split")
      .localCheckpoint()
    asg.unpersist(blocking = false)
    out
  }
  /** QUANTILE NORMALIZATION of document lengths across sources (the
    * rank-matching transform of Bolstad et al. 2003, applied the way a
    * corpus-mixing pipeline uses it: map every source's length
    * distribution onto the GLOBAL length distribution so per-source
    * length bias can't leak into a mixture as a length signal). Each
    * document takes the global value at its source-relative rank
    * fraction — nearest-rank (floor) method, tie-AVERAGED source ranks.
    *
    * Scale + exactness shape: both distributions live as VALUE-DOMAIN
    * count-collapse tables (token counts are bounded-cardinality), so
    * no global sort and no per-doc window ever touches the corpus; the
    * per-doc global position computes in PURE INTEGER floor division —
    * pos = (r2−2)·(N_g−1) ÷ (2·(n_s−1)) with r2 the doubled tie-average
    * rank — and the value lookup is a broadcast range join against the
    * domain table's [cum_before, cum) rank intervals. Zero float
    * arithmetic end to end ⇒ bit-exact in any engine at any scale. A
    * single-doc source pins to the global median position (the
    * rank-fraction is undefined at n_s = 1). */
  def quantileNormalizeLengths(t: Tables): DataFrame = {
    val docs = t.documents.select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .localCheckpoint() // source ranks + global domain + output read it
    val srcCounts = docs.groupBy("source", "n_tokens")
      .agg(count(lit(1)).as("_c"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("n_tokens")
    val srcRank = srcCounts
      .withColumn("_cum", sum("_c").over(ws))
      .select(col("source"), col("n_tokens"),
        (lit(2) * (col("_cum") - col("_c")) + col("_c") + 1).as("_r2"))
    val nS = docs.groupBy("source").agg(count(lit(1)).as("_ns"))
    val nG = docs.agg(count(lit(1)).as("_ng"))
    val wg = org.apache.spark.sql.expressions.Window.orderBy("n_tokens")
    val dom = docs.groupBy("n_tokens").agg(count(lit(1)).as("_cg"))
      .withColumn("_cumg", sum("_cg").over(wg))
      .select(col("n_tokens").as("norm_tokens"),
        (col("_cumg") - col("_cg")).as("_lo"), col("_cumg").as("_hi"))
    // `div` (integral division), never `/`: on longs `/` is DOUBLE
    // division, and floor(double-division) can cross an integer boundary
    // at one ulp exactly where the true quotient sits 1/b below it
    val pos = when(col("_ns") === 1, expr("(_ng - 1) div 2"))
      .otherwise(expr("((_r2 - 2) * (_ng - 1)) div (2 * (_ns - 1))"))
    docs
      .join(srcRank, Seq("source", "n_tokens"))
      .join(broadcast(nS), "source")
      .crossJoin(broadcast(nG))
      .withColumn("_pos", pos.cast("long"))
      .join(broadcast(dom), col("_pos") >= col("_lo") && col("_pos") < col("_hi"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("norm_tokens"))
      .orderBy("doc_id")
  }
  /** DETERMINISTIC NEGATIVE SAMPLING for contrastive/recommender
    * training pairs (the skip-gram/BPR data-prep step — Mikolov et al.
    * 2013, Rendle et al. 2009: every observed (customer, part) positive
    * draws k uniform pseudo-negatives): the draw is xxhash64 over a
    * packed (customer, part, draw-index) key mapped into the part-id
    * range, so the sample is CONTENT-DETERMINISTIC — partition- and
    * run-independent, reproducible across engines (the q_split_assign /
    * q_weighted_sample hashing discipline; no RNG state to disagree
    * on). Draws that collide with a TRUE positive are REJECTED without
    * resampling (the standard with-replacement treatment — expected
    * loss rate = the user's positive density, visible as n_neg <
    * k·n_pos in the output). Output is customer-level: positive count,
    * surviving negative count, and the exact integer checksum of the
    * sampled item ids — the bounded witness that pins the sample's
    * CONTENT, not just its size, into the oracle hash.
    *
    * Scale shape: one distinct-collapse of the interaction table, a
    * k-way map-side explode, one anti-join back against positives, and
    * customer-cardinality aggregates — no shuffle carries more than
    * k × interactions rows. */
  def negativeSamples(t: Tables, k: Int = 2): DataFrame = {
    // no checkpoint (r20): all three consumers (candidate fan-out,
    // anti-join, counts) consume the identical distinct subtree, which AQE
    // stage reuse shares within the one composed query — the barrier only
    // added a driver action and a materialization (guide §2.4)
    val pos = t.orders.select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
      .join(t.lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("p")), "ok")
      .select("c", "p").distinct()
    val np = t.part.agg(max("p_partkey").as("_np"))
    val cand = pos.crossJoin(broadcast(np))
      .select(col("c"), col("p"), col("_np"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .withColumn("_key", (col("c") * (col("_np") + 1) + col("p")) * k + col("i"))
      .withColumn("neg", pmod(xxhash64(col("_key")), col("_np")) + 1)
    val kept = cand.select(col("c"), col("neg"))
      .join(pos.select(col("c"), col("p").as("neg")), Seq("c", "neg"), "left_anti")
    val posAgg = pos.groupBy(col("c").as("custkey")).agg(count(lit(1)).as("n_pos"))
    val negAgg = kept.groupBy(col("c").as("custkey"))
      .agg(count(lit(1)).as("n_neg"), sum("neg").as("neg_checksum"))
    posAgg.join(negAgg, Seq("custkey"), "left")
      .na.fill(0L, Seq("n_neg", "neg_checksum"))
      .orderBy("custkey")
  }
}
