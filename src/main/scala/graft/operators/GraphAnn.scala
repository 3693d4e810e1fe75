package graft.operators

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** GRAPH-BASED ANN — the recall/latency frontier production vector
  * systems actually run (HNSW, Malkov & Yashunin 2016; NSG; DiskANN,
  * Subramanya et al. 2019): a stored NEIGHBOR GRAPH over the corpus
  * plus best-first BEAM SEARCH from a fixed entry point. Where IVF's
  * candidate set is "everything in the probed cells" (cell-sized even
  * when the true neighbors are few), beam search touches only the
  * adjacency of the nodes it expands — candidate count ≈
  * beam × degree × hops per query, INDEPENDENT of corpus size.
  *
  * Index layout (the [[TextIndex]] storage conventions):
  *  - `<prefix>_gadj(node_id, neighbor_id, cos)` — adjacency, bucketed
  *    AND sorted by `node_id`: a hop's expansion is an `isin` over the
  *    frontier's node ids, so the scan gets bucket pruning + sorted
  *    row-group pruning — each hop reads frontier-adjacent rows, never
  *    the graph.
  *  - `<prefix>_gnodes(vec_id, embedding)` — vectors, bucketed+sorted by
  *    `vec_id`, probed the same way for candidate scoring: the index is
  *    self-contained (DiskANN stores vectors beside adjacency for the
  *    same reason — one seek per candidate, no side lookup).
  *  - `graph_ann.meta` — "entry degree nNodes" via [[IndexFiles]]
  *    (staged-temp atomic commit, state beside data).
  *
  * Graph construction is the SRP-LSH candidate join ([[Similarity]]'s
  * bucketed shape — never all-pairs): per node keep the top-`degree`
  * candidates by exact cosine, SYMMETRIZE (union reverse edges, re-cap
  * at 2·degree keeping best — the HNSW neighbor-selection shape), then
  * add deterministic BRIDGE edges entry ↔ per-bucket representative
  * (min vec_id of each seed-0 SRP bucket) so every LSH region is
  * reachable from the entry point even when the kNN graph alone is
  * disconnected (LSH graphs on clustered data fragment; HNSW's upper
  * layers play this role). Entry point = min vec_id — deterministic,
  * like every tie-break here.
  *
  * Search keeps per-query beam state ON THE DRIVER — bounded by
  * queries × beam × degree × hops, NEVER corpus-sized (the
  * [[Similarity.fitCentroids]] / kCenterSelect precedent): beam search
  * is inherently sequential in its hops, and each hop is two
  * bucket-pruned Spark jobs (adjacency expansion, candidate scoring)
  * over literal `isin` id lists. Stops when no candidate improves any
  * query's current top-`beam` (greedy convergence) or after `maxHops`.
  *
  * Build-only, like [[TextIndex.buildIndex]]: appending vectors to a
  * neighbor graph requires re-linking their neighborhoods (the insert
  * path of HNSW); the batch story here is rebuild, with [[AnnIndex]] as
  * the appendable family member. SINGLE WRITER by contract; concurrent
  * readers are safe (meta commit is atomic). */
object GraphAnn {

  final case class Index(prefix: String, dir: String, entry: Long,
                         degree: Int, nNodes: Long) {
    def adjTable: String = s"${prefix}_gadj"
    def nodesTable: String = s"${prefix}_gnodes"
  }

  private def metaPath(dir: String) = new HPath(dir, "graph_ann.meta")
  private def bucketsPath(dir: String) = new HPath(dir, "graph_ann.buckets")

  /** Build the stored graph. One LSH candidate join + two bounded
    * windows; the corpus is never joined all-pairs. `nBits` sizes the
    * LSH buckets (≈ n/2^nBits candidates per node per table — raise it
    * with corpus size to keep buckets bounded, exactly like
    * [[Similarity.embeddingNearDupsCore]]). */
  def buildIndex(spark: SparkSession, embeddings: DataFrame, prefix: String,
                 dir: String, degree: Int = 16, nBits: Int = 4,
                 nTables: Int = 8, buckets: Int = 16): Index = {
    val tableIds = array((0 until nTables).map(lit): _*)
    val emb = embeddings
      .select(col("vec_id"), col("embedding"), explode(tableIds).as("tbl"))
      .withColumn("bucket",
        HashFunctions.srpBucketSeeded(col("embedding"), nBits, col("tbl")))
    // directed candidate edges: every ordered in-bucket pair, exact cosine
    // map-side (ids + one double through the shuffle, not vectors), best
    // collision per pair
    val pairs = emb.as("a")
      .join(emb.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("cos",
        HashFunctions.cosineSim(col("a.embedding"), col("b.embedding")))
      .select(col("a.vec_id").as("node_id"),
        col("b.vec_id").as("neighbor_id"), col("cos"))
      .groupBy("node_id", "neighbor_id").agg(max("cos").as("cos"))
    import org.apache.spark.sql.expressions.Window
    def topPerNode(df: DataFrame, n: Int) = df
      .withColumn("rn", row_number().over(Window.partitionBy("node_id")
        .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rn") <= n).drop("rn")
    // LOG-SPACED rank selection, not plain top-degree: half the edges are
    // the closest candidates (local navigability), half sit at
    // exponentially spaced similarity ranks (12, 16, 24, 32, 48, 64 for
    // degree 16) — cheap long-range links that approximate the HNSW
    // neighbor-diversity heuristic without candidate-pairwise distances,
    // so beam search can cross between similarity regions instead of
    // saturating inside the first one it enters
    val near = degree - degree / 4
    val spread = (1 to degree / 4).map(i => near << i)
    val ranks = ((1 to near) ++ spread).distinct.take(degree)
    val directed = pairs
      .withColumn("rn", row_number().over(Window.partitionBy("node_id")
        .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rn").isin(ranks: _*)).drop("rn")
    // symmetrize so beam search can enter a neighborhood from either side;
    // re-cap at 2·degree (keep best) to bound adjacency rows per node
    val sym = topPerNode(
      directed
        .unionByName(directed.select(col("neighbor_id").as("node_id"),
          col("node_id").as("neighbor_id"), col("cos")))
        .groupBy("node_id", "neighbor_id").agg(max("cos").as("cos")),
      2 * degree)
    // connectivity bridges: entry ↔ min-vec_id representative of every
    // seed-0 SRP bucket (≤ 2^nBits each way — constant-sized)
    val entry = embeddings.agg(min("vec_id")).head().getLong(0)
    val reps = emb.filter(col("tbl") === 0)
      .groupBy("bucket").agg(min("vec_id").as("rep"))
      .filter(col("rep") =!= entry)
      .select("rep")
    val vecOf = embeddings.select(col("vec_id"), col("embedding"))
    val entryVec = vecOf.filter(col("vec_id") === entry)
      .select(col("embedding").as("e_emb"))
    val bridgeCos = reps.join(vecOf, col("rep") === col("vec_id"))
      .crossJoin(broadcast(entryVec))
      .withColumn("cos", HashFunctions.cosineSim(col("e_emb"), col("embedding")))
      .select(col("rep"), col("cos"))
    val bridges = bridgeCos
      .select(lit(entry).as("node_id"), col("rep").as("neighbor_id"), col("cos"))
      .unionByName(bridgeCos.select(col("rep").as("node_id"),
        lit(entry).as("neighbor_id"), col("cos")))
    val idx0 = Index(prefix, dir, entry, degree, 0L)
    sym.unionByName(bridges)
      .groupBy("node_id", "neighbor_id").agg(max("cos").as("cos"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "node_id").sortBy("node_id")
      .option("path", new HPath(dir, idx0.adjTable).toString)
      .saveAsTable(idx0.adjTable)
    vecOf.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "vec_id").sortBy("vec_id")
      .option("path", new HPath(dir, idx0.nodesTable).toString)
      .saveAsTable(idx0.nodesTable)
    val n = embeddings.count()
    IndexFiles.mkdirs(spark, new HPath(dir))
    IndexFiles.writeString(spark, bucketsPath(dir), buckets.toString)
    // meta is the commit point (attach requires it) — written LAST
    IndexFiles.writeString(spark, metaPath(dir), s"$entry $degree $n")
    Index(prefix, dir, entry, degree, n)
  }

  /** Attach a previously built graph index (re-registers the bucketed
    * tables for a fresh catalog; the files and meta are the truth). */
  def attachIndex(spark: SparkSession, prefix: String, dir: String): Index = {
    val meta = IndexFiles.readString(spark, metaPath(dir))
      .getOrElse(throw new IllegalStateException(
        s"GraphAnn.attachIndex: no completed index at $dir (missing ${metaPath(dir)})"))
      .trim.split(' ')
    val b = IndexFiles.readString(spark, bucketsPath(dir))
      .getOrElse(throw new IllegalStateException(
        s"GraphAnn.attachIndex: missing bucket spec at ${bucketsPath(dir)}"))
      .trim.toInt
    val idx = Index(prefix, dir, meta(0).toLong, meta(1).toInt, meta(2).toLong)
    if (!spark.catalog.tableExists(idx.adjTable))
      spark.sql(
        s"""CREATE TABLE ${idx.adjTable} (node_id BIGINT, neighbor_id BIGINT,
           |cos DOUBLE) USING PARQUET
           |CLUSTERED BY (node_id) SORTED BY (node_id) INTO $b BUCKETS
           |LOCATION '${new HPath(dir, idx.adjTable)}'""".stripMargin)
    if (!spark.catalog.tableExists(idx.nodesTable))
      spark.sql(
        s"""CREATE TABLE ${idx.nodesTable} (vec_id BIGINT,
           |embedding ARRAY<FLOAT>) USING PARQUET
           |CLUSTERED BY (vec_id) SORTED BY (vec_id) INTO $b BUCKETS
           |LOCATION '${new HPath(dir, idx.nodesTable)}'""".stripMargin)
    idx
  }

  /** Deterministic best-first beam search. `queries` is the bounded
    * query batch (query_id, q_emb); self-matches are excluded like every
    * ANN operator here. Returns (query_id, neighbor_id, cosine) top-k
    * rows ordered for the dump. Driver state: O(queries × beam × degree
    * × hops). Each hop = one bucket-pruned adjacency scan + one
    * bucket-pruned scoring scan, both over literal id lists. */
  def beamSearch(spark: SparkSession, idx: Index, queries: DataFrame,
                 k: Int = 5, beam: Int = 16, maxHops: Int = 6): DataFrame =
    beamSearchWithCandidateCount(spark, idx, queries, k, beam, maxHops)._1

  /** Run `f` with bucketed scans FORCED on: the planner's
    * DisableUnnecessaryBucketedScan rule turns bucketed reads off for
    * plans with no downstream join/aggregation on the bucket key — which
    * is exactly a hop's bare filter+collect probe — and with it goes the
    * SelectedBucketsCount pruning this index's layout exists for. */
  private[graft] def withBucketPruning[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  /** [[beamSearch]] plus the number of (query, candidate) scorings — the
    * candidate-fraction numerator the recall harness and PLANS.md report
    * (fraction = count / (queries × nNodes)). */
  private[graft] def beamSearchWithCandidateCount(
      spark: SparkSession, idx: Index, queries: DataFrame,
      k: Int = 5, beam: Int = 16, maxHops: Int = 6): (DataFrame, Long) = {
    import spark.implicits._
    require(k <= beam, s"k=$k must be <= beam=$beam (the beam carries the result set)")
    val qv = queries.select(col("query_id"), col("q_emb")).cache()
    val qids = qv.select("query_id").collect().map(_.getLong(0)).toSeq
    val adj = spark.table(idx.adjTable)
    val nodes = spark.table(idx.nodesTable)

    // (cos desc, id asc) ordering shared by beam/frontier/result selection
    val ord = Ordering.by[(Long, Double), (Double, Long)] {
      case (id, cos) => (-cos, id)
    }
    var best = Map.empty[Long, Vector[(Long, Double)]].withDefaultValue(Vector.empty)
    var visited: Map[Long, Set[Long]] =
      qids.map(q => q -> Set(idx.entry)).toMap
    var nScored = 0L

    def score(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Double)] = {
      if (pairs.isEmpty) return Seq.empty
      nScored += pairs.length
      val candIds = pairs.map(_._2).distinct
      val candDf = pairs.toDF("query_id", "neighbor_id")
      withBucketPruning(spark) {
        nodes.filter(col("vec_id").isin(candIds: _*))
          .join(broadcast(candDf), col("vec_id") === col("neighbor_id"))
          .join(broadcast(qv), Seq("query_id"))
          .withColumn("cos", HashFunctions.cosineSim(col("q_emb"), col("embedding")))
          .select(col("query_id"), col("neighbor_id"), col("cos"))
          .collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
    }

    def mergeBest(scored: Seq[(Long, Long, Double)]): Unit =
      scored.groupBy(_._1).foreach { case (q, rows) =>
        val merged = (best(q) ++ rows.map(r => (r._2, r._3)))
          .distinct.sorted(ord).take(beam)
        best += q -> merged
      }

    // seed: the entry point itself is a candidate (unless it IS the query)
    mergeBest(score(qids.filter(_ != idx.entry).map(q => (q, idx.entry))))
    var frontier: Map[Long, Seq[Long]] = qids.map(q => q -> Seq(idx.entry)).toMap
    var hop = 0
    while (hop < maxHops && frontier.valuesIterator.exists(_.nonEmpty)) {
      val fIds = frontier.valuesIterator.flatten.toSeq.distinct
      val adjRows = withBucketPruning(spark) {
        adj.filter(col("node_id").isin(fIds: _*))
          .select("node_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      val adjMap = adjRows.groupBy(_._1).map { case (n, rs) => n -> rs.map(_._2) }
      val pairs = for {
        q <- qids
        n <- frontier(q)
        nb <- adjMap.getOrElse(n, Array.empty[Long])
        if nb != q && !visited(q)(nb)
      } yield (q, nb)
      visited = visited.map { case (q, vs) =>
        q -> (vs ++ pairs.collect { case (`q`, nb) => nb })
      }
      val scored = score(pairs.distinct)
      // greedy convergence: only NEW candidates that beat the query's
      // current worst-of-beam (or fill an underfull beam) expand next
      val prevWorst = best.map { case (q, b) =>
        q -> (if (b.length < beam) Double.NegativeInfinity else b.last._2)
      }.withDefaultValue(Double.NegativeInfinity)
      mergeBest(scored)
      frontier = qids.map { q =>
        q -> scored.collect { case (`q`, nb, cos) if cos > prevWorst(q) => (nb, cos) }
          .sorted(ord).take(beam).map(_._1)
      }.toMap
      hop += 1
    }
    qv.unpersist(blocking = false)
    val out = qids.flatMap(q => best(q).take(k).map { case (nb, cos) =>
        (q, nb, math.rint(cos * 1e6) / 1e6)
      })
      .toDF("query_id", "neighbor_id", "cosine")
      .orderBy("query_id", "neighbor_id")
    (out, nScored)
  }
}
