package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`array<float>` vectors).
  *
  * Two paths, per SURVEY.md §2 rows 20–21:
  *  - brute force: exact top-k for a BOUNDED query set — the query side is
  *    broadcast, the corpus streams through one narrow projection + bounded
  *    per-query window. Correctness baseline and small-query-set workhorse.
  *  - LSH (signed random projection): bucket the corpus once, equi-join
  *    queries to their bucket, rank only within the bucket. The 100 TB path:
  *    candidate count per query is corpus/2^bits on average, never all-pairs.
  */
object Similarity {

  /** Unit-normalize a float-array column into `out` (double precision);
    * zero vectors pass through unscaled instead of dividing by zero (NaN
    * would poison downstream clustering). Two-step on purpose: the norm is
    * materialized as a column first, so the per-element division reads a
    * bound reference — inlining the aggregate into the transform lambda
    * re-evaluates it per element (O(d²) per row, and this lineage is
    * recomputed by every KMeans pass). */
  private def withUnitNorm(df: DataFrame, in: String, out: String): DataFrame = {
    val d = transform(col(in), x => x.cast("double"))
    val tmp = s"_${out}_norm"
    df.withColumn(tmp, sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x)))
      .withColumn(out,
        transform(d, x => x / when(col(tmp) === 0.0, 1.0).otherwise(col(tmp))))
      .drop(tmp)
  }

  /** Exact brute-force cosine top-k for query vectors `vec_id < nQueries`.
    * The query side is tiny and broadcast; cosine runs in one codegen'd
    * kernel ([[graft.functions.CosineSimF]]); ranking is a per-query window
    * (bounded partitions — safe at any corpus size). */
  def bruteForceTopK(t: Tables, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val emb = t.embeddings
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", HashFunctions.cosineSim(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  /** LSH-bucketed approximate top-k: the corpus is bucketed by signed-
    * random-projection bits in `nTables` independent tables (recall
    * amplification: a candidate only needs to collide in ONE table); each
    * query ranks against the union of its buckets. Expected candidate
    * fraction ≤ nTables/2^nBits; the plan is a hash equi-join on
    * (table, bucket), never a cross join. Measured at sf0.1 (random
    * vectors — LSH's worst case): 1 table ≈ 0.13 recall@10, 8 tables ≈ 0.5
    * at half the brute-force candidate cost. */
  def lshTopK(t: Tables, nQueries: Int = 10, k: Int = 5, nBits: Int = 8,
              nTables: Int = 4): DataFrame = {
    val tableIds = array((0 until nTables).map(lit): _*)
    val emb = t.embeddings
      .select(col("vec_id"), col("embedding"), explode(tableIds).as("tbl"))
      .withColumn("bucket",
        HashFunctions.srpBucketSeeded(col("embedding"), nBits, col("tbl")))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("tbl"), col("bucket"))
    // cosine BEFORE the dedup (same reasoning as embeddingNearDups): the
    // distinct then shuffles ids + one double per candidate instead of two
    // embedding arrays as group-by keys
    val cand = emb.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("tbl"), col("bucket"))
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", HashFunctions.cosineSim(col("q_emb"), col("embedding")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .distinct() // a pair colliding in several tables ranks once
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer partitions the
    * corpus into `nList` cells; each query probes its `nProbe` nearest cells
    * and ranks only those candidates by exact cosine.
    *
    * Scale shape: the index build is one MLlib KMeans fit (sampled
    * iterations, centroids are tiny); assignment is a narrow projection; the
    * probe is a broadcast equi-join on the cell id — expected candidates per
    * query ≈ corpus·nProbe/nList, never all-pairs. Vectors are unit-
    * normalized before clustering so euclidean cells respect cosine
    * geometry. With nProbe == nList this is exhaustive and must equal the
    * brute-force top-k (spec-asserted). */
  def ivfTopK(t: Tables, nQueries: Int = 10, k: Int = 5,
              nList: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val emb = withUnitNorm(t.embeddings, "embedding", "_unit")
      .select(col("vec_id"), col("embedding"),
        array_to_vector(col("_unit")).as("features"))
    // few iterations suffice: IVF correctness doesn't depend on convergence
    // quality (probing uses the same centroids as assignment), only recall
    // does, and that plateaus fast on a coarse quantizer. random init
    // instead of k-means|| — the parallel init alone runs several extra
    // distributed rounds, and a coarse quantizer doesn't need them.
    // The quantizer is fit on a SEEDED SAMPLE, never the corpus: centroids
    // need ~1000·nList rows, and at 100 TB a full-corpus fit makes the
    // index build the dominant cost (each KMeans iteration is a complete
    // pass over the data). One metadata-cheap count sizes the sample
    // fraction; the limit caps it exactly, and the small sample is cached
    // across the KMeans iterations. Full-probe ≡ brute-force still holds
    // (spec-asserted): assignment and probing use the SAME centroids
    // regardless of where they were fit.
    val sampleTarget = 1000L * nList
    val corpusSize = emb.count()
    val fitInput =
      if (corpusSize <= sampleTarget) emb.select("features").coalesce(2)
      else emb.select("features")
        // 1.2× oversample so the limit is actually reached w.h.p.
        .sample(withReplacement = false,
          math.min(1.0, 1.2 * sampleTarget.toDouble / corpusSize), seed = 42L)
        .limit(sampleTarget.toInt)
    val cachedFit = fitInput.cache()
    val model = new KMeans().setK(nList).setSeed(42L).setMaxIter(5)
      .setInitMode("random")
      .fit(cachedFit)
    cachedFit.unpersist(blocking = false)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))

    val centroids = t.embeddings.sparkSession.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) })
      .toDF("cell", "centroid")

    // probe: nProbe nearest cells per query vector (euclidean on unit sphere)
    val queries = withUnitNorm(
      assigned.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      "q_emb", "q_unit")
    val dist2 = aggregate(
      zip_with(col("q_unit"), col("centroid"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val wProbe = Window.partitionBy(col("query_id")).orderBy(dist2.asc, col("cell").asc)
    val probed = queries.join(broadcast(centroids))
      .withColumn("rp", row_number().over(wProbe))
      .filter(col("rp") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cell"))

    // candidates: only vectors in probed cells; exact cosine; top-k
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    assigned.select(col("vec_id").as("neighbor_id"), col("embedding"), col("cell"))
      .join(broadcast(probed), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", HashFunctions.cosineSim(col("q_emb"), col("embedding")))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  /** Embedding-cosine near-duplicate pairs via multi-table SRP-LSH:
    * `nTables` independent bucketings of `nBits` bits each (amplifies recall
    * like MinHash bands — a pair is a candidate if it collides in ANY table),
    * equi-self-join on (table, bucket), exact cosine verify inside the
    * bucket only, distinct pairs. Never all-pairs: expected candidates per
    * table ≈ n²/2^nBits ÷ n per vector. */
  def embeddingNearDups(t: Tables, minCosine: Double = 0.35,
                        nBits: Int = 4, nTables: Int = 8): DataFrame = {
    val tableIds = array((0 until nTables).map(lit): _*)
    val emb = t.embeddings
      .select(col("vec_id"), col("embedding"), explode(tableIds).as("tbl"))
      .withColumn("bucket",
        HashFunctions.srpBucketSeeded(col("embedding"), nBits, col("tbl")))
      .select(col("vec_id"), col("embedding"), col("tbl"), col("bucket"))
    emb.as("a")
      .join(emb.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      // verify BEFORE dedup: the exact-cosine filter runs map-side on each
      // collision, so only confirmed near-dup id pairs (ids + one double, not
      // the 256-byte vectors) ever reach the distinct's shuffle. A pair
      // colliding in several tables recomputes cosine ≤ nTables times —
      // cheaper at scale than shuffling embeddings as group-by keys.
      .withColumn("cosine", HashFunctions.cosineSim(col("a.embedding"), col("b.embedding")))
      .filter(col("cosine") >= minCosine)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
      .groupBy("vec_a", "vec_b")
      .agg(round(max("cosine"), 6).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }
}
