package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{GraphAnn, Similarity}

class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private def queries(n: Int = 10) = tables.embeddings
    .filter($"vec_id" < n)
    .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))

  test("beam search recall vs brute force, touching a fraction of the corpus") {
    val dir = Files.createTempDirectory("gann").toString
    val idx = GraphAnn.buildIndex(spark, tables.embeddings, "gann_t1", dir)
    val (out, nScored) = GraphAnn.beamSearchWithCandidateCount(
      spark, idx, queries())
    val graph = out.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (graph intersect brute).size.toDouble / brute.size
    // measured frontier on this 500-vector corpus (degree=16, beam=16):
    // recall 0.98 at ~0.75 of query x corpus scored. The fraction bound
    // is loose here BECAUSE the corpus is tiny — scored count is
    // beam x degree x hops ≈ 380/query regardless of corpus size, so the
    // fraction shrinks linearly with n (19% at sf0.1's 2000 vectors; see
    // the PLANS.md frontier). A recall collapse or an exhaustive-scan
    // regression still fails loudly.
    assert(recall >= 0.9, s"recall@5 = $recall (graph=${graph.size}, brute=${brute.size})")
    val fraction = nScored.toDouble / (10 * idx.nNodes)
    assert(fraction < 0.85,
      s"beam search scored $nScored pairs = ${fraction * 100}%% of query x corpus " +
        "- not a bounded candidate set")
  }

  test("large-batch frontier form (broadcast join, no literal isin) is row- and count-identical") {
    // isinMax=0 forces every hop onto the join-only path the large-batch
    // threshold selects (the literal-isin plan balloons at queries×beam
    // ≈ 10⁵ — r15 verdict item 5); the frontier assignment join must
    // restrict the adjacency scan to the identical row set, so results
    // AND the per-hop candidate-scoring count both pin equal.
    val dir = Files.createTempDirectory("gann_join").toString
    val idx = GraphAnn.buildIndex(spark, tables.embeddings, "gann_join", dir)
    val (outIsin, nIsin) = GraphAnn.beamSearchWithCandidateCount(
      spark, idx, queries(), isinMax = Int.MaxValue)
    val (outJoin, nJoin) = GraphAnn.beamSearchWithCandidateCount(
      spark, idx, queries(), isinMax = 0)
    assert(outIsin.collect().toSeq == outJoin.collect().toSeq)
    assert(nIsin == nJoin, s"candidate counts diverge: $nIsin vs $nJoin")
  }

  test("exact-scored beam at pinned over-provisioned params equals brute-force top-k") {
    // the q_ann_graph_recall contract: beam=64 / maxHops=12 exhausts the
    // improvement frontier on any corpus the fixture family produces, so
    // the pair set AND the rounded cosine column must match bruteForceTopK
    // row-for-row — recall pinned to 1.0, not a tolerance
    val dir = Files.createTempDirectory("gann_exact").toString
    val idx = GraphAnn.buildIndex(spark, tables.embeddings, "gann_exact", dir)
    val got = GraphAnn.beamSearchExactScored(spark, idx, queries())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = Similarity.bruteForceTopK(tables)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == brute,
      s"beam(64,12) != brute: only-beam=${(got.toSet diff brute.toSet).take(3)} " +
        s"only-brute=${(brute.toSet diff got.toSet).take(3)}")
  }

  test("driver-scored and distributed-scored hops are row- and count-identical") {
    // the r20 driver scoring arm calls the same HashImpl.cosineF kernel
    // the codegen'd expression does, so beam decisions — and with them
    // the pair set AND the candidate-scoring count — must pin EXACTLY
    // equal to the distributed per-hop probe form
    val dir = Files.createTempDirectory("gann_drv").toString
    val idx = GraphAnn.buildIndex(spark, tables.embeddings, "gann_drv", dir)
    val (outDrv, nDrv) = GraphAnn.beamSearchWithCandidateCount(
      spark, idx, queries())
    spark.conf.set("spark.graft.graph.driverMaxBytes", "0")
    val (outDist, nDist) = try GraphAnn.beamSearchWithCandidateCount(
      spark, idx, queries())
    finally spark.conf.unset("spark.graft.graph.driverMaxBytes")
    assert(outDrv.collect().toSeq == outDist.collect().toSeq)
    assert(nDrv == nDist, s"candidate counts diverge: $nDrv vs $nDist")
  }

  test("beam search is deterministic") {
    val dir = Files.createTempDirectory("gann_det").toString
    val idx = GraphAnn.buildIndex(spark, tables.embeddings, "gann_det", dir)
    val a = GraphAnn.beamSearch(spark, idx, queries()).collect().toSeq
    val b = GraphAnn.beamSearch(spark, idx, queries()).collect().toSeq
    assert(a == b)
  }

  test("attach re-registers both tables in a fresh catalog; meta survives") {
    val dir = Files.createTempDirectory("gann_att").toString
    val built = GraphAnn.buildIndex(spark, tables.embeddings, "gann_att", dir)
    spark.sql("DROP TABLE gann_att_gadj")
    spark.sql("DROP TABLE gann_att_gnodes")
    val idx = GraphAnn.attachIndex(spark, "gann_att", dir)
    assert(idx.entry == built.entry && idx.nNodes == built.nNodes &&
      idx.degree == built.degree)
    assert(GraphAnn.beamSearch(spark, idx, queries(3)).count() > 0)
  }

  test("attach refuses a directory without a completed build") {
    val dir = Files.createTempDirectory("gann_empty").toString
    val e = intercept[IllegalStateException] {
      GraphAnn.attachIndex(spark, "gann_none", dir)
    }
    assert(e.getMessage.contains("no completed index"))
  }

  test("append: new vectors become searchable; replayed tag is a no-op; compaction re-caps") {
    val dir = Files.createTempDirectory("gann_app").toString
    val half = tables.embeddings.filter($"vec_id" % 2 === 0)
    val rest = tables.embeddings.filter($"vec_id" % 2 === 1)
      .select("vec_id", "embedding")
    val built = GraphAnn.buildIndex(spark, half, "gann_ap", dir)
    val appended = GraphAnn.appendToIndex(spark, rest, built,
      batchTag = Some("b1"))
    assert(appended.nNodes == built.nNodes + rest.count())
    // replay: tag already recorded, nothing changes — exercised through
    // the streaming micro-batch wiring (batchId 1 → the same tag scheme)
    val replayed = GraphAnn.appendToIndex(spark, rest, appended,
      batchTag = Some("b1"))
    assert(replayed.nNodes == appended.nNodes)
    graft.streaming.CorpusStreams.processGraphAnnBatch(spark, rest, 7L,
      appended)
    graft.streaming.CorpusStreams.processGraphAnnBatch(spark, rest, 7L,
      appended) // replayed micro-batch: tag listed, no-op
    val meta = GraphAnn.attachIndex(spark, "gann_ap", dir)
    assert(meta.nNodes == appended.nNodes + rest.count(),
      "streamed batch landed once and its replay was a no-op")
    // the appended vectors are REACHABLE: full-corpus queries now recall
    // odd neighbors too (brute force over the full corpus as truth)
    val out = GraphAnn.beamSearch(spark, appended, queries()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(_._2).exists(_ % 2 == 1),
      "no appended (odd) vector ever surfaces in the top-k")
    val brute = Similarity.bruteForceTopK(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (out intersect brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"post-append recall collapsed: $recall")
    // compaction: degree re-capped, duplicates gone, results still good
    val compacted = GraphAnn.compactIndex(spark, appended)
    val deg = spark.table(compacted.adjTable).groupBy("node_id").count()
      .agg(max("count")).head().getLong(0)
    // cap-exempt refreshed bridges can push the entry/rep nodes past
    // 2·degree by at most the seed-0 bucket count (2^nBits)
    assert(deg <= 2 * compacted.degree + (1 << 4),
      s"degree $deg > ${2 * compacted.degree} + 16")
    assert(spark.table(compacted.nodesTable).count() == compacted.nNodes)
    val outC = GraphAnn.beamSearch(spark, compacted, queries()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallC = (outC intersect brute).size.toDouble / brute.size
    assert(recallC >= 0.6, s"post-compaction recall collapsed: $recallC")
  }

  test("drifted append: intra-batch links + refreshed bridges make a novel region searchable") {
    // cluster A (axis 0) is the build-time corpus; cluster B (axis 1,
    // ids 1000+) is a DRIFTED append — a similarity region that did not
    // exist at build time. Sequential-HNSW semantics would link B
    // internally as it inserts; the batched append must get the same
    // effect from its in-batch LSH edges, and compaction's bridge
    // refresh must make the region entry-adjacent.
    val dir = Files.createTempDirectory("gann_drift").toString
    def cluster(ids: Range, axis: Int) = ids.map { i =>
      val v = Array.fill(8)(0.0f)
      v(axis) = 1.0f
      v(6) = (i % 7) * 0.02f
      v(7) = (i % 5) * 0.02f
      (i.toLong, v.toSeq)
    }
    val a = cluster(0 until 200, 0).toDF("vec_id", "embedding")
    val b = cluster(1000 until 1050, 1).toDF("vec_id", "embedding")
    val built = GraphAnn.buildIndex(spark, a, "gann_drift", dir)
    val appended = GraphAnn.appendToIndex(spark, b, built,
      batchTag = Some("drift1"))
    // in-batch linking: B members carry edges to OTHER B members
    val intraB = spark.table(appended.adjTable)
      .filter(col("node_id") >= 1000L && col("neighbor_id") >= 1000L).count()
    assert(intraB > 0, "novel batch landed with no intra-batch edges")
    val compacted = GraphAnn.compactIndex(spark, appended)
    // bridge refresh: the entry now reaches a representative of the
    // drifted region directly
    val entryNbrs = spark.table(compacted.adjTable)
      .filter(col("node_id") === compacted.entry)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(entryNbrs.exists(_ >= 1000L),
      s"no drifted representative among entry neighbors: $entryNbrs")
    // functional: drifted queries recall their in-cluster neighbors —
    // for a B query every true top-5 neighbor is another B vector
    val q = b.filter($"vec_id" < 1005L)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val out = GraphAnn.beamSearch(spark, compacted, q).collect()
    assert(out.nonEmpty)
    val inCluster = out.count(_.getLong(1) >= 1000L).toDouble / out.length
    assert(inCluster >= 0.8,
      s"drifted queries recalled mostly stale-region neighbors ($inCluster in-cluster)")
  }

  test("compaction crash states: uncommitted stage rolls back, committed rolls forward") {
    val dir = Files.createTempDirectory("gann_crash").toString
    val idx = GraphAnn.buildIndex(spark, tables.embeddings, "gann_cr", dir)
    val before = GraphAnn.beamSearch(spark, idx, queries(3)).collect().toSeq
    // uncommitted stage (no marker): attach discards it
    val stageAdj = java.nio.file.Paths.get(dir, s"${idx.adjTable}_stage")
    java.nio.file.Files.createDirectories(stageAdj)
    java.nio.file.Files.writeString(stageAdj.resolve("garbage.parquet"), "file")
    val re = GraphAnn.attachIndex(spark, "gann_cr", dir)
    assert(!java.nio.file.Files.exists(stageAdj), "uncommitted stage survived")
    assert(GraphAnn.beamSearch(spark, re, queries(3)).collect().toSeq == before)
  }

  test("a hop's adjacency expansion prunes to the frontier's buckets") {
    val dir = Files.createTempDirectory("gann_prune").toString
    val idx = GraphAnn.buildIndex(spark, tables.embeddings, "gann_pr", dir)
    // the exact scan shape beamSearch issues per hop: literal isin over
    // frontier node ids -> bucket pruning on the stored layout (the
    // planner's auto-bucketed-scan heuristic would disable it for a bare
    // filter, so beamSearch forces it — same helper here)
    val plan = GraphAnn.withBucketPruning(spark) {
      planOf(spark.table(idx.adjTable)
        .filter(col("node_id").isin(idx.entry, idx.entry + 1)))
    }
    assert("SelectedBucketsCount: (1|2) out of 16".r.findFirstIn(plan).isDefined,
      s"bucket pruning missing:\n$plan")
    // every node reaches the entry point (bridges guarantee the reverse
    // direction too): the graph serves any region of the corpus
    val adj = spark.table(idx.adjTable)
    assert(adj.filter(col("node_id") === idx.entry).count() > 0)
    val deg = adj.groupBy("node_id").count().agg(max("count")).head().getLong(0)
    assert(deg <= 2 * idx.degree + (1 << 4),
      s"adjacency degree $deg exceeds the 2*degree + bridge bound")
  }
}
