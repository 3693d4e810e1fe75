package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TextIndex}

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  test("bm25Probe against the stored postings equals the from-scratch bm25Search") {
    val dir = Files.createTempDirectory("gtidx").toString
    val idx = TextIndex.buildIndex(spark, tables.documents, "gtidx_eq", dir,
      buckets = 8)
    val live = TextAnalysis.bm25Search(tables)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val probed = TextIndex.bm25Probe(spark, idx,
        tables.documents.filter($"doc_id" < 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(probed.nonEmpty && probed == live,
      s"probe=${probed.size} live=${live.size}; " +
        s"diff=${(probed.toSet diff live.toSet).take(3)}")
  }

  test("attach re-registers the table in a catalog that lost it; stats survive") {
    val dir = Files.createTempDirectory("gtidx_attach").toString
    val built = TextIndex.buildIndex(spark, tables.documents, "gtidx_att", dir,
      buckets = 8)
    spark.sql("DROP TABLE gtidx_att_postings") // simulate a fresh session
    val idx = TextIndex.attachIndex(spark, "gtidx_att", dir, buckets = 8)
    assert(idx.nDocs == built.nDocs && idx.sumLen == built.sumLen)
    val out = TextIndex.bm25Probe(spark, idx,
      tables.documents.filter($"doc_id" < 3))
    assert(out.count() > 0)
  }

  test("segmented probe over two appended batches equals from-scratch bm25 on the union") {
    val dir = Files.createTempDirectory("gtidx_seg").toString
    val half = tables.documents.count() / 2
    TextIndex.appendSegment(spark, tables.documents.filter($"doc_id" < half),
      "gtidx_seg", dir, buckets = 8)
    val seg = TextIndex.appendSegment(spark,
      tables.documents.filter($"doc_id" >= half), "gtidx_seg", dir, buckets = 8)
    assert(seg.ids == Seq(0, 1))
    val live = TextAnalysis.bm25Search(tables)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val probed = TextIndex.bm25ProbeSegmented(spark, seg,
        tables.documents.filter($"doc_id" < 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(probed.nonEmpty && probed == live,
      s"probe=${probed.size} live=${live.size}; " +
        s"diff=${(probed.toSet diff live.toSet).take(3)}")
  }

  test("attachSegments re-registers segment tables for a fresh catalog") {
    val dir = Files.createTempDirectory("gtidx_seg_att").toString
    TextIndex.appendSegment(spark, tables.documents.filter($"doc_id" < 50),
      "gtidx_sa", dir, buckets = 8)
    TextIndex.appendSegment(spark,
      tables.documents.filter($"doc_id" >= 50 && $"doc_id" < 100),
      "gtidx_sa", dir, buckets = 8)
    spark.sql("DROP TABLE gtidx_sa_seg0")
    spark.sql("DROP TABLE gtidx_sa_seg1")
    val seg = TextIndex.attachSegments(spark, "gtidx_sa", dir, buckets = 8)
    assert(seg.ids == Seq(0, 1))
    assert(TextIndex.bm25ProbeSegmented(spark, seg,
      tables.documents.filter($"doc_id" < 3)).count() > 0)
  }

  test("streaming ingest: replayed batch is a no-op, probe equals from-scratch") {
    import graft.streaming.CorpusStreams
    val dir = Files.createTempDirectory("gtidx_stream").toString
    val half = tables.documents.count() / 2
    val b0 = tables.documents.filter($"doc_id" < half)
    val b1 = tables.documents.filter($"doc_id" >= half)
    CorpusStreams.processTextIndexBatch(spark, b0, 0L, "gtidx_st", dir)
    CorpusStreams.processTextIndexBatch(spark, b1, 1L, "gtidx_st", dir)
    // a restarted stream replays batch 1 — the listed tag makes it a no-op
    CorpusStreams.processTextIndexBatch(spark, b1, 1L, "gtidx_st", dir)
    val seg = TextIndex.attachSegments(spark, "gtidx_st", dir)
    assert(seg.ids == Seq(0, 1), s"replay appended: ${seg.ids}")
    val live = TextAnalysis.bm25Search(tables)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val probed = TextIndex.bm25ProbeSegmented(spark, seg,
        tables.documents.filter($"doc_id" < 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(probed == live)
    // an empty micro-batch must not abort the stream
    CorpusStreams.processTextIndexBatch(spark,
      tables.documents.filter($"doc_id" < 0), 2L, "gtidx_st", dir)
    assert(TextIndex.attachSegments(spark, "gtidx_st", dir).ids == Seq(0, 1))
  }

  test("compaction collapses segments to one with identical probe results") {
    val dir = Files.createTempDirectory("gtidx_compact").toString
    val half = tables.documents.count() / 2
    TextIndex.appendSegment(spark, tables.documents.filter($"doc_id" < half),
      "gtidx_cp", dir, buckets = 8)
    val grown = TextIndex.appendSegment(spark,
      tables.documents.filter($"doc_id" >= half), "gtidx_cp", dir, buckets = 8)
    val before = TextIndex.bm25ProbeSegmented(spark, grown,
        tables.documents.filter($"doc_id" < 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val compacted = TextIndex.compactSegments(spark, grown, buckets = 8)
    assert(compacted.ids.length == 1)
    // a reattach reads the swapped list — the commit point
    val reattached = TextIndex.attachSegments(spark, "gtidx_cp", dir,
      buckets = 8)
    assert(reattached.ids == compacted.ids)
    val after = TextIndex.bm25ProbeSegmented(spark, reattached,
        tables.documents.filter($"doc_id" < 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(after == before, s"diff=${(after.toSet diff before.toSet).take(3)}")
  }

  test("single-term probe prunes to one bucket and pushes the In filter") {
    val dir = Files.createTempDirectory("gtidx_prune").toString
    val idx = TextIndex.buildIndex(spark, tables.documents, "gtidx_prune", dir,
      buckets = 8)
    // one-term query doc (the term certainly exists in the corpus)
    val term = tables.documents
      .select(explode(TextAnalysis.tokens($"text")).as("w"))
      .groupBy("w").count().orderBy(desc("count")).head().getString(0)
    val q = Seq((900000L, term)).toDF("doc_id", "text")
    val df = TextIndex.bm25Probe(spark, idx, q)
    val plan = planOf(df)
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"bucket pruning missing:\n$plan")
    assert(df.count() > 0)
  }
}
