package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{CdcStore, Relational}
import graft.streaming.CorpusStreams

class CdcStoreSpec extends SparkSpec {
  import spark.implicits._

  /** The seed snapshot (op = keep) plus the SAME change derivation as the
    * batch operator, so streaming apply can be pinned row-equal to it. */
  private def seed = tables.customer.select(
    col("c_custkey").as("k"), lit("keep").as("op"),
    col("c_nationkey").as("nationkey"),
    round(col("c_acctbal"), 2).as("acctbal"))

  private def changes = {
    val base = tables.customer
    base.filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 13 === 0)
      .select(col("c_custkey").as("k"),
        when(col("c_custkey") % 13 === 0, lit("delete"))
          .otherwise(lit("update")).as("op"),
        col("c_nationkey").as("nationkey"),
        round(col("c_acctbal") + 100.0, 2).as("acctbal"))
      .union(base.filter(col("c_custkey") % 11 === 0)
        .select((col("c_custkey") + 1000000L).as("k"), lit("insert").as("op"),
          col("c_nationkey").as("nationkey"),
          round(col("c_acctbal"), 2).as("acctbal")))
  }

  private def stateRows(store: CdcStore.Store) =
    CdcStore.currentState(spark, store)
      .select(col("k").as("custkey"), col("nationkey"), col("acctbal"),
        col("op").as("merge_op"))
      .orderBy("custkey")
      .collect().map(_.toSeq).toSeq

  test("streamed change batches reproduce the batch upsertMerge row-for-row") {
    val dir = Files.createTempDirectory("cdc_eq").toString
    CorpusStreams.processCdcBatch(spark, seed, 0L, "cdc_eq", dir)
    // the change set arrives time-split across two micro-batches
    CorpusStreams.processCdcBatch(spark, changes.filter($"k" % 2 === 0), 1L,
      "cdc_eq", dir)
    CorpusStreams.processCdcBatch(spark, changes.filter($"k" % 2 === 1), 2L,
      "cdc_eq", dir)
    val store = CdcStore.attachStore(spark, "cdc_eq", dir)
    assert(store.ids == Seq(0, 1, 2))
    val expected = Relational.upsertMerge(tables).collect().map(_.toSeq).toSeq
    val got = stateRows(store)
    assert(got.nonEmpty && got == expected,
      s"diff=${(got.toSet diff expected.toSet).take(3)} / " +
        s"${(expected.toSet diff got.toSet).take(3)}")
  }

  test("a replayed micro-batch is a no-op; an empty batch is graceful") {
    val dir = Files.createTempDirectory("cdc_replay").toString
    CorpusStreams.processCdcBatch(spark, seed, 0L, "cdc_rp", dir)
    CorpusStreams.processCdcBatch(spark, changes, 1L, "cdc_rp", dir)
    val before = stateRows(CdcStore.attachStore(spark, "cdc_rp", dir))
    CorpusStreams.processCdcBatch(spark, changes, 1L, "cdc_rp", dir) // replay
    CorpusStreams.processCdcBatch(spark, changes.filter(lit(false)), 2L,
      "cdc_rp", dir) // empty
    val store = CdcStore.attachStore(spark, "cdc_rp", dir)
    assert(store.ids == Seq(0, 1), s"replay/empty appended: ${store.ids}")
    assert(stateRows(store) == before)
  }

  test("appendChanges bounds the delta-segment file count by batch bytes, not caller width") {
    // the bound lives IN the store (r17 verdict item 2): a micro-batch
    // arriving at the session's full shuffle width must still land as a
    // handful of files — every later resolve pays a fixed task setup per
    // file, and callers (the streaming loop included) should not need a
    // call-site coalesce
    val dir = Files.createTempDirectory("cdc_files").toString
    CdcStore.appendChanges(spark, seed.repartition(32), "cdc_fc", dir,
      buckets = 8, batchTag = Some("b0"))
    val files = Files.list(java.nio.file.Paths.get(dir, "cdc_fc_cdc0"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(files <= 8, s"delta segment written with $files files (> buckets)")
  }

  test("boundBucketedWrite aligned path: exactly one bucket per write task") {
    // the helper's large-batch arm repartitions at a MULTIPLE of the
    // bucket count, relying on Spark's shuffle hash and bucket hash being
    // the same pmod(murmur3(_, 42)) family — if that alignment ever broke
    // (a hash or seed change), each of the n tasks would hold rows of
    // ~all buckets and the file count would explode toward n × buckets.
    // Feeding fake "large" stats forces the aligned arm on a small batch:
    // 1 GiB / 64 MiB = 16 tasks over 8 buckets ⇒ exactly 16 files iff
    // every task held exactly one bucket.
    import graft.operators.IndexFiles
    val dir = Files.createTempDirectory("cdc_aligned").toString
    IndexFiles.boundBucketedWrite(seed, "k", 8, BigInt(1L << 30))
      .write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/aligned_t")
      .saveAsTable("aligned_t")
    val files = Files.list(java.nio.file.Paths.get(dir, "aligned_t"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(files == 16, s"aligned write produced $files files (want 16 = " +
      "one bucket per task); the shuffle/bucket hash alignment broke")
    spark.sql("DROP TABLE aligned_t")
  }

  test("an orphan segment (crash after table write, before list commit) is invisible") {
    val dir = Files.createTempDirectory("cdc_orphan").toString
    CorpusStreams.processCdcBatch(spark, seed, 0L, "cdc_or", dir)
    val before = stateRows(CdcStore.attachStore(spark, "cdc_or", dir))
    // simulate the crash window: segment data lands but the list write
    // never happened — readers must not see it
    changes.limit(5).write.parquet(s"$dir/cdc_or_cdc99")
    val store = CdcStore.attachStore(spark, "cdc_or", dir)
    assert(store.ids == Seq(0))
    assert(stateRows(store) == before)
  }

  test("compaction preserves state, keeps replays no-ops, and accepts new batches") {
    val dir = Files.createTempDirectory("cdc_compact").toString
    CorpusStreams.processCdcBatch(spark, seed, 0L, "cdc_cp", dir)
    CorpusStreams.processCdcBatch(spark, changes.filter($"k" % 2 === 0), 1L,
      "cdc_cp", dir)
    val grown = CdcStore.attachStore(spark, "cdc_cp", dir)
    val before = stateRows(grown)
    val compacted = CdcStore.compactStore(spark, grown)
    assert(compacted.ids.length == 1)
    assert(stateRows(compacted) == before, "compaction changed the state")
    // replay of a folded batch after compaction: still a no-op
    CorpusStreams.processCdcBatch(spark, changes.filter($"k" % 2 === 0), 1L,
      "cdc_cp", dir)
    assert(CdcStore.attachStore(spark, "cdc_cp", dir).ids == compacted.ids)
    // and the store keeps accepting new batches on top of the base
    CorpusStreams.processCdcBatch(spark, changes.filter($"k" % 2 === 1), 2L,
      "cdc_cp", dir)
    val after = stateRows(CdcStore.attachStore(spark, "cdc_cp", dir))
    assert(after == Relational.upsertMerge(tables).collect().map(_.toSeq).toSeq)
  }

  test("live cdcApplyLoop over a MemoryStream lands every change batch exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("cdc_live").toString
    val input = MemoryStream[(Long, String, Long, Double)]
    val q = CorpusStreams.cdcApplyLoop(spark,
      input.toDF().toDF("k", "op", "nationkey", "acctbal"), "cdc_lv", dir)
    try {
      input.addData((1L, "insert", 7L, 10.0), (2L, "insert", 8L, 20.0))
      q.processAllAvailable()
      input.addData((1L, "update", 7L, 11.5), (2L, "delete", 8L, 0.0),
        (3L, "insert", 9L, 30.0))
      q.processAllAvailable()
      val store = CdcStore.attachStore(spark, "cdc_lv", dir)
      assert(store.ids == Seq(0, 1))
      val state = CdcStore.currentState(spark, store)
        .select("k", "op", "acctbal").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(state == Seq((1L, "update", 11.5), (3L, "insert", 30.0)))
    } finally q.stop()
  }

  test("a batch tag with a separator is rejected before anything is written") {
    val dir = Files.createTempDirectory("cdc_badtag").toString
    intercept[IllegalArgumentException] {
      CdcStore.appendChanges(spark, seed, "cdc_bt", dir,
        batchTag = Some("a:b"))
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "cdc_segments.list")))
  }
}
