package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupIndex}

class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshPrefix(): String = s"gdidx_test_${System.nanoTime()}"

  test("dedupeAgainstIndex is result-equal to the rescan path") {
    val corpus = tables.documents.filter($"doc_id" >= 300)
    val batch = tables.documents.filter($"doc_id" < 300)
    val dir = Files.createTempDirectory("gdidx").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir)
    val viaIndex = DedupIndex.dedupeAgainstIndex(spark, batch, idx, corpus)
      .collect().toSeq
    val rescan = Dedup.dedupeIncrement(corpus, batch).collect().toSeq
    assert(viaIndex == rescan)
    assert(viaIndex.nonEmpty)
  }

  test("attachIndex registers a previously written index without rewriting data") {
    val corpus = tables.documents.filter($"doc_id" >= 450)
    val batch = tables.documents.filter($"doc_id" < 50)
    val dir = Files.createTempDirectory("gdidx_attach").toString
    val pfx = freshPrefix()
    val built = DedupIndex.buildIndex(spark, corpus, pfx, dir)
    val want = DedupIndex.dedupeAgainstIndex(spark, batch, built, corpus)
      .collect().toSeq
    // simulate a NEW session: drop the catalog entries, keep the files
    Seq(built.fp, built.sig, built.band).foreach(t => spark.sql(s"DROP TABLE $t"))
    val mtimes = Files.walk(java.nio.file.Paths.get(dir)).toArray.length
    val attached = DedupIndex.attachIndex(spark, pfx, dir)
    assert(Files.walk(java.nio.file.Paths.get(dir)).toArray.length == mtimes,
      "attach must not write files")
    val got = DedupIndex.dedupeAgainstIndex(spark, batch, attached, corpus)
      .collect().toSeq
    assert(got == want)
  }

  test("index probes shuffle only the batch side (one hash Exchange, bucketed scan)") {
    val corpus = tables.documents.filter($"doc_id" >= 300)
    val batch = tables.documents.filter($"doc_id" < 100)
    val dir = Files.createTempDirectory("gdidx_plan").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fpProbe = batch.select(Dedup.fingerprint(col("text")).as("fp"))
        .join(spark.table(idx.fp), Seq("fp"), "left_anti")
      val fpPlan = planOf(fpProbe)
      assert("Exchange hashpartitioning".r.findAllIn(fpPlan).size == 1,
        s"fp anti-join must shuffle only the batch side:\n$fpPlan")
      assert(fpPlan.contains("SelectedBucketsCount") || fpPlan.contains("Bucketed: true"),
        s"fp probe must read the bucketed index:\n$fpPlan")

      val bandProbe = Dedup.minhashBandRows(
          Dedup.minhashSigs(batch.select("doc_id", "text"), 2, 64), 16)
        .select("band", "band_key", "doc_id")
        .join(spark.table(idx.band), Seq("band", "band_key"))
      val bandPlan = planOf(bandProbe)
      assert("Exchange hashpartitioning".r.findAllIn(bandPlan).size == 1,
        s"band join must shuffle only the batch side:\n$bandPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("index path drops exact, in-batch, and verified near dups; novel docs survive") {
    val corpus = tables.documents.filter($"doc_id" < 50)
    val ex = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val incoming = Seq(
      (1000L, ex(0L), "en", "batch"),                   // exact dup of corpus
      (1001L, "novel zebra quartz lattice prism omega", "en", "batch"),
      (1002L, "novel zebra quartz lattice prism omega", "en", "batch"), // in-batch dup
      (1003L, ex(1L) + " tail", "en", "batch"),         // near-dup of corpus doc
      (1004L, "utterly unrelated xylophone vortex glyph nimbus ember", "en", "batch"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = Files.createTempDirectory("gdidx_mini").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir)
    val kept = DedupIndex.dedupeAgainstIndex(spark, incoming, idx, corpus)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1001L, 1004L), s"survivors: $kept")
  }

  test("two near-identical docs in the SAME batch yield one survivor") {
    val corpus = tables.documents.filter($"doc_id" < 50)
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val incoming = Seq(
      (2000L, base, "en", "batch"),
      // near-dup of 2000 — NOT byte-identical, so the exact fp stage
      // can't see it; only the in-batch band self-join can
      (2001L, base + " uniform", "en", "batch"),
      (2002L, "wholly different vocabulary nothing shared with the pair", "en", "batch"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = Files.createTempDirectory("gdidx_inbatch").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir)
    val kept = DedupIndex.dedupeAgainstIndex(spark, incoming, idx, corpus)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2000L, 2002L), s"survivors: $kept")
    // the rescan twin applies the same in-batch pass
    val rescan = Dedup.dedupeIncrement(corpus, incoming)
      .collect().map(_.getLong(0)).toSet
    assert(rescan == kept)
  }

  test("bloom pre-probe is in the plan, rejects nothing it shouldn't, result exact") {
    val corpus = tables.documents.filter($"doc_id" >= 300)
    val batch = tables.documents.filter($"doc_id" < 100)
    val dir = Files.createTempDirectory("gdidx_bloom").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir)
    assert(DedupIndex.loadBloom(spark, idx.dir).isDefined, "sidecar missing")
    // the probe plan carries the might_contain pre-filter on the batch side
    val probed = DedupIndex.dedupeAgainstIndex(spark, batch, idx, corpus)
    assert(planOf(probed).contains("might_contain"),
      "bloom pre-filter absent from the probe plan")
    // result equality with the sidecar-free rescan path
    val want = Dedup.dedupeIncrement(corpus, batch).collect().toSeq
    assert(probed.collect().toSeq == want)
    // no false negatives: re-probing the corpus itself must drop EVERY row
    // (a false negative would route an indexed fp around the anti-join)
    val self = DedupIndex.dedupeAgainstIndex(spark,
      corpus.select("doc_id", "text", "lang", "source"), idx, corpus)
    assert(self.count() == 0L, "bloom false negative re-admitted an indexed doc")
  }

  test("probe-side hot-bucket cap drops stored mega-buckets, high cap is exact") {
    // stored corpus: 40 boilerplate docs sharing every band bucket
    val boiler = (0 until 40).map(i =>
      (i.toLong, "terms of service all rights reserved contact us privacy policy", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = Files.createTempDirectory("gdidx_cap").toString
    val idx = DedupIndex.buildIndex(spark, boiler, freshPrefix(), dir)
    val batch = Seq(
      (500L, "terms of service all rights reserved contact us privacy policies", "en", "b"),
      (501L, "completely novel content about rivers and foxes and quiet dogs", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val default = DedupIndex.dedupeAgainstIndex(spark, batch, idx, boiler)
      .collect().map(_.getLong(0)).toSet
    assert(default == Set(501L), s"near-dup of boilerplate must drop: $default")
    // cap below 40: the stored mega-buckets are dropped, so the boilerplate
    // near-dup is MISSED (the documented recall trade) and both survive
    val capped = DedupIndex.dedupeAgainstIndex(spark, batch, idx, boiler,
        maxBucketSize = Some(10L))
      .collect().map(_.getLong(0)).toSet
    assert(capped == Set(500L, 501L), s"got $capped")
    // cap above every stored bucket: exact
    val high = DedupIndex.dedupeAgainstIndex(spark, batch, idx, boiler,
        maxBucketSize = Some(1000L))
      .collect().map(_.getLong(0)).toSet
    assert(high == default)
  }

  test("a torn bloom sidecar degrades to the plain anti-join, never an error") {
    val corpus = tables.documents.filter($"doc_id" >= 300)
    val batch = tables.documents.filter($"doc_id" < 100)
    val dir = Files.createTempDirectory("gdidx_torn").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir)
    val want = DedupIndex.dedupeAgainstIndex(spark, batch, idx, corpus)
      .collect().toSeq
    // simulate a torn write on a store without atomic rename: truncate the
    // sidecar mid-file so readFrom fails
    val bloomFile = java.nio.file.Paths.get(dir, "fp.bloom")
    val bytes = Files.readAllBytes(bloomFile)
    Files.write(bloomFile, bytes.take(bytes.length / 2))
    assert(DedupIndex.loadBloom(spark, dir).isEmpty,
      "torn sidecar must parse as absent")
    val got = DedupIndex.dedupeAgainstIndex(spark, batch, idx, corpus)
    assert(!planOf(got).contains("might_contain"),
      "torn sidecar must drop the pre-filter from the plan")
    assert(got.collect().toSeq == want)
    // writes go through a temp+rename, so no .tmp residue ever persists
    assert(!Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).exists(_.endsWith(".tmp")))
  }

  test("compactIndex collapses file count, preserves results and the one-Exchange probe") {
    val corpus = tables.documents.filter($"doc_id" >= 350)
    val dir = Files.createTempDirectory("gdidx_compact").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir)
    // several small appends → many small per-bucket files
    var grown = corpus
    for (lo <- Seq(50L, 100L, 150L, 200L, 250L)) {
      val day = tables.documents.filter($"doc_id" >= lo && $"doc_id" < lo + 50)
      val kept = DedupIndex.dedupeAgainstIndex(spark, day, idx, grown)
      val survivors = day.join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
        .localCheckpoint()
      DedupIndex.appendToIndex(spark, survivors, idx)
      grown = grown.unionByName(survivors.select(grown.columns.map(col): _*))
        .localCheckpoint()
    }
    val batch = tables.documents.filter($"doc_id" < 50)
    val want = DedupIndex.dedupeAgainstIndex(spark, batch, idx, grown)
      .collect().toSeq
    def parquetFiles(sub: String): Int =
      Files.walk(java.nio.file.Paths.get(dir, sub)).toArray
        .map(_.toString).count(_.endsWith(".parquet"))
    val before = parquetFiles("fp")
    DedupIndex.compactIndex(spark, idx)
    val after = parquetFiles("fp")
    assert(after < before, s"fp files $before -> $after: compaction must collapse")
    assert(after <= 8, s"at most one file per bucket expected, got $after")
    // result-equality after the rewrite, bloom rebuilt and consistent
    val got = DedupIndex.dedupeAgainstIndex(spark, batch, idx, grown)
    assert(got.collect().toSeq == want)
    assert(DedupIndex.loadBloom(spark, dir).isDefined, "bloom must be rebuilt")
    // probe stays one-Exchange against the compacted bucketed layout
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = batch.select(Dedup.fingerprint(col("text")).as("fp"))
        .join(spark.table(idx.fp), Seq("fp"), "left_anti")
      val plan = planOf(probe)
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"compacted fp probe must still shuffle only the batch side:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"compacted probe must read the bucketed index:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("a compaction killed mid-swap recovers to a consistent index") {
    import java.nio.file.{Path, Paths, StandardCopyOption}
    def copyDir(src: Path, dst: Path): Unit =
      Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    val corpus = tables.documents.filter($"doc_id" >= 350)
    val batch = tables.documents.filter($"doc_id" < 50)
    val dir = Files.createTempDirectory("gdidx_crash").toString
    val pfx = freshPrefix()
    val idx = DedupIndex.buildIndex(spark, corpus, pfx, dir)
    val want = DedupIndex.dedupeAgainstIndex(spark, batch, idx, corpus)
      .collect().toSeq

    // STATE A — crash right after the commit marker, before any promotion:
    // all three tables staged, canonical intact, marker present
    for (sub <- Seq("fp", "sig", "band"))
      copyDir(Paths.get(dir, sub), Paths.get(dir, s"${sub}_stage"))
    Files.write(Paths.get(dir, "compact.commit"), "compact".getBytes("UTF-8"))
    // a NEW session attaching the index must roll the swap forward
    Seq(idx.fp, idx.sig, idx.band).foreach(t => spark.sql(s"DROP TABLE $t"))
    val attached = DedupIndex.attachIndex(spark, pfx, dir)
    assert(!Files.exists(Paths.get(dir, "compact.commit")), "marker must clear")
    for (sub <- Seq("fp", "sig", "band")) {
      assert(!Files.exists(Paths.get(dir, s"${sub}_stage")), s"$sub stage residue")
      assert(!Files.exists(Paths.get(dir, s"${sub}_old")), s"$sub aside residue")
    }
    val gotA = DedupIndex.dedupeAgainstIndex(spark, batch, attached, corpus)
      .collect().toSeq
    assert(gotA == want, "post-recovery probe diverged (state A)")

    // STATE B — crash mid-promotion: fp fully promoted; sig caught between
    // the aside rename and the stage promotion (canonical MISSING — the
    // destructive window the rename-aside protocol makes recoverable);
    // band staged but untouched
    for (sub <- Seq("sig", "band"))
      copyDir(Paths.get(dir, sub), Paths.get(dir, s"${sub}_stage"))
    Files.move(Paths.get(dir, "sig"), Paths.get(dir, "sig_old"))
    Files.write(Paths.get(dir, "compact.commit"), "compact".getBytes("UTF-8"))
    // the next PROBE (not attach) must recover before planning
    val gotB = DedupIndex.dedupeAgainstIndex(spark, batch, attached, corpus)
      .collect().toSeq
    assert(gotB == want, "post-recovery probe diverged (state B)")
    assert(!Files.exists(Paths.get(dir, "compact.commit")))
    for (sub <- Seq("fp", "sig", "band")) {
      assert(Files.exists(Paths.get(dir, sub)), s"$sub canonical missing")
      assert(!Files.exists(Paths.get(dir, s"${sub}_stage")), s"$sub stage residue")
      assert(!Files.exists(Paths.get(dir, s"${sub}_old")), s"$sub aside residue")
    }

    // stage-only garbage WITHOUT a marker (crash before commit) is inert:
    // probes ignore it and serve the canonical generation
    copyDir(Paths.get(dir, "fp"), Paths.get(dir, "fp_stage"))
    val gotC = DedupIndex.dedupeAgainstIndex(spark, batch, attached, corpus)
      .collect().toSeq
    assert(gotC == want, "uncommitted stage garbage must be ignored")
    assert(Files.exists(Paths.get(dir, "fp_stage")), "roll-back is the next compaction's job")
  }

  test("index meta pins the bucket count; compaction derives it from the store") {
    val corpus = tables.documents.filter($"doc_id" >= 450)
    val dir = Files.createTempDirectory("gdidx_meta").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir, buckets = 4)
    assert(DedupIndex.loadIndexBuckets(spark, dir).contains(4))
    // compaction reads the stored count — no caller parameter to get wrong
    DedupIndex.compactIndex(spark, idx)
    assert(DedupIndex.loadIndexBuckets(spark, dir).contains(4),
      "compaction must preserve the stored bucket count")
    val files = Files.walk(java.nio.file.Paths.get(dir, "fp")).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(files <= 4, s"compacted at the stored bucket count: $files files")
  }

  test("appendToIndex grows the index so day-2 probes see day-1 survivors") {
    val corpus = tables.documents.filter($"doc_id" >= 400) // day 0 store
    val day1 = tables.documents.filter($"doc_id" >= 200 && $"doc_id" < 300)
    val day2 = tables.documents.filter($"doc_id" < 100)
    val dir = Files.createTempDirectory("gdidx_grow").toString
    val idx = DedupIndex.buildIndex(spark, corpus, freshPrefix(), dir)

    // day 1: dedup against the store, append the survivors
    val kept1 = DedupIndex.dedupeAgainstIndex(spark, day1, idx, corpus)
    val survivors1 = day1.join(kept1.select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    DedupIndex.appendToIndex(spark, survivors1, idx)
    val grownCorpus = corpus.unionByName(survivors1.select(corpus.columns.map(col): _*))

    // day 2 against the GROWN index ≡ the rescan path over the grown corpus
    val got = DedupIndex.dedupeAgainstIndex(spark, day2, idx, grownCorpus,
        minEstJaccard = 0.5).collect().toSeq
    val want = Dedup.dedupeIncrement(grownCorpus, day2).collect().toSeq
    assert(got == want && got.nonEmpty)

    // and the appended files respect the bucket layout: probes stay
    // one-Exchange after the append
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = day2.select(Dedup.fingerprint(col("text")).as("fp"))
        .join(spark.table(idx.fp), Seq("fp"), "left_anti")
      val plan = planOf(probe)
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"grown fp probe must still shuffle only the batch side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
