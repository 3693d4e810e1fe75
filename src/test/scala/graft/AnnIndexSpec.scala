package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def queries10 = tables.embeddings.filter($"vec_id" < 10)

  test("attached-index query is result-equal to ivfTopK on the same corpus") {
    val dir = Files.createTempDirectory("gannidx").toString
    AnnIndex.buildIndex(spark, tables.embeddings, dir)
    val idx = AnnIndex.attachIndex(spark, dir)
    val got = AnnIndex.queryIndex(spark, idx, queries10).collect().toSeq
    val want = Similarity.ivfTopK(tables).collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("frozen quantizer: build(A)+append(B) equals build(A∪B) fit on A") {
    val a = tables.embeddings.filter($"vec_id" % 2 === 0)
    val b = tables.embeddings.filter($"vec_id" % 2 === 1)
    val dirInc = Files.createTempDirectory("gannidx_inc").toString
    val idxInc = AnnIndex.buildIndex(spark, a, dirInc, fitOn = Some(a))
    AnnIndex.appendToIndex(spark, b, idxInc)
    val dirFull = Files.createTempDirectory("gannidx_full").toString
    val idxFull = AnnIndex.buildIndex(spark, tables.embeddings, dirFull,
      fitOn = Some(a))
    // identical stored state (vector→cell assignments)...
    def assignments(i: AnnIndex.Index) =
      spark.read.parquet(i.vectorsPath).select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(assignments(idxInc) == assignments(idxFull))
    // ...and identical query results
    val got = AnnIndex.queryIndex(spark, idxInc, queries10).collect().toSeq
    val want = AnnIndex.queryIndex(spark, idxFull, queries10).collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("query reads ONLY the probed cell directories (partition pruning)") {
    val dir = Files.createTempDirectory("gannidx_prune").toString
    AnnIndex.buildIndex(spark, tables.embeddings, dir)
    val idx = AnnIndex.attachIndex(spark, dir)
    val allCells = spark.read.parquet(idx.vectorsPath)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    val twoQueries = tables.embeddings.filter($"vec_id" < 2)
    val plan = planOf(AnnIndex.queryIndex(spark, idx, twoQueries))
    // the cell predicate must be classified as a PARTITION filter (applied
    // at directory listing), not a data filter
    val pf = "PartitionFilters: \\[cell[^\\]]*IN \\(([0-9,]+)\\)"
      .r.findFirstMatchIn(plan)
    assert(pf.isDefined, s"no cell IN partition filter in plan:\n$plan")
    val probedCells = pf.get.group(1).split(',').map(_.trim.toInt).toSet
    assert(probedCells.subsetOf(allCells) && probedCells.size < allCells.size,
      s"probed $probedCells should be a strict subset of $allCells")
    // behavioral proof: corrupt a NON-probed cell directory — a scan that
    // touched it would throw; the pruned query never reads it
    val victim = (allCells -- probedCells).head
    Files.write(
      java.nio.file.Paths.get(idx.vectorsPath, s"cell=$victim", "garbage.parquet"),
      "not a parquet file".getBytes)
    val got = AnnIndex.queryIndex(spark, idx, twoQueries).collect()
    assert(got.nonEmpty, "pruned query should succeed despite the corrupt cell")
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(idx.vectorsPath).filter($"cell" === victim).count()
    }
  }

  test("compactIndex: one file per cell after many appends; state and queries unchanged") {
    val parts = (0 until 4).map(i => tables.embeddings.filter($"vec_id" % 4 === i))
    val dir = Files.createTempDirectory("gannidx_compact").toString
    val idx = AnnIndex.buildIndex(spark, parts.head, dir,
      fitOn = Some(parts.head))
    parts.tail.foreach(p => AnnIndex.appendToIndex(spark, p, idx))
    def filesPerCell(): Map[String, Int] = {
      val root = java.nio.file.Paths.get(idx.vectorsPath)
      java.nio.file.Files.list(root).toArray.map(_.toString)
        .filter(_.contains("cell=")).map { d =>
          d -> java.nio.file.Files.list(java.nio.file.Paths.get(d))
            .toArray.map(_.toString).count(_.endsWith(".parquet"))
        }.toMap
    }
    def state() = spark.read.parquet(idx.vectorsPath)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(filesPerCell().values.exists(_ > 1),
      "fixture should have fragmented cells before compaction")
    val before = state()
    val wantQ = AnnIndex.queryIndex(spark, idx, queries10).collect().toSeq
    AnnIndex.compactIndex(spark, idx)
    assert(filesPerCell().values.forall(_ == 1), filesPerCell().toString)
    assert(state() == before)
    assert(AnnIndex.queryIndex(spark, idx, queries10).collect().toSeq == wantQ)
    // no residue: stage/aside/marker all gone
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${idx.vectorsPath}_stage")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${idx.vectorsPath}_old")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx.dir, "compact.commit")))
  }

  test("compaction crash states: uncommitted stage rolls back, committed stage rolls forward") {
    import org.apache.hadoop.fs.{FileUtil, Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = Files.createTempDirectory("gannidx_crash").toString
    val idx = AnnIndex.buildIndex(spark, tables.embeddings, dir)
    val before = spark.read.parquet(idx.vectorsPath)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val canonical = new HPath(idx.vectorsPath)
    val stage = new HPath(s"${idx.vectorsPath}_stage")
    val fs = canonical.getFileSystem(conf)
    // crash BEFORE the commit marker: stage present, marker absent
    FileUtil.copy(fs, canonical, fs, stage, false, conf)
    AnnIndex.attachIndex(spark, dir)
    assert(!fs.exists(stage), "uncommitted stage must roll back on attach")
    // crash AFTER the commit marker: stage + marker present
    FileUtil.copy(fs, canonical, fs, stage, false, conf)
    val mp = new HPath(idx.dir, "compact.commit")
    val out = fs.create(mp, true); out.write("compact".getBytes); out.close()
    AnnIndex.attachIndex(spark, dir)
    assert(!fs.exists(stage) && !fs.exists(mp) &&
      !fs.exists(new HPath(s"${idx.vectorsPath}_old")))
    val after = spark.read.parquet(idx.vectorsPath)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(after == before, "roll-forward must preserve the vector state")
  }

  test("attachIndex refuses a directory without a completed build") {
    val dir = Files.createTempDirectory("gannidx_missing").toString
    val e = intercept[IllegalArgumentException] {
      AnnIndex.attachIndex(spark, dir)
    }
    assert(e.getMessage.contains("no completed index"))
  }

  test("buildIndex on an empty corpus fails with a clear message") {
    val empty = tables.embeddings.filter($"vec_id" < 0)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.buildIndex(spark,
        empty, Files.createTempDirectory("gannidx_empty").toString)
    }
    assert(e.getMessage.contains("no vectors"))
  }
}
