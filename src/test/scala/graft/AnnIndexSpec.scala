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
