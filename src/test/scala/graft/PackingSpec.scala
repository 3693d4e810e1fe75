package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, TextAnalysis}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val contextLen = 64

  private def packed = Packing.packDocuments(tables, contextLen = contextLen)

  test("every document is packed exactly once") {
    val n = tables.documents.count()
    val p = packed
    assert(p.count() == n)
    assert(p.select("doc_id").distinct().count() == n)
  }

  test("no bin exceeds the context length unless it holds a single oversized doc") {
    val bad = packed.groupBy("shard", "bin_idx")
      .agg(sum("n_tokens").as("used"), count(lit(1)).as("n_docs"))
      .filter(col("used") > contextLen && col("n_docs") > 1)
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("bin indices are contiguous from zero within every shard") {
    packed.groupBy("shard")
      .agg(min("bin_idx").as("lo"), max("bin_idx").as("hi"),
        countDistinct("bin_idx").as("n"))
      .collect().foreach { r =>
        assert(r.getLong(r.fieldIndex("lo")) == 0L)
        assert(r.getLong(r.fieldIndex("n")) == r.getLong(r.fieldIndex("hi")) + 1,
          s"holes in bin numbering: $r")
      }
  }

  test("packing wastes bounded padding (next-fit quality, not just validity)") {
    // next-fit guarantee: any two CONSECUTIVE bins hold > contextLen
    // together (else the second bin's first doc would have fit in the
    // first), so total bins < 2·(total tokens/contextLen) + shards
    val p = packed
    val bins = p.select("shard", "bin_idx").distinct().count()
    val total = p.agg(sum("n_tokens")).head().getLong(0)
    val shards = p.select("shard").distinct().count()
    assert(bins <= 2 * (total / contextLen) + shards + 1,
      s"bins=$bins total=$total — worse than the next-fit bound")
  }

  test("packing is deterministic under input partitioning and row order") {
    val base = packed.collect().map(_.toSeq).toSeq
    val shuffled = tables.withTable("documents",
      tables.documents.orderBy(rand(42)).repartition(7))
    val again = Packing.packDocuments(shuffled, contextLen = contextLen)
      .collect().map(_.toSeq).toSeq
    assert(again == base)
  }

  test("packing per-doc token counts match textStats") {
    val fromPack = packed.select("doc_id", "n_tokens")
    val fromStats = TextAnalysis.textStats(tables)
      .select(col("doc_id"), col("n_tokens"))
    assert(fromPack.exceptAll(fromStats).isEmpty &&
      fromStats.exceptAll(fromPack).isEmpty)
  }
}
