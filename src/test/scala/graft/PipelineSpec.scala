package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline, TextAnalysis}

class PipelineSpec extends SparkSpec {

  test("finalCorpus = exact-dedup winners ∩ gopher pass ∩ length band") {
    val got = Pipeline.finalCorpus(tables).collect().map(_.getLong(0)).toSet
    val winners = Dedup.exactRows(tables).collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.gopherFilter(tables)
      .filter(col("pass") === 1).collect().map(_.getLong(0)).toSet
    // driver-side interpolated p5–p95 band per language
    def q(v: Array[Long], p: Double): Double = {
      val s = v.sorted
      val rank = p * (s.length - 1)
      val lo = rank.toInt
      val g = rank - lo
      if (lo + 1 < s.length) s(lo) * (1 - g) + s(lo + 1) * g else s(lo).toDouble
    }
    val docs = tables.documents.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bands = docs.groupBy(_._2).map { case (lang, ds) =>
      val cs = ds.map(_._3)
      lang -> (q(cs, 0.05), q(cs, 0.95))
    }
    val inBand = docs.filter { case (_, lang, n) =>
      val (lo, hi) = bands(lang); n >= lo && n <= hi
    }.map(_._1).toSet
    assert(got == (winners & quality & inBand), "composition mismatch")
    assert(got.nonEmpty)
  }
}
