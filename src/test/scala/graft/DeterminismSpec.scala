package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Analytics, Dedup, Graph, TextAnalysis}

/** Partition-independence: results must be bit-identical when the input
  * arrives in a different partitioning/order — the reproducibility
  * property that makes a re-run after a lost executor produce the same
  * corpus. Each operator runs against the plain catalog and against one
  * whose fact table is repartitioned (different partition count AND row
  * order), and the collected results are compared exactly.
  */
class DeterminismSpec extends SparkSpec {

  private def shuffled(name: String): graft.sources.Tables = {
    val base = tables
    base.withTable(name, base.resolved(name).repartition(7))
  }

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("funnelSteps is partition-independent") {
    assert(rowsOf(Analytics.funnelSteps(tables)) ==
      rowsOf(Analytics.funnelSteps(shuffled("events"))))
  }

  test("retentionCohorts is partition-independent") {
    assert(rowsOf(Analytics.retentionCohorts(tables)) ==
      rowsOf(Analytics.retentionCohorts(shuffled("events"))))
  }

  test("eventTransitions is partition-independent") {
    assert(rowsOf(Analytics.eventTransitions(tables)) ==
      rowsOf(Analytics.eventTransitions(shuffled("events"))))
  }

  test("pageRank is partition-independent at the emitted precision") {
    assert(rowsOf(Graph.pageRank(tables)) ==
      rowsOf(Graph.pageRank(shuffled("lineitem"))))
  }

  test("sourceSignatureSimilarity is partition-independent") {
    assert(rowsOf(Dedup.sourceSignatureSimilarity(tables)) ==
      rowsOf(Dedup.sourceSignatureSimilarity(shuffled("documents"))))
  }

  test("zipfSlope and tokenEntropy are partition-independent") {
    assert(rowsOf(TextAnalysis.zipfSlope(tables)) ==
      rowsOf(TextAnalysis.zipfSlope(shuffled("documents"))))
    assert(rowsOf(TextAnalysis.tokenEntropy(tables)) ==
      rowsOf(TextAnalysis.tokenEntropy(shuffled("documents"))))
  }
}
