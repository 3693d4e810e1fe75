package graft

import org.apache.spark.sql.functions._
import graft.operators.Ids

class IdsSpec extends SparkSpec {

  test("contiguousIds assigns exactly 0..n-1 across partitions") {
    val df = tables.documents.repartition(7)
    val ids = Ids.contiguousIds(df).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(0L until df.count()))
  }

  test("contiguousIds keeps every original column intact") {
    val out = Ids.contiguousIds(tables.region)
    assert(out.columns.toSeq == tables.region.columns.toSeq :+ "id")
    assert(out.select("r_regionkey").collect().map(_.getInt(0)).sorted.sameElements(0 until 5))
  }

  test("hashIds are unique and deterministic on a unique key") {
    val a = Ids.hashIds(tables.documents, col("doc_id")).select("doc_id", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Ids.hashIds(tables.documents, col("doc_id")).select("doc_id", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size == a.size) // no collisions at this scale
  }
}
