package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("declarative metadata and the batched decode stub agree") {
    val meta = Multimodal.metadata(tables).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val decoded = Multimodal.decodeFeatures(spark, tables).collect()
    assert(decoded.length == meta.size)
    decoded.foreach { f =>
      val (bl, w, h, fmt) = meta(f.doc_id)
      assert(f.byte_len == bl && f.width == w && f.height == h && f.format == fmt,
        s"decode/metadata mismatch for doc ${f.doc_id}")
    }
  }

  test("decode stub is deterministic (checksum stable across runs)") {
    val a = Multimodal.decodeFeatures(spark, tables).collect().map(f => f.doc_id -> f.checksum).toMap
    val b = Multimodal.decodeFeatures(spark, tables).collect().map(f => f.doc_id -> f.checksum).toMap
    assert(a == b)
  }

  test("payloads are real binary columns") {
    val df = Multimodal.withPayload(tables)
    assert(df.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val first = df.orderBy("doc_id").head()
    val text = tables.documents.orderBy("doc_id").head().getAs[String]("text")
    assert(new String(first.getAs[Array[Byte]]("payload"), "UTF-8") == text)
  }
}
