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

  test("resize changes dimensions and preserves content checksums") {
    val resized = Multimodal.resizeFeatures(spark, tables, 224, 224).collect()
    val original = Multimodal.decodeFeatures(spark, tables).collect()
      .map(f => f.doc_id -> f.checksum).toMap
    assert(resized.nonEmpty)
    resized.foreach { f =>
      assert(f.width == 224 && f.height == 224)
      assert(f.checksum == original(f.doc_id))
    }
  }

  test("frameSample fans each payload into n deterministic in-bounds frames") {
    val n = 4
    val frames = Multimodal.frameSample(spark, tables, n).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.size == tables.documents.count())
    val lens = Multimodal.withPayload(tables).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").length).toMap
    byDoc.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until n))
      fs.foreach(f => assert(f.offset >= 0 && f.offset < math.max(lens(id), 1)))
    }
    // determinism
    val again = Multimodal.frameSample(spark, tables, n).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f.frame_checksum).toMap
    frames.foreach(f => assert(again((f.doc_id, f.frame_idx)) == f.frame_checksum))
  }

  test("payloads are real binary columns") {
    val df = Multimodal.withPayload(tables)
    assert(df.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val first = df.orderBy("doc_id").head()
    val text = tables.documents.orderBy("doc_id").head().getAs[String]("text")
    assert(new String(first.getAs[Array[Byte]]("payload"), "UTF-8") == text)
  }

  test("mediaFormat sniffs real magic bytes; byteEntropy hits its bounds") {
    import graft.functions.HashImpl
    def sniff(bytes: Int*) = HashImpl.mediaFormat(bytes.map(_.toByte).toArray).toString
    assert(sniff(0xFF, 0xD8, 0xFF, 0xE0) == "jpeg")
    assert(sniff(0x89, 0x50, 0x4E, 0x47, 0x0D) == "png")
    assert(sniff(0x47, 0x49, 0x46, 0x38) == "gif")
    assert(sniff(0x52, 0x49, 0x46, 0x46, 1, 2, 3, 4, 0x57, 0x41, 0x56, 0x45) == "wav")
    assert(sniff(0x25, 0x50, 0x44, 0x46) == "pdf")
    assert(sniff(0x00, 0x01, 0x02) == "unknown")
    assert(sniff(0x52, 0x49, 0x46, 0x46, 1, 2, 3, 4, 0x41, 0x56, 0x49, 0x20) == "unknown") // RIFF but not WAVE
    // entropy bounds: constant payload → 0 bits; all 256 bytes once → 8 bits
    assert(HashImpl.byteEntropy(Array.fill(100)(7.toByte)) == 0.0)
    assert(math.abs(HashImpl.byteEntropy((0 until 256).map(_.toByte).toArray) - 8.0) < 1e-12)
    assert(HashImpl.byteEntropy(Array.emptyByteArray) == 0.0)
  }

  test("byteStats matches a driver-side byte recompute on real docs") {
    val rows = Multimodal.byteStats(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val texts = tables.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (d, len, sniffed, h) =>
      val bytes = texts(d).getBytes("UTF-8")
      assert(len == bytes.length, s"doc $d")
      assert(sniffed == "unknown")
      val expect = graft.functions.HashImpl.byteEntropy(bytes)
      assert(math.abs(h - math.round(expect * 1e6) / 1e6) < 1e-9, s"doc $d")
      assert(h > 0.0 && h < 8.0)
    }
  }
}
