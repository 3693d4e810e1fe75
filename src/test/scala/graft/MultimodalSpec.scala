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

  test("decodeImage parses real PNG/JPEG/BMP/GIF bytes; corrupt bytes quarantine") {
    def encode(fmt: String, w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    // PNG is lossless: dimensions AND pixels round-trip exactly
    val png = Multimodal.decodeImage(1L, encode("png", 17, 9, 100)).get
    assert(png.format == "png" && png.width == 17 && png.height == 9
      && png.mean_gray == 100.0)
    // JPEG is lossy: dimensions exact, constant-gray mean within codec error
    val jpg = Multimodal.decodeImage(2L, encode("jpg", 32, 8, 100)).get
    assert(jpg.format.startsWith("jp") && jpg.width == 32 && jpg.height == 8
      && math.abs(jpg.mean_gray - 100.0) < 3.0)
    val bmp = Multimodal.decodeImage(3L, encode("bmp", 5, 5, 0)).get
    assert(bmp.format == "bmp" && bmp.width == 5 && bmp.mean_gray == 0.0)
    val gif = Multimodal.decodeImage(4L, encode("gif", 3, 7, 255)).get
    assert(gif.format == "gif" && gif.height == 7 && gif.mean_gray == 255.0)
    // bytes no codec recognizes → None (quarantine), never a crash
    assert(Multimodal.decodeImage(5L, "not an image at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(6L, Array.emptyByteArray).isEmpty)
  }

  test("imageDecodeStats: real decode over synthetic PNGs matches the generation formula") {
    val rows = Multimodal.imageDecodeStats(tables).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val dims = tables.documents.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == dims.size, "every synthetic image must decode")
    rows.foreach { case (id, fmt, w, h, mean) =>
      assert(fmt == "png")
      assert(w == dims(id) % 16 + 1 && h == id % 12 + 1, s"doc $id dims")
      val px = for (x <- 0L until w; y <- 0L until h) yield (31 * id + 7 * x + 13 * y) % 256
      val expect = px.sum.toDouble / px.length
      assert(mean == math.round(expect * 1e6) / 1e6
        || math.abs(mean - expect) < 1e-9, s"doc $id mean $mean vs $expect")
    }
  }

  test("decodeImage reads grayscale rasters exactly (no sRGB conversion)") {
    // r8 ADVICE: getRGB routes TYPE_BYTE_GRAY through a linear-gray→sRGB
    // conversion; the raster path must recover the raw sample value
    val gray = 100
    val img = new java.awt.image.BufferedImage(
      6, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 4; x <- 0 until 6) raster.setSample(x, y, 0, gray)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val f = Multimodal.decodeImage(1L, bos.toByteArray).get
    assert(f.width == 6 && f.height == 4)
    assert(f.mean_gray == gray.toDouble, s"grayscale sample distorted: ${f.mean_gray}")
  }

  test("decodeAudio parses real WAV bytes exactly; non-audio quarantines") {
    def wav(rate: Int, samples: Array[Int]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val samples = Array(0, 1000, -1000, 32767, -32768, 17)
    val f = Multimodal.decodeAudio(1L, wav(16000, samples)).get
    assert(f.sample_rate == 16000 && f.channels == 1 && f.n_frames == samples.length)
    val expectRms = math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / samples.length)
    assert(f.rms == expectRms, s"rms ${f.rms} vs $expectRms")
    assert(f.duration_ms == samples.length * 1000.0 / 16000.0)
    // bytes no parser recognizes → None (quarantine), never a crash
    assert(Multimodal.decodeAudio(2L, "not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(3L, Array.emptyByteArray).isEmpty)
    // a real image is a parseable container but not audio → quarantine
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.decodeAudio(4L, bos.toByteArray).isEmpty)
  }

  test("audioDecodeStats: real decode over synthetic WAVs matches the generation formula") {
    val rows = Multimodal.audioDecodeStats(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val chars = tables.documents.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == chars.size, "every synthetic WAV must decode")
    rows.foreach { case (id, rate, ch, frames, durMs, rms) =>
      val n = (chars(id) % 400) + 100
      assert(rate == 8000 * (1 + id % 3) && ch == 1 && frames == n, s"doc $id header")
      assert(durMs == math.round(n * 1000.0 / rate * 1e6) / 1e6, s"doc $id duration")
      val sumsq = (0L until n).map { i =>
        val s = ((31 * id + 17 * i) % 2048) - 1024; s * s
      }.sum
      val expect = math.sqrt(sumsq.toDouble / n)
      assert(rms == math.round(expect * 1e6) / 1e6, s"doc $id rms $rms vs $expect")
    }
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
