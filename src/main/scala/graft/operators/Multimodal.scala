package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column handling: media as opaque `binary` payloads plus typed
  * metadata, with decode / feature-extraction as partition-batched operators.
  *
  * IMAGE decode is REAL: the JDK's `javax.imageio` ships headless readers
  * for JPEG/PNG/GIF/BMP/TIFF/WBMP, so [[decodeImagePayloads]] parses actual
  * image bytes — container format from the matched reader, dimensions and
  * pixel statistics from the decoded raster. Only AUDIO/VIDEO lack codecs
  * in this container, so [[decodeStub]]/[[frameSampleStub]] remain clearly
  * marked deterministic stand-ins for those; the Spark-side plumbing — the
  * binary schema, the partition-batched execution shape (the Scala analogue
  * of a `mapInPandas` batch UDF), the typed output encoders — is shared and
  * real for all modalities.
  */
object Multimodal {

  /** A media row: opaque payload + its id. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Typed decode output (what a real image decode would yield). */
  final case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
                                 height: Int, format: String, checksum: Long)

  /** Attach a binary payload column (here: the UTF-8 bytes of `text` stand in
    * for a media blob; at 100 TB this is the parquet `binary` column as-is). */
  def withPayload(t: Tables): DataFrame =
    t.documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Declarative metadata extraction over the binary payload — byte length
    * and deterministic pseudo-dimensions (integer arithmetic only, so the SQL
    * oracle reproduces it exactly). Narrow projection, no shuffle. */
  def metadata(t: Tables): DataFrame = {
    val byteLen = length(encode(col("text"), "UTF-8")).cast("bigint")
    t.documents
      .select(
        col("doc_id"),
        byteLen.as("byte_len"),
        ((byteLen % 64) * 16 + 16).as("width"),
        ((byteLen % 48) * 16 + 16).as("height"),
        when(byteLen % 3 === 0, "png")
          .when(byteLen % 3 === 1, "jpg")
          .otherwise("webp").as("format"))
      .orderBy("doc_id")
  }

  /** REAL byte-level payload features — no codec required, so nothing here
    * is stubbed: byte length, magic-byte container sniff (jpeg/png/gif/
    * wav/pdf — the check a media pipeline runs before trusting an
    * extension), and byte-entropy in bits/byte (truncated or zero-padded
    * blobs score near 0, encrypted/well-compressed media near 8 — the
    * cheap corrupt-file signal). Both kernels are codegen'd expressions;
    * the whole query is one narrow projection. On this corpus the payloads
    * are UTF-8 text bytes, so the sniff reports "unknown" (spec feeds real
    * JPEG/PNG/WAV headers to pin the magic logic) and the oracle mirrors
    * the entropy arithmetic over characters — byte-identical for ASCII. */
  def byteStats(t: Tables): DataFrame =
    withPayload(t)
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        graft.functions.HashFunctions.mediaFormat(col("payload")).as("sniffed"),
        round(graft.functions.HashFunctions.byteEntropy(col("payload")), 6)
          .as("byte_entropy"))
      .orderBy("doc_id")

  /** STUB decode kernel — stands in for an AUDIO/VIDEO codec (genuinely
    * absent from this container; IMAGES decode for real via
    * [[decodeImagePayloads]]). Deterministic: derives "dimensions" and a
    * checksum from the payload bytes, so specs can assert exact values. A
    * real deployment swaps only this function; the surrounding batch
    * plumbing is unchanged. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < r.payload.length) {
      h ^= (r.payload(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    val n = r.payload.length
    MediaFeatures(r.doc_id, n, (n % 64) * 16 + 16, (n % 48) * 16 + 16,
      Seq("png", "jpg", "webp")(n % 3), h)
  }

  /** A sampled "frame" of a media payload (video frame-sampling stand-in). */
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Int, frame_checksum: Long)

  /** STUB resize — a real implementation would re-encode pixels; the stub
    * rescales the metadata and keeps the checksum, which is exactly the
    * contract the spec pins down (shape transform, content-preserving). */
  def resizeStub(f: MediaFeatures, w: Int, h: Int): MediaFeatures =
    f.copy(width = w, height = h)

  /** STUB frame sampler — derives `n` deterministic frame offsets from the
    * payload (a real video codec would seek keyframes) and a per-frame
    * checksum over the bytes at each offset. */
  def frameSampleStub(r: MediaRecord, n: Int): Seq[Frame] = {
    val len = math.max(r.payload.length, 1)
    (0 until n).map { i =>
      val offset = (len.toLong * i / n).toInt
      var h = 0xcbf29ce484222325L ^ i
      var j = offset
      val end = math.min(offset + 16, r.payload.length)
      while (j < end) { h ^= (r.payload(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      Frame(r.doc_id, i, offset, h)
    }
  }

  /** Partition-batched resize over decoded features (narrow op). */
  def resizeFeatures(spark: SparkSession, t: Tables, w: Int, h: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    decodeFeatures(spark, t).mapPartitions(_.map(resizeStub(_, w, h)))
  }

  /** Partition-batched frame sampling: one payload fans out to `n` frame
    * rows (flatMap — still narrow, no shuffle). */
  def frameSample(spark: SparkSession, t: Tables, n: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    withPayload(t).as[MediaRecord].mapPartitions(_.flatMap(frameSampleStub(_, n)))
  }

  /** Partition-batched decode: the Scala analogue of `mapInPandas` — one
    * iterator per partition, so a real codec could amortize per-batch setup
    * (model load, native handles) across the partition. Narrow op; output is
    * a typed Dataset with a proper Encoder (no Kryo blobs). */
  def decodeFeatures(spark: SparkSession, t: Tables): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(t).as[MediaRecord].mapPartitions { it =>
      // per-partition setup for a real codec would go here (amortized)
      it.map(decodeStub)
    }
  }

  /** REAL decoded-image features: container format (from the ImageIO reader
    * that matched the byte stream — a real parse, not an extension guess),
    * raster dimensions, and the mean gray level of the decoded pixels
    * (ITU-R BT.601-ish integer luma for color rasters; the exact channel
    * value for grayscale). `mean_gray` is computed as an exact integer sum
    * over the raster divided once at the end, so an oracle that knows the
    * pixel-generation formula reproduces it bit-for-bit (PNG is lossless). */
  final case class ImageFeatures(doc_id: Long, format: String, width: Int,
                                 height: Int, mean_gray: Double)

  /** Decode ONE image payload via javax.imageio. Returns None when no
    * installed reader recognizes the bytes (truncated/corrupt/unsupported —
    * the row is reported, not crashed on, mirroring a production decode
    * pipeline's quarantine path). */
  private[graft] def decodeImage(doc_id: Long, payload: Array[Byte]): Option[ImageFeatures] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val img = reader.read(0)
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          val row = new Array[Int](w)
          val cm = img.getColorModel
          val trueGray = img.getRaster.getNumBands == 1 &&
            !cm.isInstanceOf[java.awt.image.IndexColorModel] &&
            cm.getColorSpace.getType == java.awt.color.ColorSpace.TYPE_GRAY
          if (trueGray) {
            // genuine grayscale raster: read samples directly — getRGB
            // routes a TYPE_BYTE_GRAY raster through a linear-gray→sRGB
            // colorspace conversion and distorts the channel value, so the
            // "exact channel value for grayscale" contract needs the raster
            // path (r8 ADVICE). Indexed 1-band rasters (GIF/indexed PNG)
            // carry palette INDICES, not gray — they take the RGB path.
            // Bulk row reads, not per-pixel calls.
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              raster.getSamples(0, y, w, 1, 0, row)
              var x = 0
              while (x < w) { sum += row(x); x += 1 }
              y += 1
            }
          } else {
            // bulk row-at-a-time getRGB: one image-op call per ROW instead of
            // per pixel (the per-pixel getRGB was ~an order of magnitude
            // slower through BufferedImage on real photos — r8 verdict)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val rgb = row(x)
                val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                // integer luma; for gray pixels (r==g==b) this is exactly r
                sum += (if (r == g && g == b) r else (299 * r + 587 * g + 114 * b) / 1000)
                x += 1
              }
              y += 1
            }
          }
          Some(ImageFeatures(doc_id,
            reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
            w, h, sum.toDouble / (w.toLong * h)))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Partition-batched REAL image decode over a binary payload column —
    * the production shape: one ImageInputStream per row, reader lookup by
    * magic bytes, narrow op (no shuffle), typed output. Rows no installed
    * codec can parse are dropped (quarantine semantics). */
  def decodeImagePayloads(spark: SparkSession,
                          images: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import spark.implicits._
    images.mapPartitions(_.flatMap(r => decodeImage(r.doc_id, r.payload)))
  }

  /** Deterministic synthetic image corpus derived from `documents`: one
    * REAL PNG per document, dimensions from simple integer arithmetic on
    * (doc_id, n_chars) and a gray pattern g(x,y) = (31·doc_id + 7x + 13y)
    * mod 256. Encoded with the JDK PNG writer on the executors — a narrow
    * mapPartitions, so the corpus-scale story is the same as reading a
    * parquet binary column. The formula (not the bytes) is the oracle
    * contract: PNG is lossless, so decoding must recover it exactly. */
  def syntheticImages(spark: SparkSession, t: Tables): Dataset[MediaRecord] = {
    import spark.implicits._
    t.documents.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val w = (nChars % 16 + 1).toInt
        val h = (id % 12 + 1).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((31 * id + 7 * x + 13 * y) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(id, bos.toByteArray)
      })
  }

  /** The oracle-checkable image-decode query: synthesize a real PNG per
    * document, decode it with the real codec, emit per-image features. The
    * oracle re-derives width/height/mean from the generation formula — so a
    * hash match proves the encode→decode round trip recovered every pixel. */
  def imageDecodeStats(t: Tables): DataFrame = {
    val spark = t.spark
    decodeImagePayloads(spark, syntheticImages(spark, t))
      .toDF()
      .select(col("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        round(col("mean_gray"), 6).as("mean_gray"))
      .orderBy("doc_id")
  }

  /** REAL decoded-audio features: sample rate / channel count / frame count
    * from the parsed WAV header, and the RMS amplitude of the decoded
    * 16-bit PCM samples. Decode is `javax.sound.sampled` — pure-Java,
    * headless WAV/PCM parsing that ships with the JDK, so AUDIO is no
    * longer a stub (the stub is confined to video, which genuinely has no
    * JDK codec). */
  final case class AudioFeatures(doc_id: Long, sample_rate: Long,
                                 channels: Long, n_frames: Long,
                                 duration_ms: Double, rms: Double)

  /** Decode ONE audio payload via javax.sound.sampled. Returns None when
    * the bytes are not a parseable audio container, or decode to anything
    * other than 16-bit signed little-endian PCM (quarantine semantics,
    * mirroring [[decodeImage]]). RMS is computed from an exact integer
    * sum of squares divided once at the end, so an oracle that knows the
    * sample-generation formula reproduces it bit-for-bit (WAV PCM is
    * lossless and IEEE sqrt is correctly rounded). */
  private[graft] def decodeAudio(doc_id: Long, payload: Array[Byte]): Option[AudioFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            || f.getSampleSizeInBits != 16 || f.isBigEndian) None
        else {
          val bytes = in.readAllBytes()
          val nSamples = bytes.length / 2
          var sumsq = 0L
          var i = 0
          while (i < nSamples) {
            val s = (bytes(2 * i) & 0xff) | (bytes(2 * i + 1).toInt << 8)
            sumsq += s.toLong * s
            i += 1
          }
          val frames = in.getFrameLength
          val rate = f.getSampleRate.toDouble
          Some(AudioFeatures(doc_id, f.getSampleRate.toLong, f.getChannels.toLong,
            frames, frames * 1000.0 / rate,
            math.sqrt(sumsq.toDouble / math.max(nSamples, 1))))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-batched REAL audio decode over a binary payload column —
    * same production shape as [[decodeImagePayloads]]: narrow, typed,
    * quarantining. */
  def decodeAudioPayloads(spark: SparkSession,
                          audio: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.mapPartitions(_.flatMap(r => decodeAudio(r.doc_id, r.payload)))
  }

  /** Deterministic synthetic audio corpus derived from `documents`: one
    * REAL mono 16-bit PCM WAV per document, encoded with the JDK WAV
    * writer on the executors (narrow mapPartitions). The oracle contract
    * is the generation formula, not the bytes:
    * rate = 8000·(1 + doc_id mod 3), n = (n_chars mod 400) + 100 frames,
    * s(i) = ((31·doc_id + 17·i) mod 2048) − 1024. */
  def syntheticAudio(spark: SparkSession, t: Tables): Dataset[MediaRecord] = {
    import spark.implicits._
    t.documents.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val rate = (8000 * (1 + id % 3)).toInt
        val n = ((nChars % 400) + 100).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = (((31 * id + 17 * i) % 2048) - 1024).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRecord(id, bos.toByteArray)
      })
  }

  /** The oracle-checkable audio-decode query: synthesize a real WAV per
    * document, decode it with the real JDK parser, emit per-clip features.
    * The oracle re-derives rate/frames/RMS from the generation formula — a
    * hash match proves the encode→decode round trip recovered every
    * sample. */
  def audioDecodeStats(t: Tables): DataFrame = {
    val spark = t.spark
    decodeAudioPayloads(spark, syntheticAudio(spark, t))
      .toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("n_frames"),
        round(col("duration_ms"), 6).as("duration_ms"),
        round(col("rms"), 6).as("rms"))
      .orderBy("doc_id")
  }
}
