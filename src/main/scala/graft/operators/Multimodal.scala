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

  /** STUB decode kernel — the pluggable-codec PLUMBING surface only: every
    * real modality now decodes for real ([[decodeImagePayloads]] via
    * javax.imageio, [[decodeAudioPayloads]] via javax.sound.sampled,
    * [[decodeVideoPayloads]] via the RIFF/AVI parser). This stand-in
    * remains for codecs the JDK genuinely lacks (H.264, vorbis, …):
    * deterministic "dimensions" and a checksum from the payload bytes, so
    * specs can pin the batch plumbing a real native codec would slot
    * into. */
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
    Dedup.kernelSpread(t.documents).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
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
      // decode once (r19): the global sort's range-sampling pass would
      // otherwise re-run the whole encode+decode pipeline a second time
      .localCheckpoint()
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
    Dedup.kernelSpread(t.documents).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
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
      // decode once (r19): the global sort's range-sampling pass would
      // otherwise re-run the whole encode+decode pipeline a second time
      .localCheckpoint()
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // REAL video: AVI (RIFF) container parsing + frame decode. The JDK has
  // no compressed-video codec (H.264 etc. stay out of reach), but the AVI
  // container itself and its two classic frame encodings ARE decodable
  // with what ships here: uncompressed 24-bit DIB frames ('00db', parsed
  // directly — lossless, so oracle-formula-exact) and MJPEG frames
  // ('00dc', each frame a real JPEG decoded via javax.imageio). With
  // this, NO modality in the module is a stub: bytes→features is a real
  // parse for images, audio, and video alike.
  // ---------------------------------------------------------------------

  /** REAL decoded-video features: frame count / dimensions / fps from the
    * parsed AVI headers (cross-checked against the actual movi chunks —
    * a disagreement is quarantined, not trusted), and the mean gray level
    * across every pixel of every decoded frame (same integer-luma
    * convention as [[decodeImage]]). */
  final case class VideoFeatures(doc_id: Long, n_frames: Long, width: Long,
                                 height: Long, fps: Double, mean_gray: Double)

  private def leU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b, o, 4, "US-ASCII") else ""

  /** Decode ONE AVI payload. Returns None on anything that is not a
    * structurally sound AVI with 24-bit BI_RGB DIB or MJPG video frames
    * (quarantine semantics, mirroring [[decodeImage]]/[[decodeAudio]]):
    * bad magic, truncated chunks, header/stream disagreement, frame-size
    * mismatch, undecodable JPEG bytes. */
  private[graft] def decodeVideo(doc_id: Long, payload: Array[Byte]): Option[VideoFeatures] =
    try {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
        fourcc(payload, 8) != "AVI ") return None
      val riffEnd = math.min(payload.length.toLong, 8L + leU32(payload, 4)).toInt
      var usPerFrame = 0L; var totalFrames = -1L
      var w = -1L; var h = -1L
      var bitCount = -1L; var compression = ""
      var frameSum = 0L; var framesSeen = 0L; var pixPerFrame = 0L
      var structureOk = true

      def walk(from: Int, to: Int, inMovi: Boolean, inHdrl: Boolean): Unit = {
        var o = from
        while (structureOk && o + 8 <= to) {
          val id = fourcc(payload, o)
          val size = leU32(payload, o + 4)
          val data = o + 8
          if (data + size > to) { structureOk = false; return }
          id match {
            case "LIST" =>
              val listType = fourcc(payload, data)
              walk(data + 4, (data + size).toInt,
                inMovi || listType == "movi", inHdrl || listType == "hdrl")
            case "avih" if inHdrl && size >= 40 =>
              usPerFrame = leU32(payload, data)
              totalFrames = leU32(payload, data + 16)
              w = leU32(payload, data + 32)
              h = leU32(payload, data + 36)
            case "strf" if inHdrl && size >= 40 =>
              bitCount = leU32(payload, data + 14) & 0xffff
              // biCompression: 0 = BI_RGB (raw DIB); 'MJPG' fourcc otherwise
              val comp = leU32(payload, data + 16)
              compression = if (comp == 0L) "DIB" else fourcc(payload, data + 16)
            case "00db" if inMovi =>
              // uncompressed bottom-up BGR rows, 4-byte-aligned stride
              val stride = ((w * 3 + 3) / 4) * 4
              if (w <= 0 || h <= 0 || size != stride * h) { structureOk = false; return }
              var y = 0L
              while (y < h) {
                val row = data + (y * stride).toInt
                var x = 0
                while (x < w) {
                  val b = payload(row + 3 * x) & 0xff
                  val g = payload(row + 3 * x + 1) & 0xff
                  val r = payload(row + 3 * x + 2) & 0xff
                  frameSum += (if (r == g && g == b) r else (299 * r + 587 * g + 114 * b) / 1000)
                  x += 1
                }
                y += 1
              }
              framesSeen += 1; pixPerFrame = w * h
            case "00dc" if inMovi =>
              // MJPEG: every frame is a standalone real JPEG
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
                java.util.Arrays.copyOfRange(payload, data, (data + size).toInt)))
              if (img == null || img.getWidth != w || img.getHeight != h) {
                structureOk = false; return
              }
              val row = new Array[Int](img.getWidth)
              var y = 0
              while (y < img.getHeight) {
                img.getRGB(0, y, img.getWidth, 1, row, 0, img.getWidth)
                var x = 0
                while (x < img.getWidth) {
                  val rgb = row(x)
                  val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                  frameSum += (if (r == g && g == b) r else (299 * r + 587 * g + 114 * b) / 1000)
                  x += 1
                }
                y += 1
              }
              framesSeen += 1; pixPerFrame = w * h
            case _ => () // unknown chunks are legal in RIFF; skip
          }
          o = (data + size + (size & 1L)).toInt // RIFF chunks pad to even
        }
      }

      walk(12, riffEnd, inMovi = false, inHdrl = false)
      val dibOk = compression == "DIB" && bitCount == 24
      val mjpgOk = compression == "MJPG"
      if (!structureOk || !(dibOk || mjpgOk) || usPerFrame <= 0 ||
        framesSeen == 0 || framesSeen != totalFrames || pixPerFrame <= 0) None
      else Some(VideoFeatures(doc_id, framesSeen, w, h,
        1000000.0 / usPerFrame, frameSum.toDouble / (framesSeen * pixPerFrame)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-batched REAL video decode over a binary payload column —
    * same production shape as the image/audio paths: narrow, typed,
    * quarantining. */
  def decodeVideoPayloads(spark: SparkSession,
                          videos: Dataset[MediaRecord]): Dataset[VideoFeatures] = {
    import spark.implicits._
    videos.mapPartitions(_.flatMap(r => decodeVideo(r.doc_id, r.payload)))
  }

  /** Build ONE real uncompressed-DIB AVI from a per-(frame, x, y) gray
    * function — a complete RIFF file (hdrl: avih + strl/strh/strf; movi:
    * '00db' frames with 4-byte-aligned bottom-up BGR rows). */
  private[graft] def encodeAviDib(w: Int, h: Int, nFrames: Int, fps: Int)
                                 (gray: (Int, Int, Int) => Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride.toLong * h
    val moviSize = 4L + nFrames * (8L + frameBytes)
    val hdrlSize = 4L + (8 + 56) + (8 + (4L + (8 + 56) + (8 + 40)))
    cc("RIFF"); u32(4L + (8 + hdrlSize) + (8 + moviSize)); cc("AVI ")
    cc("LIST"); u32(hdrlSize); cc("hdrl")
    cc("avih"); u32(56)
    u32(1000000L / fps); u32(0); u32(0); u32(0) // usPerFrame, maxBps, pad, flags
    u32(nFrames); u32(0); u32(1); u32(frameBytes) // totalFrames, init, streams, bufSize
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0) // dims + reserved[4]
    cc("LIST"); u32(4L + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); u32(56)
    cc("vids"); cc("DIB "); u32(0); u16(0); u16(0) // type, handler, flags, prio, lang
    u32(0); u32(1); u32(fps); u32(0); u32(nFrames) // init, scale, rate, start, length
    u32(frameBytes); u32(0); u32(0) // bufSize, quality, sampleSize
    u16(0); u16(0); u16(w); u16(h) // rcFrame
    cc("strf"); u32(40)
    u32(40); u32(w); u32(h); u16(1); u16(24) // biSize, w, h, planes, bitCount
    u32(0); u32(frameBytes); u32(0); u32(0); u32(0); u32(0) // BI_RGB, size, res
    cc("LIST"); u32(moviSize); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); u32(frameBytes)
      var y = h - 1 // DIB rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val g = gray(f, x, y)
          bos.write(g); bos.write(g); bos.write(g)
          x += 1
        }
        var pad = stride - 3 * w
        while (pad > 0) { bos.write(0); pad -= 1 }
        y -= 1
      }
      f += 1
    }
    bos.toByteArray
  }

  /** Deterministic synthetic video corpus derived from `documents`: one
    * REAL uncompressed-DIB AVI per document, encoded on the executors
    * (narrow mapPartitions). The oracle contract is the generation
    * formula, not the bytes — DIB frames are lossless:
    * w = n_chars mod 8 + 2, h = doc_id mod 6 + 2, frames = doc_id mod 4
    * + 2, fps ∈ {8,10,16,20,25} by doc_id mod 5 (all divide 10⁶, so
    * µs/frame is exact), g(f,x,y) = (31·doc_id + 7x + 13y + 19f) mod 256. */
  def syntheticVideos(spark: SparkSession, t: Tables): Dataset[MediaRecord] = {
    import spark.implicits._
    val fpsTable = Array(8, 10, 16, 20, 25)
    Dedup.kernelSpread(t.documents).select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val w = (nChars % 8 + 2).toInt
        val h = (id % 6 + 2).toInt
        val nf = (id % 4 + 2).toInt
        val fps = fpsTable((id % 5).toInt)
        MediaRecord(id, encodeAviDib(w, h, nf, fps)(
          (f, x, y) => ((31 * id + 7 * x + 13 * y + 19 * f) % 256).toInt))
      })
  }

  /** The oracle-checkable video-decode query: synthesize a real AVI per
    * document, decode it with the real RIFF parser, emit per-video
    * features. The oracle re-derives frames/dims/fps/mean from the
    * generation formula — a hash match proves the container round trip
    * recovered every pixel of every frame. */
  def videoDecodeStats(t: Tables): DataFrame = {
    val spark = t.spark
    decodeVideoPayloads(spark, syntheticVideos(spark, t))
      .toDF()
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"),
        round(col("fps"), 6).as("fps"),
        round(col("mean_gray"), 6).as("mean_gray"))
      // decode once (r19): the global sort's range-sampling pass would
      // otherwise re-run the whole encode+decode pipeline a second time
      .localCheckpoint()
      .orderBy("doc_id")
  }
}
