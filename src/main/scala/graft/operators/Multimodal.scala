package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column handling: media as opaque `binary` payloads plus typed
  * metadata, with decode / feature-extraction as partition-batched operators.
  *
  * The container has no image/audio codecs, so `decodeBatch` is a clearly
  * marked DETERMINISTIC STUB — but everything Spark-side is real: the binary
  * schema, the partition-batched execution shape (the Scala analogue of a
  * `mapInPandas` batch UDF), the typed output encoder, and the declarative
  * metadata path that the correctness oracle checks.
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

  /** STUB decode kernel — stands in for an image/audio codec (libs not in
    * this container). Deterministic: derives "dimensions" and a checksum from
    * the payload bytes, so specs can assert exact values. A real deployment
    * swaps only this function; the surrounding batch plumbing is unchanged. */
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
}
