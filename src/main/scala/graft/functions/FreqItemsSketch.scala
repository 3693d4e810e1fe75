package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al., public algorithm) heavy-hitters buffer:
  * at most `capacity` counters; overflow evicts the current minimum and
  * inherits its count as the new item's error bound. Guarantees: every item
  * with true frequency > n/capacity is present, and for any tracked item
  * `est - err <= true <= est`. Buffers merge (sum matching counters, evict
  * down to `capacity`), which is what makes the aggregate a single
  * partial+final pass instead of a full groupBy shuffle. Caveat: like all
  * SpaceSaving merges, tie-breaking during eviction makes the exact counter
  * set sensitive to merge order for items near the eviction boundary — the
  * error bounds above hold under ANY merge order, but tail items of the
  * top-k can differ between runs when counts tie. Heavy hitters
  * (freq > n/capacity) are always present regardless. */
final class FreqSketchBuffer(val capacity: Int) {
  val counts = new mutable.HashMap[String, Long]()
  val errors = new mutable.HashMap[String, Long]()

  def add(item: String, by: Long = 1L, err: Long = 0L): Unit = {
    counts.get(item) match {
      case Some(c) =>
        counts.update(item, c + by)
        if (err > 0) errors.update(item, errors.getOrElse(item, 0L) + err)
      case None if counts.size < capacity =>
        counts.update(item, by)
        if (err > 0) errors.update(item, err)
      case None =>
        // evict the deterministic minimum (count, then item) and inherit it
        val (minItem, minCount) = counts.minBy { case (i, c) => (c, i) }
        counts.remove(minItem); errors.remove(minItem)
        counts.update(item, minCount + by)
        errors.update(item, minCount + err)
    }
  }

  /** Minimum counter value if this buffer has ever evicted (i.e. is full) —
    * an upper bound on the count any UNTRACKED item may have accumulated
    * here. 0 when not full (nothing was ever evicted). */
  private def minIfFull: Long =
    if (counts.size >= capacity) counts.values.min else 0L

  /** Sound mergeable-summary merge (Agarwal et al.'s mergeable heavy
    * hitters): an item absent from a FULL buffer may still have accumulated
    * up to that buffer's min counter there, so its contribution is that min,
    * counted entirely as error. Keeps `true <= est` AND `est - err <= true`
    * under any merge order; a plain per-item add() would silently
    * under-estimate items evicted on one side. */
  def mergeIn(other: FreqSketchBuffer): Unit = {
    val mA = minIfFull
    val mB = other.minIfFull
    val items = counts.keySet ++ other.counts.keySet
    val merged = items.toSeq.map { item =>
      val cA = counts.getOrElse(item, mA)
      val eA = if (counts.contains(item)) errors.getOrElse(item, 0L) else mA
      val cB = other.counts.getOrElse(item, mB)
      val eB = if (other.counts.contains(item)) other.errors.getOrElse(item, 0L) else mB
      (item, cA + cB, eA + eB)
    }.sortBy { case (item, c, _) => (-c, item) }.take(capacity)
    counts.clear(); errors.clear()
    merged.foreach { case (item, c, e) =>
      counts.update(item, c)
      if (e > 0) errors.update(item, e)
    }
  }
}

/** freq_items(item, k) → array<struct<item, est_count, max_err>>, the top-k
  * frequent items by estimated count (desc, then item asc — deterministic).
  */
case class FreqItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketchBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"freq_items requires a string item column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): FreqSketchBuffer =
    new FreqSketchBuffer(capacity)

  override def update(buf: FreqSketchBuffer, input: InternalRow): FreqSketchBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FreqSketchBuffer, other: FreqSketchBuffer): FreqSketchBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: FreqSketchBuffer): Any = {
    val rows = buf.counts.toSeq
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c, buf.errors.getOrElse(item, 0L))
      }
    new GenericArrayData(rows.toArray[Any]): ArrayData
  }

  override def serialize(buf: FreqSketchBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, c) =>
      // length-prefixed UTF-8 bytes, not writeUTF: writeUTF throws on any
      // string whose encoding exceeds 64 KiB (long documents/URLs)
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(c); out.writeLong(buf.errors.getOrElse(item, 0L))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new FreqSketchBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      val item = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      buf.counts.update(item, c)
      if (e > 0) buf.errors.update(item, e)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren.head)
}

object FreqItemsSketch {
  /** Column API: aggregate a string column into a frequent-items sketch. */
  def freqItems(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      FreqItemsSketch(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
