package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Open-addressing long→count map — the primitive-specialized buffer for
  * [[LongModeAgg]]. Spark's built-in `Mode` keeps an OpenHashMap[AnyRef,
  * Long], so every label-propagation round paid a boxed hash update per
  * edge plus a generic map serialization per group; this buffer stores
  * keys and counts in two flat long arrays (counts ≥ 1 ⇒ a zero count
  * marks an empty slot, so the 0L key needs no sentinel flag) and
  * serializes as plain length-prefixed pairs. Linear probing, power-of-2
  * capacity, grow at 60% load. */
final class LongCountBuffer(initialCapacity: Int = 16) {
  private var mask = initialCapacity - 1
  private var keys = new Array[Long](initialCapacity)
  private var cnts = new Array[Long](initialCapacity)
  private var n = 0

  private def slot(k: Long): Int = {
    var h = k * -7046029254386353131L // Stafford mix13 multiplier (public)
    h ^= h >>> 32
    (h & mask).toInt
  }

  def add(k: Long, by: Long): Unit = {
    var i = slot(k)
    while (true) {
      if (cnts(i) == 0L) {
        keys(i) = k; cnts(i) = by; n += 1
        if (n * 5L > (mask + 1) * 3L) grow()
        return
      } else if (keys(i) == k) {
        cnts(i) += by
        return
      } else i = (i + 1) & mask
    }
  }

  private def grow(): Unit = {
    val ok = keys; val oc = cnts
    val newCap = (mask + 1) << 1
    keys = new Array[Long](newCap)
    cnts = new Array[Long](newCap)
    mask = newCap - 1
    n = 0
    var i = 0
    while (i < ok.length) {
      if (oc(i) != 0L) add(ok(i), oc(i))
      i += 1
    }
  }

  def foreachEntry(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < keys.length) {
      if (cnts(i) != 0L) f(keys(i), cnts(i))
      i += 1
    }
  }

  def size: Int = n
}

/** long_mode(col) → the most frequent value of a non-null LONG column,
  * ties broken by the LOWEST value — the deterministic plurality pick
  * label propagation needs (identical semantics to Spark's
  * `mode(col, deterministic = true)` on longs, ~3× cheaper per row and
  * per merge at the sf0.1 co-purchase scale). Partial-aggregates
  * map-side like any TypedImperativeAggregate. Returns null only for an
  * all-null/empty group. */
case class LongModeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongCountBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_mode requires a LONG column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): LongCountBuffer = new LongCountBuffer()

  override def update(buf: LongCountBuffer, input: InternalRow): LongCountBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: LongCountBuffer, other: LongCountBuffer): LongCountBuffer = {
    other.foreachEntry((k, c) => buf.add(k, c))
    buf
  }

  override def eval(buf: LongCountBuffer): Any = {
    if (buf.size == 0) return null
    var bestK = 0L
    var bestC = 0L
    var any = false
    buf.foreachEntry { (k, c) =>
      if (!any || c > bestC || (c == bestC && k < bestK)) {
        bestK = k; bestC = c; any = true
      }
    }
    bestK
  }

  override def serialize(buf: LongCountBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { (k, c) => out.writeLong(k); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LongCountBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    // size the buffer past the 60% growth trigger up front
    var cap = 16
    while (n * 5L > cap * 3L) cap <<= 1
    val buf = new LongCountBuffer(cap)
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongModeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongModeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongModeAgg =
    copy(child = newChildren.head)
}

object LongMode {
  /** Column API: deterministic plurality (max count, min value on ties)
    * of a long column. */
  def longMode(c: Column): Column =
    ColumnBridge.column(
      LongModeAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
