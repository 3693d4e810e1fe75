package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Greenwald–Khanna quantile summary over primitive arrays — the
  * bounded-memory sketch buffer for [[QuantileSketchAgg]]. Spark's
  * `percentile_approx` buffer (`QuantileSummaries`) keeps boxed
  * `Stats(value, g, delta)` objects in growable object arrays and pays a
  * generic serialization per partial; this buffer holds the summary as
  * three flat primitive arrays plus a raw-insert chunk, so the per-row
  * hot path is one array store and the occasional cost is a primitive
  * `Arrays.sort` of the chunk plus a linear merge (r19: 710 → ~150 ms
  * for the three-sketch aggregation over sf0.1 lineitem).
  *
  * Rank bookkeeping is the exact GK bracket form: tuple i brackets the
  * sorted POSITION of one element instance inside [rmin_i, rmax_i] with
  * rmin_i = Σ_{j≤i} g_j and rmax_i = rmin_i + Δ_i (instance semantics —
  * under ties the position inside the tie run is what's bracketed, the
  * same convention `percentile_approx` uses). All three mutations keep
  * brackets VALID by construction: a sorted raw chunk enters as exact
  * tuples (g=1, Δ=0); merging interleaves by value under one consistent
  * tie placement — the incoming side's equal-valued instances precede
  * this side's — so an incoming tuple adds this side's bracket on
  * "#instances STRICTLY below v" while a resident tuple adds the
  * incoming side's bracket on "#instances ≤ v" (using ≤ on both sides
  * double-places ties and inflates spans by the tie-run width per
  * merge); compressing drops tuple i into i+1 only while the combined
  * g_i + g_{i+1} + Δ_{i+1} fits the threshold, never touching the two
  * extreme tuples. The structural invariant, by induction over every
  * mutation path and merge ORDER: max(g+Δ) ≤ n/accuracy (a fold is
  * thresholded there; a merge sums the sides' invariants,
  * n_A/accuracy + n_B/accuracy = n/accuracy; an exact chunk adds zero
  * width). The first-tuple-with-rmax ≥ target query is therefore off by
  * strictly less than n/accuracy in rank — inside the n/accuracy + 1
  * contract `percentile_approx` documents, so the sketch is a drop-in
  * for audit formulas written against it.
  *
  * Memory per group is O(accuracy) summary tuples plus the fixed chunk
  * regardless of group size — the property that makes this the
  * corpus-scale path (a 100 TB group streams through the same buffer).
  * The insert-path/merge-path threshold split (see [[flushRaw]]) keeps
  * that holding through long partial-merge chains, not just one level. */
final class GkSummary(val accuracy: Int) {
  private val chunkCap = 8192
  var count = 0L
  private var vals = new Array[Double](64)
  private var gs = new Array[Long](64)
  private var dels = new Array[Long](64)
  private var size = 0
  private var raw = new Array[Double](chunkCap)
  private var rawSize = 0

  def insert(v: Double): Unit = {
    raw(rawSize) = v; rawSize += 1; count += 1L
    if (rawSize == chunkCap) flushRaw()
  }

  /** Fold the raw chunk into the summary (sorted-exact side merge).
    * Insert-path compression runs at HALF the merge threshold: leaf
    * summaries then carry spans ≤ count/(2·accuracy), which leaves the
    * post-merge compress (at count/accuracy) headroom to fold pairs of
    * incoming tuples — without the split, merged spans saturate the
    * threshold and summary size grows linearly with the merge count
    * instead of staying O(accuracy). */
  def flushRaw(): Unit = if (rawSize > 0) {
    java.util.Arrays.sort(raw, 0, rawSize)
    mergeInto(raw, null, null, rawSize, rawSize.toLong)
    rawSize = 0
    compress(count / (2L * accuracy))
  }

  /** Merge `other`'s flushed summary into this one. */
  def mergeSummary(other: GkSummary): Unit = {
    flushRaw()
    other.flushRaw()
    if (other.size > 0) {
      mergeInto(other.vals, other.gs, other.dels, other.size, other.count)
      count += other.count
      compress(count / accuracy)
    } else count += other.count
  }

  /** Interleave this summary with side B (gsB/delsB null ⇒ an exact
    * sorted chunk: g=1, Δ=0), computing merged rmin/rmax brackets that
    * stay valid under ties and converting back to (g, Δ) form. When
    * called from [[flushRaw]] the B count is already reflected in
    * `count` by [[insert]]; callers pass B's count explicitly. */
  private def mergeInto(valsB: Array[Double], gsB: Array[Long],
                        delsB: Array[Long], nb: Int, countB: Long): Unit = {
    if (nb == 0) return
    val na = size
    val ov = new Array[Double](na + nb)
    val og = new Array[Long](na + nb)
    val od = new Array[Long](na + nb)
    // cumulative rmin/rmax walkers per side; leA/leB = tuples with
    // value ≤ the current emitted value (lookahead for tie safety)
    def gB(j: Int): Long = if (gsB == null) 1L else gsB(j)
    def dB(j: Int): Long = if (delsB == null) 0L else delsB(j)
    val rminA = new Array[Long](na + 1)
    var i = 0
    while (i < na) { rminA(i + 1) = rminA(i) + gs(i); i += 1 }
    val rminB = new Array[Long](nb + 1)
    var j = 0
    while (j < nb) { rminB(j + 1) = rminB(j) + gB(j); j += 1 }
    val countA = rminA(na)
    i = 0; j = 0
    // The merged placement is made CONSISTENT under ties: at equal
    // values, B's instances precede A's. An A tuple therefore adds
    // bracket bounds on #B ≤ v (lookahead leB counts B tuples with
    // value ≤ v), while a B tuple adds bounds on #A STRICTLY < v
    // (lookahead ltA). Using ≤ on both sides double-places equal
    // instances and inflates spans by the tie-run width per merge
    // (r19: 13 chained merges over 60%-tied data grew maxSpan 30 →
    // 2748 against a threshold of 400 before this distinction).
    var ltA = 0 // count of A tuples with value < current (strict)
    var leB = 0 // count of B tuples with value ≤ current
    var out = 0
    var prevRmin = 0L
    while (i < na || j < nb) {
      val takeB = i >= na || (j < nb && valsB(j) <= vals(i))
      val v = if (takeB) valsB(j) else vals(i)
      while (ltA < na && vals(ltA) < v) ltA += 1
      while (leB < nb && valsB(leB) <= v) leB += 1
      var rmin = 0L; var rmax = 0L
      if (takeB) {
        val low = rminA(ltA) // rmin of A's last strictly-smaller tuple
        val high = if (ltA == na) countA else rminA(ltA + 1) + dels(ltA) - 1L
        rmin = rminB(j + 1) + low
        rmax = rminB(j + 1) + dB(j) + high
        j += 1
      } else {
        val low = rminB(leB) // rmin of B's last tuple with value ≤ v (0 if none)
        val high = if (leB == nb) countB else rminB(leB + 1) + dB(leB) - 1L
        rmin = rminA(i + 1) + low
        rmax = rminA(i + 1) + dels(i) + high
        i += 1
      }
      // rank is monotone in value, so the previous tuple's lower bound
      // is also a valid lower bound here — clamping keeps the emitted
      // rmin sequence nondecreasing (ties can otherwise compute a
      // locally smaller cumulative bound), which keeps every g ≥ 0
      if (rmin < prevRmin) rmin = prevRmin
      if (rmax < rmin) rmax = rmin
      ov(out) = v
      og(out) = rmin - prevRmin
      od(out) = rmax - rmin
      prevRmin = rmin
      out += 1
    }
    vals = ov; gs = og; dels = od; size = out
  }

  private[functions] def restore(v: Array[Double], g: Array[Long],
                                 d: Array[Long], n: Int): Unit = {
    vals = v; gs = g; dels = d; size = n
  }

  /** Drop tuple i into i+1 while the combined span fits `t`; the two
    * extreme tuples always survive so min/max stay exactly represented. */
  private def compress(t: Long): Unit = {
    if (size <= 2) return
    if (t <= 1L) return
    var w = 1 // write cursor over [1, size-2]; tuple 0 is pinned
    var r = 1
    while (r < size - 1) {
      if (r + 1 < size && gs(r) + gs(r + 1) + dels(r + 1) <= t) {
        gs(r + 1) += gs(r) // fold r into r+1: r+1's rmin/rmax unchanged
      } else {
        vals(w) = vals(r); gs(w) = gs(r); dels(w) = dels(r); w += 1
      }
      r += 1
    }
    vals(w) = vals(size - 1); gs(w) = gs(size - 1); dels(w) = dels(size - 1)
    size = w + 1
  }

  /** Value whose instance rank is strictly within n/accuracy of the
    * rank target ⌈q·n⌉ (1-based). */
  def query(q: Double): Double =
    queryRank(math.max(1L, math.ceil(q * count).toLong))

  /** Value whose instance rank is strictly within n/accuracy of the
    * 1-based rank target `r` — the primitive behind [[query]], exposed
    * for sketch-guided EXACT refinement (bracketing a target rank with
    * two sketch probes shifted by the error bound yields a value window
    * certain to contain the exact order statistic; one filtered exact
    * pass inside the window then resolves it). */
  def queryRank(r: Long): Double = {
    flushRaw()
    require(size > 0, "query on an empty summary")
    var rmin = 0L
    var i = 0
    while (i < size - 1) {
      rmin += gs(i)
      if (rmin + dels(i) >= r) return vals(i)
      i += 1
    }
    vals(size - 1)
  }

  def isEmpty: Boolean = count == 0L

  /** (value, rmin, rmax) per tuple — spec hook: every bracket must
    * intersect the value's tie run, i.e. rmin ≤ count(≤ value) and
    * rmax ≥ count(< value) + 1 (instance semantics). */
  private[graft] def brackets: Array[(Double, Long, Long)] = {
    flushRaw()
    val out = new Array[(Double, Long, Long)](size)
    var rmin = 0L
    var i = 0
    while (i < size) {
      rmin += gs(i)
      out(i) = (vals(i), rmin, rmin + dels(i))
      i += 1
    }
    out
  }

  /** Largest rank-bracket span max(g_i + Δ_i) — the quantity the query
    * error is bounded by; specs pin it ≤ count/accuracy. */
  def maxSpan: Long = {
    flushRaw()
    var m = 0L
    var i = 0
    while (i < size) { if (gs(i) + dels(i) > m) m = gs(i) + dels(i); i += 1 }
    m
  }

  def write(out: DataOutputStream): Unit = {
    flushRaw()
    out.writeInt(accuracy)
    out.writeLong(count)
    out.writeInt(size)
    var i = 0
    while (i < size) {
      out.writeDouble(vals(i)); out.writeLong(gs(i)); out.writeLong(dels(i))
      i += 1
    }
  }
}

object GkSummary {
  def read(in: DataInputStream): GkSummary = {
    val s = new GkSummary(in.readInt())
    s.count = in.readLong()
    val n = in.readInt()
    val v = new Array[Double](n); val g = new Array[Long](n); val d = new Array[Long](n)
    var i = 0
    while (i < n) {
      v(i) = in.readDouble(); g(i) = in.readLong(); d(i) = in.readLong(); i += 1
    }
    s.restore(v, g, d, n)
    s
  }
}

/** sketch_quantiles(col, ps, accuracy) → array of approximate quantiles
  * from ONE shared GK sketch — `percentile_approx` builds a separate
  * sketch per call even over the same column; sharing the pass halves
  * the insert work for the (p50, p90)-of-one-column shape. Null for an
  * all-null/empty group, matching `percentile_approx`. */
case class QuantileSketchAgg(
    child: Expression,
    ps: Seq[Double],
    accuracy: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkSummary] {

  require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
    s"sketch_quantiles: ps must be non-empty fractions, got $ps")
  require(accuracy >= 1, s"sketch_quantiles: accuracy must be >= 1, got $accuracy")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sketch_quantiles requires a DOUBLE column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): GkSummary = new GkSummary(accuracy)

  override def update(buf: GkSummary, input: InternalRow): GkSummary = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: GkSummary, other: GkSummary): GkSummary = {
    buf.flushRaw()
    buf.mergeSummary(other)
    buf
  }

  override def eval(buf: GkSummary): Any = {
    buf.flushRaw()
    if (buf.isEmpty) null
    else new GenericArrayData(ps.map(buf.query).toArray)
  }

  override def serialize(buf: GkSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.write(out)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GkSummary =
    GkSummary.read(new DataInputStream(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

/** sketch_state(col, accuracy) → the serialized [[GkSummary]] itself
  * (BinaryType) — for callers that probe the summary on the driver
  * (rank-targeted cut derivation, sketch-guided exact refinement)
  * instead of fixing the quantile fractions at plan-build time. The
  * per-group payload is O(accuracy) bytes regardless of group size. */
case class SketchStateAgg(
    child: Expression,
    accuracy: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkSummary] {

  require(accuracy >= 1, s"sketch_state: accuracy must be >= 1, got $accuracy")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sketch_state requires a DOUBLE column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): GkSummary = new GkSummary(accuracy)

  override def update(buf: GkSummary, input: InternalRow): GkSummary = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: GkSummary, other: GkSummary): GkSummary = {
    buf.mergeSummary(other)
    buf
  }

  override def eval(buf: GkSummary): Any = serialize(buf)

  override def serialize(buf: GkSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.write(out)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GkSummary =
    GkSummary.read(new DataInputStream(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(newOffset: Int): SketchStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SketchStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SketchStateAgg =
    copy(child = newChildren.head)
}

object QuantileSketch {
  /** Column API: the serialized per-group GK summary (decode with
    * [[fromBytes]]); empty groups round-trip as an empty summary. */
  def sketchState(c: Column, accuracy: Int): Column =
    ColumnBridge.column(
      SketchStateAgg(ColumnBridge.expression(c), accuracy)
        .toAggregateExpression())

  /** Decode a [[sketchState]] payload back into a queryable summary. */
  def fromBytes(bytes: Array[Byte]): GkSummary =
    GkSummary.read(new DataInputStream(new ByteArrayInputStream(bytes)))

  /** Column API: approximate quantiles of a double column at fractions
    * `ps` from one shared bounded-memory sketch; rank error strictly
    * under n/accuracy — inside `percentile_approx`'s documented
    * n/accuracy + 1 bound for the same accuracy, so audits written
    * against that contract hold. */
  def sketchQuantiles(c: Column, ps: Seq[Double], accuracy: Int): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(c), ps, accuracy)
        .toAggregateExpression())
}
