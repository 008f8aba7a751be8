package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass phase-bin fold of the BLS/PDM cell frame — the custom
  * aggregate behind `blsCells` (r19 optimization round).
  *
  * The declarative shape it replaces exploded every series row ×|grid|
  * trial periods and folded 2·nb CONDITIONAL sums per exploded row
  * (`sum(when(b === i, ...))` — each input row paid |grid| group-hash
  * probes plus |grid|·2·nb branch evaluations, ~530 expression ops for
  * the 16-period/16-bin grid). This fold reads each series row ONCE:
  * per trial period one exact integer phase bin (the IDENTICAL
  * `((tus % p) * nb) DIV p` arithmetic — all operands non-negative, so
  * Java `%`/`/` coincide with Spark's `%`/`DIV`) and two array
  * increments into the period's (count, flux-sum) slots. Every
  * accumulator is an exact int64 sum, so the emitted cells are
  * bit-identical to the conditional-aggregate form under ANY
  * partitioning/merge order — the same order-free-reduction discipline
  * the wide aggregate relied on.
  *
  * Buffer: one flat long array [n, Σx, Σx², then per period nb counts
  * followed by nb sums] — 3 + |grid|·2·nb slots (515 longs ≈ 4 KB for
  * the production 16×16 grid), merged slot-wise. Output: one
  * |grid|-long array of (p_us, n, sx, sxx, nbs, sbs) structs — the
  * caller explodes it into the per-(object, period) cell frame, so the
  * group count drops from |objects|·|grid| to |objects| and the series
  * totals (n, Σx, Σx² — identical across periods) are folded once per
  * row instead of once per (row, period).
  *
  * Null contract: rows with a NULL tus or xc are ignored (the series
  * builders derive both from non-null parquet columns; a NULL here
  * would have poisoned the old form's `sum(when)` columns silently —
  * skipping is the conservative reading, and parity at both SFs pins
  * corpus behavior).
  */
case class BlsCellFold(tus: Expression, xc: Expression,
  periods: Seq[Long], nb: Int,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(periods.nonEmpty && periods.forall(_ > 0),
    "bls_cell_fold requires positive trial periods")
  require(nb >= 2, s"bls_cell_fold requires nb >= 2, got $nb")

  private val pArr: Array[Long] = periods.toArray
  private val stride = 2 * nb
  private val bufLen = 3 + pArr.length * stride

  override def children: Seq[Expression] = Seq(tus, xc)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p_us", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", LongType, nullable = false),
    StructField("sxx", LongType, nullable = false),
    StructField("nbs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("sbs", ArrayType(LongType, containsNull = false),
      nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = tus.eval(input)
    val x = xc.eval(input)
    if (t != null && x != null) {
      val tv = t.asInstanceOf[Long]
      val xv = x.asInstanceOf[Long]
      buf(0) += 1L
      buf(1) += xv
      buf(2) += xv * xv
      var i = 0
      var base = 3
      while (i < pArr.length) {
        val p = pArr(i)
        val b = (((tv % p) * nb) / p).toInt
        buf(base + b) += 1L
        buf(base + nb + b) += xv
        i += 1
        base += stride
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](pArr.length)
    var i = 0
    while (i < pArr.length) {
      val base = 3 + i * stride
      val nbs = new Array[Long](nb)
      val sbs = new Array[Long](nb)
      System.arraycopy(buf, base, nbs, 0, nb)
      System.arraycopy(buf, base + nb, sbs, 0, nb)
      out(i) = new GenericInternalRow(Array[Any](
        pArr(i), buf(0), buf(1), buf(2),
        new GenericArrayData(nbs), new GenericArrayData(sbs)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bufLen)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BlsCellFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BlsCellFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): BlsCellFold =
    copy(tus = newChildren(0), xc = newChildren(1))
  override def prettyName: String = "bls_cell_fold"
}

/** One-pass Lomb–Scargle sufficient-sum fold — the custom aggregate
  * behind `lsSufFrameBy` (r19 optimization round). Same design as
  * [[BlsCellFold]]: per series row, for each trial period, one exact
  * integer phase bin (`((tus % p) * B) DIV p`, all operands
  * non-negative) indexes the FIXED-POINT trig tables (the same Scala
  * [[Seq]]s the old plan spliced as `typedLit` + `element_at`, so
  * every c/s value is the identical long), and the seven
  * period-dependent sums (Σc, Σs, Σxc, Σxs, Σc², Σs², Σcs) accumulate
  * as exact int64 beside the three shared totals (n, Σx, Σx²). The
  * old shape exploded ×|grid| and paid a group-hash probe + 10
  * aggregate updates per exploded row; this pays one probe + 16
  * tight-loop iterations per series row. Same int64 precondition as
  * the declarative form (documented at qLombScargle); sums are
  * order-free so the output is bit-identical.
  */
case class GlsSufFold(tus: Expression, xc: Expression,
  periods: Seq[Long], lsBins: Int, cosTab: Seq[Long], sinTab: Seq[Long],
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(periods.nonEmpty && periods.forall(_ > 0),
    "gls_suf_fold requires positive trial periods")
  require(cosTab.length == lsBins && sinTab.length == lsBins,
    "gls_suf_fold trig tables must have lsBins entries")

  private val pArr: Array[Long] = periods.toArray
  private val cosArr: Array[Long] = cosTab.toArray
  private val sinArr: Array[Long] = sinTab.toArray
  private val stride = 7
  private val bufLen = 3 + pArr.length * stride

  override def children: Seq[Expression] = Seq(tus, xc)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p_us", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", LongType, nullable = false),
    StructField("sxx", LongType, nullable = false),
    StructField("sc", LongType, nullable = false),
    StructField("ss", LongType, nullable = false),
    StructField("sxc", LongType, nullable = false),
    StructField("sxs", LongType, nullable = false),
    StructField("scc", LongType, nullable = false),
    StructField("sss", LongType, nullable = false),
    StructField("scs", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = tus.eval(input)
    val x = xc.eval(input)
    if (t != null && x != null) {
      val tv = t.asInstanceOf[Long]
      val xv = x.asInstanceOf[Long]
      buf(0) += 1L
      buf(1) += xv
      buf(2) += xv * xv
      var i = 0
      var base = 3
      while (i < pArr.length) {
        val p = pArr(i)
        val b = (((tv % p) * lsBins) / p).toInt
        val c = cosArr(b)
        val si = sinArr(b)
        buf(base) += c
        buf(base + 1) += si
        buf(base + 2) += xv * c
        buf(base + 3) += xv * si
        buf(base + 4) += c * c
        buf(base + 5) += si * si
        buf(base + 6) += c * si
        i += 1
        base += stride
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](pArr.length)
    var i = 0
    while (i < pArr.length) {
      val base = 3 + i * stride
      out(i) = new GenericInternalRow(Array[Any](
        pArr(i), buf(0), buf(1), buf(2),
        buf(base), buf(base + 1), buf(base + 2), buf(base + 3),
        buf(base + 4), buf(base + 5), buf(base + 6)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bufLen)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GlsSufFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GlsSufFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): GlsSufFold =
    copy(tus = newChildren(0), xc = newChildren(1))
  override def prettyName: String = "gls_suf_fold"
}

/** One-pass conditional-entropy cell fold — the custom aggregate
  * behind `cePeriodOver` (r19 opt round). Same design as
  * [[BlsCellFold]]: per series row, for each trial period, one exact
  * integer phase bin; the (phase, magnitude) occupancy counter
  * `buf[p·B·M + pbin·M + mbin]` increments by one (the magnitude bin
  * arrives as an input column — it needs the per-object min/max
  * window, which stays upstream). eval() reduces each period's B×M
  * occupancy grid to the entropy numerator the old plan computed
  * relationally: num = Σ_ij n_ij·(L[n_ij] − L[n_i]) over occupied
  * cells, with L the spliced fixed-point log table. The NULL-on-
  * beyond-table semantics (n_i > tabMax ⇒ L[n_i] IS NULL, null term
  * skipped by SUM, all-null period ⇒ null num; n_ij ≤ n_i so validity
  * is just n_i ≤ tabMax) is the contract pinned by the DuckDB
  * oracle's list_extract — NOT by Spark's element_at, which under the
  * session's ANSI default THROWS past the array end. CeLnTab must be
  * sized to the max feasible per-bin count; overflow degrades to a
  * null term rather than an error, exactly as the oracle does. All
  * counts are exact int64; the emitted (p_us, n, num) rows are
  * bit-identical to the old (object, period, phase, mag) cell
  * aggregate + n_i window + period aggregate they replace. */
case class CeCellFold(tus: Expression, mbin: Expression,
  periods: Seq[Long], phaseBins: Int, magBins: Int, lnTab: Seq[Long],
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(periods.nonEmpty && periods.forall(_ > 0),
    "ce_cell_fold requires positive trial periods")
  require(phaseBins >= 2 && magBins >= 2, "ce_cell_fold needs >= 2 bins")

  private val pArr: Array[Long] = periods.toArray
  @transient private lazy val lnArr: Array[Long] = lnTab.toArray
  private val stride = phaseBins * magBins
  private val bufLen = pArr.length * stride

  override def children: Seq[Expression] = Seq(tus, mbin)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p_us", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("num", LongType, nullable = true))), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = tus.eval(input)
    val m = mbin.eval(input)
    if (t != null && m != null) {
      val tv = t.asInstanceOf[Long]
      val mv = m.asInstanceOf[Long].toInt
      if (mv < 0 || mv >= magBins)
        throw new IllegalArgumentException(
          s"ce_cell_fold: mbin $mv outside [0, $magBins)")
      var i = 0
      var base = 0
      while (i < pArr.length) {
        val p = pArr(i)
        val pb = (((tv % p) * phaseBins) / p).toInt
        buf(base + pb * magBins + mv) += 1L
        i += 1
        base += stride
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val tabMax = lnArr.length
    val out = new Array[Any](pArr.length)
    var i = 0
    while (i < pArr.length) {
      val base = i * stride
      var n = 0L
      var num = 0L
      var sawValid = false
      var pb = 0
      while (pb < phaseBins) {
        var ni = 0L
        var m = 0
        while (m < magBins) { ni += buf(base + pb * magBins + m); m += 1 }
        n += ni
        if (ni > 0 && ni <= tabMax) {
          val lnNi = lnArr(ni.toInt - 1)
          m = 0
          while (m < magBins) {
            val nij = buf(base + pb * magBins + m)
            if (nij > 0) {
              num += nij * (lnArr(nij.toInt - 1) - lnNi)
              sawValid = true
            }
            m += 1
          }
        }
        pb += 1
      }
      out(i) = new GenericInternalRow(Array[Any](
        pArr(i), n, if (sawValid) num else null))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bufLen)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CeCellFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CeCellFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): CeCellFold =
    copy(tus = newChildren(0), mbin = newChildren(1))
  override def prettyName: String = "ce_cell_fold"
}

object BlsFold {
  /** Column API: `blsCellFold(tus, xc, grid, nb)` → one array of
    * per-trial-period (p_us, n, sx, sxx, nbs, sbs) cell structs. */
  def blsCellFold(tus: Column, xc: Column, periods: Seq[Long],
    nb: Int): Column =
    ColumnBridge.column(BlsCellFold(
      ColumnBridge.expression(tus), ColumnBridge.expression(xc),
      periods, nb).toAggregateExpression())

  /** Column API: `glsSufFold(tus, xc, grid, B, cosTab, sinTab)` → one
    * array of per-trial-period GLS sufficient-sum structs. */
  def glsSufFold(tus: Column, xc: Column, periods: Seq[Long], lsBins: Int,
    cosTab: Seq[Long], sinTab: Seq[Long]): Column =
    ColumnBridge.column(GlsSufFold(
      ColumnBridge.expression(tus), ColumnBridge.expression(xc),
      periods, lsBins, cosTab, sinTab).toAggregateExpression())

  /** Column API: `ceCellFold(tus, mbin, grid, B, M, lnTab)` → one
    * array of per-trial-period (p_us, n, num) entropy structs. */
  def ceCellFold(tus: Column, mbin: Column, periods: Seq[Long],
    phaseBins: Int, magBins: Int, lnTab: Seq[Long]): Column =
    ColumnBridge.column(CeCellFold(
      ColumnBridge.expression(tus), ColumnBridge.expression(mbin),
      periods, phaseBins, magBins, lnTab).toAggregateExpression())
}
