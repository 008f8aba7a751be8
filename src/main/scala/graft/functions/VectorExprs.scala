package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native integer-vector kernels. The declarative equivalents
  * (`aggregate(zip_with(...))`) are higher-order functions, which
  * Catalyst evaluates outside whole-stage codegen; these expressions
  * generate a tight static loop call instead — the dot product is the
  * O(candidates × dims) hot path of ANN/embedding-dedup, so it must
  * stay inside the generated loop. Semantics are identical (exact
  * bigint sums), so oracle parity is unchanged. */
object VectorKernels {
  def intDot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  def intNormSq(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { val x = a.getLong(i); s += x * x; i += 1 }
    s
  }

  /** Σ_m lut[m][codes[m]] — the PQ asymmetric-distance lookup fold:
    * `lut` is the per-query M×K integer distance table
    * (array<array<bigint>>), `codes` a candidate's M one-byte codes
    * (array<int>). Evaluated once per ADC candidate row — the PQ
    * search hot path. STRICT where the declarative
    * `aggregate(zip_with(...))` twin was silently NULL: a length
    * mismatch or out-of-range code means a corrupt/mismatched codes
    * row, and scoring it as NULL would silently drop it from ranking
    * — fail loudly instead. */
  def pqAdc(lut: ArrayData, codes: ArrayData): Long = {
    val m = lut.numElements()
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc: codes length ${codes.numElements()} != lut subspaces $m — " +
          "corrupt codes row or model/table mismatch")
    var s = 0L
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      val row = lut.getArray(i)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"pq_adc: code $c out of range [0, ${row.numElements()}) in subspace $i — " +
            "corrupt codes row or model/table mismatch")
      s += row.getLong(c)
      i += 1
    }
    s
  }
}

/** Σ a_i·b_i over two integer-scaled (bigint array) vectors. */
case class IntVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.intDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.intDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntVecDot =
    copy(left = l, right = r)
}

/** Σ_m lut[m][codes[m]] — PQ ADC scoring as a native codegen kernel;
  * the declarative `aggregate(zip_with(lut, codes, …))` twin is an
  * interpreted higher-order function evaluated per candidate row. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  override def nullSafeEval(lut: Any, codes: Any): Any =
    VectorKernels.pqAdc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.pqAdc($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** Σ a_i² over an integer-scaled (bigint array) vector. */
case class IntVecNormSq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_vec_norm_sq"
  override def nullSafeEval(a: Any): Any =
    VectorKernels.intNormSq(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.intNormSq($a)")
  override protected def withNewChildInternal(newChild: Expression): IntVecNormSq =
    copy(child = newChild)
}
