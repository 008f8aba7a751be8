package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SpecifiedWindowFrame, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, MapType, StructType}

/** Optimizer rule: rewrite the window top-n idiom
  *
  * {{{ filter(rn <= k, window(row_number() as rn over (partition by K order by S))) }}}
  *
  * into [[TopKPerKeyNode]], which `TopKStrategy` plans as the
  * partial/final bounded-heap operator. The user keeps writing the
  * natural window query; the plan stops sorting every key's rows in
  * one task and instead shuffles ≤ k rows per key per input
  * partition — the aggregate-style shape that survives 100 TB.
  *
  * Fires only on the exact safe shape:
  *  - a single window expression, and it is `row_number()` (whose
  *    1-based dense numbering matches FinalTopKExec's rank);
  *  - non-empty partition spec (a global top-k has no key to cluster
  *    on) and non-empty order spec;
  *  - the filter is one simple comparison bounding rn by a literal;
  *    k is positive and small enough for an in-memory heap.
  *
  * Tie behavior matches row_number: both pick an arbitrary winner
  * among order-equal rows (make the order total for determinism).
  * The rewrite keeps the rank attribute's exprId, so downstream
  * references to `rn` resolve unchanged.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Heap rows per key per partition stay bounded by this. */
  val MaxRewriteK = 1024

  /** Floating-point grouping needs Spark's NormalizeFloatingNumbers
    * (0.0 vs −0.0, NaN canonicalization), which runs later and only
    * rewrites nodes it knows (Window/Aggregate/Join) — our custom node
    * would byte-compare raw keys and split those groups. Skip the
    * rewrite for any float-bearing partition key. */
  private[plans] def containsFloat(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case a: ArrayType => containsFloat(a.elementType)
    case m: MapType => containsFloat(m.keyType) || containsFloat(m.valueType)
    case s: StructType => s.fields.exists(f => containsFloat(f.dataType))
    case _ => false
  }

  private def boundOf(cond: Expression, rn: AttributeReference): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId => Some(k)
      case LessThan(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference)
        if a.exprId == rn.exprId => Some(k)
      case GreaterThan(IntegerLiteral(k), a: AttributeReference)
        if a.exprId == rn.exprId => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window)
      if w.windowExpressions.size == 1 &&
        w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
        !w.partitionSpec.exists(e => containsFloat(e.dataType)) =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(RowNumber(), spec), _)
          // row_number always runs on its required row frame; any other
          // frame means the query isn't the plain top-n idiom
          if spec.frameSpecification.isInstanceOf[SpecifiedWindowFrame] =>
          val rn = a.toAttribute.asInstanceOf[AttributeReference]
          boundOf(cond, rn) match {
            case Some(k) if k >= 1 && k <= MaxRewriteK =>
              TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, rn, w.child)
            case _ => f
          }
        case _ => f
      }
  }
}
