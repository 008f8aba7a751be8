package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operations in exact integer space.
  *
  * Every float component is scaled to `round(x * 1e7)` as a bigint
  * once; dot products and squared norms are then exact integer sums
  * (order-independent — the reason the DuckDB oracle can hash-match
  * them), and cosine = dot / (√na·√nb) is three correctly-rounded
  * IEEE ops on identical inputs, hence bit-identical across engines.
  *
  * Scaling bounds: |x| ≤ 1 components → |xi| ≤ 1e7; a 64-dim squared
  * norm ≤ 64e14 < 2^53 (exact as double too) and far below 2^63.
  *
  * These are SQL-expression builders (higher-order functions over the
  * array column) rather than UDFs — evaluated natively by Catalyst.
  */
object VectorOps {
  val ScaleLit = "10000000.0"

  /** float array → exact integer-scaled bigint array. */
  def intVec(col: String): Column =
    expr(s"transform($col, x -> CAST(ROUND(CAST(x AS DOUBLE) * $ScaleLit) AS BIGINT))")

  /** Σ x_i² over an integer-scaled vector (exact bigint) — native
    * codegen kernel (IntVecNormSq), not a higher-order function. */
  def normSq(col: String): Column = {
    import org.apache.spark.sql.graftx.ColumnBridge
    ColumnBridge.column(IntVecNormSq(ColumnBridge.expression(expr(col))))
  }

  /** Σ a_i·b_i over two integer-scaled vectors (exact bigint) — native
    * codegen kernel (IntVecDot): the O(candidates × dims) hot path. */
  def dot(a: String, b: String): Column = {
    import org.apache.spark.sql.graftx.ColumnBridge
    ColumnBridge.column(IntVecDot(
      ColumnBridge.expression(expr(a)), ColumnBridge.expression(expr(b))))
  }

  /** Column form of [[dot]] — lets one side be a literal vector (e.g.
    * a broadcast IVF codebook entry baked into the plan). */
  def dotC(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftx.ColumnBridge
    ColumnBridge.column(IntVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** cosine from exact integer dot + squared norms — deterministic. */
  def cosine(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / (sqrt(normA.cast("double")) * sqrt(normB.cast("double")))

  /** Sign-LSH bucket: bit j set iff component dims(j) > 0. Exact float
    * comparisons → identical bucketing in any engine. */
  def signBucket(col: String, dims: Seq[Int]): Column =
    expr(dims.zipWithIndex
      .map { case (d, j) => s"(CAST(element_at($col, ${d + 1}) > 0 AS INT) * ${1 << j})" }
      .mkString(" + "))

  /** The same expressions as DuckDB SQL fragments (for oracles). */
  object Sql {
    def signBucket(col: String, dims: Seq[Int]): String =
      dims.zipWithIndex
        .map { case (d, j) => s"(CAST($col[${d + 1}] > 0 AS INT) * ${1 << j})" }
        .mkString(" + ")
  }
}
