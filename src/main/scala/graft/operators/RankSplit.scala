package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-split global ordering — EXACT per-group rank (and,
  * optionally, running weight) without a total-order sort per group.
  *
  * `rank(df).over(groups, cellCol, orderCols)` is semantically
  * `row_number() OVER (PARTITION BY groups ORDER BY orderCols)` plus
  * the group size, but the plan never sorts a whole group in one
  * task:
  *
  *  1. ~`splits` approximate split points of `cellCol` per group (one
  *     combinable `approx_percentile`; accuracy only affects balance,
  *     never the answer);
  *  2. each row's CELL = number of split points below its `cellCol`
  *     (broadcast join + codegen'd array fold — monotone in the sort
  *     key, tie values always share a cell);
  *  3. `row_number` / running `sum(weight)` within (group, cell) —
  *     parallelism is groups × cells, each sort holds ~1/splits of a
  *     group;
  *  4. per-(group, cell) row/weight totals (a groups × cells
  *     control-plane table) are cumulated over PRECEDING cells and
  *     broadcast back: global rank = cell offset + local rank.
  *
  * Requirements: `cellCol` must order consistently with `orderCols`
  * (typically it IS the first order column, or a monotone integer
  * proxy of it — e.g. price in cents for a double price), and
  * `orderCols` must be a total order (include a unique tie-break).
  *
  * Used by q_ntile, q_percent_rank, q_weighted_median and q_zipf; at
  * 100 TB raise `splits` with the data — every stage stays
  * combinable, broadcast-sized, or cell-bounded.
  *
  * COST CONTRACT: the input is traversed in THREE independent
  * subplans (split points, per-cell totals, final rank join) —
  * Catalyst does not share them. For a plain pruned scan that is the
  * classic re-read-vs-materialize trade (Spark's own range
  * partitioner samples + re-reads the same way); if the input is
  * EXPENSIVE to recompute (an aggregate, a join), persist or
  * `localCheckpoint` it first, as q_zipf does with its vocabulary.
  */
object RankSplit {

  /** Output columns appended to the input frame. */
  val RankCol = "__rank"      // 1-based global rank within the group
  val SizeCol = "__grp_n"     // group row count
  val CumWCol = "__cumw"      // inclusive running weight (weighted form)
  val TotWCol = "__grp_w"     // group weight total (weighted form)

  /** Steps 1–2 alone: append `__cell` (0..splits−1, monotone in
    * `cellCol`) from per-group approximate split points. Reused by
    * [[rank]] and by plans that need histogram cells without ranks
    * (q_skyline's cell-bounded dominance). */
  def assignCells(df: DataFrame, groupCols: Seq[String], cellCol: String,
    splits: Int = 32): DataFrame = {
    require(splits >= 2, "need at least 2 splits")
    val gCols = groupCols.map(col)
    val probes = (1 until splits).map(_.toDouble / splits)
    // pin the split points: [[rank]] references the celled frame in
    // two independent subplans (per-cell totals + the final rank
    // join), and without the checkpoint each one re-runs this
    // approx_percentile over the full input — measured 30-40% of
    // q_weighted_median's whole cost at sf0.1 (r16). The frame is
    // |groups| rows of one split array; the same non-replicated
    // localCheckpoint trade q_ks_drift's histogram already documents.
    // EAGER by design (the default): constructing any RankSplit-based
    // DataFrame now runs the percentile job at plan-build time, which
    // plan-only consumers (specs, Explain) also pay — accepted, both
    // because lazy checkpoints can still double-compute under
    // concurrent first actions and because a pinned split set also
    // closes the latent hazard of the two subplans sampling DIFFERENT
    // split points (approx_percentile is not guaranteed stable across
    // recomputes; divergent cells would not break correctness — ranks
    // compose per cell — but would skew the balance the splits exist
    // to provide).
    // accuracy 1000 (not the 10000 default): split points only set
    // CELL BALANCE, never the answer, and ±0.1% of rank is far finer
    // balance than the splits/cell granularity itself — while the
    // default's digest costs ~1 s per construction at sf0.1 (~3x the
    // raw scan), paid by EVERY RankSplit consumer through the eager
    // checkpoint below
    val sp = df.groupBy(gCols: _*).agg(
      expr(s"approx_percentile($cellCol, array(${probes.mkString(",")})," +
        " 1000)").as("__sps"))
      .localCheckpoint()
    // a NULL cell value would silently drop its row at the __cell
    // equi-joins below (NULL never equi-matches); fail loudly instead —
    // callers must coalesce/filter NULLs upstream, where the intended
    // ordering of NULLs is theirs to choose. The CASE wrapper is
    // measured cost-free: isolated sf0.1 bench of q_ntile is the same
    // (within run noise) with and without it — the `aggregate` HOF
    // dominates either way.
    // cell = count of split points strictly below the value — since
    // the r19 opt round a native codegen kernel ([[graft.functions
    // .CountBelow]]): the previous `aggregate(__sps, ...)` higher-order
    // function ran OUTSIDE whole-stage codegen once per input row and
    // was measured as ~2.2 s of q_weighted_median's 6.9 s at sf0.1;
    // the kernel is the identical strict comparison count, so cells
    // (and therefore every rank) are unchanged.
    val celled = if (groupCols.isEmpty) df.crossJoin(broadcast(sp))
      else df.join(broadcast(sp), groupCols)
    import org.apache.spark.sql.graftx.ColumnBridge
    val below = ColumnBridge.column(graft.functions.CountBelow(
      ColumnBridge.expression(col("__sps")),
      ColumnBridge.expression(col(cellCol))))
    celled
      .withColumn("__cell", when(col(cellCol).isNull, expr(
        s"CAST(raise_error('RankSplit: NULL in cell column $cellCol — " +
          "coalesce or filter NULLs upstream') AS INT)"))
        .otherwise(below))
      .drop("__sps")
  }

  def rank(df: DataFrame, groupCols: Seq[String], cellCol: String,
    orderCols: Seq[String], weightCol: Option[String] = None,
    splits: Int = 32): DataFrame = {
    val gCols = groupCols.map(col)
    val withCell = assignCells(df, groupCols, cellCol, splits)

    val cellPart = gCols :+ col("__cell")
    val wLocal = Window.partitionBy(cellPart: _*)
      .orderBy(orderCols.map(col): _*)
    val wPrevCells = Window.partitionBy(gCols: _*).orderBy(col("__cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGrp = Window.partitionBy(gCols: _*)

    val perCellAggs: Seq[Column] = count(lit(1)).as("__cn") +:
      weightCol.map(w => sum(col(w)).as("__cw")).toSeq
    var offs = withCell.groupBy(cellPart: _*).agg(perCellAggs.head,
        perCellAggs.tail: _*)
      .withColumn("__off", coalesce(sum(col("__cn")).over(wPrevCells), lit(0L)))
      .withColumn(SizeCol, sum(col("__cn")).over(wGrp))
    for (_ <- weightCol) offs = offs
      .withColumn("__offw", coalesce(sum(col("__cw")).over(wPrevCells), lit(0L)))
      .withColumn(TotWCol, sum(col("__cw")).over(wGrp))
    offs = offs.drop("__cn", "__cw")

    var out = withCell
      .join(broadcast(offs), groupCols :+ "__cell")
      .withColumn(RankCol, col("__off") + row_number().over(wLocal))
    for (w <- weightCol) out = out
      .withColumn(CumWCol, col("__offw") + sum(col(w)).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    out.drop("__cell", "__off", "__offw")
  }
}
