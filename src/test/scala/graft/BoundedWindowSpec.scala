package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded control-plane windows.
  *
  * Three plans intentionally run a GLOBAL (unpartitioned) window —
  * the source of Spark's "No Partition Defined ... moving all data to
  * a single partition" warnings in the bench log. Each is safe
  * because its input is a tiny AGGREGATE (digits / histogram cells),
  * never raw data. These specs make that safety a tested invariant:
  * the number of global windows per plan is pinned (a NEW one cannot
  * sneak in unnoticed) and each one's frame cardinality is recomputed
  * and bounded, so a regression that un-aggregates a window input
  * fails here instead of hiding in warning spam.
  */
class BoundedWindowSpec extends AnyFunSuite {
  import SparkTestSession._

  private def globalWindows(df: DataFrame): Seq[WindowExec] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  /** Windows whose partitioning is empty OR entirely foldable (a
    * constant key like lit(1) funnels every row to one task exactly
    * like no key at all). */
  private def constantKeyWindows(df: DataFrame): Seq[WindowExec] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.queryExecution.executedPlan.collect {
        case w: WindowExec
          if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) => w
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q_benford's only global window rides the <=9-row digit aggregate") {
    assert(globalWindows(queries.CoreOlap.qBenford(spark, sf)).size == 1,
      "q_benford global-window count changed")
    // the windowed frame IS the digit aggregate: at most 9 rows
    val digits = Tables.orders(spark, sf)
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .distinct().count()
    assert(digits >= 1 && digits <= 9, s"digit frame has $digits rows")
  }

  test("q_skyline's only global window rides the <=cells-row per-cell min") {
    assert(globalWindows(queries.CoreOlap.qSkyline(spark, sf)).size == 1,
      "q_skyline global-window count changed")
    // cross-cell dominance input = one row per histogram cell
    val o = Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long").as("pc"))
    val probes = (1 until queries.CoreOlap.NtileSplits)
      .map(_.toDouble / queries.CoreOlap.NtileSplits)
    val cells = o
      .crossJoin(broadcast(o.agg(
        expr(s"approx_percentile(pc, array(${probes.mkString(",")}))").as("sps"))))
      .withColumn("cell",
        expr("aggregate(sps, 0, (acc, b) -> acc + IF(pc > b, 1, 0))"))
      .select("cell").distinct().count()
    assert(cells <= queries.CoreOlap.NtileSplits,
      s"skyline cell frame has $cells rows > ${queries.CoreOlap.NtileSplits}")
  }

  test("q_ks_drift (and its sampled twin) hold ZERO unpartitioned or constant-key windows") {
    // the r14 verdict's one `weak`: the corpus cumsum used to ride a
    // lit(1)-keyed window over the |sources|x|values| grid — the
    // whole dense grid through ONE task. The rework computes it on
    // the per-v totals frame via cell-partitioned cumsum + a
    // triangular offset join, so no window anywhere in the plan may
    // be unpartitioned or constant-keyed (the per-source and per-cell
    // windows all carry real keys).
    assert(constantKeyWindows(queries.Quality.qKsDrift(spark, sf)).isEmpty,
      "q_ks_drift regained a constant-key window")
    assert(constantKeyWindows(queries.Quality.qKsDriftSampled(spark, sf)).isEmpty,
      "q_ks_drift_sampled regained a constant-key window")
  }

  test("RankSplit with no groups runs its two global windows over the <=splits-cell offset table") {
    val base = Tables.orders(spark, sf).select(
      col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("pc"))
    val splits = 32
    val ranked = operators.RankSplit.rank(base, Seq.empty, "pc",
      Seq("pc", "o_orderkey"), splits = splits)
    // exactly the offset-table pair (__off cumulation + group total);
    // the per-row rank window stays partitioned by __cell
    assert(globalWindows(ranked).size == 2,
      "RankSplit empty-group global-window count changed")
    // the offset table's cardinality: one row per cell, cells bounded
    // by construction (cell = #split points below pc, of splits-1)
    val probes = (1 until splits).map(_.toDouble / splits)
    val cells = base
      .crossJoin(broadcast(base.agg(
        expr(s"approx_percentile(pc, array(${probes.mkString(",")}))").as("sps"))))
      .withColumn("cell",
        expr("aggregate(sps, 0, (acc, b) -> acc + IF(pc > b, 1, 0))"))
      .select("cell").distinct().count()
    assert(cells <= splits, s"offset table has $cells cells > $splits")
  }
}
