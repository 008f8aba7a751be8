package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate (sketch) aggregations — the shapes that make
  * 100 TB-scale "how many distinct / what's the p95" queries cheap:
  * both sketches build map-side partial state (a HyperLogLog++
  * register set, a KLL/GK quantile summary) and shuffle only the tiny
  * merged sketch per group, never the raw values.
  *
  * Sketch internals are engine-specific (Spark's HLL++ and DuckDB's
  * approx_count_distinct disagree on exact estimates by design), so
  * these are rows-only entries; the accuracy contract is enforced by
  * property specs against the exact answers instead
  * (SketchesSpec: relative error ≤ 5% for distinct, rank error within
  * the declared bound for quantiles).
  */
object Sketches {

  /** Approximate distinct users per event type (HLL++, rsd 2%),
    * alongside the group's row count. One shuffle of sketch state. */
  def qSketchDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct($"user_id", 0.02).as("approx_users"))
      .orderBy($"event_type")
  }

  /** Approximate value quantiles per event type (p50/p95/p99) over
    * the exact-integer c100 domain; accuracy set by the 10k summary. */
  def qSketchQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type", round($"value" * 100).cast("long").as("xc"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(xc, array(0.5, 0.95, 0.99), 10000)").as("q"))
      .select($"event_type", $"n",
        element_at($"q", 1).as("p50_c100"),
        element_at($"q", 2).as("p95_c100"),
        element_at($"q", 3).as("p99_c100"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------
  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_distinct" -> (qSketchDistinct _),
    "q_sketch_quantile" -> (qSketchQuantile _))

  /** Rows-only: sketch estimates are engine-specific by design. */
  val oracles: Map[String, String] = Map.empty
}
