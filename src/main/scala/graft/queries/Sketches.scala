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
  /** Count-Min sketch geometry: [[CmsDepth]] independent hash rows ×
    * 256 buckets (one md5 hex-byte per row). 256×4 = 1 024 counter
    * cells total — the whole sketch shuffles in a few KB no matter
    * how large the corpus is. */
  private val CmsDepth = 4

  /** Point-query probe set: answers are what a CMS is FOR (ask the
    * sketch "how often did `w` occur" without holding the
    * vocabulary). A fixed probe list keeps the query deterministic. */
  private[graft] val CmsProbes = Seq(
    "table", "query", "spark", "scan", "value", "the",
    "vector", "merge", "window", "stream", "batch", "row")

  /** Count-Min sketch word-frequency estimates, with the exact count
    * alongside — the one-sided error contract (estimate ≥ truth,
    * proven per-row by SketchesSpec) made visible.
    *
    * Unlike [[qSketchDistinct]]'s HLL++ this sketch is built from
    * first principles with PORTABLE integer arithmetic — row `i`'s
    * bucket for word `w` is hex byte `substring(md5(w || '#' || i),
    * 1, 2)` — so DuckDB reproduces the cells bit-for-bit and the
    * entry is fully hash-checked, not rows-only.
    *
    * Scale shape: the ×[[CmsDepth]] bucket explode happens map-side
    * and feeds a partial aggregate, so the shuffle carries at most
    * 1 024 (row, bucket) cells per task — never tokens, never the
    * vocabulary. The probe lookup is a broadcast join of
    * |probes|×depth rows against those cells. The exact side is a
    * map-combinable count over the probe-filtered scan. */
  def qSketchCms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
    // (row, bucket) occurrence cells: explode each token into its
    // CmsDepth home buckets, then count — partial agg combines to
    // ≤1024 cells before the shuffle
    val cellCols = (0 until CmsDepth).map { i =>
      struct(lit(i).as("i"),
        substring(md5(concat($"w", lit(s"#$i"))), 1, 2).as("b"))
    }
    val cells = toks
      .select(explode(array(cellCols: _*)).as("c"))
      .groupBy($"c.i".as("i"), $"c.b".as("b"))
      .agg(count(lit(1)).as("cnt"))
    // probe rows: |CmsProbes| × CmsDepth, broadcast to the cells
    val probes = CmsProbes.toDF("word")
      .withColumn("i", explode(array((0 until CmsDepth).map(lit): _*)))
      .withColumn("b",
        substring(md5(concat($"word", lit("#"), $"i".cast("string"))), 1, 2))
    val est = broadcast(probes).join(cells, Seq("i", "b"))
      .groupBy($"word").agg(min($"cnt").as("cms_n"))
    val exact = toks.filter($"w".isInCollection(CmsProbes))
      .groupBy($"w".as("word")).agg(count(lit(1)).as("exact_n"))
    est.join(exact, Seq("word"))
      .select($"word", $"exact_n", $"cms_n")
      .orderBy($"word")
  }

  private val cmsProbesSql =
    CmsProbes.map(w => s"('$w')").mkString(", ")

  /** Identical md5 hex-byte bucket arithmetic in DuckDB — the sketch
    * cells, the probe lookup, and the exact counts all reproduce, so
    * the comparison is a full hash check. */
  val qSketchCmsSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |tk AS (SELECT w FROM toks WHERE w <> ''),
       |cells AS (
       |  SELECT d.i, SUBSTRING(MD5(w || '#' || d.i), 1, 2) AS b,
       |         COUNT(*) AS cnt
       |  FROM tk CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(i)
       |  GROUP BY 1, 2),
       |probes AS (
       |  SELECT p.word, d.i,
       |         SUBSTRING(MD5(p.word || '#' || d.i), 1, 2) AS b
       |  FROM (VALUES $cmsProbesSql) AS p(word)
       |  CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(i)),
       |est AS (
       |  SELECT word, MIN(cnt) AS cms_n
       |  FROM probes JOIN cells USING (i, b) GROUP BY word),
       |exact AS (
       |  SELECT w AS word, COUNT(*) AS exact_n FROM tk
       |  WHERE w IN (${CmsProbes.map(w => s"'$w'").mkString(", ")})
       |  GROUP BY 1)
       |SELECT word, exact_n, cms_n
       |FROM est JOIN exact USING (word)
       |ORDER BY word""".stripMargin

  // ---------------------------------------------------------------
  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_distinct" -> (qSketchDistinct _),
    "q_sketch_quantile" -> (qSketchQuantile _),
    "q_sketch_cms" -> (qSketchCms _))

  /** q_sketch_distinct / q_sketch_quantile stay rows-only (HLL++ and
    * KLL internals are engine-specific by design; accuracy-spec'd
    * against exact answers instead). The CMS is portable integer
    * arithmetic, so it carries a full oracle. */
  val oracles: Map[String, String] = Map(
    "q_sketch_cms" -> qSketchCmsSql)
}
