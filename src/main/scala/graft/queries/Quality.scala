package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality surface over the catalog — the profiling and
  * constraint-validation pass an ingest pipeline runs before it
  * trusts a table (the reference validates its bulk-loads by
  * row-count and spot-query; at warehouse scale this generalizes to
  * per-column profiles and declared-rule checks, cf. Deequ's
  * published design).
  *
  * Both queries are single-scan shapes: the profile is ONE aggregate
  * over the table (plus Spark's Expand for the exact multi-column
  * distinct counts), the constraint check is one aggregate plus one
  * anti-join for the referential rule. At 100 TB the exact distinct
  * columns would switch to the HLL sketch path (`q_sketch_distinct`)
  * — the exact version here is the oracle-checkable contract.
  */
object Quality {

  /** Orders projected to type-normalized profile columns: doubles to
    * exact c100 bigints, timestamps to integer micros, so min/max
    * render identically as strings in both engines. */
  private def o(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir).select(
      $"o_orderkey".as("okey"),
      $"o_custkey".as("cust"),
      $"o_orderstatus".as("status"),
      round($"o_totalprice" * 100).cast("long").as("price_c100"),
      // o_orderdate lands as TIMESTAMP_NTZ; the session TZ is pinned
      // UTC, so the NTZ→TZ cast is the identity and unix_micros
      // equals DuckDB's epoch_us on the same naive value
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("odate_us"),
      $"o_orderpriority".as("prio"))
  }

  // ---------------------------------------------------------------
  /** Per-column profile of `orders`: total rows, null count, exact
    * distinct count, and min/max (stringified — bigint→string is
    * deterministic in both engines) — one long-format row per column. */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Seq("okey", "cust", "status", "price_c100", "odate_us", "prio")
    val aggs = count(lit(1)).as("n_total") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val stackArgs = cols.map { c =>
      s"'$c', n_total, n_total - nn_$c, nd_$c, mn_$c, mx_$c"
    }.mkString(", ")
    o(s, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_total, n_null, n_distinct, min_s, max_s)")
      .orderBy($"col_name")
  }

  val qProfileSql: String = {
    val cols = Seq("okey", "cust", "status", "price_c100", "odate_us", "prio")
    val selects = cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_total,
         |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_s, CAST(MAX($c) AS VARCHAR) AS max_s
         |FROM o""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH o AS (SELECT o_orderkey AS okey, o_custkey AS cust,
       |  o_orderstatus AS status,
       |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c100,
       |  epoch_us(o_orderdate) AS odate_us, o_orderpriority AS prio
       |  FROM orders)
       |$selects
       |ORDER BY col_name""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Declared-rule constraint check: one row per rule with its
    * violation count — the accept/reject gate of an ingest job
    * (domain, range, null, uniqueness, and referential integrity).
    * The four row-local rules share ONE scan (a single aggregate);
    * the referential rule is the usual anti-join on the key. */
  def qConstraints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val local = o(s, dir).agg(
      sum(when($"price_c100" < 0, 1L).otherwise(0L)).as("v_price_nonneg"),
      sum(when(!$"status".isin("O", "F", "P"), 1L).otherwise(0L)).as("v_status_domain"),
      sum(when($"cust".isNull, 1L).otherwise(0L)).as("v_cust_notnull"),
      (count(lit(1)) - countDistinct($"okey")).as("v_orderkey_unique"))
      .selectExpr("stack(4, " +
        "'price_nonneg', v_price_nonneg, " +
        "'status_domain', v_status_domain, " +
        "'cust_notnull', v_cust_notnull, " +
        "'orderkey_unique', v_orderkey_unique) AS (rule, n_violations)")
    val orphan = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("cust_referential").as("rule"), $"n_violations")
    local.unionByName(orphan).orderBy($"rule")
  }

  val qConstraintsSql: String =
    """WITH o AS (SELECT o_orderkey AS okey, o_custkey AS cust,
      |  o_orderstatus AS status,
      |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_c100
      |  FROM orders)
      |SELECT 'price_nonneg' AS rule,
      |  CAST(SUM(CASE WHEN price_c100 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM o
      |UNION ALL
      |SELECT 'status_domain',
      |  CAST(SUM(CASE WHEN status NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM o
      |UNION ALL
      |SELECT 'cust_notnull',
      |  CAST(SUM(CASE WHEN cust IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM o
      |UNION ALL
      |SELECT 'orderkey_unique', COUNT(*) - COUNT(DISTINCT okey) FROM o
      |UNION ALL
      |SELECT 'cust_referential', COUNT(*) FROM orders o2
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o2.o_custkey)
      |ORDER BY rule""".stripMargin

  // ---------------------------------------------------------------
  /** Hashed-feature linear classifier (the fastText-shaped quality
    * filter of DCLM/FineWeb-style pipelines): every token hashes to a
    * signed integer weight, the doc's score is the sum, and the gate
    * keeps docs scoring above a mean-per-token threshold. Here the
    * "model" is a pure hash function — weight(w) = ascii of md5(w)'s
    * first hex char, centered at its expectation (70 = mean ascii of
    * a uniform hex digit: (48..57, 97..102)/16) — i.e. a deterministic
    * random projection; swapping in trained weights changes the
    * lookup, not the plan.
    *
    * Scale shape: the weight is a function OF THE TOKEN, so there is
    * no vocabulary table, no join, no shuffle — one higher-order
    * `aggregate` fold per row inside a single codegen stage; the
    * presentation sort is the only exchange. At 100 TB this is the
    * cheapest possible gate: one streaming pass. */
  val QcMeanX1000 = 125L

  def qQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .select($"doc_id", size($"toks").as("n_toks"),
        expr("aggregate(toks, 0L, (acc, x) -> " +
          "acc + ascii(substring(md5(x), 1, 1)) - 70)").as("score"))
      .withColumn("keep", ($"score" * 1000 >= $"n_toks" * QcMeanX1000).cast("int"))
      .orderBy($"doc_id")
  }

  val qQualityClassifierSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  list_filter(string_split(text, ' '), x -> x != '') AS toks
       |  FROM documents)
       |SELECT doc_id, CAST(len(toks) AS INT) AS n_toks,
       |  CAST(COALESCE(list_sum(list_transform(toks,
       |    x -> ascii(substring(md5(x), 1, 1)) - 70)), 0) AS BIGINT) AS score,
       |  CAST(CAST(COALESCE(list_sum(list_transform(toks,
       |    x -> ascii(substring(md5(x), 1, 1)) - 70)), 0) AS BIGINT) * 1000
       |    >= len(toks) * $QcMeanX1000 AS INT) AS keep
       |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Flag threshold: a source drifts when its KS distance from the
    * rest of the corpus exceeds 0.10. */
  val KsThreshMilli = 100L

  /** Per-source distribution drift as the EXACT two-sample
    * Kolmogorov–Smirnov statistic over the document-length (n_chars)
    * distribution: each source A against the rest of the corpus B,
    * `D = max_v |F_A(v) − F_B(v)|` kept in integer space as
    * `d_num = max_v |cumA(v)·n_B − cumB(v)·n_A|` (bigint exact;
    * `D = d_num/(n_A·n_B)` is the single IEEE division) — the
    * ingest-gate check that a new crawl slice hasn't shifted shape
    * even when its mean looks fine (q_value_drift's TV distance
    * needs pre-chosen buckets; KS is bucket-free and catches shifts
    * TV smears). The drift flag compares in pure integers
    * (`1000·d_num > thresh·n_A·n_B`).
    *
    * Scale shape: one combinable (source, value) histogram aggregate
    * — the corpus never moves, only |sources|×|distinct lengths|
    * cells — then a broadcast dense grid (distinct values × sources)
    * so every source's CDF is evaluated at EVERY corpus value (a
    * source missing a value still steps there), cumsums as one
    * source-partitioned window over that tiny grid, and a broadcast
    * per-source-totals join. `cumB = cumTotal − cumA` avoids ever
    * building the complement's histogram. Bigint bounds: products
    * stay under 2^63 up to ~3·10^9 docs/side; past that the same
    * query runs on a pre-sampled slice (the published KS n for 1e-3
    * sensitivity is far smaller anyway). */
  def qKsDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = Tables.documents(s, dir)
      .groupBy($"source", $"n_chars".as("v"))
      .agg(count(lit(1)).as("c"))
    // dense grid: every (source, corpus-distinct value) cell, count 0
    // where the source lacks the value — both factors are tiny
    // aggregates of the histogram, so the grid never touches documents
    val grid = broadcast(hist.select($"v").distinct())
      .crossJoin(broadcast(hist.select($"source").distinct()))
      .join(hist, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c"))
    val wcum = Window.partitionBy($"source").orderBy($"v")
    val wtot = Window.partitionBy($"vv").orderBy($"v")
    val cums = grid
      .withColumn("cum_a", sum($"c").over(wcum))
      .withColumn("vv", lit(1))
      .withColumn("cum_t", sum($"c").over(wtot))
      // every source sees every v, so at each v the total cumulative
      // count is |sources| × the per-source grid's share — divide out
      // by counting each v once: cum_t over the grid counts all
      // sources' cells up to v, which IS the corpus cumulative count
      .drop("vv")
    val tot = hist.groupBy($"source").agg(sum($"c").as("n_a"))
      .withColumn("n_t", sum($"n_a").over(Window.partitionBy(lit(1))))
    cums.join(broadcast(tot), Seq("source"))
      .select($"source", $"n_a", ($"n_t" - $"n_a").as("n_b"),
        abs($"cum_a" * ($"n_t" - $"n_a") -
          ($"cum_t" - $"cum_a") * $"n_a").as("dn"))
      .groupBy($"source", $"n_a", $"n_b")
      .agg(max($"dn").as("d_num"))
      .withColumn("d_val",
        $"d_num".cast("double") / ($"n_a".cast("double") * $"n_b"))
      .withColumn("drift",
        (lit(1000L) * $"d_num" > lit(KsThreshMilli) * $"n_a" * $"n_b")
          .cast("int"))
      .orderBy($"source")
  }

  /** Oracle twin — same dense grid, same integer cumsum identity. */
  val qKsDriftSql: String =
    s"""WITH h AS (SELECT source, n_chars AS v, COUNT(*) AS c
       |  FROM documents GROUP BY 1, 2),
       |grid AS (SELECT sv.source, vv.v, COALESCE(h.c, 0) AS c
       |  FROM (SELECT DISTINCT source FROM h) sv
       |  CROSS JOIN (SELECT DISTINCT v FROM h) vv
       |  LEFT JOIN h ON h.source = sv.source AND h.v = vv.v),
       |cums AS (SELECT source, v, c,
       |    SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum_a,
       |    SUM(c) OVER (ORDER BY v) AS cum_t
       |  FROM grid),
       |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_a
       |  FROM h GROUP BY 1),
       |tt AS (SELECT CAST(SUM(n_a) AS BIGINT) AS n_t FROM tot),
       |d AS (SELECT c.source, t.n_a, tt.n_t - t.n_a AS n_b,
       |    ABS(c.cum_a * (tt.n_t - t.n_a)
       |      - (c.cum_t - c.cum_a) * t.n_a) AS dn
       |  FROM cums c JOIN tot t ON c.source = t.source CROSS JOIN tt)
       |SELECT source, n_a, n_b, CAST(MAX(dn) AS BIGINT) AS d_num,
       |  CAST(MAX(dn) AS DOUBLE)
       |    / (CAST(n_a AS DOUBLE) * n_b) AS d_val,
       |  CAST(1000 * MAX(dn) > $KsThreshMilli * n_a * n_b AS INT) AS drift
       |FROM d GROUP BY 1, 2, 3 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  /** Vector-table ingest gate — the QA pass a pipeline runs on an
    * embedding table before building ANY index over it (a zero
    * vector poisons cosine similarity with NaN, a ragged dimension
    * breaks every kernel, a norm-collapsed label signals an encoder
    * regression): per label, count, dimension min/max (equal ⇔
    * rectangular), exact integer-scaled norm² min/max, zero-vector
    * count, and the RMS norm.
    *
    * Cross-engine discipline: components go through the house
    * integer-scaling (round(x·10⁷) — [[graft.functions.VectorOps]]),
    * so norm² is exact bigint via the IntVecNormSq codegen kernel
    * (≡ DuckDB's unnest + SUM(vi·vi)); the RMS is one fixed double
    * chain over the exact sums.
    *
    * Scale shape: one scan, per-row O(dim) kernel work, one
    * combinable label aggregate — no shuffle beyond the |labels|-cell
    * reduction. */
  def qEmbeddingQa(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorOps
    Tables.embeddings(s, dir)
      .withColumn("iv", VectorOps.intVec("embedding"))
      .withColumn("dim", expr("CAST(size(embedding) AS BIGINT)"))
      .withColumn("nrm", VectorOps.normSq("iv"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        min($"dim").as("dim_min"), max($"dim").as("dim_max"),
        min($"nrm").as("min_nrm"), max($"nrm").as("max_nrm"),
        sum(when($"nrm" === 0L, 1L).otherwise(0L)).as("n_zero"),
        sum($"nrm".cast("decimal(38,0)")).as("_sum_nrm"))
      .withColumn("rms_norm",
        sqrt($"_sum_nrm".cast("double") / $"n_vecs".cast("double")) /
          lit(10000000.0))
      .select($"label", $"n_vecs", $"dim_min", $"dim_max", $"min_nrm",
        $"max_nrm", $"n_zero", $"rms_norm")
      .orderBy($"label")
  }

  /** Oracle twin: same integer scaling, hugeint-exact sums, the
    * identical RMS chain. */
  val qEmbeddingQaSql: String =
    s"""WITH u AS (SELECT vec_id,
       |    CAST(ROUND(CAST(v AS DOUBLE)
       |      * ${graft.functions.VectorOps.ScaleLit}) AS BIGINT) AS vi
       |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)),
       |n AS (SELECT vec_id, CAST(SUM(vi*vi) AS BIGINT) AS nrm,
       |    COUNT(*) AS dim
       |  FROM u GROUP BY 1),
       |j AS (SELECT e.label, n.nrm, n.dim
       |  FROM embeddings e JOIN n USING (vec_id))
       |SELECT label, COUNT(*) AS n_vecs,
       |  MIN(dim) AS dim_min, MAX(dim) AS dim_max,
       |  MIN(nrm) AS min_nrm, MAX(nrm) AS max_nrm,
       |  CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_zero,
       |  SQRT(CAST(SUM(nrm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
       |    / CAST(${graft.functions.VectorOps.ScaleLit} AS DOUBLE)
       |    AS rms_norm
       |FROM j GROUP BY label ORDER BY label""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> (qProfile _),
    "q_constraints" -> (qConstraints _),
    "q_quality_classifier" -> (qQualityClassifier _),
    "q_ks_drift" -> (qKsDrift _),
    "q_embedding_qa" -> (qEmbeddingQa _))

  val oracles: Map[String, String] = Map(
    "q_profile" -> qProfileSql,
    "q_constraints" -> qConstraintsSql,
    "q_quality_classifier" -> qQualityClassifierSql,
    "q_ks_drift" -> qKsDriftSql,
    "q_embedding_qa" -> qEmbeddingQaSql)
}
