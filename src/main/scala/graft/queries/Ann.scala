package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * - Brute force: the (tiny) query set is broadcast against one
  *   corpus scan — no corpus shuffle for candidate generation; top-k
  *   extraction is a two-phase salted window (parallel partial top-k,
  *   then a final top-k over ≤ 64·k survivors per query), so no
  *   single task ever sorts a whole query's candidate list.
  * - Sign-LSH: candidates pruned to the query's sign bucket — plus
  *   its flip-1-bit neighbor buckets (multi-probe, the standard
  *   recall lever: a query near a hyperplane boundary finds matches
  *   that landed just across it). The probe set is exploded on the
  *   tiny broadcast query side, so the corpus still sees ONE
  *   equi-join on its bucket key — the 100 TB path (scan prunes to
  *   matching buckets when the corpus is bucket-partitioned).
  *
  * Cosines are computed from integer-scaled vectors (VectorOps), so
  * both engines produce bit-identical doubles and the DuckDB oracle
  * hash-matches exactly — including the rank order.
  */
object Ann {

  private val K = 10
  private[graft] val NQueries = 5

  /** Flip-1-bit multi-probe: the bucket itself plus one probe per
    * plane. 0 extra probes = exact-bucket LSH. */
  def probeBuckets(bucket: org.apache.spark.sql.Column, nPlanes: Int): org.apache.spark.sql.Column =
    array((bucket +: (0 until nPlanes).map(j => bucket.bitwiseXOR(lit(1 << j)))): _*)

  private def scored(s: SparkSession, dir: String, useBuckets: Boolean,
    multiProbe: Boolean): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).select(
      $"vec_id",
      VectorOps.intVec("embedding").as("iv"),
      VectorOps.signBucket("embedding", Dedup.BucketDims).as("bucket"))
      .withColumn("nrm", VectorOps.normSq("iv"))
    val q = e.filter($"vec_id" < NQueries).select(
      $"vec_id".as("qid"), $"iv".as("qiv"), $"nrm".as("qnrm"),
      $"bucket".as("qbucket"))
    val joined =
      if (useBuckets && multiProbe) {
        // explode the probe set on the tiny query side; corpus-side key
        // stays the plain bucket (prunable at the scan when partitioned)
        val probes = q.withColumn("probe",
          explode(probeBuckets($"qbucket", Dedup.BucketDims.size)))
        e.join(broadcast(probes), $"bucket" === $"probe" && $"vec_id" =!= $"qid")
      } else if (useBuckets)
        e.join(broadcast(q), $"bucket" === $"qbucket" && $"vec_id" =!= $"qid")
      else
        e.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
    joined
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"qnrm", $"nrm"))
      .select($"qid", $"vec_id".as("vid"), $"dot", $"cosine")
  }

  /** Two-phase salted top-[[K]] per query under a caller-chosen
    * total order — ONE copy of the salting/K discipline for every
    * ranking surface (cosine searches and the MIPS dot ranking; the
    * PQ candidate stage keeps its own [[topByAdc]] variant because
    * its k and output contract differ). */
  private def topKBy(df: DataFrame, order: Seq[Column],
    out: Seq[Column]): DataFrame = {
    import df.sparkSession.implicits._
    val w1 = Window.partitionBy($"qid", $"salt").orderBy(order: _*)
    val w2 = Window.partitionBy($"qid").orderBy(order: _*)
    df.withColumn("salt", pmod($"vid", lit(64)))
      .withColumn("prn", row_number().over(w1)).filter($"prn" <= K)
      .withColumn("rnk", row_number().over(w2)).filter($"rnk" <= K)
      .select(out :+ col("rnk"): _*)
      .orderBy($"qid", $"rnk")
  }

  /** The cosine form (rank ties broken by vid). */
  private def topK(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    topKBy(df, Seq($"cosine".desc, $"vid"),
      Seq($"qid", $"vid", $"dot", $"cosine"))
  }

  def qAnnBruteforce(s: SparkSession, dir: String): DataFrame =
    topK(scored(s, dir, useBuckets = false, multiProbe = false))

  /** FILTERED vector search — the tenant/category-scoped idiom every
    * production vector store serves ("top-k among vectors WHERE
    * label = ?"): each query ranks only corpus vectors sharing its
    * label, filter-THEN-search (the predicate joins before any
    * scoring, so no post-filter recall loss — search-then-filter
    * returns fewer than k when the filter is selective).
    *
    * Scale shape: the label predicate rides the equi-join key, so at
    * rest a label-partitioned layout prunes the scan to the query's
    * slice (the IVF-list discipline applied to a metadata column) and
    * the scored candidate set is the label slice, not the corpus;
    * scoring and top-k are the [[qAnnBruteforce]] machinery (query
    * side broadcast, two-phase salted top-k). */
  def qAnnFiltered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).select($"vec_id", $"label",
      VectorOps.intVec("embedding").as("iv"))
      .withColumn("nrm", VectorOps.normSq("iv"))
    val q = e.filter($"vec_id" < NQueries).select(
      $"vec_id".as("qid"), $"label".as("qlabel"),
      $"iv".as("qiv"), $"nrm".as("qnrm"))
    topK(e.join(broadcast(q), $"label" === $"qlabel" && $"vec_id" =!= $"qid")
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"qnrm", $"nrm"))
      .select($"qid", $"vec_id".as("vid"), $"dot", $"cosine"))
  }

  /** Exact-bucket (single-probe) variant — kept for the recall spec. */
  def annLshSingleProbe(s: SparkSession, dir: String): DataFrame =
    topK(scored(s, dir, useBuckets = true, multiProbe = false))

  // ---------------------------------------------------------------
  /** Cosine floor (milli) of the RANGE search. Corpus-calibrated the
    * way any production radius is (the q_dedup_threshold_curve
    * discipline — read the similarity histogram, cut above the random
    * bulk): this synthetic corpus's random-pair cosines bulk below
    * ~0.3 and its closest neighborhoods reach ~0.48, so 0.32 returns
    * the genuine top neighborhoods (a handful of rows per probe at
    * every test SF) without dragging in the bulk. */
  val RangeTauMilli = 320L

  /** THRESHOLD (range/radius) similarity search — the second search
    * semantics every production vector store serves beside top-k
    * ("every vector with cosine ≥ τ", the dedup / recommendation /
    * entity-resolution shape): top-k bounds the RESULT SIZE, range
    * bounds the SIMILARITY, and a dense neighborhood legitimately
    * returns more than k rows while a sparse one returns none — no
    * rank machinery can express that.
    *
    * The membership test never touches a float: cos ≥ τ ⟺ dot > 0 ∧
    * 10⁶·dot² ≥ τ²·|q|²·|v|² in exact decimal(38,0)/hugeint integer
    * arithmetic (dot ≤ 6.4·10¹⁵ at dim 64 ⇒ every product < 10³⁸),
    * so the result SET is bit-exact cross-engine — the reported
    * cosine double is the usual fixed chain, for reading only.
    *
    * Scale shape: the probe set broadcasts against ONE corpus scan
    * (the [[qAnnBruteforce]] discipline) and the threshold filter is
    * a per-row codegen predicate — no shuffle at all before the
    * presentation sort. At 100 TB the same query composes with the
    * sign-bucket prefilter exactly as [[qAnnLsh]] does, trading the
    * guaranteed-exact set for bucket recall — registered exact
    * because range semantics define correctness by the THRESHOLD, and
    * the recall-telemetry discipline (q_ann_recall*) already covers
    * the approximate families. */
  def qAnnRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).select($"vec_id",
      VectorOps.intVec("embedding").as("iv"))
      .withColumn("nrm", VectorOps.normSq("iv"))
    val q = e.filter($"vec_id" < NQueries).select(
      $"vec_id".as("qid"), $"iv".as("qiv"), $"nrm".as("qnrm"))
    val tau2 = RangeTauMilli * RangeTauMilli
    e.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .filter($"dot" > 0 && expr(
        s"CAST(1000000 AS DECIMAL(38,0)) * dot * dot >= " +
          s"CAST($tau2 AS DECIMAL(38,0)) * qnrm * nrm"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"qnrm", $"nrm"))
      .select($"qid", $"vec_id".as("vid"), $"dot", $"cosine")
      .orderBy($"qid", $"cosine".desc, $"vid")
  }

  /** The 100-TB execution path of [[qAnnRange]] as its own
    * hash-checked entry (the q_ks_drift_sampled discipline — the
    * scale story as a verified query, not a comment): the SAME
    * integer threshold membership evaluated only over the sign-bucket
    * multi-probe candidates ([[qAnnLsh]]'s candidate generation — the
    * corpus joins ONE bucket key, prunable at the scan when
    * bucket-partitioned), trading the guaranteed-exact set for
    * bucket recall. [[qAnnRangeRecall]] watches that trade. */
  def qAnnRangeLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).select($"vec_id",
      VectorOps.intVec("embedding").as("iv"),
      VectorOps.signBucket("embedding", Dedup.BucketDims).as("bucket"))
      .withColumn("nrm", VectorOps.normSq("iv"))
    val q = e.filter($"vec_id" < NQueries).select(
      $"vec_id".as("qid"), $"iv".as("qiv"), $"nrm".as("qnrm"),
      $"bucket".as("qbucket"))
    val probes = q.withColumn("probe",
      explode(probeBuckets($"qbucket", Dedup.BucketDims.size)))
    val tau2 = RangeTauMilli * RangeTauMilli
    e.join(broadcast(probes), $"bucket" === $"probe" && $"vec_id" =!= $"qid")
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .filter($"dot" > 0 && expr(
        s"CAST(1000000 AS DECIMAL(38,0)) * dot * dot >= " +
          s"CAST($tau2 AS DECIMAL(38,0)) * qnrm * nrm"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"qnrm", $"nrm"))
      .select($"qid", $"vec_id".as("vid"), $"dot", $"cosine")
      .orderBy($"qid", $"cosine".desc, $"vid")
  }

  /** Range-recall telemetry: how much of the exact above-threshold
    * set the bucketed range search retains, per probe — the eval
    * loop that makes [[qAnnRangeLsh]] deployable (the q_ann_recall
    * discipline applied to threshold semantics; a probe whose exact
    * set is empty has no recall row). */
  def qAnnRangeRecall(s: SparkSession, dir: String): DataFrame =
    recallOf(qAnnRange(s, dir), qAnnRangeLsh(s, dir))

  /** Shared CTE prefix of every range oracle: integer-scaled
    * components and norms (plus sign buckets when probing). */
  private def rangeBaseCtes(withBuckets: Boolean): String = {
    val bucket = VectorOps.Sql.signBucket("embedding", Dedup.BucketDims)
    val b = if (withBuckets)
      s",\nb AS (SELECT vec_id, $bucket AS bucket FROM embeddings)" else ""
    s"""e AS (
       |  SELECT vec_id, i, CAST(ROUND(CAST(v AS DOUBLE) * ${VectorOps.ScaleLit}) AS BIGINT) AS vi
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |n AS (SELECT vec_id, SUM(vi * vi) AS nrm FROM e GROUP BY vec_id)$b"""
      .stripMargin
  }

  /** The suffix-parameterized range candidate + membership CTE chain
    * (pair$sfx → d$sfx → f$sfx), shared verbatim by the exact, the
    * bucketed, and the recall oracles — the sqlRerankCtes
    * discipline: a predicate or chain change lands everywhere or
    * nowhere. */
  private def rangeSetCtes(sfx: String, bucketJoin: Boolean): String = {
    val tau2 = RangeTauMilli * RangeTauMilli
    val probeMasks = Dedup.BucketDims.indices.map(1 << _).mkString(", ")
    val bucketCond = if (bucketJoin)
      s"""
         |           AND xor(bq.bucket, bv.bucket) IN (0, $probeMasks)""".stripMargin
    else ""
    val src = if (bucketJoin) "b" else "(SELECT vec_id FROM embeddings)"
    s"""pair$sfx AS (SELECT bq.vec_id AS qid, bv.vec_id AS vid
       |         FROM $src bq JOIN $src bv ON bq.vec_id < $NQueries
       |           AND bv.vec_id <> bq.vec_id$bucketCond),
       |d$sfx AS (SELECT pair$sfx.qid, pair$sfx.vid, CAST(SUM(ea.vi * eb.vi) AS BIGINT) AS dot
       |      FROM pair$sfx JOIN e ea ON ea.vec_id = pair$sfx.qid
       |                JOIN e eb ON eb.vec_id = pair$sfx.vid AND eb.i = ea.i
       |      GROUP BY 1, 2),
       |f$sfx AS (SELECT d$sfx.qid, d$sfx.vid, d$sfx.dot,
       |        CAST(d$sfx.dot AS DOUBLE)
       |          / (SQRT(CAST(nq.nrm AS DOUBLE)) * SQRT(CAST(nv.nrm AS DOUBLE))) AS cosine
       |      FROM d$sfx JOIN n nq ON nq.vec_id = d$sfx.qid
       |             JOIN n nv ON nv.vec_id = d$sfx.vid
       |      WHERE d$sfx.dot > 0
       |        AND 1000000::HUGEINT * d$sfx.dot * d$sfx.dot
       |          >= $tau2::HUGEINT * nq.nrm * nv.nrm)""".stripMargin
  }

  /** Oracle twin: same integer membership predicate in hugeint, same
    * cosine chain. */
  val qAnnRangeSql: String =
    s"""WITH ${rangeBaseCtes(withBuckets = false)},
       |${rangeSetCtes("", bucketJoin = false)}
       |SELECT qid, vid, dot, cosine FROM f
       |ORDER BY qid, cosine DESC, vid""".stripMargin

  // ---------------------------------------------------------------
  /** MAX-INNER-PRODUCT search (MIPS) — the THIRD search semantics
    * beside cosine top-k and threshold/range, and the one recommender
    * retrieval actually runs (user · item raw dot: a long item vector
    * legitimately outranks a better-aligned short one — cosine
    * deliberately erases exactly the magnitude signal MIPS keys on;
    * published reductions to cosine-ANN append a norm dimension, but
    * the SEMANTICS is its own contract and gets its own entry): per
    * query vector, top-k corpus vectors by the raw scaled-integer dot
    * product. The ENTIRE ranking is exact int64 (dot of two ×10⁷
    * fixed-point vectors — no float anywhere, not even for display
    * ordering), so ranks are bit-exact cross-engine by construction —
    * the strongest hash-stability class in the ANN family.
    *
    * Scale shape: the [[qAnnBruteforce]] discipline — query side
    * broadcast against ONE corpus scan, per-row codegen dot, salted
    * two-phase top-k (never a whole-corpus sort). */
  def qAnnMips(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mipsOver(Tables.embeddings(s, dir).select($"vec_id",
      VectorOps.intVec("embedding").as("iv")))
  }

  /** Plan body over any (vec_id, iv) frame — factored so the spec
    * can drive a deliberately NON-normalized fixture through it (the
    * test corpus is unit-norm, where MIPS and cosine rankings
    * coincide by construction; the magnitude semantics needs vectors
    * whose lengths differ to show itself). */
  private[graft] def mipsOver(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val q = e.filter($"vec_id" < NQueries)
      .select($"vec_id".as("qid"), $"iv".as("qiv"))
    val scoredDot = e.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .select($"qid", $"vec_id".as("vid"), $"dot")
    topKBy(scoredDot, Seq($"dot".desc, $"vid"),
      Seq($"qid", $"vid", $"dot"))
  }

  /** Oracle twin: the shared element CTE, integer dot, integer rank. */
  val qAnnMipsSql: String =
    s"""WITH ${rangeBaseCtes(withBuckets = false)},
       |pair AS (SELECT bq.vec_id AS qid, bv.vec_id AS vid
       |         FROM (SELECT vec_id FROM embeddings) bq
       |         JOIN (SELECT vec_id FROM embeddings) bv
       |           ON bq.vec_id < $NQueries AND bv.vec_id <> bq.vec_id),
       |dm AS (SELECT pair.qid, pair.vid, CAST(SUM(ea.vi * eb.vi) AS BIGINT) AS dot
       |      FROM pair JOIN e ea ON ea.vec_id = pair.qid
       |                JOIN e eb ON eb.vec_id = pair.vid AND eb.i = ea.i
       |      GROUP BY 1, 2),
       |rm AS (SELECT qid, vid, dot,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, vid) AS rnk
       |  FROM dm)
       |SELECT qid, vid, dot, rnk FROM rm
       |WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin

  // ---------------------------------------------------------------
  /** Upper cosine bound (milli) of the hard-negative band: above it
    * a neighbor is a near-duplicate (a FALSE negative for a
    * contrastive objective), below [[RangeTauMilli]] it is too easy
    * to teach anything. */
  val NegHiMilli = 900L

  /** HARD-NEGATIVE mining — the contrastive-training data op every
    * embedding pipeline runs (DPR/Contriever shape: for each anchor,
    * the most similar corpus items that are NOT the same content
    * make the strongest training signal): per query vector, the
    * top-k neighbors inside the similarity BAND
    * [[[RangeTauMilli]], [[NegHiMilli]]) — the floor drops
    * uninformative easy negatives, the cap drops near-duplicates
    * that would be false negatives. BOTH band edges are the
    * [[qAnnRange]] exact integer predicate (decimal(38,0)/hugeint —
    * no float ever decides membership), so the banded SET is
    * bit-exact cross-engine; ranking inside the band is the
    * [[qAnnBruteforce]] salted two-phase top-k.
    *
    * Scale shape: one broadcast probe pass over the corpus scan with
    * a per-row codegen band predicate (no shuffle before the
    * top-k); at 100 TB the band test composes with the sign-bucket
    * candidate generation exactly as [[qAnnRangeLsh]] does. */
  def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).select($"vec_id",
      VectorOps.intVec("embedding").as("iv"))
      .withColumn("nrm", VectorOps.normSq("iv"))
    val q = e.filter($"vec_id" < NQueries).select(
      $"vec_id".as("qid"), $"iv".as("qiv"), $"nrm".as("qnrm"))
    val lo2 = RangeTauMilli * RangeTauMilli
    val hi2 = NegHiMilli * NegHiMilli
    topK(e.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .filter($"dot" > 0 && expr(
        s"CAST(1000000 AS DECIMAL(38,0)) * dot * dot >= " +
          s"CAST($lo2 AS DECIMAL(38,0)) * qnrm * nrm") && expr(
        s"CAST(1000000 AS DECIMAL(38,0)) * dot * dot < " +
          s"CAST($hi2 AS DECIMAL(38,0)) * qnrm * nrm"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"qnrm", $"nrm"))
      .select($"qid", $"vec_id".as("vid"), $"dot", $"cosine"))
  }

  /** Oracle twin: the range base CTEs, the band predicate on both
    * edges in hugeint, the brute-force rank tail. */
  val qHardNegativesSql: String = {
    val lo2 = RangeTauMilli * RangeTauMilli
    val hi2 = NegHiMilli * NegHiMilli
    s"""WITH ${rangeBaseCtes(withBuckets = false)},
       |pair AS (SELECT bq.vec_id AS qid, bv.vec_id AS vid
       |         FROM (SELECT vec_id FROM embeddings) bq
       |         JOIN (SELECT vec_id FROM embeddings) bv
       |           ON bq.vec_id < $NQueries AND bv.vec_id <> bq.vec_id),
       |db AS (SELECT pair.qid, pair.vid, CAST(SUM(ea.vi * eb.vi) AS BIGINT) AS dot
       |      FROM pair JOIN e ea ON ea.vec_id = pair.qid
       |                JOIN e eb ON eb.vec_id = pair.vid AND eb.i = ea.i
       |      GROUP BY 1, 2),
       |fb AS (SELECT db.qid, db.vid, db.dot,
       |        CAST(db.dot AS DOUBLE)
       |          / (SQRT(CAST(nq.nrm AS DOUBLE)) * SQRT(CAST(nv.nrm AS DOUBLE))) AS cosine
       |      FROM db JOIN n nq ON nq.vec_id = db.qid
       |             JOIN n nv ON nv.vec_id = db.vid
       |      WHERE db.dot > 0
       |        AND 1000000::HUGEINT * db.dot * db.dot
       |          >= $lo2::HUGEINT * nq.nrm * nv.nrm
       |        AND 1000000::HUGEINT * db.dot * db.dot
       |          < $hi2::HUGEINT * nq.nrm * nv.nrm),
       |rb AS (SELECT qid, vid, dot, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rnk
       |  FROM fb)
       |SELECT qid, vid, dot, cosine, rnk FROM rb
       |WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin
  }

  val qAnnRangeLshSql: String =
    s"""WITH ${rangeBaseCtes(withBuckets = true)},
       |${rangeSetCtes("", bucketJoin = true)}
       |SELECT qid, vid, dot, cosine FROM f
       |ORDER BY qid, cosine DESC, vid""".stripMargin

  val qAnnRangeRecallSql: String =
    s"""WITH ${rangeBaseCtes(withBuckets = true)},
       |${rangeSetCtes("x", bucketJoin = false)},
       |${rangeSetCtes("l", bucketJoin = true)}
       |SELECT fx.qid, COUNT(*) AS n_exact,
       |  CAST(SUM(CASE WHEN fl.vid IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_match,
       |  CAST((100 * SUM(CASE WHEN fl.vid IS NOT NULL THEN 1 ELSE 0 END))
       |    // COUNT(*) AS BIGINT) AS recall_pct
       |FROM fx LEFT JOIN fl ON fl.qid = fx.qid AND fl.vid = fx.vid
       |GROUP BY 1 ORDER BY 1""".stripMargin

  def qAnnLsh(s: SparkSession, dir: String): DataFrame =
    topK(scored(s, dir, useBuckets = true, multiProbe = true))

  // ---------------------------------------------------------------
  private val NCentroids = 8
  private val NProbe = 2

  /** IVF-style ANN with a TRAINED deterministic codebook.
    *
    * The coarse quantizer is [[ivfTrain]]: integer Lloyd over a
    * deterministic seed (the embedding rows with vec_id in [NQueries,
    * NQueries+NCentroids)). At scale the train step runs once offline
    * and ships its codebook to every executor exactly as done here
    * (the tiny driver-side collect is the model parameters, not
    * data-plane); the DuckDB oracle re-derives the identical codebook
    * by unrolling the same integer iterations in SQL.
    *
    * Phase shapes (the 100 TB path):
    *  1. assign: per-row argmax over the LITERAL codebook (baked into
    *     the plan as constant arrays) — one corpus scan, zero shuffle;
    *     at rest the assigned list id is the partition key, so probing
    *     prunes at the scan.
    *  2. probe: each query scores the same codebook and keeps its
    *     NProbe nearest lists (recall lever, like LSH multi-probe).
    *  3. exact integer-cosine re-rank of candidates in the probed
    *     lists only (~NProbe/NCentroids of the corpus), then the same
    *     two-phase salted top-k as brute force.
    *
    * Tie-breaking is (cosine desc, centroid id asc) everywhere, via
    * struct ordering on (cos, -cid) — bit-identical to the oracle's
    * ROW_NUMBER, since cosines are exact-integer-derived doubles. */
  /** Seed codebook for the coarse quantizer: the embedding rows with
    * vec_id in [NQueries, NQueries+NCentroids), cid = vec_id — the
    * deterministic k-means++-stand-in initializer. */
  private[graft] def ivfSeed(e: DataFrame): Seq[(Long, Seq[Long], Long)] = {
    import e.sparkSession.implicits._
    e.filter($"vec_id" >= NQueries && $"vec_id" < NQueries + NCentroids)
      .orderBy($"vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
  }

  /** [[ivfSeed]] from an already-collected corpus head ([[pqHead]]) —
    * identical rows, zero extra jobs. */
  private[graft] def ivfSeedOf(
    head: Seq[(Long, Seq[Long], Long)]): Seq[(Long, Seq[Long], Long)] =
    head.filter(r => r._1 >= NQueries && r._1 < NQueries + NCentroids)

  private[graft] val IvfIters = 2

  /** Trained IVF coarse quantizer: [[IvfIters]] integer Lloyd
    * iterations over the seed. Assignment is (cosine desc, cid asc) —
    * IDENTICAL to search-time list assignment, so training clusters
    * under the same geometry searches use — and the update is the
    * per-dimension integer floor-average of the members (an empty
    * list keeps its previous centroid). Sums/counts are exact
    * order-independent bigints → the codebook is bit-deterministic
    * under any partitioning, and the DuckDB oracle re-derives it
    * exactly by unrolling the same iterations in SQL. Per iteration:
    * one corpus scan + a combinable (NCentroids × dims)-key
    * aggregate; the collect is the codebook, not data-plane. */
  private[graft] def ivfTrain(e: DataFrame, iters: Int = IvfIters,
    pin: Boolean = true): Seq[(Long, Seq[Long], Long)] =
    ivfTrainFrom(e, null, iters, pin)

  /** The Lloyd loop from a given seed codebook (null → collect the
    * seed here) — callers that already collected the head
    * ([[pqHead]]) pass [[ivfSeedOf]]'s result and skip the seed
    * scan. */
  private[graft] def ivfTrainFrom(e: DataFrame,
    seed: Seq[(Long, Seq[Long], Long)], iters: Int = IvfIters,
    pin: Boolean = true): Seq[(Long, Seq[Long], Long)] = {
    import e.sparkSession.implicits._
    // training makes iters+1 passes over the corpus frame (each seed/
    // assignment scan re-derives intVec from parquet otherwise); pin
    // it for the duration — the train working set, released before
    // any data-plane query runs. Callers that keep using the frame
    // right after training (the IVFADC builds re-scan it for the
    // residual encode) pass pin=false and own the persist lifetime.
    val pinned = if (pin) e.persist() else e
    try {
      var cents = if (seed != null) seed else ivfSeed(pinned)
      for (_ <- 1 to iters) {
        val stats = withListAssignment(pinned, cents)
          .select($"acid", posexplode($"iv").as(Seq("d", "v")))
          .groupBy($"acid", $"d")
          .agg(sum($"v").as("s"), count(lit(1)).as("n"))
          .collect()
          .map(r => ((r.getLong(0), r.getInt(1)),
            Math.floorDiv(r.getLong(2), r.getLong(3)))).toMap
        cents = cents.map { case (cid, civ, _) =>
          val nv = civ.indices.map(d => stats.getOrElse((cid, d), civ(d)))
          (cid, nv, nv.map(x => x * x).sum)
        }
      }
      cents
    } finally if (pin) { e.unpersist(false); () }
  }

  /** Mean cosine of every row to its assigned list centroid — the
    * quality proxy the spec pins for [[ivfTrain]]. NOTE: cosine
    * assignment with an unnormalized floor-mean update is NOT
    * guaranteed monotone in this quantity (the floor-mean is the L2
    * minimizer, and spherical k-means would mean-normalize members);
    * the spec's "does not worsen vs the seed" is an EMPIRICAL pin on
    * the fixed deterministic test corpus, catching regressions in the
    * training plumbing rather than asserting an algorithmic
    * invariant. */
  private[graft] def ivfMeanCos(e: DataFrame, cents: Seq[(Long, Seq[Long], Long)]): Double = {
    import e.sparkSession.implicits._
    e.withColumn("best",
      array_max(centScores(cents)($"iv", $"nrm")).getField("cos"))
      .agg(avg($"best")).head().getDouble(0)
  }

  /** Per-row (cos, −cid) scores against the literal IVF codebook;
    * argmax of the struct = nearest list with cid tie-break. */
  private def centScores(cents: Seq[(Long, Seq[Long], Long)])(
    iv: Column, nrm: Column): Column =
    array(cents.map { case (cid, civ, cn) =>
      struct(
        VectorOps.cosine(VectorOps.dotC(iv, typedLit(civ)), nrm, lit(cn))
          .as("cos"),
        lit(-cid).as("negcid"))
    }: _*)

  private[graft] def withListAssignment(e: DataFrame,
    cents: Seq[(Long, Seq[Long], Long)]): DataFrame = {
    import e.sparkSession.implicits._
    e.withColumn("acid",
      -array_max(centScores(cents)($"iv", $"nrm")).getField("negcid"))
  }

  // ---------------------------------------------------------------
  // Standalone coarse-quantizer model lifecycle (IVF without PQ
  // codes): train ONCE at build time, store the tiny model table,
  // LOAD at query time. The registered q_ann_ivf used to retrain
  // in-plan on every execution — iters+1 extra corpus passes per
  // query run, a cost that at 100× scale charges every analyst for a
  // model that should be an artifact. Training stays available as
  // the explicit build path ([[buildIvfModel]]); the query path only
  // ever reads the stored model.

  /** Train-if-absent + store the standalone IVF model at `path`;
    * over a complete model this trains nothing and returns the
    * STORED one (same idempotence contract as the codes builders). */
  def buildIvfModel(s: SparkSession, raw: DataFrame, path: String)
    : Seq[(Long, Seq[Long], Long)] = {
    if (graft.sources.Catalog.tableComplete(s, path))
      return loadIvfModel(s, path)
    val lists = ivfTrain(intEmbOf(raw))
    graft.sources.Catalog.createIfAbsent(s, ivfModelRows(s, lists), path)
    lists
  }

  /** Load a stored standalone IVF model — no training, no corpus
    * scan, just the tiny model table. Fails loudly on a wrong-kind or
    * empty model table (as [[loadPqIndex]]/[[loadIvfPqIndex]] do for
    * the symmetric mistakes) — an empty centroid list would otherwise
    * flow through [[qAnnIvf]] as silently empty assignments. */
  def loadIvfModel(s: SparkSession, path: String): Seq[(Long, Seq[Long], Long)] = {
    require(graft.sources.Catalog.tableComplete(s, path),
      s"$path is not a complete IVF model table — build it first")
    val rows = s.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSeq
    require(rows.nonEmpty && rows.forall(_._1 == "ivf"),
      s"$path is not a standalone IVF model table (kinds: " +
        s"${rows.map(_._1).distinct.sorted.mkString(",")}) — point " +
        "PQ/IVFADC indexes at loadPqIndex/loadIvfPqIndex instead")
    ivfModelOf(rows)
  }

  /** Per-corpus cache location for the registered q_ann_ivf's stored
    * model, keyed by `table`'s file identity (name + length +
    * mtime): regenerated test data gets a fresh key, so a stale
    * cached codebook can never shadow retrained truth. The registered
    * query's (session, dir) signature has nowhere to thread an
    * explicit model path through — production callers use
    * [[buildIvfModel]]/[[loadIvfModel]] with a real artifact
    * location; this cache is the same lifecycle with a derived one. */
  /** Content key over `dir` + the named input tables' file identity
    * (name + length + mtime, recursive) — shared by every derived
    * cache in the library ([[annCachePath]] here, the spatial
    * association stores in [[graft.queries.Spatial]]), so the key
    * format cannot drift between modules. */
  private[graft] def annCacheKey(dir: String, tables: Seq[String]): String = {
    def sig(f: java.io.File): String =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).map(sig).mkString("[", ",", "]")
      else s"${f.getName}:${f.length}:${f.lastModified}"
    java.security.MessageDigest.getInstance("MD5")
      .digest((dir + tables.map(t =>
        "|" + sig(new java.io.File(dir, t))).mkString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private[graft] def annCachePath(dir: String, kind: String,
    table: String = "embeddings.parquet"): String =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
      System.getProperty("java.io.tmpdir")) +
      s"/graft_${kind}_${annCacheKey(dir, Seq(table))}"

  private[graft] def ivfModelCachePath(dir: String): String =
    annCachePath(dir, "ivf_model")

  /** Per-process memo of loaded standalone models, keyed by (path,
    * commit-marker mtime): repeated executions skip even the tiny
    * model read, while a REPLACED model at the same path (new build →
    * new `_SUCCESS` mtime) invalidates naturally. Bounded: one tiny
    * entry per distinct stored model this process has touched. */
  private val ivfModelMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Seq[(Long, Seq[Long], Long)]]()

  private[graft] def ivfStoredModel(s: SparkSession, dir: String)
    : Seq[(Long, Seq[Long], Long)] = {
    val path = ivfModelCachePath(dir)
    if (!graft.sources.Catalog.tableComplete(s, path)) {
      // a partial dir here is OUR crashed cache build, not a user
      // table — unlike the codes builders there is nothing consistent
      // with it to protect, so resolve it by rebuilding
      graft.sources.Catalog.dropIfExists(s, path)
      buildIvfModel(s, Tables.embeddings(s, dir), path)
    }
    // stamp via the Hadoop FS like the rest of the lifecycle —
    // java.io.File would report 0 for every non-local scheme and the
    // memo would never invalidate on a rebuild
    val stamp = graft.sources.Catalog.commitStamp(s, path)
    ivfModelMemo.computeIfAbsent((path, stamp), _ => loadIvfModel(s, path))
  }

  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = intEmb(s, dir)
    val cents = ivfStoredModel(s, dir)
    val assigned = withListAssignment(e, cents)
    val probes = e.filter($"vec_id" < NQueries)
      .withColumn("scores", centScores(cents)($"iv", $"nrm"))
      .withColumn("probe", explode(expr(
        s"transform(slice(sort_array(scores, false), 1, $NProbe), x -> -x.negcid)")))
      .select($"vec_id".as("qid"), $"iv".as("qiv"), $"nrm".as("qnrm"), $"probe")
    val cand = assigned
      .join(broadcast(probes), $"acid" === $"probe" && $"vec_id" =!= $"qid")
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"qnrm", $"nrm"))
      .select($"qid", $"vec_id".as("vid"), $"dot", $"cosine")
    topK(cand)
  }

  // ---------------------------------------------------------------
  /** The nprobe operating points of [[qAnnRecallCurve]] — must
    * include [[NProbe]] so the deployed point sits ON the curve. */
  private[graft] val ProbeSweep = Seq(1, 2, 4)

  /** Recall-vs-nprobe TUNING CURVE of the IVF search — the
    * [[Dedup.qDedupThresholdCurve]] discipline applied to the coarse
    * quantizer: [[qAnnRecall]]-style recall@[[K]] per query at EVERY
    * candidate [[ProbeSweep]] operating point in one pass, the
    * artifact an operator reads to move the nprobe knob (is the
    * deployed [[NProbe]] on the recall plateau or under it?). The
    * probe list is computed ONCE at max(nprobe) with each probed
    * list's RANK attached; a candidate's eligibility at operating
    * point np is the per-row predicate prank ≤ np (a vector belongs
    * to exactly one list, so no candidate dedup is needed), and the
    * per-(query, np) top-k runs through the ONE shared salted
    * [[topKBy]] on a packed partition key.
    *
    * Scale shape: ONE corpus scan against the probed lists (the
    * [[qAnnIvf]] candidate join, broadcast probes), the ×|sweep|
    * explode applies to the CANDIDATE sliver only, and the exact side
    * is the fixed [[NQueries]] probe sample as in every recall
    * query. */
  def qAnnRecallCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = intEmb(s, dir)
    val cents = ivfStoredModel(s, dir)
    val assigned = withListAssignment(e, cents)
    val maxNp = ProbeSweep.max
    val probes = e.filter($"vec_id" < NQueries)
      .withColumn("scores", centScores(cents)($"iv", $"nrm"))
      .withColumn("pr", explode(expr(
        s"transform(slice(sort_array(scores, false), 1, $maxNp), " +
          "(x, j) -> struct(-x.negcid AS probe, j + 1 AS prank))")))
      .select($"vec_id".as("qid"), $"iv".as("qiv"), $"nrm".as("qnrm"),
        $"pr.probe".as("probe"), $"pr.prank".as("prank"))
    val cand = assigned
      .join(broadcast(probes), $"acid" === $"probe" && $"vec_id" =!= $"qid")
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"qnrm", $"nrm"))
      .select($"qid", $"vec_id".as("vid"), $"dot", $"cosine", $"prank")
    val swept = cand
      .withColumn("np", explode(typedLit(ProbeSweep.map(_.toLong))))
      .filter($"prank" <= $"np")
      // pack (qid, np) into the key topKBy partitions on; qids are
      // dense small ids and np ≤ 8, so the packing is collision-free
      .withColumn("qid0", $"qid")
      .withColumn("qid", $"qid" * lit(8L) + $"np")
    val approx = topKBy(swept, Seq($"cosine".desc, $"vid"),
      Seq($"qid", $"qid0", $"np", $"vid"))
      .select($"qid0".as("qid"), $"np", $"vid")
    val exact = qAnnBruteforce(s, dir)
      .withColumn("np", explode(typedLit(ProbeSweep.map(_.toLong))))
    recallOf(exact, approx, Seq("qid", "np"))
  }

  // ---------------------------------------------------------------
  // Clustering surface over the SAME trained coarse quantizer: the
  // IVF codebook IS an integer k-means model, so cluster analytics
  // and SemDeDup-style semantic dedup reuse it — one model, three
  // consumers (ANN probing, cluster profiling, semantic dedup).

  /** Per-row best (cos, −cid, dot) against the literal codebook —
    * [[centScores]] plus the raw integer dot, for consumers that
    * aggregate exact integer statistics per cluster. The struct
    * ordering (cos, negcid, ...) is unchanged: negcid is unique per
    * element, so the added field never participates in the argmax. */
  private def centScoresDot(cents: Seq[(Long, Seq[Long], Long)])(
    iv: Column, nrm: Column): Column =
    array(cents.map { case (cid, civ, cn) =>
      val dot = VectorOps.dotC(iv, typedLit(civ))
      struct(
        VectorOps.cosine(dot, nrm, lit(cn)).as("cos"),
        lit(-cid).as("negcid"),
        dot.as("dot"))
    }: _*)

  /** Per-cluster profile of the corpus under the stored k-means
    * model: member count, exact integer dot-sum to the centroid, and
    * min/max member cosine (each an order-independent exact double —
    * a MEAN cosine would be summation-order-dependent and break the
    * hash oracle; sum_dot is the exact sufficient statistic a caller
    * derives means from). One corpus scan against the broadcast
    * literal codebook + one [[NCentroids]]-key combinable aggregate —
    * no shuffle wider than the cluster count at any corpus size. */
  private[graft] def kmeansProfileOf(e: DataFrame,
    cents: Seq[(Long, Seq[Long], Long)]): DataFrame = {
    import e.sparkSession.implicits._
    e.withColumn("best", array_max(centScoresDot(cents)($"iv", $"nrm")))
      .select((-$"best.negcid").as("cid"), $"best.cos".as("cos"),
        $"best.dot".as("dot"))
      .groupBy($"cid")
      .agg(count(lit(1)).as("n_members"), sum($"dot").as("sum_dot"),
        min($"cos").as("min_cos"), max($"cos").as("max_cos"))
      .orderBy($"cid")
  }

  def qKmeansProfile(s: SparkSession, dir: String): DataFrame =
    kmeansProfileOf(intEmb(s, dir), ivfStoredModel(s, dir))

  /** Semantic-dedup cosine threshold — aligned with the LSH-blocked
    * near-dup notion ([[Dedup]]'s embedding pairs use the same bar). */
  private[graft] val SemTau = 0.35

  /** SemDeDup-style semantic dedup: assign every vector to its
    * k-means cluster, compare pairs ONLY within a cluster, and drop
    * any vector whose cluster holds a lower-id vector with cosine ≥
    * [[SemTau]] (lowest id wins — the deterministic survivor rule the
    * exact-dedup paths use). Output: every vector with its cluster,
    * its dup source (−1 when kept), and the keep flag.
    *
    * Scale shape: clustering IS the blocking — the pair join is an
    * equi-join on cluster id, so no all-pairs product exists and each
    * cluster's quadratic work is bounded by its size. The cluster
    * count is the scale knob (raise NCentroids with the corpus so
    * per-cluster membership stays bounded, exactly how SemDeDup runs
    * at corpus scale); skewed clusters are AQE skew-join territory.
    * At test scale Catalyst broadcasts the smaller build side. */
  private[graft] def semDedupOf(e: DataFrame,
    cents: Seq[(Long, Seq[Long], Long)]): DataFrame = {
    import e.sparkSession.implicits._
    val a = withListAssignment(e, cents)
      .select($"vec_id", $"iv", $"nrm", $"acid")
    val dupOf = a.select($"acid", $"vec_id".as("i"), $"iv".as("iv1"), $"nrm".as("n1"))
      .join(a.select($"acid", $"vec_id".as("j"), $"iv".as("iv2"), $"nrm".as("n2")),
        Seq("acid"))
      .filter($"i" < $"j")
      .withColumn("dot", VectorOps.dot("iv1", "iv2"))
      .withColumn("cos", VectorOps.cosine($"dot", $"n1", $"n2"))
      .filter($"cos" >= SemTau)
      .groupBy($"j".as("vec_id")).agg(min($"i").as("dup_of"))
    a.select($"vec_id", $"acid".as("cid"))
      .join(dupOf, Seq("vec_id"), "left")
      // −1, not NULL, for kept rows: a nullable long column round-trips
      // through pandas as float64 and the driver's compare would see a
      // schema drift
      .withColumn("dup_of", coalesce($"dup_of", lit(-1L)))
      .withColumn("kept", $"dup_of".equalTo(-1L).cast("int"))
      .orderBy($"vec_id")
  }

  def qSemdedup(s: SparkSession, dir: String): DataFrame =
    semDedupOf(intEmb(s, dir), ivfStoredModel(s, dir))

  // ---------------------------------------------------------------
  /** Shared oracle tail: exact integer dot + cosine over candidate
    * pairs `(qid, vid)` in CTE `candCte`, then the top-[[K]] by
    * (cosine desc, vid) — the common back of every ANN oracle twin,
    * as [[ivfCoarsePrefix]] is the common front. */
  /** The ONE integer-dot + cosine + (cosine DESC, vid) re-rank CTE
    * chain, suffix-parameterized so oracles needing TWO candidate
    * generations in one statement (q_ann_recall) share it verbatim
    * with the single-search oracles — a tie-break or norm change
    * edits every oracle or none. */
  private def sqlRerankCtes(candCte: String, sfx: String): String =
    s"""d$sfx AS (SELECT $candCte.qid, $candCte.vid, CAST(SUM(ea.vi * eb.vi) AS BIGINT) AS dot
       |      FROM $candCte JOIN e ea ON ea.vec_id = $candCte.qid
       |                JOIN e eb ON eb.vec_id = $candCte.vid AND eb.i = ea.i
       |      GROUP BY 1, 2),
       |c$sfx AS (SELECT qid, vid, dot,
       |        CAST(dot AS DOUBLE) / (SQRT(CAST(nq.nrm AS DOUBLE)) * SQRT(CAST(nv.nrm AS DOUBLE))) AS cosine
       |      FROM d$sfx JOIN n nq ON nq.vec_id = qid JOIN n nv ON nv.vec_id = vid),
       |r$sfx AS (SELECT qid, vid, dot, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rnk
       |  FROM c$sfx)""".stripMargin

  private def sqlRerankTail(candCte: String): String =
    s"""${sqlRerankCtes(candCte, "")}
       |SELECT qid, vid, dot, cosine, rnk FROM r
       |WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin

  private def oracleSql(bucketJoin: Boolean,
    labelJoin: Boolean = false): String = {
    val bucket = VectorOps.Sql.signBucket("embedding", Dedup.BucketDims)
    // multi-probe twin: candidate iff buckets are equal or differ in
    // exactly one plane bit (xor is 0 or a power of two)
    val probeMasks = Dedup.BucketDims.indices.map(1 << _).mkString(", ")
    val bucketCond =
      if (bucketJoin) s" AND xor(bq.bucket, bv.bucket) IN (0, $probeMasks)" else ""
    val labelCond = if (labelJoin) " AND bq.label = bv.label" else ""
    s"""WITH e AS (
       |  SELECT vec_id, i, CAST(ROUND(CAST(v AS DOUBLE) * ${VectorOps.ScaleLit}) AS BIGINT) AS vi
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |n AS (SELECT vec_id, SUM(vi * vi) AS nrm FROM e GROUP BY vec_id),
       |b AS (SELECT vec_id, label, $bucket AS bucket FROM embeddings),
       |pair AS (SELECT bq.vec_id AS qid, bv.vec_id AS vid
       |         FROM b bq JOIN b bv ON bq.vec_id < $NQueries
       |           AND bv.vec_id <> bq.vec_id$bucketCond$labelCond),
       |${sqlRerankTail("pair")}""".stripMargin
  }

  val qAnnBruteforceSql: String = oracleSql(bucketJoin = false)
  val qAnnLshSql: String = oracleSql(bucketJoin = true)
  val qAnnFilteredSql: String =
    oracleSql(bucketJoin = false, labelJoin = true)

  /** Recall@k of the multi-probe LSH search against the exact answer,
    * AS A QUERY — the eval telemetry an ANN deployment monitors
    * continuously (a recall regression is silent in the search
    * results themselves): per query vector, how many of the exact
    * top-k survive in the LSH top-k. Composes the two searches and
    * one (qid, vid) equi-join; integer percentage, hash-checked.
    *
    * Scale shape: in production the exact side runs on a fixed probe
    * SAMPLE of queries (recall needs statistical coverage, not every
    * query), so the brute-force cost is bounded by the probe set —
    * here the probe set IS the harness's [[NQueries]] queries. */
  def qAnnRecall(s: SparkSession, dir: String): DataFrame =
    recallOf(qAnnBruteforce(s, dir), qAnnLsh(s, dir))

  /** The recall census shared by every per-family recall query: how
    * many of `exact`'s (qid, vid) pairs survive in `approx`, as an
    * integer percentage per query. ONE definition — a change to the
    * recall arithmetic (the DIV rounding, the null-hit counting)
    * lands in every family or none (the sqlRerankCtes discipline). */
  private def recallOf(exact: DataFrame, approx: DataFrame,
    keys: Seq[String] = Seq("qid")): DataFrame = {
    import exact.sparkSession.implicits._
    val kc = keys.map(col)
    exact.select(kc :+ $"vid": _*)
      .join(approx.select(kc :+ $"vid" :+ lit(1).as("hit"): _*),
        keys :+ "vid", "left")
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce($"hit", lit(0))).cast("long").as("n_match"))
      .select(kc ++ Seq($"n_exact", $"n_match",
        expr("CAST((100 * n_match) DIV n_exact AS BIGINT)")
          .as("recall_pct")): _*)
      .orderBy(kc: _*)
  }

  /** SQL twin of [[recallOf]]: the overlap SELECT over two re-ranked
    * CTE families (`r$exactSfx`, `r$approxSfx`). */
  private def sqlRecallTail(exactSfx: String, approxSfx: String): String =
    s"""SELECT rbf.qid, COUNT(*) AS n_exact,
       |  CAST(SUM(CASE WHEN rap.vid IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_match,
       |  CAST((100 * SUM(CASE WHEN rap.vid IS NOT NULL THEN 1 ELSE 0 END))
       |    // COUNT(*) AS BIGINT) AS recall_pct
       |FROM (SELECT qid, vid FROM r$exactSfx WHERE rnk <= $K) rbf
       |LEFT JOIN (SELECT qid, vid FROM r$approxSfx WHERE rnk <= $K) rap
       |  ON rap.qid = rbf.qid AND rap.vid = rbf.vid
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle twin of [[qAnnRecall]]: both candidate generations + the
    * shared re-rank tail inlined twice (exact and bucket-probed),
    * overlap-counted per query. */
  val qAnnRecallSql: String = {
    val bucket = VectorOps.Sql.signBucket("embedding", Dedup.BucketDims)
    val probeMasks = Dedup.BucketDims.indices.map(1 << _).mkString(", ")
    def pairs(sfx: String, cond: String) =
      s"""p$sfx AS (SELECT bq.vec_id AS qid, bv.vec_id AS vid
         |  FROM b bq JOIN b bv ON bq.vec_id < $NQueries
         |    AND bv.vec_id <> bq.vec_id$cond)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, i, CAST(ROUND(CAST(v AS DOUBLE) * ${VectorOps.ScaleLit}) AS BIGINT) AS vi
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |n AS (SELECT vec_id, SUM(vi * vi) AS nrm FROM e GROUP BY vec_id),
       |b AS (SELECT vec_id, $bucket AS bucket FROM embeddings),
       |${pairs("bf", "")},
       |${sqlRerankCtes("pbf", "bf")},
       |${pairs("ls", s" AND xor(bq.bucket, bv.bucket) IN (0, $probeMasks)")},
       |${sqlRerankCtes("pls", "ls")}
       |${sqlRecallTail("bf", "ls")}""".stripMargin
  }

  /** One unrolled integer-Lloyd iteration k of the oracle twin:
    * assign every vector to its (cos desc, cid asc) nearest centroid
    * of codebook c{k}, then c{k+1} = per-(cid, dim) floor-average of
    * the members (COALESCE keeps an empty list's previous centroid).
    * `(s - ((s % n) + n) % n) // n` is exact floor division — DuckDB's
    * `//` truncates toward zero, Spark's Math.floorDiv floors, and the
    * adjusted numerator is exactly divisible so both agree. */
  private def ivfTrainCte(k: Int): String = {
    val j = k + 1
    s"""cn$k AS (SELECT cid, SUM(vi * vi) AS nrm FROM c$k GROUP BY cid),
       |d$k AS (SELECT ev.vec_id AS vid, c.cid, CAST(SUM(ev.vi * c.vi) AS BIGINT) AS dot
       |       FROM e ev JOIN c$k c ON c.i = ev.i GROUP BY 1, 2),
       |a$k AS (SELECT vid, cid FROM (
       |    SELECT d$k.vid, d$k.cid, ROW_NUMBER() OVER (PARTITION BY d$k.vid ORDER BY
       |      CAST(d$k.dot AS DOUBLE) / (SQRT(CAST(nv.nrm AS DOUBLE)) * SQRT(CAST(nc.nrm AS DOUBLE))) DESC,
       |      d$k.cid) AS rn
       |    FROM d$k JOIN n nv ON nv.vec_id = d$k.vid
       |         JOIN cn$k nc ON nc.cid = d$k.cid) t WHERE rn = 1),
       |m$k AS (SELECT a$k.cid, e.i, CAST(SUM(e.vi) AS BIGINT) AS s, COUNT(*) AS cnt
       |       FROM a$k JOIN e ON e.vec_id = a$k.vid GROUP BY 1, 2),
       |c$j AS (SELECT c$k.cid, c$k.i,
       |         COALESCE(CAST((m$k.s - ((m$k.s % m$k.cnt) + m$k.cnt) % m$k.cnt) // m$k.cnt AS BIGINT),
       |                  c$k.vi) AS vi
       |       FROM c$k LEFT JOIN m$k ON m$k.cid = c$k.cid AND m$k.i = c$k.i),""".stripMargin
  }

  /** Shared oracle prefix: integer-scaled rows `e`, norms `n`, the
    * [[IvfIters]]-times-unrolled coarse-quantizer training to `c$T`,
    * the per-row list `assign`ment, and each query's [[NProbe]]
    * probed lists `qp` — the common front of the IVF and IVFADC
    * oracle twins, identical tie-breaks to the in-plan code. */
  private def ivfCoarsePrefix: String = {
    val T = IvfIters
    s"""WITH e AS (
       |  SELECT vec_id, i, CAST(ROUND(CAST(v AS DOUBLE) * ${VectorOps.ScaleLit}) AS BIGINT) AS vi
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |n AS (SELECT vec_id, SUM(vi * vi) AS nrm FROM e GROUP BY vec_id),
       |c0 AS (SELECT vec_id AS cid, i, vi FROM e
       |       WHERE vec_id >= $NQueries AND vec_id < ${NQueries + NCentroids}),
       |${(0 until T).map(ivfTrainCte).mkString("\n")}
       |cn$T AS (SELECT cid, SUM(vi * vi) AS nrm FROM c$T GROUP BY cid),
       |cd AS (SELECT ev.vec_id AS vid, c.cid, CAST(SUM(ev.vi * c.vi) AS BIGINT) AS dot
       |       FROM e ev JOIN c$T c ON c.i = ev.i GROUP BY 1, 2),
       |cs AS (SELECT vid, cd.cid AS cid,
       |         CAST(dot AS DOUBLE) / (SQRT(CAST(nv.nrm AS DOUBLE)) * SQRT(CAST(nc.nrm AS DOUBLE))) AS cos
       |       FROM cd JOIN n nv ON nv.vec_id = vid JOIN cn$T nc ON nc.cid = cd.cid),
       |assign AS (SELECT vid, cid FROM (
       |    SELECT vid, cid, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cos DESC, cid) AS rn
       |    FROM cs) t WHERE rn = 1),
       |qp AS (SELECT vid AS qid, cid FROM (
       |    SELECT vid, cid, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cos DESC, cid) AS rn
       |    FROM cs WHERE vid < $NQueries) t WHERE rn <= $NProbe),""".stripMargin
  }

  /** Oracle twin of [[qAnnRecallCurve]]: the shared unrolled-training
    * prefix, probe ranks to max(sweep), the ×sweep eligibility join,
    * a (qid, np)-partitioned re-rank, and the recall overlap against
    * the brute-force re-rank CTEs. */
  val qAnnRecallCurveSql: String = {
    val maxNp = ProbeSweep.max
    val sweep = ProbeSweep.mkString(", ")
    s"""$ivfCoarsePrefix
       |qps AS (SELECT vid AS qid, cid, rn AS prank FROM (
       |    SELECT vid, cid, ROW_NUMBER() OVER (PARTITION BY vid
       |      ORDER BY cos DESC, cid) AS rn
       |    FROM cs WHERE vid < $NQueries) t WHERE rn <= $maxNp),
       |ps AS (SELECT CAST(unnest([$sweep]) AS BIGINT) AS np),
       |candc AS (SELECT q.qid, ps.np, a.vid
       |  FROM qps q JOIN assign a ON a.cid = q.cid AND a.vid <> q.qid
       |  JOIN ps ON q.prank <= ps.np),
       |dcv AS (SELECT c.qid, c.np, c.vid,
       |    CAST(SUM(ea.vi * eb.vi) AS BIGINT) AS dot
       |  FROM candc c JOIN e ea ON ea.vec_id = c.qid
       |    JOIN e eb ON eb.vec_id = c.vid AND eb.i = ea.i
       |  GROUP BY 1, 2, 3),
       |ccv AS (SELECT qid, np, vid,
       |    CAST(dot AS DOUBLE) / (SQRT(CAST(nq.nrm AS DOUBLE))
       |      * SQRT(CAST(nv.nrm AS DOUBLE))) AS cosine
       |  FROM dcv JOIN n nq ON nq.vec_id = qid
       |    JOIN n nv ON nv.vec_id = vid),
       |rcv AS (SELECT qid, np, vid, ROW_NUMBER() OVER (
       |    PARTITION BY qid, np ORDER BY cosine DESC, vid) AS rnk
       |  FROM ccv),
       |pbf AS (SELECT q.vec_id AS qid, v.vec_id AS vid
       |  FROM embeddings q JOIN embeddings v
       |    ON q.vec_id < $NQueries AND v.vec_id <> q.vec_id),
       |${sqlRerankCtes("pbf", "bf")}
       |SELECT rbf.qid, ps.np, COUNT(*) AS n_exact,
       |  CAST(SUM(CASE WHEN rap.vid IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_match,
       |  CAST((100 * SUM(CASE WHEN rap.vid IS NOT NULL THEN 1 ELSE 0 END))
       |    // COUNT(*) AS BIGINT) AS recall_pct
       |FROM (SELECT qid, vid FROM rbf WHERE rnk <= $K) rbf
       |CROSS JOIN ps
       |LEFT JOIN (SELECT qid, np, vid FROM rcv WHERE rnk <= $K) rap
       |  ON rap.qid = rbf.qid AND rap.np = ps.np AND rap.vid = rbf.vid
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Oracle twin of [[qAnnIvf]]: re-trains the identical coarse
    * quantizer (seed rows 5..12, [[IvfIters]] unrolled integer Lloyd
    * iterations), same (cos desc, cid asc) tie-breaks via ROW_NUMBER. */
  val qAnnIvfSql: String = {
    s"""$ivfCoarsePrefix
       |cand AS (SELECT qp.qid, a.vid FROM qp
       |         JOIN assign a ON a.cid = qp.cid AND a.vid <> qp.qid),
       |${sqlRerankTail("cand")}""".stripMargin
  }

  /** Oracle twin of [[qKmeansProfile]]: the shared unrolled-training
    * prefix already carries per-(vid, cid) dots (`cd`) and cosines
    * (`cs`) — restrict both to the assigned pair and aggregate. */
  val qKmeansProfileSql: String =
    s"""$ivfCoarsePrefix
       |prof AS (SELECT a.cid, COUNT(*) AS n_members,
       |    CAST(SUM(cd.dot) AS BIGINT) AS sum_dot,
       |    MIN(cs.cos) AS min_cos, MAX(cs.cos) AS max_cos
       |  FROM assign a
       |  JOIN cd ON cd.vid = a.vid AND cd.cid = a.cid
       |  JOIN cs ON cs.vid = a.vid AND cs.cid = a.cid
       |  GROUP BY a.cid)
       |SELECT cid, n_members, sum_dot, min_cos, max_cos
       |FROM prof ORDER BY cid""".stripMargin

  /** Oracle twin of [[qSemdedup]]: same assignment, within-cluster
    * pairs only, same exact integer dot / cosine and the lowest-id
    * survivor rule. */
  val qSemdedupSql: String =
    s"""$ivfCoarsePrefix
       |pr AS (SELECT x.vid AS i, y.vid AS j FROM assign x
       |       JOIN assign y ON x.cid = y.cid AND x.vid < y.vid),
       |pd AS (SELECT pr.i, pr.j, CAST(SUM(ea.vi * eb.vi) AS BIGINT) AS dot
       |       FROM pr JOIN e ea ON ea.vec_id = pr.i
       |            JOIN e eb ON eb.vec_id = pr.j AND eb.i = ea.i
       |       GROUP BY 1, 2),
       |pc AS (SELECT pd.i, pd.j FROM pd
       |       JOIN n na ON na.vec_id = pd.i JOIN n nb ON nb.vec_id = pd.j
       |       WHERE CAST(pd.dot AS DOUBLE) /
       |         (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE)))
       |         >= $SemTau),
       |dup AS (SELECT j AS vec_id, MIN(i) AS dup_of FROM pc GROUP BY j)
       |SELECT a.vid AS vec_id, a.cid,
       |  COALESCE(dup.dup_of, -1) AS dup_of,
       |  CAST(COALESCE(dup.dup_of, -1) = -1 AS INT) AS kept
       |FROM assign a LEFT JOIN dup ON dup.vec_id = a.vid
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------
  private[graft] val PqM = 8        // subspaces (64 dims → 8 per subspace)
  private[graft] val PqK = 8        // centroids per subspace
  private[graft] val PqSub = 8      // dims per subspace
  private[queries] val PqCand = 100   // ADC candidates re-ranked exactly
  private[queries] val PqIters = 2    // Lloyd iterations over the seed

  /** Product-quantization ANN — the memory-side 100 TB lever IVF does
    * not provide: each vector compresses to [[PqM]] one-byte codes
    * (64 dims × 8 bytes → 8 bytes, 64×), and ADC candidate scoring
    * reads CODES, not vectors.
    *
    * Production shape (all spec-tested over a STORED codes table):
    *  1. [[pqTrain]]: [[PqIters]] Lloyd iterations per subspace, all
    *     integer (sums are exact in any order; the new centroid is the
    *     floor-average), seeded from [[PqK]] deterministic corpus
    *     rows. Each iteration is one combinable 512-key aggregate; the
    *     collected codebook is model parameters, not data-plane.
    *  2. [[buildPqIndex]]: encode (per subspace, argmin integer L2
    *     over the literal codebook — one scan, zero shuffle) and store
    *     `[vec_id, codes]` via [[graft.sources.Catalog.createIfAbsent]]
    *     — the 64× compression lands AT REST.
    *  3. [[pqSearchStored]]: per query, the M×K distance LUT is
    *     computed driver-side (8×8 longs — search-request parameters)
    *     and ADC = Σ_m lut[m][codes[m]] — an [[PqM]]-element fold per
    *     candidate over the codes scan, whose ReadSchema is exactly
    *     `[vec_id, codes]` (spec-asserted).
    *  4. top-[[PqCand]] by (adc, vid) per query via the salted
    *     two-phase heap, then the standard exact integer-cosine
    *     re-rank of those ≤ [[PqCand]]·queries rows to top-[[K]]
    *     (only the re-rank touches full vectors, via a broadcast
    *     candidate join — ~1e-3 of the corpus at these settings).
    *
    * [[qAnnPq]] (the verify-gate entry) runs the identical train /
    * encode / LUT-ADC / re-rank pipeline with the codes kept in-plan
    * (the correctness gate may not write to disk); the spec pins
    * stored-vs-in-plan parity, so the green row covers both.
    * Though approximate w.r.t. brute force, the pipeline itself is
    * deterministic integer math end-to-end, so [[qAnnPqSql]] is a
    * full DuckDB oracle twin (unrolled training, encode, LUT, ADC,
    * re-rank) and the row is hash-checked; the spec additionally
    * pins recall vs brute force and re-derives one ADC driver-side
    * from the stored codes. */
  private[graft] def intEmb(s: SparkSession, dir: String): DataFrame =
    intEmbOf(Tables.embeddings(s, dir))

  /** (vec_id, embedding) rows → the integer-scaled (vec_id, iv, nrm)
    * frame every ANN path works in. Factored out so incremental
    * appends can encode an arbitrary new-vector batch, not just the
    * stored table. */
  private[graft] def intEmbOf(raw: DataFrame): DataFrame = {
    import raw.sparkSession.implicits._
    raw.select($"vec_id", VectorOps.intVec("embedding").as("iv"))
      .withColumn("nrm", VectorOps.normSq("iv"))
  }

  /** Deterministic seed codebook: centroid c of subspace m = seed row
    * c's m-th [[PqSub]]-dim slice. `seedBase` picks the first seed
    * row's vec_id: the raw-vector PQ seeds from [NQueries,
    * NQueries+PqK) (the same rows as the IVF seed — harmless there),
    * but RESIDUAL training (IVFADC) must seed from rows DISJOINT from
    * the IVF codebook ([[IvfPqSeedBase]]): a codebook row's residual
    * against its own list is ~zero, and eight ~zero seeds collapse
    * every subspace to one effective centroid. */
  private[graft] def pqSeed(e: DataFrame, seedBase: Long = NQueries): Seq[Seq[Seq[Long]]] = {
    import e.sparkSession.implicits._
    val rows = e.filter($"vec_id" >= seedBase && $"vec_id" < seedBase + PqK)
      .orderBy($"vec_id").collect()
      .map(_.getSeq[Long](1))
    (0 until PqM).map(m => rows.toSeq.map(_.slice(m * PqSub, (m + 1) * PqSub)))
  }

  /** Residual-PQ seed rows: the [[PqK]] vec_ids immediately after the
    * IVF codebook range — disjoint from it by construction. */
  private[graft] val IvfPqSeedBase: Long = NQueries + NCentroids

  /** codes column (array<int>, values 0..[[PqK]]-1) from `iv` against
    * the literal `cent` codebook: per subspace, argmin integer L2
    * (ties → lowest centroid id, via array_position's first match).
    *
    * The per-centroid score is `‖c‖² − 2·x·c` — same argmin (and same
    * ties) as the full L2, since `‖x‖²` is constant within a
    * subspace — evaluated by the single-pass native codegen kernel
    * [[graft.functions.PqEncode]]: one loop over the row's M×K×Sub
    * products, NOT a composed tree of M×K slice+dot columns folded
    * through array_min/array_position (the r13 shape — measurably
    * slower per row AND a whole-stage-codegen size problem, since the
    * generated method grew with the 64 literal centroid slices; before
    * that, an interpreted higher-order `aggregate` lambda was the
    * whole encode cost). */
  private[graft] def withCodes(e: DataFrame, cent: Seq[Seq[Seq[Long]]]): DataFrame = {
    import org.apache.spark.sql.graftx.ColumnBridge
    e.withColumn("codes", ColumnBridge.column(graft.functions.PqEncode(
      ColumnBridge.expression(col("iv")), cent)))
  }

  /** Integer Lloyd iterations: assign every row's subvectors to their
    * nearest centroids, then recompute each centroid as the exact
    * integer floor-average of its members (empty clusters keep their
    * previous centroid). Sums/counts are order-independent bigints →
    * the trained codebook is bit-deterministic under any partitioning.
    * Per iteration: one corpus scan + a combinable aggregate on
    * [[PqM]]·[[PqK]]·[[PqSub]] = 512 keys; the collect is the
    * codebook, not data. */
  /** One collected corpus head covering BOTH driver-side inputs of an
    * in-plan PQ search — the query rows ([0, [[NQueries]])) and the
    * seed rows ([seedBase, seedBase+[[PqK]])) — so the search pays ONE
    * tiny collect job instead of two: at bench scale the pipeline's
    * cost is per-job fixed overhead, not data (r12 verdict asked where
    * q_ann_pq's time goes — it is this job ladder). */
  private[graft] def pqHead(e: DataFrame,
    hi: Long): Seq[(Long, Seq[Long], Long)] = {
    import e.sparkSession.implicits._
    e.filter($"vec_id" < hi)
      .select($"vec_id", $"iv", $"nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  /** [[pqSeed]] from an already-collected head — identical rows and
    * slicing, zero extra jobs. */
  private[graft] def pqSeedOf(head: Seq[(Long, Seq[Long], Long)],
    seedBase: Long): Seq[Seq[Seq[Long]]] = {
    val rows = head.filter(r => r._1 >= seedBase && r._1 < seedBase + PqK)
      .map(_._2)
    (0 until PqM).map(m => rows.map(_.slice(m * PqSub, (m + 1) * PqSub)))
  }

  private[graft] def pqTrain(e: DataFrame, iters: Int = PqIters,
    seedBase: Long = NQueries): Seq[Seq[Seq[Long]]] =
    pqTrainFrom(e, pqSeed(e, seedBase), iters)

  /** The Lloyd loop itself, from a given seed codebook — callers that
    * already collected the head ([[pqHead]]) pass [[pqSeedOf]]'s
    * result and skip the seed scan. */
  private[graft] def pqTrainFrom(e: DataFrame, seed: Seq[Seq[Seq[Long]]],
    iters: Int = PqIters): Seq[Seq[Seq[Long]]] = {
    import e.sparkSession.implicits._
    var cent = seed
    for (_ <- 1 to iters) {
      // one generator row per (vec, subspace) with the subspace's
      // [[PqSub]] dim-sums as parallel aggregate columns — the r13
      // shape exploded a second time to (vec, m, d) rows: 8× the
      // aggregate input rows and 512 grouping keys for the identical
      // integer sums (bit-for-bit: Σ per (m, code, d) is
      // order-independent either way). At sf0.1 the two shapes time
      // identically (~1.2 s JIT-warm, interleaved A/B in
      // [[graft.tools.ProfIvfPq]] — the apparent 3→1 s win was JIT
      // warmup); the 8× row reduction is kept for the scale path,
      // where aggregate input rows dominate fixed overhead.
      val dimSums = (0 until PqSub).map(d =>
        sum(expr(s"iv[m * $PqSub + $d]")).as(s"s$d"))
      val stats = withCodes(e.select($"vec_id", $"iv"), cent)
        .select($"iv", posexplode($"codes").as(Seq("m", "code")))
        .groupBy($"m", $"code")
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .collect()
        .flatMap { r =>
          val n = r.getLong(2)
          (0 until PqSub).map(d =>
            ((r.getInt(0), r.getInt(1), d), Math.floorDiv(r.getLong(3 + d), n)))
        }.toMap
      cent = (0 until PqM).map(m => (0 until PqK).map(k => (0 until PqSub).map(d =>
        stats.getOrElse((m, k, d), cent(m)(k)(d)))))
    }
    cent
  }

  /** Total integer quantization error Σ‖iv − recon(codes)‖² of a
    * codebook over the corpus — the quantity Lloyd descends; the spec
    * asserts training does not worsen it vs the seed. */
  private[graft] def pqQuantError(e: DataFrame, cent: Seq[Seq[Seq[Long]]]): Long = {
    import e.sparkSession.implicits._
    withCodes(e.select($"vec_id", $"iv"), cent)
      .withColumn("cent", typedLit(cent))
      .withColumn("recon", expr(
        s"flatten(transform(sequence(0, ${PqM - 1}), m -> cent[m][codes[m]]))"))
      .withColumn("qe", expr(
        "aggregate(zip_with(iv, recon, (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .agg(sum($"qe")).head().getLong(0)
  }

  // -- oracle twin of the PQ pipeline ----------------------------
  /** Assignment CTEs against subspace codebook `p$t`: per (row,
    * subspace), the centroid minimizing `‖c‖² − 2·x·c` (same argmin
    * and same lowest-k tie-break as [[withCodes]]' `array_position`
    * of the min). `pa$t` is (vid, m, k). `src` is the subspace-rows
    * table — raw subvectors for flat PQ, residual subvectors for
    * IVFADC. */
  private def pqAssignCte(t: Int, src: String = "es"): String =
    s"""pc$t AS (SELECT m, k, SUM(vi * vi) AS cc FROM p$t GROUP BY m, k),
       |pd$t AS (SELECT $src.vec_id AS vid, $src.m, c.k,
       |          CAST(SUM($src.vi * c.vi) AS BIGINT) AS dot
       |        FROM $src JOIN p$t c ON c.m = $src.m AND c.d = $src.d
       |        GROUP BY 1, 2, 3),
       |pa$t AS (SELECT vid, m, k FROM (
       |    SELECT pd$t.vid, pd$t.m, pd$t.k,
       |      ROW_NUMBER() OVER (PARTITION BY pd$t.vid, pd$t.m
       |        ORDER BY CAST(pc.cc AS BIGINT) - 2 * pd$t.dot, pd$t.k) AS rn
       |    FROM pd$t JOIN pc$t pc ON pc.m = pd$t.m AND pc.k = pd$t.k) t
       |  WHERE rn = 1),""".stripMargin

  /** One unrolled integer-Lloyd iteration of [[pqTrain]]'s oracle
    * twin: assign ([[pqAssignCte]]), then `p${t+1}` = per-(m, k, d)
    * exact floor-average of the members (COALESCE keeps an empty
    * cluster's previous centroid; floor-division idiom as in
    * [[ivfTrainCte]]). */
  private def pqTrainCte(t: Int, src: String = "es"): String = {
    val j = t + 1
    s"""${pqAssignCte(t, src)}
       |pm$t AS (SELECT a.m, a.k, $src.d, CAST(SUM($src.vi) AS BIGINT) AS s,
       |          COUNT(*) AS cnt
       |        FROM pa$t a JOIN $src ON $src.vec_id = a.vid AND $src.m = a.m
       |        GROUP BY 1, 2, 3),
       |p$j AS (SELECT c.m, c.k, c.d,
       |         COALESCE(CAST((pm$t.s - ((pm$t.s % pm$t.cnt) + pm$t.cnt) % pm$t.cnt) // pm$t.cnt AS BIGINT),
       |                  c.vi) AS vi
       |       FROM p$t c LEFT JOIN pm$t
       |         ON pm$t.m = c.m AND pm$t.k = c.k AND pm$t.d = c.d),""".stripMargin
  }

  /** Oracle twin of [[qAnnPq]]: re-trains the identical per-subspace
    * codebooks ([[PqIters]] unrolled integer Lloyd iterations over the
    * seed rows), re-encodes every vector, rebuilds each query's
    * integer L2 LUT, scores ADC = Σ_m lut[m][codes[m]], keeps the
    * top-[[PqCand]] by (adc, vid), and exactly re-ranks — every stage
    * integer-exact, so the hash compare is bit-strict. */
  val qAnnPqSql: String = {
    val T = PqIters
    s"""WITH e AS (
       |  SELECT vec_id, i, CAST(ROUND(CAST(v AS DOUBLE) * ${VectorOps.ScaleLit}) AS BIGINT) AS vi
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |n AS (SELECT vec_id, SUM(vi * vi) AS nrm FROM e GROUP BY vec_id),
       |es AS (SELECT vec_id, CAST((i - 1) // $PqSub AS INT) AS m,
       |         CAST((i - 1) % $PqSub AS INT) AS d, vi FROM e),
       |p0 AS (SELECT m, CAST(vec_id - $NQueries AS INT) AS k, d, vi FROM es
       |       WHERE vec_id >= $NQueries AND vec_id < ${NQueries + PqK}),
       |${(0 until T).map(t => pqTrainCte(t)).mkString("\n")}
       |${pqAssignCte(T)}
       |lut AS (SELECT es.vec_id AS qid, c.m, c.k,
       |          CAST(SUM((es.vi - c.vi) * (es.vi - c.vi)) AS BIGINT) AS l2
       |        FROM es JOIN p$T c ON c.m = es.m AND c.d = es.d
       |        WHERE es.vec_id < $NQueries GROUP BY 1, 2, 3),
       |adc AS (SELECT l.qid, a.vid, CAST(SUM(l.l2) AS BIGINT) AS adc
       |        FROM pa$T a JOIN lut l ON l.m = a.m AND l.k = a.k
       |        WHERE a.vid <> l.qid GROUP BY 1, 2),
       |cand AS (SELECT qid, vid FROM (
       |    SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, vid) AS crn
       |    FROM adc) t WHERE crn <= $PqCand),
       |${sqlRerankTail("cand")}""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Per-subspace quantization-distortion telemetry of the PQ
    * codebook — the standard diagnostic a PQ deployment publishes
    * beside its recall (Jégou et al. 2011 report exactly this
    * per-subspace MSE): for every corpus vector, the exact integer
    * squared error ‖x_m − c_{code(x,m)}‖² between each subvector and
    * its assigned centroid, aggregated per subspace into count /
    * total / max / mean. An unbalanced row (one subspace carrying
    * most of the error) is the signal to re-split dims or raise K
    * BEFORE recall degrades — this complements [[qAnnRecall]]-family
    * telemetry, which only sees the end-to-end effect.
    *
    * Because the encode is the integer argmin over the codebook, each
    * row's error IS min_k ‖x_m − c_k‖² — the spec pins that encode
    * optimality directly. All errors exact int64 (component ≤ 10⁷ →
    * per-subspace error ≤ ~5·10¹³; corpus sums ≪ int64; a 100-TB
    * deployment shards the same combinable sums). Scale shape: ONE
    * encode scan (the [[graft.functions.PqEncode]] codegen kernel) +
    * a map-side ×[[PqM]] subspace explode on 8-dim slices into a
    * combinable [[PqM]]-key aggregate; the codebook rides as a
    * 512-long literal. */
  def qPqDistortion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = intEmb(s, dir)
    val head = pqHead(e, NQueries + PqK)
    val cent = pqTrainFrom(e, pqSeedOf(head, NQueries))
    withCodes(e.select($"vec_id", $"iv"), cent)
      .withColumn("m", explode(sequence(lit(0), lit(PqM - 1))))
      .withColumn("sub", expr(s"slice(iv, m * $PqSub + 1, $PqSub)"))
      .withColumn("cvec", element_at(element_at(typedLit(cent), $"m" + 1),
        element_at($"codes", $"m" + 1) + 1))
      .withColumn("e2", expr("aggregate(zip_with(sub, cvec," +
        " (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"))
      .groupBy($"m")
      .agg(count(lit(1)).as("n_vectors"),
        sum($"e2").as("sum_err"),
        max($"e2").as("max_err"))
      .withColumn("mean_err",
        $"sum_err".cast("double") / $"n_vectors".cast("double"))
      .orderBy($"m")
  }

  /** Oracle twin: the unrolled integer-Lloyd training ([[pqTrainCte]]
    * — ONE text copy with [[qAnnPqSql]]), the final assignment, and
    * the per-(vector, subspace) exact squared error against the
    * assigned centroid. */
  lazy val qPqDistortionSql: String = {
    val T = PqIters
    s"""WITH e AS (
       |  SELECT vec_id, i, CAST(ROUND(CAST(v AS DOUBLE) * ${VectorOps.ScaleLit}) AS BIGINT) AS vi
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |es AS (SELECT vec_id, CAST((i - 1) // $PqSub AS INT) AS m,
       |         CAST((i - 1) % $PqSub AS INT) AS d, vi FROM e),
       |p0 AS (SELECT m, CAST(vec_id - $NQueries AS INT) AS k, d, vi FROM es
       |       WHERE vec_id >= $NQueries AND vec_id < ${NQueries + PqK}),
       |${(0 until T).map(t => pqTrainCte(t)).mkString("\n")}
       |${pqAssignCte(T)}
       |err AS (SELECT a.vid, a.m,
       |    CAST(SUM((es.vi - c.vi) * (es.vi - c.vi)) AS BIGINT) AS e2
       |  FROM pa$T a
       |  JOIN es ON es.vec_id = a.vid AND es.m = a.m
       |  JOIN p$T c ON c.m = a.m AND c.k = a.k AND c.d = es.d
       |  GROUP BY 1, 2)
       |SELECT m, COUNT(*) AS n_vectors,
       |  CAST(SUM(e2) AS BIGINT) AS sum_err,
       |  CAST(MAX(e2) AS BIGINT) AS max_err,
       |  CAST(SUM(e2) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS mean_err
       |FROM err GROUP BY 1 ORDER BY m""".stripMargin
  }

  /** The IVF×PQ candidate chain (residual encode → LUT → ADC →
    * top-[[PqCand]] per query) as composable CTEs, shared by
    * [[qAnnIvfPqSql]] and the recall oracle. Assumes
    * [[ivfCoarsePrefix]]'s e/n/c/assign/qp CTEs precede it; ends at
    * `cand` (no trailing comma). */
  private def ivfpqCandCtes: String = {
    val T = IvfIters
    val P = PqIters
    s"""res AS (SELECT ev.vec_id, ev.i, ev.vi - c.vi AS vi
       |        FROM e ev JOIN assign a ON a.vid = ev.vec_id
       |             JOIN c$T c ON c.cid = a.cid AND c.i = ev.i),
       |ess AS (SELECT vec_id, CAST((i - 1) // $PqSub AS INT) AS m,
       |          CAST((i - 1) % $PqSub AS INT) AS d, vi FROM res),
       |p0 AS (SELECT m, CAST(vec_id - $IvfPqSeedBase AS INT) AS k, d, vi FROM ess
       |       WHERE vec_id >= $IvfPqSeedBase AND vec_id < ${IvfPqSeedBase + PqK}),
       |${(0 until P).map(pqTrainCte(_, "ess")).mkString("\n")}
       |${pqAssignCte(P, "ess")}
       |qres AS (SELECT qp.qid, qp.cid, ev.i, ev.vi - c.vi AS vi
       |         FROM qp JOIN e ev ON ev.vec_id = qp.qid
       |              JOIN c$T c ON c.cid = qp.cid AND c.i = ev.i),
       |qss AS (SELECT qid, cid, CAST((i - 1) // $PqSub AS INT) AS m,
       |          CAST((i - 1) % $PqSub AS INT) AS d, vi FROM qres),
       |lut AS (SELECT qss.qid, qss.cid, c.m, c.k,
       |          CAST(SUM((qss.vi - c.vi) * (qss.vi - c.vi)) AS BIGINT) AS l2
       |        FROM qss JOIN p$P c ON c.m = qss.m AND c.d = qss.d
       |        GROUP BY 1, 2, 3, 4),
       |adc AS (SELECT qp.qid, a.vid, CAST(SUM(l.l2) AS BIGINT) AS adc
       |        FROM assign a JOIN qp ON qp.cid = a.cid AND a.vid <> qp.qid
       |             JOIN pa$P enc ON enc.vid = a.vid
       |             JOIN lut l ON l.qid = qp.qid AND l.cid = a.cid
       |                       AND l.m = enc.m AND l.k = enc.k
       |        GROUP BY 1, 2),
       |cand AS (SELECT qid, vid FROM (
       |    SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, vid) AS crn
       |    FROM adc) t WHERE crn <= $PqCand)""".stripMargin
  }

  /** Oracle twin of [[qAnnIvfPq]] — the composed IVFADC pipeline,
    * every stage integer-exact: the shared coarse prefix
    * ([[ivfCoarsePrefix]]: trained quantizer, `assign`, probes `qp`),
    * residuals of every row against its assigned list centroid,
    * residual-PQ training seeded from [[IvfPqSeedBase]], residual
    * encode, one residual LUT per (query, probed list), ADC over
    * candidates whose assigned list is probed by that query,
    * top-[[PqCand]] by (adc, vid), exact re-rank on RAW vectors. */
  val qAnnIvfPqSql: String =
    s"""$ivfCoarsePrefix
       |$ivfpqCandCtes,
       |${sqlRerankTail("cand")}""".stripMargin

  /** Recall@k of the IVF×PQ search against the exact answer — the
    * [[qAnnRecall]] eval telemetry for the OTHER approximate path
    * (coarse-probe pruning + 8-bit residual codes lose recall in two
    * different ways: a true neighbor outside every probed list never
    * ranks; ADC quantization error misranks inside the candidate
    * set). Monitoring recall per index family is what tells an
    * operator WHICH knob (nprobe vs candidate budget) regressed.
    * Same composition: one (qid, vid) equi-join, integer percentage.
    *
    * Scale note: as with [[qAnnRecall]], the exact side runs on the
    * fixed probe sample — brute-force cost bounded by [[NQueries]]. */
  def qAnnRecallIvfpq(s: SparkSession, dir: String): DataFrame =
    recallOf(qAnnBruteforce(s, dir), qAnnIvfPq(s, dir))

  /** Oracle twin: the full IVF×PQ chain ([[ivfpqCandCtes]]) and the
    * brute-force pair set share one prefix (e/n come from
    * [[ivfCoarsePrefix]]), each re-ranked by the shared tail. */
  val qAnnRecallIvfpqSql: String =
    s"""$ivfCoarsePrefix
       |$ivfpqCandCtes,
       |${sqlRerankCtes("cand", "pq")},
       |pbf AS (SELECT q.vec_id AS qid, v.vec_id AS vid
       |        FROM n q JOIN n v ON q.vec_id < $NQueries
       |          AND v.vec_id <> q.vec_id),
       |${sqlRerankCtes("pbf", "bf")}
       |${sqlRecallTail("bf", "pq")}""".stripMargin

  /** Bucket count for the stored PQ codes table: codes are
    * partitioned by `bk = vec_id mod PqBuckets`, so appends land as
    * bounded per-bucket files, [[graft.sources.Catalog.compactPartitions]]
    * compacts in place, and a point lookup by vec_id prunes to one
    * bucket. Raise with corpus size (buckets ≈ corpus / executor-sized
    * chunk); the value only shapes file layout, never results. */
  private[graft] val PqBuckets = 16

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bk", pmod(col("vec_id"), lit(PqBuckets.toLong)))

  // ---------------------------------------------------------------
  // Stored model: the codebook(s) are PART of the index — a codes
  // table is meaningless without the exact model that encoded it, so
  // every build persists the model at `<codesPath>.model` and a
  // rebuild over a COMPLETE index returns the STORED model instead of
  // retraining (a retrained codebook over a drifted corpus would
  // silently mismatch the stored codes — the reviewed failure mode).
  // Write order makes crashes decidable: model first, codes second;
  // codes-absent → any stale model is dropped and both rewritten;
  // codes-complete+model-missing → loud failure.

  private def modelPath(codesPath: String): String = codesPath + ".model"

  /** Model rows: (kind, a, k, d, v) — kind="pq" rows carry subspace
    * codebooks (a = subspace, k = centroid, d = dim); kind="ivf" rows
    * carry coarse centroids (a = cid, k unused, d = dim). */
  private def pqModelRows(s: SparkSession, cent: Seq[Seq[Seq[Long]]]): DataFrame = {
    import s.implicits._
    (for (m <- cent.indices; k <- cent(m).indices; d <- cent(m)(k).indices)
      yield ("pq", m.toLong, k, d, cent(m)(k)(d)))
      .toDF("kind", "a", "k", "d", "v")
  }

  private def ivfModelRows(s: SparkSession, lists: Seq[(Long, Seq[Long], Long)]): DataFrame = {
    import s.implicits._
    (for ((cid, civ, _) <- lists; d <- civ.indices)
      yield ("ivf", cid, 0, d, civ(d)))
      .toDF("kind", "a", "k", "d", "v")
  }

  private def loadModelRows(s: SparkSession, codesPath: String)
    : Seq[(String, Long, Int, Int, Long)] = {
    require(graft.sources.Catalog.tableComplete(s, modelPath(codesPath)),
      s"codes table at $codesPath is complete but its model at " +
        s"${modelPath(codesPath)} is missing — the index is unusable; " +
        "dropIfExists both and rebuild")
    s.read.parquet(modelPath(codesPath)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSeq
  }

  private def pqModelOf(rows: Seq[(String, Long, Int, Int, Long)]): Seq[Seq[Seq[Long]]] = {
    val byKey = rows.collect { case ("pq", m, k, d, v) => ((m.toInt, k, d), v) }.toMap
    (0 until PqM).map(m => (0 until PqK).map(k => (0 until PqSub).map(d =>
      byKey((m, k, d)))))
  }

  private def ivfModelOf(rows: Seq[(String, Long, Int, Int, Long)]): Seq[(Long, Seq[Long], Long)] =
    rows.collect { case ("ivf", cid, _, d, v) => (cid, d, v) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (cid, ds) =>
        val civ = ds.sortBy(_._2).map(_._3)
        (cid, civ, civ.map(x => x * x).sum)
      }

  /** Load the model half of a complete stored PQ index — a reader's
    * entry point: no training, no corpus scan, just the tiny model
    * table. Fails loudly on an incomplete index AND on an index of
    * the wrong kind (an IVFADC model here would decode residual codes
    * with raw-space LUTs — silently wrong neighbors). */
  def loadPqIndex(s: SparkSession, codesPath: String): Seq[Seq[Seq[Long]]] = {
    require(graft.sources.Catalog.tableComplete(s, codesPath),
      s"$codesPath is not a complete codes table")
    val rows = loadModelRows(s, codesPath)
    require(!rows.exists(_._1 == "ivf"),
      s"$codesPath is an IVFADC index (its model has coarse centroids) — " +
        "use loadIvfPqIndex/ivfPqSearchStored")
    pqModelOf(rows)
  }

  /** Load the (lists, pq) model halves of a complete stored IVFADC
    * index — as [[loadPqIndex]], for [[ivfPqSearchStored]]; fails
    * loudly when pointed at a flat PQ index (no coarse centroids). */
  def loadIvfPqIndex(s: SparkSession, codesPath: String)
    : (Seq[(Long, Seq[Long], Long)], Seq[Seq[Seq[Long]]]) = {
    require(graft.sources.Catalog.tableComplete(s, codesPath),
      s"$codesPath is not a complete codes table")
    val rows = loadModelRows(s, codesPath)
    require(rows.exists(_._1 == "ivf"),
      s"$codesPath is a flat PQ index (its model has no coarse centroids) — " +
        "use loadPqIndex/pqSearchStored")
    (ivfModelOf(rows), pqModelOf(rows))
  }

  /** Train + encode + store the codes table at `codesPath`,
    * partitioned by the [[PqBuckets]] vec_id bucket, plus its model
    * at `<codesPath>.model`. Idempotent AND consistent: over a
    * complete index this retrains nothing and returns the STORED
    * codebook. Callers hand the codebook to [[pqSearchStored]] and
    * [[appendPqVectors]]. */
  def buildPqIndex(s: SparkSession, dir: String, codesPath: String): Seq[Seq[Seq[Long]]] =
    buildPqIndexOf(s, Tables.embeddings(s, dir), codesPath)

  /** FAILFAST on an unmarked partial codes dir BEFORE any builder
    * drops the stored model: a rebuild over a crashed build would
    * otherwise delete the old model first and then throw on
    * createPartitionedIfAbsent — leaving a freshly retrained model
    * beside stale partial codes, and an operator who "repairs" the
    * codes dir by hand would pair mismatched model+codes. Resolving
    * the partial dir (drop it, or restore its marker) is an explicit
    * operator decision, taken while the old model is still intact. */
  private def requireNoPartialCodes(s: SparkSession, codesPath: String): Unit =
    require(!graft.sources.Catalog.tableExists(s, codesPath),
      s"$codesPath exists but is not marked complete (crashed build?); " +
        "resolve it before rebuilding — the stored model has not been touched")

  /** [[buildPqIndex]] over an explicit (vec_id, embedding) corpus
    * frame — the ingest-pipeline entry point (and how the spec builds
    * on a corpus subset to prove append ≡ rebuild). */
  def buildPqIndexOf(s: SparkSession, raw: DataFrame, codesPath: String): Seq[Seq[Seq[Long]]] = {
    import s.implicits._
    if (graft.sources.Catalog.tableComplete(s, codesPath))
      return loadPqIndex(s, codesPath)
    requireNoPartialCodes(s, codesPath)
    graft.sources.Catalog.dropIfExists(s, modelPath(codesPath))
    val e = intEmbOf(raw)
    val cent = pqTrain(e)
    graft.sources.Catalog.createIfAbsent(s, pqModelRows(s, cent), modelPath(codesPath))
    graft.sources.Catalog.createPartitionedIfAbsent(s,
      withBucket(withCodes(e.select($"vec_id", $"iv"), cent)
        .select($"vec_id", $"codes")),
      codesPath, Seq("bk"))
    cent
  }

  /** Incremental ingest: encode ONLY `rawBatch` (a (vec_id,
    * embedding) frame of new vectors) against the FROZEN `cent`
    * codebook and append to the stored codes table — per-batch cost
    * tracks the batch plus one column-pruned scan of the stored
    * vec_ids (the REPLAY GUARD: an orchestrator that crashes after
    * commit and retries the batch must not duplicate rows, so already
    * -present vec_ids are anti-joined away — append-if-new
    * semantics, spec-proven idempotent). The appended codes are
    * bit-identical to what a full re-encode of the union with the
    * same codebook would produce (spec-proven); the codebook itself
    * is as of build time — retraining on a drifted corpus is a
    * rebuild event, not an append. */
  /** In-batch dedup + the bucket-pruned replay guard shared by every
    * bk-partitioned appender (PQ codes, vector store). vec_id is the
    * identity key: duplicates WITHIN the batch (an at-least-once
    * source can deliver a vector twice in one poll) collapse
    * arbitrarily, duplicates vs the TABLE are anti-joined away. The
    * guard scan prunes to the batch's own buckets — a duplicate must
    * land in the same bk partition (bk is a pure function of
    * vec_id), so per-batch guard cost tracks the touched buckets,
    * not the table. One implementation so the two tables' replay
    * semantics can never silently diverge. */
  /** Deterministic in-batch dedup on the identity key: lowest
    * embedding wins per vec_id (array ordering is total), NOT
    * dropDuplicates, whose survivor is partitioning-dependent — in
    * dual-target ingest the store and codes appenders each dedup the
    * same micro-batch independently, and nondeterministic survivors
    * could commit a store vector and codes encoded from DIFFERENT
    * rows under one vec_id: a silent vector/codes mismatch. Same
    * reasoning as [[graft.streaming.DocStream]]'s dedupBatch. */
  private def dedupBatchDet(rawBatch: DataFrame): DataFrame = {
    import rawBatch.sparkSession.implicits._
    val w = Window.partitionBy($"vec_id").orderBy($"embedding")
    rawBatch.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
  }

  private def freshAgainst(s: SparkSession, path: String,
    rawBatch: DataFrame): DataFrame = {
    import s.implicits._
    val batch = dedupBatchDet(rawBatch)
    val bks = batch.select(pmod($"vec_id", lit(PqBuckets.toLong)).as("bk"))
      .distinct().collect().map(_.getLong(0)).toSeq
    batch.join(
      s.read.parquet(path).filter($"bk".isin(bks: _*)).select($"vec_id"),
      Seq("vec_id"), "left_anti")
  }

  def appendPqVectors(s: SparkSession, codesPath: String,
    cent: Seq[Seq[Seq[Long]]], rawBatch: DataFrame): Unit = {
    import s.implicits._
    val e = intEmbOf(freshAgainst(s, codesPath, rawBatch))
    graft.sources.Catalog.appendPartitioned(s,
      withBucket(withCodes(e.select($"vec_id", $"iv"), cent)
        .select($"vec_id", $"codes")),
      codesPath, Seq("bk"))
  }

  /** Driver-side per-query LUT: lut[m][k] = integer L2 between the
    * query's m-th subvector and centroid k of subspace m. ADC of a
    * candidate is then Σ_m lut[m][codes[m]] — [[PqM]] array lookups,
    * no vector math. */
  private[graft] def pqLut(cent: Seq[Seq[Seq[Long]]], qiv: Seq[Long]): Seq[Seq[Long]] =
    (0 until PqM).map { m =>
      val sub = qiv.slice(m * PqSub, (m + 1) * PqSub)
      cent(m).map(c => sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
    }

  /** Tiny query-side frame: (qid, qiv, qnrm, lut) for the [[NQueries]]
    * query vectors — broadcast everywhere it joins. */
  private[graft] def pqQueryFrame(s: SparkSession, e: DataFrame,
    cent: Seq[Seq[Seq[Long]]]): DataFrame = {
    import s.implicits._
    val qs = e.filter($"vec_id" < NQueries)
      .select($"vec_id", $"iv", $"nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    pqQueryFrameOf(s, qs, cent)
  }

  /** [[pqQueryFrame]] from an already-collected head ([[pqHead]]) —
    * identical frame, zero extra jobs. */
  private[graft] def pqQueryFrameOf(s: SparkSession,
    head: Seq[(Long, Seq[Long], Long)],
    cent: Seq[Seq[Seq[Long]]]): DataFrame = {
    import s.implicits._
    head.filter(_._1 < NQueries)
      .map { case (qid, qiv, qnrm) => (qid, qiv, qnrm, pqLut(cent, qiv)) }
      .toDF("qid", "qiv", "qnrm", "lut")
  }

  /** The LUT fold: Σ_m lut[m][codes[m]] — [[PqM]] array lookups per
    * candidate, no vector math. A native codegen kernel
    * ([[graft.functions.PqAdc]]): this evaluates once per ADC
    * candidate row (the PQ search hot path), and the declarative
    * `aggregate(zip_with(...))` twin is an interpreted higher-order
    * function there. */
  private def adcCol: Column = {
    import org.apache.spark.sql.graftx.ColumnBridge
    ColumnBridge.column(graft.functions.PqAdc(
      ColumnBridge.expression(col("lut")),
      ColumnBridge.expression(col("codes"))))
  }

  /** Salted two-phase top-[[PqCand]] per query by (adc, vid) — no
    * single task ever holds a query's whole candidate list. */
  private def topByAdc(adc: DataFrame): DataFrame = {
    import adc.sparkSession.implicits._
    val order = Seq($"adc", $"vid")
    val w1 = Window.partitionBy($"qid", $"salt").orderBy(order: _*)
    val w2 = Window.partitionBy($"qid").orderBy(order: _*)
    adc.withColumn("salt", pmod($"vid", lit(64)))
      .withColumn("prn", row_number().over(w1)).filter($"prn" <= PqCand)
      .withColumn("crn", row_number().over(w2)).filter($"crn" <= PqCand)
      .select($"qid", $"vid", $"adc")
  }

  /** ADC over a codes frame (columns vec_id, codes — nothing else is
    * referenced, so a stored-table scan prunes to exactly those two),
    * then salted two-phase top-[[PqCand]] per query by (adc, vid). */
  private[graft] def pqAdcCandidates(codes: DataFrame, qdf: DataFrame): DataFrame = {
    import codes.sparkSession.implicits._
    topByAdc(codes
      .crossJoin(broadcast(qdf.select($"qid", $"lut")))
      .filter($"vec_id" =!= $"qid")
      .withColumn("adc", adcCol)
      .select($"qid", $"vec_id".as("vid"), $"adc"))
  }

  // ---------------------------------------------------------------
  // Bucketed VECTOR STORE — the at-rest layout for the re-rank side.
  // The codes tables bound the CANDIDATE scan, but the exact re-rank
  // must fetch candidate vectors, and against a flat corpus file that
  // fetch is a full-corpus scan. Stored [vec_id, embedding]
  // partitioned by bk = vec_id mod PqBuckets, the re-rank reads ONLY
  // the buckets holding candidates (a static partition filter from
  // the ≤ PqCand·NQueries collected candidate ids — request-plane,
  // like the LUTs): search I/O is bounded by candidates on BOTH scan
  // paths, the full 100 TB shape.

  /** Create the bucket-partitioned vector store (same crash-safe
    * lifecycle as the codes tables). */
  def buildVectorStore(s: SparkSession, raw: DataFrame, path: String): Boolean =
    graft.sources.Catalog.createPartitionedIfAbsent(s,
      withBucket(raw.select(col("vec_id"), col("embedding"))), path, Seq("bk"))

  /** Append new vectors to the store — the shared [[freshAgainst]]
    * dedup + replay guard, then the staged partitioned append. */
  def appendVectorStore(s: SparkSession, path: String, rawBatch: DataFrame): Unit = {
    import s.implicits._
    // normalize array NULLABILITY only: tightly-encoded sources
    // (e.g. a streaming Dataset of tuples) carry array<float> NOT
    // NULL, which the schema-drift guard would reject against the
    // stored nullable column. A non-float element type is left
    // untouched so the guard still FAILFASTs loudly — an
    // unconditional cast would silently narrow doubles or null out
    // strings past the very check meant to reject them.
    val batch = rawBatch.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) =>
        rawBatch.withColumn("embedding", col("embedding").cast("array<float>"))
      case _ => rawBatch
    }
    val fresh = freshAgainst(s, path, batch)
    graft.sources.Catalog.appendPartitioned(s,
      withBucket(fresh.select($"vec_id", $"embedding")), path, Seq("bk"))
  }

  /** A partial store (crashed build, no _SUCCESS) would not fail a
    * search loudly — missing query vectors silently drop whole
    * queries and missing candidates vanish from the re-rank's inner
    * join — so every indexed-search entry point checks completeness
    * first, like the stored-codes searches do. */
  private def requireVectorStore(s: SparkSession, vecStorePath: String): Unit =
    require(graft.sources.Catalog.tableComplete(s, vecStorePath),
      s"$vecStorePath is not a complete vector store (crashed build?)")

  /** Bucket-pruned fetch of specific vec_ids from the store, as the
    * integer-scaled (vec_id, iv, nrm) frame. */
  private def fetchVectors(s: SparkSession, vecStorePath: String,
    ids: Seq[Long]): DataFrame = {
    import s.implicits._
    val bks = ids.map(i => Math.floorMod(i, PqBuckets).toLong).distinct
    intEmbOf(s.read.parquet(vecStorePath)
      .filter($"bk".isin(bks: _*) && $"vec_id".isin(ids: _*))
      .select($"vec_id", $"embedding"))
  }

  /** Re-rank against the bucketed store: collect the bounded
    * candidate set (request-plane), fetch only its buckets, exact
    * integer-cosine top-[[K]]. */
  private def indexedRerank(s: SparkSession, vecStorePath: String,
    cand: DataFrame, qdf: DataFrame): DataFrame = {
    import s.implicits._
    val candRows = cand.select($"qid", $"vid", $"adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val vecs = fetchVectors(s, vecStorePath, candRows.map(_._2).distinct)
    pqRerank(vecs, candRows.toDF("qid", "vid", "adc"), qdf)
  }

  /** Fully-stored PQ search: both scan paths are index-shaped — ADC
    * over the codes table (ReadSchema [vec_id, codes]), re-rank over
    * ONLY the candidate buckets of the vector store — and the model
    * comes from the index itself. The self-contained reader entry
    * point: two paths in, neighbors out. */
  def pqSearchIndexed(s: SparkSession, vecStorePath: String,
    codesPath: String): DataFrame = {
    import s.implicits._
    requireVectorStore(s, vecStorePath)
    val cent = loadPqIndex(s, codesPath)
    val qdf = pqQueryFrame(s,
      fetchVectors(s, vecStorePath, 0L until NQueries), cent)
    val codes = s.read.parquet(codesPath).select($"vec_id", $"codes")
    indexedRerank(s, vecStorePath, pqAdcCandidates(codes, qdf), qdf)
  }

  /** Fully-stored IVFADC search — as [[pqSearchIndexed]]: probed-list
    * partition-pruned ADC + candidate-bucket-pruned re-rank, model
    * from the index. */
  def ivfPqSearchIndexed(s: SparkSession, vecStorePath: String,
    codesPath: String): DataFrame = {
    import s.implicits._
    requireVectorStore(s, vecStorePath)
    val (lists, pq) = loadIvfPqIndex(s, codesPath)
    val qe = fetchVectors(s, vecStorePath, 0L until NQueries)
    val (qdf, probeDf, allProbed) = ivfPqQueryFrames(s, qe, lists, pq)
    val codes = s.read.parquet(codesPath).select($"vec_id", $"codes", $"acid")
    indexedRerank(s, vecStorePath,
      ivfPqCandidates(codes, probeDf, allProbed), qdf)
  }

  /** Exact integer-cosine re-rank of the ADC candidates (broadcast
    * candidate semi-join → one pruned pass over the vectors for
    * ≤ [[PqCand]]·[[NQueries]] rows), then the shared top-[[K]]. */
  private def pqRerank(e: DataFrame, cand: DataFrame, qdf: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val scored = e
      .join(broadcast(cand.select($"qid", $"vid")), e("vec_id") === $"vid")
      .join(broadcast(qdf.select($"qid".as("jqid"), $"qiv", $"qnrm")),
        $"qid" === $"jqid")
      .withColumn("dot", VectorOps.dot("qiv", "iv"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"qnrm", $"nrm"))
      .select($"qid", $"vid", $"dot", $"cosine")
    topK(scored)
  }

  /** Search a STORED codes table: the production path. The ADC stage
    * scans `codesPath` only (ReadSchema `[vec_id, codes]`, asserted in
    * the spec); vectors are touched once, for the bounded re-rank. */
  def pqSearchStored(s: SparkSession, dir: String, codesPath: String,
    cent: Seq[Seq[Seq[Long]]]): DataFrame = {
    import s.implicits._
    require(graft.sources.Catalog.tableComplete(s, codesPath),
      s"$codesPath is not a complete codes table (crashed build?)")
    val e = intEmb(s, dir)
    val qdf = pqQueryFrame(s, e, cent)
    val codes = s.read.parquet(codesPath).select($"vec_id", $"codes")
    pqRerank(e, pqAdcCandidates(codes, qdf), qdf)
  }

  def qAnnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = intEmb(s, dir)
    // one head collect feeds both the seed and the query frame
    val head = pqHead(e, NQueries + PqK)
    val cent = pqTrainFrom(e, pqSeedOf(head, NQueries))
    val qdf = pqQueryFrameOf(s, head, cent)
    val codes = withCodes(e.select($"vec_id", $"iv"), cent)
      .select($"vec_id", $"codes")
    pqRerank(e, pqAdcCandidates(codes, qdf), qdf)
  }

  // ---------------------------------------------------------------
  /** IVF×PQ (IVFADC) — the full composed ANN index, at rest: every
    * vector is assigned to its IVF list and its RESIDUAL against the
    * list centroid is compressed to PQ codes, stored as a codes table
    * PARTITIONED BY the list id. Residual (not raw) quantization is
    * the classic IVFADC choice: residual norms are far smaller than
    * vector norms, so the same [[PqK]]-centroid budget resolves the
    * differences that matter within a probed list. A search then
    *  1. picks each query's [[NProbe]] nearest lists driver-side
    *     (scoring the ≤[[NCentroids]]-entry codebook — request
    *     parameters, not data) and builds one residual LUT PER
    *     probed list (lut[m][k] vs the query's residual against that
    *     list's centroid);
    *  2. scans ONLY the probed list partitions (`acid IN (...)` is a
    *     static partition filter — ~NProbe/NCentroids of the table is
    *     LISTED, let alone read) with ReadSchema `[vec_id, codes]`;
    *  3. LUT-ADC scores those candidates (the list-id equi-join picks
    *     each candidate's matching per-list LUT), salted
    *     top-[[PqCand]];
    *  4. exact integer-cosine re-rank of the bounded candidate set.
    * That is the 100 TB similarity-search shape: IVF bounds the I/O,
    * PQ bounds the bytes per row, the re-rank bounds the exactness
    * cost. Though approximate w.r.t. brute force (both stages prune),
    * the pipeline is deterministic integer math end-to-end, so
    * [[qAnnIvfPqSql]] re-derives it in full as a DuckDB oracle and
    * the row is hash-checked; the spec additionally pins stored≡
    * in-plan parity, partition pruning, probed-list discipline, and
    * recall. */
  /** Literal cid → centroid-vector map (model parameters). */
  private def centMapCol(lists: Seq[(Long, Seq[Long], Long)]): Column =
    map(lists.flatMap { case (cid, civ, _) =>
      Seq(lit(cid), typedLit(civ)) }: _*)

  /** RESIDUAL frame: iv ← iv − centroid(assigned list), plus `acid`.
    * Classic IVFADC quantizes residuals, not raw vectors — residual
    * norms are much smaller than vector norms, so the same
    * [[PqK]]-centroid budget spends its resolution where the query
    * actually discriminates (within the probed list).
    *
    * MATERIALIZED (localCheckpoint): the residual is a computed
    * column, and projection collapse would otherwise inline its whole
    * expression tree (list argmax + subtraction) into every one of
    * the 128 slice references inside the codes argmin — measured as a
    * ~4× query blowup. A production build materializes residuals
    * transiently before encoding anyway (the stored codes are the
    * durable artifact); checkpointing here is that same step. */
  private[graft] def residualFrame(e: DataFrame,
    lists: Seq[(Long, Seq[Long], Long)], pinned: Boolean = false): DataFrame = {
    import e.sparkSession.implicits._
    val r = withListAssignment(e, lists)
      .withColumn("cvec", element_at(centMapCol(lists), $"acid"))
      .select($"vec_id",
        expr("zip_with(iv, cvec, (a, b) -> a - b)").as("iv"),
        $"acid")
    // pinned=true materializes via persist (an InMemoryRelation is an
    // equally good projection-collapse barrier) so the caller can
    // RELEASE the blocks deterministically with unpersist — required
    // on the per-micro-batch append path, where localCheckpoint
    // blocks would otherwise accrete until driver GC. Query/build
    // paths keep localCheckpoint (blocks die with the plan).
    if (pinned) { val p = r.persist(); p.count(); p }
    else r.localCheckpoint()
  }

  def buildIvfPqIndex(s: SparkSession, dir: String, codesPath: String)
    : (Seq[(Long, Seq[Long], Long)], Seq[Seq[Seq[Long]]]) =
    buildIvfPqIndexOf(s, Tables.embeddings(s, dir), codesPath)

  /** [[buildIvfPqIndex]] over an explicit (vec_id, embedding) corpus
    * frame — the ingest-pipeline entry point. Idempotent AND
    * consistent: over a complete index nothing retrains and the
    * STORED (lists, pq) model is returned — a freshly trained model
    * over a drifted corpus would silently mismatch the stored codes.
    * The corpus frame stays pinned from coarse training through the
    * eager residual materialization (one persist lifetime instead of
    * re-deriving intVec per phase). */
  def buildIvfPqIndexOf(s: SparkSession, raw: DataFrame, codesPath: String)
    : (Seq[(Long, Seq[Long], Long)], Seq[Seq[Seq[Long]]]) = {
    import s.implicits._
    if (graft.sources.Catalog.tableComplete(s, codesPath))
      return loadIvfPqIndex(s, codesPath)
    requireNoPartialCodes(s, codesPath)
    graft.sources.Catalog.dropIfExists(s, modelPath(codesPath))
    val e = intEmbOf(raw).persist()
    try {
      val lists = ivfTrain(e, pin = false)
      val res = residualFrame(e, lists) // eager checkpoint — e is done after this
      val pq = pqTrain(res.select($"vec_id", $"iv"), seedBase = IvfPqSeedBase)
      val coded = withCodes(res, pq)
        .select($"vec_id", $"codes", $"acid")
      graft.sources.Catalog.createIfAbsent(s,
        ivfModelRows(s, lists).union(pqModelRows(s, pq)), modelPath(codesPath))
      graft.sources.Catalog.createPartitionedIfAbsent(s, coded, codesPath, Seq("acid"))
      (lists, pq)
    } finally { e.unpersist(false); () }
  }

  /** Incremental ingest for the IVFADC index: assign ONLY `rawBatch`
    * to its IVF lists, residual-encode against the FROZEN (lists, pq)
    * model, and append into the matching `acid=` partitions — batch
    * cost tracks the batch (plus the replay-guard scan of stored
    * vec_ids, as in [[appendPqVectors]]); existing partitions stay
    * prunable. Spec-proven bit-identical to a full re-encode of the
    * union under the same model and idempotent under batch replay;
    * retraining either codebook is a rebuild event. */
  def appendIvfPqVectors(s: SparkSession, codesPath: String,
    lists: Seq[(Long, Seq[Long], Long)], pq: Seq[Seq[Seq[Long]]],
    rawBatch: DataFrame): Unit = {
    import s.implicits._
    // see appendPqVectors: deterministic in-batch dedup on the
    // identity key, then a replay guard pruned to the batch's own
    // lists (assignment is a pure function of the vector under the
    // frozen model, so a duplicate lands in the same acid partition)
    val res = residualFrame(intEmbOf(dedupBatchDet(rawBatch)),
      lists, pinned = true)
    try {
      val acids = res.select($"acid").distinct().collect().map(_.getLong(0)).toSeq
      val fresh = withCodes(res, pq).select($"vec_id", $"codes", $"acid")
        .join(s.read.parquet(codesPath).filter($"acid".isin(acids: _*))
          .select($"vec_id"), Seq("vec_id"), "left_anti")
      graft.sources.Catalog.appendPartitioned(s, fresh, codesPath, Seq("acid"))
    } finally { res.unpersist(false); () }
  }

  /** Streaming ingest into a stored ANN index: each micro-batch of
    * (vec_id, embedding) rows is encoded and appended. The codebook
    * is NOT a parameter — it is loaded from the index's own stored
    * model (the only codebook that can be correct for this table;
    * taking one from the caller would let a retrained model silently
    * poison the codes), and the model's kind decides PQ vs IVFADC.
    * The append replay guard turns at-least-once delivery into
    * effectively-exactly-once table content, and each batch first
    * resolves any crashed append commit ([[graft.sources.Catalog
    * .recoverAppends]] — deterministic roll-forward/back), so the
    * stream self-heals after a kill instead of refusing on the
    * leftover staging dir. Single-writer per index, like every
    * appender here.
    *
    * With `vecStorePath` set, each batch ALSO lands in the bucketed
    * vector store — STORE FIRST, codes second: a concurrent search
    * resolves every codes row it finds (an extra store row without
    * codes is invisible — only candidates are fetched), whereas the
    * reverse order opens a window where a true neighbor's codes are
    * scannable but its vector is absent and the re-rank's inner join
    * silently drops it. Both appends carry their own replay guard,
    * so a crash between the two converges on replay under either
    * order; the ordering buys read consistency, keeping
    * [[pqSearchIndexed]]/[[ivfPqSearchIndexed]] serviceable under
    * streaming ingest.
    *
    * File accretion (one file per touched partition per batch) is
    * folded OUT-OF-BAND with [[graft.sources.Catalog
    * .compactPartitions]] while the stream is stopped — unlike
    * [[graft.sources.ObjectIndex]]'s manifest-guarded in-loop fold,
    * compactPartitions' dynamic-overwrite rewrite is not crash-
    * atomic, so it stays a maintenance-window operation under the
    * single-writer discipline rather than running inside the loop. */
  def ingestVectorStream(vecs: DataFrame, codesPath: String,
    checkpointPath: String, vecStorePath: Option[String] = None)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    val rows = loadModelRows(vecs.sparkSession, codesPath)
    val ivfPq = rows.exists(_._1 == "ivf")
    val pq = pqModelOf(rows)
    val lists = if (ivfPq) ivfModelOf(rows) else Seq.empty
    vecs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // each appender runs its own dedup + guard + write actions
        // against this frame — pin it once so the micro-batch is not
        // recomputed per action (4× for dual-target ingest)
        val b = batch.persist()
        try {
          vecStorePath.foreach { sp =>
            graft.sources.Catalog.recoverAppends(s, sp)
            appendVectorStore(s, sp, b)
          }
          graft.sources.Catalog.recoverAppends(s, codesPath)
          if (ivfPq) appendIvfPqVectors(s, codesPath, lists, pq, b)
          else appendPqVectors(s, codesPath, pq, b)
        } finally { b.unpersist(false); () }
      }
      .start()
  }

  /** Driver-side probe selection: the query's [[NProbe]] nearest IVF
    * lists by (cosine desc, cid asc) — same ordering as the in-plan
    * assignment. */
  private def probeListsFor(qiv: Seq[Long], qnrm: Long,
    lists: Seq[(Long, Seq[Long], Long)]): Seq[Long] =
    lists.map { case (cid, civ, cn) =>
      val dot = qiv.zip(civ).map { case (a, b) => a * b }.sum
      (dot.toDouble / (math.sqrt(qnrm.toDouble) * math.sqrt(cn.toDouble)), cid)
    }.sortBy { case (cos, cid) => (-cos, cid) }.take(NProbe).map(_._2)

  /** Probe-side frames, driver-built: `qdf` carries (qid, qiv, qnrm)
    * for the exact re-rank; `probeDf` carries one row per (query,
    * probed list) with THAT LIST's residual LUT — lut[m][k] = integer
    * L2 between the query's residual against the list centroid and
    * PQ centroid k (the IVFADC per-list lookup table). */
  private def ivfPqQueryFrames(s: SparkSession, e: DataFrame,
    lists: Seq[(Long, Seq[Long], Long)], pq: Seq[Seq[Seq[Long]]])
    : (DataFrame, DataFrame, Seq[Long]) = {
    import s.implicits._
    val qs = e.filter($"vec_id" < NQueries)
      .select($"vec_id", $"iv", $"nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    ivfPqQueryFramesOf(s, qs, lists, pq)
  }

  /** [[ivfPqQueryFrames]] from already-collected query rows (the
    * [[pqHead]] fuse) — identical frames, zero extra jobs. */
  private def ivfPqQueryFramesOf(s: SparkSession,
    qrows: Seq[(Long, Seq[Long], Long)],
    lists: Seq[(Long, Seq[Long], Long)], pq: Seq[Seq[Seq[Long]]])
    : (DataFrame, DataFrame, Seq[Long]) = {
    import s.implicits._
    val qs = qrows.filter(_._1 < NQueries)
    val probeRows = qs.flatMap { case (qid, qiv, qnrm) =>
      probeListsFor(qiv, qnrm, lists).map { pa =>
        val civ = lists.find(_._1 == pa).get._2
        val qres = qiv.zip(civ).map { case (a, b) => a - b }
        (qid, pa, pqLut(pq, qres))
      }
    }
    (qs.map { case (qid, qiv, qnrm) => (qid, qiv, qnrm) }
      .toDF("qid", "qiv", "qnrm"),
      probeRows.toDF("qid", "pacid", "lut"),
      probeRows.map(_._2).distinct)
  }

  /** ADC candidates from a LIST-PARTITIONED codes frame: the probed
    * lists arrive as a static IN partition filter plus a per-query
    * equi-join on the list id, which also selects the right per-list
    * residual LUT. */
  private def ivfPqCandidates(codes: DataFrame, probeDf: DataFrame,
    allProbed: Seq[Long]): DataFrame = {
    import codes.sparkSession.implicits._
    topByAdc(codes
      .filter($"acid".isin(allProbed: _*))
      .join(broadcast(probeDf), $"acid" === $"pacid" && $"vec_id" =!= $"qid")
      .withColumn("adc", adcCol)
      .select($"qid", $"vec_id".as("vid"), $"adc"))
  }

  private def ivfPqSearch(s: SparkSession, e: DataFrame, codes: DataFrame,
    lists: Seq[(Long, Seq[Long], Long)], pq: Seq[Seq[Seq[Long]]],
    qrows: Seq[(Long, Seq[Long], Long)] = null): DataFrame = {
    val (qdf, probeDf, allProbed) =
      if (qrows != null) ivfPqQueryFramesOf(s, qrows, lists, pq)
      else ivfPqQueryFrames(s, e, lists, pq)
    pqRerank(e, ivfPqCandidates(codes, probeDf, allProbed), qdf)
  }

  /** Search the STORED list-partitioned codes table (the production
    * path; spec asserts partition pruning + pruned ReadSchema). */
  def ivfPqSearchStored(s: SparkSession, dir: String, codesPath: String,
    lists: Seq[(Long, Seq[Long], Long)], pq: Seq[Seq[Seq[Long]]]): DataFrame = {
    import s.implicits._
    require(graft.sources.Catalog.tableComplete(s, codesPath),
      s"$codesPath is not a complete codes table (crashed build?)")
    ivfPqSearch(s, intEmb(s, dir),
      s.read.parquet(codesPath).select($"vec_id", $"codes", $"acid"), lists, pq)
  }

  def qAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one persist lifetime across coarse training, the eager residual
    // materialization, and the driver-side query-frame collects; the
    // returned frame's re-rank scan re-derives from parquet (lazy,
    // after the unpersist — same as a stored-index search would)
    val e = intEmb(s, dir).persist()
    try {
      // one head collect feeds the IVF seed AND the query frames
      val head = pqHead(e, NQueries + NCentroids)
      val lists = ivfTrainFrom(e, ivfSeedOf(head), IvfIters, pin = false)
      val res = residualFrame(e, lists)
      val pq = pqTrain(res.select($"vec_id", $"iv"), seedBase = IvfPqSeedBase)
      val codes = withCodes(res, pq)
        .select($"vec_id", $"codes", $"acid")
      ivfPqSearch(s, e, codes, lists, pq, qrows = head)
    } finally { e.unpersist(false); () }
  }

  // ---------------------------------------------------------------
  // Registered STORED searches — the production path (pre-built codes
  // table + bucketed vector store, both scans index-shaped) as
  // first-class query entries, so the bench measures what production
  // runs and CORRECTNESS hash-checks it. The index artifacts resolve
  // per corpus exactly like [[ivfStoredModel]]'s: built once into a
  // data-identity-keyed cache location (a regenerated corpus gets a
  // fresh key), reused by every later execution — the create-if-
  // absent builders make re-resolution a no-op, never a rebuild.
  // Results are bit-identical to the in-plan q_ann_pq / q_ann_ivfpq
  // (training is deterministic from the same data), so the same
  // DuckDB oracles hash-check them.

  /** Resolve (build-once) the shared bucketed vector store for `dir`. */
  private def ensureVectorStore(s: SparkSession, dir: String): String = {
    val path = annCachePath(dir, "vecstore")
    if (!graft.sources.Catalog.tableComplete(s, path))
      graft.sources.Catalog.dropIfExists(s, path) // our crashed cache build
    buildVectorStore(s, Tables.embeddings(s, dir), path)
    path
  }

  /** Resolve (build-once) a stored codes index for `dir`; `ivf`
    * selects IVFADC vs flat PQ. A partial cache dir is OUR crashed
    * build — resolved by dropping codes AND model before the builder
    * (whose partial-dir guard protects USER tables, not this cache). */
  private def ensureCodesIndex(s: SparkSession, dir: String, ivf: Boolean): String = {
    val path = annCachePath(dir, if (ivf) "ivfpq_codes" else "pq_codes")
    if (!graft.sources.Catalog.tableComplete(s, path)) {
      graft.sources.Catalog.dropIfExists(s, path)
      graft.sources.Catalog.dropIfExists(s, modelPath(path))
    }
    if (ivf) buildIvfPqIndexOf(s, Tables.embeddings(s, dir), path)
    else buildPqIndexOf(s, Tables.embeddings(s, dir), path)
    path
  }

  def qAnnPqStored(s: SparkSession, dir: String): DataFrame =
    pqSearchIndexed(s, ensureVectorStore(s, dir), ensureCodesIndex(s, dir, ivf = false))

  def qAnnIvfPqStored(s: SparkSession, dir: String): DataFrame =
    ivfPqSearchIndexed(s, ensureVectorStore(s, dir), ensureCodesIndex(s, dir, ivf = true))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_bruteforce" -> (qAnnBruteforce _),
    "q_ann_range" -> (qAnnRange _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_ann_mips" -> (qAnnMips _),
    "q_ann_range_lsh" -> (qAnnRangeLsh _),
    "q_ann_range_recall" -> (qAnnRangeRecall _),
    "q_ann_filtered" -> (qAnnFiltered _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_ann_recall_curve" -> (qAnnRecallCurve _),
    "q_ann_recall_ivfpq" -> (qAnnRecallIvfpq _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_ann_pq" -> (qAnnPq _),
    "q_pq_distortion" -> (qPqDistortion _),
    "q_ann_ivfpq" -> (qAnnIvfPq _),
    "q_ann_pq_stored" -> (qAnnPqStored _),
    "q_ann_ivfpq_stored" -> (qAnnIvfPqStored _),
    "q_kmeans_profile" -> (qKmeansProfile _),
    "q_semdedup" -> (qSemdedup _))

  val oracles: Map[String, String] = Map(
    "q_ann_bruteforce" -> qAnnBruteforceSql,
    "q_ann_range" -> qAnnRangeSql,
    "q_hard_negatives" -> qHardNegativesSql,
    "q_ann_mips" -> qAnnMipsSql,
    "q_ann_range_lsh" -> qAnnRangeLshSql,
    "q_ann_range_recall" -> qAnnRangeRecallSql,
    "q_ann_filtered" -> qAnnFilteredSql,
    "q_ann_recall" -> qAnnRecallSql,
    "q_ann_recall_curve" -> qAnnRecallCurveSql,
    "q_ann_recall_ivfpq" -> qAnnRecallIvfpqSql,
    "q_ann_lsh" -> qAnnLshSql,
    "q_ann_ivf" -> qAnnIvfSql,
    "q_ann_pq" -> qAnnPqSql,
    "q_pq_distortion" -> qPqDistortionSql,
    "q_ann_ivfpq" -> qAnnIvfPqSql,
    // the stored searches return bit-identical results to their
    // in-plan twins (deterministic training over the same corpus), so
    // the same unrolled-training oracles hash-check them
    "q_ann_pq_stored" -> qAnnPqSql,
    "q_ann_ivfpq_stored" -> qAnnIvfPqSql,
    "q_kmeans_profile" -> qKmeansProfileSql,
    "q_semdedup" -> qSemdedupSql)
}
