package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{TextFunctions, VectorOps}

/** Deduplication suite over `documents` / `embeddings` — the core of a
  * training-data pipeline at 100 TB.
  *
  * Scale shapes (SURVEY.md §5):
  * - exact dedup: one shuffle on the content hash (high-cardinality
  *   key — parallelism scales with the corpus).
  * - n-gram Jaccard: inverted-index join (explode distinct grams →
  *   equi-join on gram → count per pair), never an all-pairs product.
  * - MinHash: signatures in ONE pass per doc (custom Expression — no
  *   shingle explode); only rows×bands tiny keys ever shuffle.
  * - LSH: band-bucket equi-join with a bucket-size cap (skew guard);
  *   signature-estimated Jaccard verify.
  * - SimHash: 16-bit piece blocking (pigeonhole: hamming ≤ 3 over 4
  *   pieces ⇒ ≥ 1 piece equal), then exact popcount verify.
  * - embedding: sign-LSH bucket blocking + exact integer cosine.
  */
object Dedup {

  // ---------------------------------------------------------------
  /** Exact dedup: canonical = min doc_id per content hash. Window over
    * the hash (high-cardinality) — single shuffle, no join-back. */
  def qDedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"fp")
    Tables.documents(s, dir)
      .select($"doc_id", md5($"text").as("fp"))
      .withColumn("canonical_id", min($"doc_id").over(w))
      .withColumn("is_dup", ($"doc_id" =!= $"canonical_id").cast("int"))
      .orderBy($"doc_id")
  }

  val qDedupExactSql: String =
    """SELECT doc_id, fp, canonical_id,
      |  CAST(doc_id <> canonical_id AS INT) AS is_dup
      |FROM (SELECT doc_id, MD5(text) AS fp,
      |        MIN(doc_id) OVER (PARTITION BY MD5(text)) AS canonical_id
      |      FROM documents) t
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Word-3-gram sets per doc (distinct), as (doc_id, gram) rows.
    * Grams are reduced to 64-bit xxhash keys immediately: distinct and
    * the inverted-index join then run on longs instead of ~35-byte
    * strings (array_distinct has a fast primitive path; join keys are
    * 8 bytes). A 64-bit collision would perturb a count with
    * probability ~(grams²/2^65) ≈ 1e-11 — far below any practical
    * concern, and the per-doc gram cardinality `ng` stays exact the
    * same way on both sides of the threshold inequality. */
  private def gramRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", explode(array_distinct(expr(
        "transform(sequence(0, size(w) - 3), i -> xxhash64(concat_ws(' ', w[i], w[i+1], w[i+2])))")))
        .as("gram"))
  }

  private val gramRowsSql =
    """SELECT doc_id, unnest(list_distinct(
      |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS gram
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |WHERE len(w) >= 3""".stripMargin

  /** Exact n-gram Jaccard near-dup pairs (j ≥ 0.5) via inverted-index
    * join — the threshold test is the integer cross-multiplication
    * 2·|∩| ≥ |∪|, and jac_pct an integer division: exact parity. */
  def qNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = gramRows(s, dir)
    val counts = g.groupBy($"doc_id").agg(count(lit(1)).as("ng"))
    val pairs = g.select($"doc_id".as("d1"), $"gram")
      .join(g.select($"doc_id".as("d2"), $"gram"), "gram")
      .filter($"d1" < $"d2")
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("inter"))
    pairs
      .join(counts.select($"doc_id".as("d1"), $"ng".as("ng1")), "d1")
      .join(counts.select($"doc_id".as("d2"), $"ng".as("ng2")), "d2")
      .withColumn("un", $"ng1" + $"ng2" - $"inter")
      .filter($"inter" * 2 >= $"un")
      .select($"d1", $"d2", $"inter", $"un",
        expr("(100 * inter) DIV un").as("jac_pct"))
      .orderBy($"d1", $"d2")
  }

  val qNgramJaccardSql: String =
    s"""WITH g AS ($gramRowsSql),
       |n AS (SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
       |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT d1, d2, inter, na.ng + nb.ng - inter AS un,
       |  (100 * inter) // (na.ng + nb.ng - inter) AS jac_pct
       |FROM p JOIN n na ON p.d1 = na.doc_id JOIN n nb ON p.d2 = nb.doc_id
       |WHERE inter * 2 >= na.ng + nb.ng - inter
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------
  /** Per-doc MinHash signature digest (one-pass custom Expression;
    * rows-only — the signature algorithm is not ANSI-expressible). */
  def qDedupMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.minhashSig($"text", 3, 128).as("sig"))
      .select($"doc_id",
        size($"sig").as("k"),
        element_at($"sig", 1).as("sig0"),
        element_at($"sig", 2).as("sig1"),
        element_at($"sig", 3).as("sig2"),
        element_at($"sig", 4).as("sig3"),
        expr("aggregate(sig, 0L, (acc, x) -> acc ^ x)").as("sig_xor"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------
  /** MinHash-LSH candidate pairs + signature-estimated Jaccard verify.
    * 128 hashes, 32 bands × 4 rows; buckets capped at 50 docs (skew
    * guard — a degenerate bucket can never force a quadratic task).
    * Pairs with ≥ 45/128 matching positions (ĵ ≈ 0.35) survive. */
  def qDedupLshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.minhashSig($"text", 3, 128).as("sig"))
    val bands = sigs.select($"doc_id", posexplode(expr(
      "transform(sequence(0, 31), b -> hash(slice(sig, b * 4 + 1, 4), b))")))
      .toDF("doc_id", "band", "bkey")
    val wB = Window.partitionBy($"band", $"bkey")
    val capped = bands.withColumn("bsz", count(lit(1)).over(wB))
      .filter($"bsz" <= 50).drop("bsz")
    val cand = capped.select($"doc_id".as("d1"), $"band", $"bkey")
      .join(capped.select($"doc_id".as("d2"), $"band", $"bkey"),
        Seq("band", "bkey"))
      .filter($"d1" < $"d2")
      .select($"d1", $"d2").distinct()
    cand
      .join(sigs.select($"doc_id".as("d1"), $"sig".as("sig1")), "d1")
      .join(sigs.select($"doc_id".as("d2"), $"sig".as("sig2")), "d2")
      .withColumn("matches", expr(
        "aggregate(zip_with(sig1, sig2, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
      .filter($"matches" >= 45)
      .select($"d1", $"d2", $"matches",
        expr("(100 * matches) DIV 128").as("est_pct"))
      .orderBy($"d1", $"d2")
  }

  // ---------------------------------------------------------------
  /** SimHash near-dup pairs: 64-bit signature, 4×16-bit piece
    * blocking (hamming ≤ 3 ⇒ some piece equal, by pigeonhole), exact
    * popcount verify. Rows-only (custom Expression). */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.simhash64($"text").as("sh"))
    val pieces = sh.select($"doc_id", $"sh", posexplode(expr(
      "transform(sequence(0, 3), p -> shiftright(sh, p * 16) & 65535)")))
      .toDF("doc_id", "sh", "piece", "pval")
    val cand = pieces.select($"doc_id".as("d1"), $"sh".as("sh1"), $"piece", $"pval")
      .join(pieces.select($"doc_id".as("d2"), $"sh".as("sh2"), $"piece", $"pval"),
        Seq("piece", "pval"))
      .filter($"d1" < $"d2")
      .select($"d1", $"d2", $"sh1", $"sh2").distinct()
    cand
      .withColumn("hamming", expr("bit_count(sh1 ^ sh2)"))
      .filter($"hamming" <= 3)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }

  // ---------------------------------------------------------------
  /** Embedding-cosine near-dup pairs (cos ≥ 0.35): sign-LSH bucket
    * blocking (5 fixed dims → 32 buckets) + exact integer-scaled
    * cosine verify. The oracle applies the identical bucketing, so
    * the declared semantics — near-dups among same-bucket candidates
    * — is exactly reproducible. */
  val BucketDims: Seq[Int] = Seq(0, 13, 27, 41, 55)

  def qDedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).select(
      $"vec_id",
      VectorOps.intVec("embedding").as("iv"),
      VectorOps.signBucket("embedding", BucketDims).as("bucket"))
      .withColumn("nrm", VectorOps.normSq("iv"))
    val a = e.select($"vec_id".as("d1"), $"iv".as("iv1"), $"nrm".as("nrm1"), $"bucket")
    val b = e.select($"vec_id".as("d2"), $"iv".as("iv2"), $"nrm".as("nrm2"), $"bucket")
    a.join(b, "bucket")
      .filter($"d1" < $"d2")
      .withColumn("dot", VectorOps.dot("iv1", "iv2"))
      .withColumn("cosine", VectorOps.cosine($"dot", $"nrm1", $"nrm2"))
      .filter($"cosine" >= 0.35)
      .select($"d1", $"d2", $"dot", $"cosine")
      .orderBy($"d1", $"d2")
  }

  val qDedupEmbeddingSql: String = {
    val bucket = VectorOps.Sql.signBucket("embedding", BucketDims)
    s"""WITH e AS (
       |  SELECT vec_id, i, CAST(ROUND(CAST(v AS DOUBLE) * ${VectorOps.ScaleLit}) AS BIGINT) AS vi
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |n AS (SELECT vec_id, SUM(vi * vi) AS nrm FROM e GROUP BY vec_id),
       |b AS (SELECT vec_id, $bucket AS bucket FROM embeddings),
       |p AS (SELECT x.vec_id AS d1, y.vec_id AS d2
       |      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |d AS (SELECT p.d1, p.d2, CAST(SUM(ea.vi * eb.vi) AS BIGINT) AS dot
       |      FROM p JOIN e ea ON ea.vec_id = p.d1
       |             JOIN e eb ON eb.vec_id = p.d2 AND eb.i = ea.i
       |      GROUP BY 1, 2)
       |SELECT d1, d2, dot,
       |  CAST(dot AS DOUBLE) / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) AS cosine
       |FROM d JOIN n na ON na.vec_id = d1 JOIN n nb ON nb.vec_id = d2
       |WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) >= 0.35
       |ORDER BY d1, d2""".stripMargin
  }

  // ---------------------------------------------------------------
  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_lsh_pairs" -> (qDedupLshPairs _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_dedup_embedding" -> (qDedupEmbedding _))

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" -> qDedupExactSql,
    "q_ngram_jaccard" -> qNgramJaccardSql,
    "q_dedup_embedding" -> qDedupEmbeddingSql)
}
