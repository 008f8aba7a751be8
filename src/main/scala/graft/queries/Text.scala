package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{TextFunctions, TextHashAlgos}

/** Text-analysis workload over the `documents` table — the
  * quality/statistics layer of a training-data pipeline: quality
  * scoring, language ID, token counting, content fingerprinting.
  *
  * Every query is one scan + narrow per-row expressions (no shuffle at
  * all except the final presentation sort), so they scale linearly
  * with the corpus. All metrics are integers — exact parity with the
  * DuckDB oracle.
  */
object Text {

  // ---------------------------------------------------------------
  /** The corpus quality gate, defined ONCE for every consumer
    * (q_text_quality's keep flag here and Dedup.qPipelineClean's
    * filter): minimum word count and the stopword probe list. Tuning
    * the gate updates both queries and both oracles together. */
  val QualityMinWords = 40
  val StopProbeList = "'the', 'a'"

  /** Quality scoring: word counts, type-token ratio, stopword hits,
    * and a composite keep/drop flag — the usual pre-training corpus
    * filters (length, lexical diversity, stopword presence). */
  def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"source",
        length($"text").as("n_chars_actual"),
        expr("size(split(text, ' '))").as("n_words"),
        expr("size(array_distinct(split(text, ' ')))").as("n_distinct_words"),
        expr(s"size(filter(split(text, ' '), w -> w IN ($StopProbeList)))").as("stop_hits"))
      .withColumn("ttr_pct",
        expr("CAST((100 * n_distinct_words) DIV n_words AS INT)"))
      .withColumn("keep",
        when($"n_words" >= QualityMinWords && $"stop_hits" > 0, 1).otherwise(0))
      .orderBy($"doc_id")
  }

  val qTextQualitySql: String =
    s"""SELECT doc_id, lang, source,
       |  CAST(LENGTH(text) AS INT) AS n_chars_actual,
       |  CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_words,
       |  CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INT) AS n_distinct_words,
       |  CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN ($StopProbeList))) AS INT) AS stop_hits,
       |  CAST((100 * LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))) // LEN(STRING_SPLIT(text, ' ')) AS INT) AS ttr_pct,
       |  CAST(CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= $QualityMinWords
       |        AND LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN ($StopProbeList))) > 0
       |       THEN 1 ELSE 0 END AS INT) AS keep
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Stopword-overlap language ID: count marker-word hits per
    * language profile, predict the argmax (fixed tie-break order).
    * Marker sets are drawn from the corpus vocabulary so the scores
    * are non-degenerate on the synthetic data; the operator shape —
    * per-language profile scores + deterministic argmax — is the real
    * deliverable. */
  /** The marker-word score columns + argmax CASE shared by
    * [[qLangId]] (per-doc readout) and [[qLangConfusion]] (the
    * per-pair eval rollup) — one copy, so detector text can never
    * drift between the gate and its telemetry. */
  private def langScored(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    def hits(words: String) =
      expr(s"size(filter(split(text, ' '), w -> w IN ($words)))")
    docs
      .select($"doc_id", $"lang",
        hits("'the', 'a'").as("s_en"),
        hits("'query', 'table'").as("s_fr"),
        hits("'group', 'order'").as("s_de"),
        hits("'row', 'column'").as("s_es"),
        hits("'scan', 'merge'").as("s_zh"))
      .withColumn("predicted",
        when($"s_en" >= $"s_fr" && $"s_en" >= $"s_de" && $"s_en" >= $"s_es" && $"s_en" >= $"s_zh", "en")
          .when($"s_fr" >= $"s_de" && $"s_fr" >= $"s_es" && $"s_fr" >= $"s_zh", "fr")
          .when($"s_de" >= $"s_es" && $"s_de" >= $"s_zh", "de")
          .when($"s_es" >= $"s_zh", "es")
          .otherwise("zh"))
  }

  def qLangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    langScored(Tables.documents(s, dir))
      .withColumn("correct", when($"predicted" === $"lang", 1).otherwise(0))
      .orderBy($"doc_id")
  }

  /** ONE SQL copy of the detector — the marker-word score columns and
    * the argmax CASE — interpolated by BOTH [[qLangIdSql]] and
    * [[qLangConfusionSql]], mirroring the Spark-side [[langScored]]
    * factoring: the gate and its telemetry can never measure
    * different detectors on either engine. */
  private val langScoreColsSql: String = {
    def hits(words: String) =
      s"CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN ($words))) AS INT)"
    s"""${hits("'the', 'a'")} AS s_en,
       |  ${hits("'query', 'table'")} AS s_fr,
       |  ${hits("'group', 'order'")} AS s_de,
       |  ${hits("'row', 'column'")} AS s_es,
       |  ${hits("'scan', 'merge'")} AS s_zh""".stripMargin
  }
  private val langCaseSql: String =
    """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en >= s_zh THEN 'en'
      |       WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
      |       WHEN s_de >= s_es AND s_de >= s_zh THEN 'de'
      |       WHEN s_es >= s_zh THEN 'es'
      |       ELSE 'zh' END""".stripMargin

  val qLangIdSql: String =
    s"""SELECT doc_id, lang, s_en, s_fr, s_de, s_es, s_zh,
       |  $langCaseSql AS predicted,
       |  CAST(CASE WHEN ($langCaseSql) = lang THEN 1 ELSE 0 END AS INT) AS correct
       |FROM (SELECT doc_id, lang,
       |  $langScoreColsSql
       |FROM documents) t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Language-gate CONFUSION MATRIX — the eval telemetry that makes
    * the q_lang_id heuristic deployable as a filter (the same
    * recall-loop discipline the ANN family carries): per
    * (label, predicted) pair the exact count and the label-row
    * permille, so precision/recall/per-language failure modes read
    * straight off the output. A gate whose confusion is not
    * monitored silently changes the corpus mix when the detector or
    * the data drifts.
    *
    * Scale shape: one document scan through the shared codegen
    * scorer into ONE combinable (label, predicted) aggregate —
    * ≤|langs|² cells; the row totals are a second aggregate OF that
    * tiny frame, broadcast back. */
  def qLangConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // two consumers (cells + row totals) of one ≤|langs|²-row frame:
    // pin it so the corpus is scored ONCE (the ks_drift convention)
    val cnt = langScored(Tables.documents(s, dir))
      .groupBy($"lang", $"predicted").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = cnt.groupBy($"lang").agg(sum($"n").as("n_lang"))
    cnt.join(broadcast(tot), Seq("lang"))
      .withColumn("permille", expr("n * 1000 DIV n_lang"))
      .orderBy($"lang", $"predicted")
  }

  val qLangConfusionSql: String = {
    s"""WITH sc AS (SELECT doc_id, lang,
       |  $langScoreColsSql
       |FROM documents),
       |p AS (SELECT lang,
       |  $langCaseSql AS predicted
       |  FROM sc),
       |c AS (SELECT lang, predicted, COUNT(*) AS n FROM p GROUP BY 1, 2),
       |tt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang
       |  FROM c GROUP BY 1)
       |SELECT lang, predicted, n, n_lang,
       |  CAST(n * 1000 // n_lang AS BIGINT) AS permille
       |FROM c JOIN tt USING (lang)
       |ORDER BY lang, predicted""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Token counting: whitespace tokens plus a BPE-ish greedy regex
    * segmentation ([a-z]{1,4} chunks — ceil(len/4) pieces per word). */
  def qTokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        expr("size(split(text, ' '))").as("ws_tokens"),
        expr("regexp_count(text, '[a-z]{1,4}')").as("bpe_tokens"),
        length(regexp_replace($"text", " ", "")).as("n_nonspace"))
      .orderBy($"doc_id")
  }

  val qTokenCountSql: String =
    """SELECT doc_id,
      |  CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS ws_tokens,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]{1,4}')) AS INT) AS bpe_tokens,
      |  CAST(LENGTH(REPLACE(text, ' ', '')) AS INT) AS n_nonspace
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Content fingerprint: md5 of whitespace-normalized lowercase text
    * — the exact-dedup key. */
  def qFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        md5(lower(trim(regexp_replace($"text", "\\s+", " ")))).as("fp"))
      .orderBy($"doc_id")
  }

  val qFingerprintSql: String =
    """SELECT doc_id,
      |  MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Winnowing fingerprints: one row per (doc, selected k-gram
    * fingerprint) — the MOSS-style plagiarism/near-dup index. The
    * kernel is a custom one-pass Expression, but its output IS
    * oracle-expressible ([[qWinnowFingerprintSql]]): the selected
    * value per window is the window's SIGNED-min gram hash (the
    * rightmost-min tie-break only picks which index, never a
    * different value), and FNV-1a unrolls into exact HUGEINT
    * arithmetic when the text is single-byte (the oracle relies on
    * character positions = byte offsets, true for the ASCII test
    * corpus; the Spark kernel itself is byte-correct for any UTF-8). */
  def qWinnowFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        explode(TextFunctions.winnowFingerprints($"text", k = 8, w = 4)).as("fp"))
      .orderBy($"doc_id", $"fp")
  }

  /** Oracle twin of [[qWinnowFingerprint]] (k = 8, w = 4): per gram
    * start `i`, the FNV-1a 64 hash unrolled as mod-2^64 HUGEINT
    * steps, reinterpreted as a SIGNED bigint (the Expression compares
    * Java longs); a window of `w` consecutive grams selects its min;
    * DISTINCT matches the kernel's per-doc selected-set semantics. */
  val qWinnowFingerprintSql: String = {
    val (k, w) = (8, 4)
    val offset = java.lang.Long.toUnsignedString(TextHashAlgos.FnvOffset)
    val prime = java.lang.Long.toUnsignedString(TextHashAlgos.FnvPrime)
    val hashExpr = (0 until k).foldLeft(s"$offset::HUGEINT") { (acc, j) =>
      s"((xor($acc, ord(substr(text, i + $j, 1))::HUGEINT) * $prime::HUGEINT)" +
        " % 18446744073709551616::HUGEINT)"
    }
    s"""WITH g AS (
       |  SELECT doc_id, i,
       |    CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
       |              THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS h
       |  FROM (
       |    SELECT doc_id, i, $hashExpr AS h
       |    FROM (SELECT doc_id, text,
       |            unnest(range(1, length(text) - $k + 2)) AS i
       |          FROM documents WHERE length(text) >= $k))),
       |sel AS (
       |  SELECT doc_id, i,
       |    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
       |                 ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mh,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS n
       |  FROM g)
       |SELECT DISTINCT doc_id, mh AS fp
       |FROM sel WHERE i <= GREATEST(n - ${w - 1}, 1)
       |ORDER BY doc_id, fp""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Top terms per doc via TF-IDF-style weighting. The weight is the
    * exact-integer inverse document frequency `(1000·N) DIV df`
    * instead of `ln(N/df)`: Java's and DuckDB's `ln` are not
    * guaranteed bit-identical (the repo rule — reductions and ranks in
    * integer space), and the ranking it induces is the same
    * monotone-in-1/df order. Top [[TfidfTopK]] per doc is written as
    * the plain `row_number() <= k` idiom, so TopKRewrite plans it on
    * the bounded-heap TopKPerKey operator — per-doc keys are
    * high-cardinality, exactly the shape the partial flush handles.
    *
    * Shuffles: (doc, term) tf aggregate, term-keyed df aggregate +
    * join-back, and the top-k exchange of ≤ k·partitions survivors —
    * each on a key whose cardinality grows with the corpus. The 1-row
    * doc count joins in as a broadcast.
    *
    * df is a groupBy (map-side combinable) rather than a
    * count-over-Window on term: a stopword's window partition would
    * hold one row per containing DOC (≈ the corpus) in a single task.
    * The price is that Catalyst evaluates the tf subtree twice (plans
    * share no common subexpression without manual materialization) —
    * a second linear, embarrassingly-parallel pass; a production
    * pipeline materializes the (doc, term, tf) table into the catalog
    * once and feeds every downstream consumer from it. */
  val TfidfTopK = 3

  def qTfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("term"))
      .filter(length($"term") > 0)
    val tf = words.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", $"tf" * expr("(1000 * n_docs) DIV df"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")))
      .filter($"rnk" <= TfidfTopK)
      .select($"doc_id", $"term", $"tf", $"df", $"score", $"rnk")
      .orderBy($"doc_id", $"rnk")
  }

  val qTfidfSql: String =
    s"""WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
       |           FROM documents),
       |wf AS (SELECT doc_id, term FROM w WHERE LENGTH(term) > 0),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM wf GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |sc AS (SELECT t.doc_id, t.term, t.tf, d.df,
       |         t.tf * ((1000 * n.n_docs) // d.df) AS score
       |       FROM tf t JOIN df d USING (term) CROSS JOIN n),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, term) AS rnk FROM sc)
       |SELECT doc_id, term, tf, df, CAST(score AS BIGINT) AS score, CAST(rnk AS INT) AS rnk
       |FROM r WHERE rnk <= $TfidfTopK ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------
  /** Exact corpus heavy hitters (terms with ≥ [[HhPctX100]]/100 % of
    * all term occurrences) WITHOUT a full-vocabulary shuffle: a
    * Misra-Gries sketch aggregate (custom TypedImperativeAggregate,
    * [[graft.functions.MisraGries]]) nominates ≤ [[HhK]] candidates —
    * every item above n/([[HhK]]+1) ≈ 1.5% is mathematically
    * guaranteed to survive, across any partitioning/merge order — and
    * only those candidates are exactly recounted (broadcast semi-join)
    * and thresholded. The shuffle carries one ≤ 64-counter map per
    * partition instead of one row per distinct term; the recount
    * aggregates a candidate-pruned stream. The DuckDB oracle computes
    * the same heavy hitters the naive way, so parity PROVES the
    * sketch's no-false-negative guarantee end-to-end. */
  val HhK = 64
  /** Threshold in hundredths of a percent of total occurrences (2%);
    * must stay above 100·100/(HhK+1) ≈ 1.54% for the MG guarantee. */
  val HhPctX100 = 200

  def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def words = Tables.documents(s, dir)
      .select(explode(split(lower($"text"), "[^a-z]+")).as("term"))
      .filter(length($"term") > 0)
    val cand = words
      .agg(graft.functions.HeavyHitters.misraGries($"term", HhK).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item".as("term"))
    val n = words.agg(count(lit(1)).as("n_words"))
    words
      .join(broadcast(cand), "term")
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter($"cnt" * 10000L >= $"n_words" * HhPctX100)
      .select($"term", $"cnt", $"n_words")
      .orderBy($"cnt".desc, $"term")
  }

  val qHeavyHittersSql: String =
    s"""WITH w AS (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
       |           FROM documents),
       |wf AS (SELECT term FROM w WHERE LENGTH(term) > 0),
       |n AS (SELECT COUNT(*) AS n_words FROM wf),
       |c AS (SELECT term, COUNT(*) AS cnt FROM wf GROUP BY 1)
       |SELECT term, cnt, n.n_words
       |FROM c CROSS JOIN n
       |WHERE cnt * 10000 >= n.n_words * $HhPctX100
       |ORDER BY cnt DESC, term""".stripMargin

  // ---------------------------------------------------------------
  /** Deterministic stratified sampling: per-language Bernoulli rates
    * keyed on a content-independent hash of the doc id — the
    * rebalancing move a training mix runs (downsample the dominant
    * language, keep more of the rest). The first hex nibble of
    * md5(doc_id) is uniform over '0'..'f', so `nibble < '1'` keeps
    * 1/16 of `en` and `nibble < '4'` keeps 4/16 of everything else —
    * a pure string compare, identical in both engines.
    *
    * Determinism is the point: re-running the pipeline (or a failed
    * task) selects the SAME sample — no RNG state, no seed plumbing —
    * and the predicate is a per-row filter, so the scan stays
    * shuffle-free and linear. */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        substring(md5($"doc_id".cast("string")), 1, 1).as("h"))
      .filter($"h" < when($"lang" === "en", "1").otherwise("4"))
      .orderBy($"doc_id")
  }

  val qSampleStratifiedSql: String =
    """SELECT doc_id, lang, SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
      |FROM documents
      |WHERE SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1)
      |      < CASE WHEN lang = 'en' THEN '1' ELSE '4' END
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Collocation mining: adjacent-word bigrams scored by integer lift
    * `(1000·N·c(ab)) DIV (c(a)·c(b))` — the PMI ranking (PMI =
    * log lift is monotone in it, and integer lift is bit-exact across
    * engines where `ln` is not). Bigrams below [[CollocMinCount]]
    * occurrences are dropped — the standard frequency floor, and the
    * reason the surviving join side is vocabulary-sized, not
    * corpus-sized.
    *
    * Scale shape: bigram and unigram counts are map-side-combinable
    * aggregates; the two score joins key on single terms
    * (vocabulary-sized sides, Zipf-skewed but count-aggregated first,
    * so each key is ONE row — no posting-list blowup); the 1-row
    * token total broadcasts. */
  val CollocMinCount = 5

  def qCollocations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')").as("lt"))
    val uni = toks.select(explode($"lt").as("w"))
    val ucnt = uni.groupBy($"w").agg(count(lit(1)).as("c"))
    val nTok = uni.agg(count(lit(1)).as("n_tok"))
    // element_at is 1-based; the sequence guard avoids Spark's
    // descending sequence(1, 0) on 0/1-token docs
    val big = toks.select(explode(expr(
      "CASE WHEN size(lt) < 2 THEN array() ELSE " +
        "transform(sequence(1, size(lt) - 1), " +
        "i -> struct(element_at(lt, i) AS w1, element_at(lt, i + 1) AS w2)) END"))
      .as("bg"))
      .select($"bg.w1", $"bg.w2")
    val bcnt = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_ab"))
      .filter($"c_ab" >= CollocMinCount)
    bcnt
      .join(ucnt.select($"w".as("w1"), $"c".as("c_a")), "w1")
      .join(ucnt.select($"w".as("w2"), $"c".as("c_b")), "w2")
      .crossJoin(broadcast(nTok))
      // decimal(38,0) intermediates: at the 100 TB target n_tok is
      // ~1e13 and a frequent unigram pair's c_a·c_b can pass 2^63 —
      // int64 products would wrap silently (Spark) or error (DuckDB).
      // DIV on decimals is exact integral division on both engines.
      .withColumn("lift_x1000", expr(
        "CAST((CAST(1000 AS DECIMAL(38,0)) * n_tok * c_ab) " +
          "DIV (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"))
      .select($"w1", $"w2", $"c_ab", $"c_a", $"c_b", $"lift_x1000")
      .orderBy($"lift_x1000".desc, $"w1", $"w2")
  }

  val qCollocationsSql: String =
    s"""WITH toks AS (SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                x -> x <> '') AS lt FROM documents),
       |uni AS (SELECT unnest(lt) AS w FROM toks),
       |ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_tok FROM uni),
       |big AS (SELECT unnest(list_transform(range(1, len(lt)),
       |          i -> struct_pack(w1 := lt[i], w2 := lt[i + 1]))) AS bg FROM toks),
       |bcnt AS (SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS c_ab FROM big
       |         GROUP BY 1, 2 HAVING COUNT(*) >= $CollocMinCount)
       |SELECT b.w1, b.w2, b.c_ab, u1.c AS c_a, u2.c AS c_b,
       |  CAST((CAST(1000 AS HUGEINT) * n.n_tok * b.c_ab)
       |    // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS lift_x1000
       |FROM bcnt b
       |JOIN ucnt u1 ON b.w1 = u1.w
       |JOIN ucnt u2 ON b.w2 = u2.w
       |CROSS JOIN n
       |ORDER BY lift_x1000 DESC, w1, w2""".stripMargin

  // ---------------------------------------------------------------
  // ---------------------------------------------------------------
  /** Zipf rank–frequency table: corpus terms ranked by (count desc,
    * term) with their counts — the vocabulary-telemetry curve every
    * corpus health check plots. The term-count aggregate is one
    * combinable shuffle; the GLOBAL rank comes from
    * [[graft.operators.RankSplit]] (cell-bounded sorts — a plain
    * `row_number() OVER (ORDER BY cnt DESC)` would sort the whole
    * vocabulary in one task). Ranking on the negated count makes the
    * ascending rank machinery produce a descending-frequency rank.
    * The count floor keeps the report bounded; it is a tested
    * semantic (mirrored in the oracle), not hidden truncation. */
  val ZipfMinCount = 50L

  def qZipf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // RankSplit makes three linear passes over its input; without a
    // materialization each pass would re-tokenize the whole CORPUS.
    // localCheckpoint pins the (already count-floored) vocab table —
    // corpus scanned once, the three passes read the small vocab.
    val counts = Tables.documents(s, dir)
      .select(explode(split(lower($"text"), "[^a-z]+")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= ZipfMinCount)
      .withColumn("nc", -$"cnt")
      .localCheckpoint()
    graft.operators.RankSplit.rank(counts, Seq.empty, "nc",
      Seq("nc", "term"))
      .select($"__rank".as("rank"), $"term", $"cnt")
      .orderBy($"rank")
  }

  val qZipfSql: String =
    s"""WITH c AS (
       |  SELECT term, COUNT(*) AS cnt FROM (
       |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
       |    FROM documents) t
       |  WHERE term <> '' GROUP BY 1)
       |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank, term,
       |  CAST(cnt AS BIGINT) AS cnt
       |FROM c WHERE cnt >= $ZipfMinCount
       |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------
  /** Intra-document repetition filters (the Gopher/MassiveText family):
    * duplicate word-3-gram permille (how much of the doc is recycled
    * phrasing) and top-bigram coverage permille (how much one bigram
    * dominates). Docs above either threshold are machine-generated /
    * boilerplate suspects and get `keep = 0`.
    *
    * Shape for 100 TB: repetition is a PER-DOCUMENT property, so both
    * metrics are computed in ONE streaming pass per row by the native
    * [[graft.functions.RepStats]] expression (codegen static call —
    * the projection stays inside the whole-stage loop). Zero shuffle:
    * nothing leaves the document, unlike the tf/df queries; only the
    * 5-long stats vector exists outside the kernel. The declarative
    * twin [[repetitionFold]] (array `transform` + sorted run-length
    * `aggregate` fold) is kept as the property-test oracle for the
    * kernel. */
  val RepDup3PmMax = 10
  val RepTop2PmMax = 60

  def qRepetition(s: SparkSession, dir: String): DataFrame =
    repetition(Tables.documents(s, dir))

  private[graft] def repetition(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // the ≥3-words filter runs BEFORE the kernel on a cheap builtin
    // (space count ≥ 2 ⟺ n_words ≥ 3): filtering on r[0] instead
    // would push the predicate through the projection by substituting
    // the alias — re-evaluating the kernel once in the Filter and
    // again in the Project (spec-pinned to exactly one invocation)
    repGate(docs
      .filter(expr("length(text) - length(replace(text, ' ', '')) >= 2"))
      .select($"doc_id", TextFunctions.repStats($"text").as("r"))
      .select($"doc_id", $"r" (0).as("n_words"), $"r" (1).as("n3"),
        $"r" (2).as("dst3"), $"r" (3).as("mx2"), $"r" (4).as("n2")))
  }

  /** Declarative twin of [[repetition]] — same result, computed with
    * built-in array expressions (n-grams via `transform(sequence)`,
    * distinct via `array_distinct`, max bigram multiplicity as a
    * run-length `aggregate` fold over the sorted bigram array). The
    * spec proves kernel ≡ fold on randomized corpora. */
  private[graft] def repetitionFold(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    repGate(docs
      .select($"doc_id", split($"text", " ").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id",
        size($"w").cast("long").as("n_words"),
        expr("transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))").as("g3"),
        expr("array_sort(transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1])))").as("s2"))
      .select($"doc_id", $"n_words",
        expr("CAST(size(g3) AS BIGINT)").as("n3"),
        expr("CAST(size(array_distinct(g3)) AS BIGINT)").as("dst3"),
        expr("""aggregate(s2,
             named_struct('prev', CAST(NULL AS STRING),
                          'run', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT)),
             (a, x) -> named_struct(
               'prev', x,
               'run', IF(x <=> a.prev, a.run + 1, CAST(1 AS BIGINT)),
               'mx', GREATEST(a.mx, IF(x <=> a.prev, a.run + 1, CAST(1 AS BIGINT)))),
             a -> a.mx)""").as("mx2"),
        expr("CAST(size(s2) AS BIGINT)").as("n2")))
  }

  /** Shared tail: permille metrics + the keep gate over the raw
    * (n_words, n3, dst3, mx2, n2) stats. */
  private def repGate(stats: DataFrame): DataFrame = {
    import stats.sparkSession.implicits._
    stats
      .select($"doc_id", $"n_words",
        expr("(1000 * (n3 - dst3)) DIV n3").as("dup3_pm"),
        expr("(1000 * mx2) DIV n2").as("top2_pm"))
      .withColumn("keep",
        when($"dup3_pm" <= RepDup3PmMax && $"top2_pm" <= RepTop2PmMax, 1)
          .otherwise(0))
      .orderBy($"doc_id")
  }

  val qRepetitionSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |           WHERE len(string_split(text, ' ')) >= 3),
       |t3 AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                              for i in range(1, len(w) - 1)]) AS g FROM d),
       |a3 AS (SELECT doc_id, COUNT(*) AS n3, COUNT(DISTINCT g) AS dst3
       |       FROM t3 GROUP BY 1),
       |t2 AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
       |                              for i in range(1, len(w))]) AS g FROM d),
       |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM t2 GROUP BY 1, 2),
       |a2 AS (SELECT doc_id, MAX(c) AS mx2, CAST(SUM(c) AS BIGINT) AS n2
       |       FROM c2 GROUP BY 1)
       |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
       |  (1000 * (a3.n3 - a3.dst3)) // a3.n3 AS dup3_pm,
       |  (1000 * a2.mx2) // a2.n2 AS top2_pm,
       |  CASE WHEN (1000 * (a3.n3 - a3.dst3)) // a3.n3 <= $RepDup3PmMax
       |        AND (1000 * a2.mx2) // a2.n2 <= $RepTop2PmMax
       |       THEN 1 ELSE 0 END AS keep
       |FROM d JOIN a3 USING (doc_id) JOIN a2 USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Sequence packing: assign documents to fixed token-budget training
    * shards, concatenate-and-chunk style (docs are laid end-to-end in
    * order; a shard is [[PackBudget]] whitespace tokens; a doc belongs
    * to the shard its first token lands in, `n_cut` counts docs that
    * straddle a shard boundary — the padding/splitting the trainer
    * must absorb).
    *
    * Shape for 100 TB: packing is sequential per stream, so a single
    * per-source ordering would serialize the corpus. Instead docs are
    * packed within `(source, batch)` where batch = `doc_id DIV`
    * [[PackBatch]] — the ingest-batch granularity. Every window is
    * bounded by the batch size, all batches pack in parallel, and one
    * shuffle (the window partition key) does all the work; shard ids
    * are deterministic and stable under re-partitioning. */
  val PackBudget = 128L
  val PackBatch = 100L

  def qPackShards(s: SparkSession, dir: String): DataFrame =
    packShards(Tables.documents(s, dir))

  /** `toksOf`: optional (doc_id, toks) frame replacing the default
    * whitespace token counts — the hook for sizing shards in REAL
    * subword tokens ([[Bpe.bpeTokenCounts]]); whitespace counts
    * under-count exactly the sources (code, rare words) that blow a
    * token budget. The join is on the corpus key, so it rides the
    * same shuffle the packing window needs anyway. */
  private[graft] def packShards(docs: DataFrame,
    toksOf: Option[DataFrame] = None): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"source", $"batch").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = docs.select($"doc_id", $"source",
      expr(s"doc_id DIV $PackBatch").as("batch"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("ws_toks"))
    toksOf.fold(base.withColumnRenamed("ws_toks", "toks")) { t =>
      // left join + loud failure on a missing count: an inner join
      // would silently DROP any doc the token source skipped — shard
      // packing must cover the corpus or fail, never quietly lose
      // training data
      base.drop("ws_toks")
        .join(t.select($"doc_id", $"toks".cast("long").as("toks")),
          Seq("doc_id"), "left")
        .withColumn("toks", coalesce($"toks", raise_error(concat(
          lit("packShards: toksOf has no token count for doc_id "),
          $"doc_id"))))
    }
      .withColumn("cum", sum($"toks").over(w))
      // a doc is cut iff its LAST token (position cum - 1) lands in a
      // later shard than its first; ending exactly on a boundary is
      // not a cut
      .select($"doc_id", $"source", $"batch", $"toks",
        expr(s"(cum - toks) DIV $PackBudget").as("shard"),
        expr(s"CASE WHEN (cum - 1) DIV $PackBudget > (cum - toks) DIV $PackBudget THEN 1 ELSE 0 END").as("cut"))
      .groupBy($"source", $"batch", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"cut").as("n_cut"),
        min($"doc_id").as("doc_lo"), max($"doc_id").as("doc_hi"),
        sum($"toks").as("tok_sum"))
      .orderBy($"source", $"batch", $"shard")
  }

  val qPackShardsSql: String =
    s"""WITH t AS (SELECT doc_id, source, doc_id // $PackBatch AS batch,
       |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (SELECT *, SUM(toks) OVER (PARTITION BY source, batch
       |        ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
       |SELECT source, batch, CAST((cum - toks) // $PackBudget AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN (cum - 1) // $PackBudget > (cum - toks) // $PackBudget
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_cut,
       |  MIN(doc_id) AS doc_lo, MAX(doc_id) AS doc_hi,
       |  CAST(SUM(toks) AS BIGINT) AS tok_sum
       |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------
  /** Gate telemetry: per-source counts of documents failing each
    * ingest gate (too short, no stopword, repetitive) and the docs
    * that pass all three — the dashboard a corpus operator watches to
    * see WHAT the pipeline is dropping and from WHERE. Flags are
    * independent (a doc can be both short and repetitive); `n_keep`
    * is exactly [[graft.streaming.DocStream.gate]]'s survivor count
    * per source (spec-tied). Thresholds are the shared [[Text]]
    * constants.
    *
    * Shape for 100 TB: one scan, the RepStats kernel once per row
    * (flags are projected from a single aliased stats vector — no
    * filter references it, so nothing re-evaluates it), one
    * combinable groupBy(source). GREATEST guards the permille DIVs
    * for docs with no trigram (their repetition flag is false). */
  def qGateStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"source", TextFunctions.repStats($"text").as("r"),
        expr(s"size(filter(split(text, ' '), w -> w IN ($StopProbeList)))").as("stop_hits"))
      .select($"source",
        when($"r" (0) < QualityMinWords, 1).otherwise(0).as("short"),
        when($"stop_hits" === 0, 1).otherwise(0).as("nostop"),
        when($"r" (1) >= 1 &&
          (expr(s"(1000 * (r[1] - r[2])) DIV GREATEST(r[1], 1)") > RepDup3PmMax ||
            expr(s"(1000 * r[3]) DIV GREATEST(r[4], 1)") > RepTop2PmMax), 1)
          .otherwise(0).as("rep"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"short").as("n_short"), sum($"nostop").as("n_nostop"),
        sum($"rep").as("n_repeat"),
        sum(when($"short" === 0 && $"nostop" === 0 && $"rep" === 0, 1)
          .otherwise(0)).as("n_keep"))
      .orderBy($"source")
  }

  val qGateStatsSql: String =
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |t3 AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                              for i in range(1, len(w) - 1)]) AS g
       |       FROM d WHERE len(w) >= 3),
       |a3 AS (SELECT doc_id, COUNT(*) AS n3, COUNT(DISTINCT g) AS dst3
       |       FROM t3 GROUP BY 1),
       |t2 AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
       |                              for i in range(1, len(w))]) AS g
       |       FROM d WHERE len(w) >= 2),
       |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM t2 GROUP BY 1, 2),
       |a2 AS (SELECT doc_id, MAX(c) AS mx2, CAST(SUM(c) AS BIGINT) AS n2
       |       FROM c2 GROUP BY 1),
       |st AS (SELECT d.doc_id, d.source, CAST(len(d.w) AS BIGINT) AS nw,
       |        COALESCE(a3.n3, 0) AS n3, COALESCE(a3.dst3, 0) AS dst3,
       |        COALESCE(a2.mx2, 0) AS mx2, COALESCE(a2.n2, 0) AS n2,
       |        CASE WHEN LEN(LIST_FILTER(d.w, x -> x IN ($StopProbeList))) > 0
       |             THEN 0 ELSE 1 END AS nostop
       |       FROM d LEFT JOIN a3 USING (doc_id) LEFT JOIN a2 USING (doc_id)),
       |f AS (SELECT source,
       |        CASE WHEN nw < $QualityMinWords THEN 1 ELSE 0 END AS short,
       |        nostop,
       |        CASE WHEN n3 >= 1 AND
       |              ((1000 * (n3 - dst3)) // GREATEST(n3, 1) > $RepDup3PmMax
       |               OR (1000 * mx2) // GREATEST(n2, 1) > $RepTop2PmMax)
       |             THEN 1 ELSE 0 END AS rep
       |      FROM st)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(short) AS BIGINT) AS n_short,
       |  CAST(SUM(nostop) AS BIGINT) AS n_nostop,
       |  CAST(SUM(rep) AS BIGINT) AS n_repeat,
       |  CAST(SUM(CASE WHEN short = 0 AND nostop = 0 AND rep = 0
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
       |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Document chunking for embedding/retrieval pipelines: overlapping
    * fixed-token windows ([[ChunkTokens]] tokens every [[ChunkStride]],
    * so consecutive chunks share `ChunkTokens - ChunkStride` tokens of
    * context), one row per chunk with its token extent and an md5
    * content key for downstream dedup/joins.
    *
    * Shape for 100 TB: the explode factor is ⌈n_words/stride⌉ — a
    * bounded ~1.3× row expansion at these settings, all inside
    * whole-stage codegen (`sequence` + `slice` + `concat_ws`, no UDF,
    * no shuffle but the presentation sort). Chunk ids are derived
    * (doc_id, chunk_id) — deterministic under any partitioning. */
  val ChunkTokens = 64
  val ChunkStride = 48

  def qChunk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      // the last chunk is the FIRST whose window reaches the document
      // end — a further stride would emit a chunk fully contained in
      // the previous one (zero new tokens, a redundant embedding)
      .select($"doc_id", $"w",
        expr(s"explode(sequence(0, CAST(greatest(0, (size(w) - $ChunkTokens + $ChunkStride - 1) DIV $ChunkStride) AS INT)))").as("c"))
      .select($"doc_id", $"c".cast("long").as("chunk_id"),
        ($"c" * ChunkStride).cast("long").as("start_word"),
        expr(s"CAST(size(slice(w, c * $ChunkStride + 1, $ChunkTokens)) AS BIGINT)").as("n_tokens"),
        expr(s"md5(concat_ws(' ', slice(w, c * $ChunkStride + 1, $ChunkTokens)))").as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_id")
  }

  val qChunkSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |c AS (SELECT doc_id, w,
       |        unnest(range(0, greatest(0, (len(w) - $ChunkTokens + $ChunkStride - 1) // $ChunkStride) + 1)) AS c
       |      FROM d)
       |SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
       |  CAST(c * $ChunkStride AS BIGINT) AS start_word,
       |  CAST(len(list_slice(w, c * $ChunkStride + 1, c * $ChunkStride + $ChunkTokens)) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(list_slice(w, c * $ChunkStride + 1, c * $ChunkStride + $ChunkTokens), ' ')) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------
  /** Vocabulary drift telemetry: per source, how far its [[DriftK]]
    * most frequent terms diverge from the corpus-global top-[[DriftK]]
    * — overlap count and exact integer-permille Jaccard. A source
    * whose feed changed character (new domain, spam influx, encoding
    * break) drops out of the global vocabulary first.
    *
    * Shape for 100 TB: ONE corpus-scale shuffle (the combinable
    * (source, term) count); everything after runs on vocabulary-sized
    * data — global counts re-aggregate the per-source aggregate (never
    * the corpus), the global top-K is a broadcast, and the per-source
    * rank window partitions over sources. Ties break (count desc,
    * term asc) on both sides, so the K-boundary is deterministic. */
  val DriftK = 20

  def qSourceDrift(s: SparkSession, dir: String): DataFrame =
    sourceDrift(Tables.documents(s, dir))

  private[graft] def sourceDrift(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val st = docs
      .select($"source", explode(split(lower($"text"), "[^a-z]+")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"source", $"term").agg(count(lit(1)).as("cnt"))
    val globalTop = st.groupBy($"term").agg(sum($"cnt").as("cnt"))
      .orderBy($"cnt".desc, $"term").limit(DriftK).select($"term")
    val w = Window.partitionBy($"source").orderBy($"cnt".desc, $"term")
    val srcTop = st.withColumn("rk", row_number().over(w))
      .filter($"rk" <= DriftK).select($"source", $"term")
    // true Jaccard over the ACTUAL set sizes — a narrow source (or a
    // tiny global vocabulary) can have fewer than DriftK terms, and
    // those degenerate feeds are exactly what this telemetry flags
    val nGlob = globalTop.agg(count(lit(1)).as("n_glob"))
    srcTop
      .join(broadcast(globalTop.withColumn("g", lit(1))), Seq("term"), "left")
      .groupBy($"source")
      .agg(sum(coalesce($"g", lit(0))).as("n_overlap"),
        count(lit(1)).as("n_src"))
      .crossJoin(broadcast(nGlob))
      .select($"source", $"n_overlap",
        expr("(1000 * n_overlap) DIV (n_src + n_glob - n_overlap)").as("jac_pm"))
      .orderBy($"source")
  }

  val qSourceDriftSql: String =
    s"""WITH t AS (SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
       |           FROM documents),
       |st AS (SELECT source, term, COUNT(*) AS cnt FROM t
       |       WHERE term <> '' GROUP BY 1, 2),
       |g AS (SELECT term FROM (SELECT term, SUM(cnt) AS cnt FROM st GROUP BY 1)
       |      ORDER BY cnt DESC, term LIMIT $DriftK),
       |sk AS (SELECT source, term FROM (
       |         SELECT source, term,
       |           ROW_NUMBER() OVER (PARTITION BY source
       |             ORDER BY cnt DESC, term) AS rk FROM st)
       |       WHERE rk <= $DriftK),
       |ov AS (SELECT sk.source,
       |         CAST(SUM(CASE WHEN g.term IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_overlap,
       |         COUNT(*) AS n_src
       |       FROM sk LEFT JOIN g ON sk.term = g.term GROUP BY 1)
       |SELECT source, n_overlap,
       |  (1000 * n_overlap) // (n_src + (SELECT COUNT(*) FROM g) - n_overlap) AS jac_pm
       |FROM ov ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  /** Mixture budget: sample `total DIV MixBudgetDen` docs. */
  private[graft] val MixBudgetDen = 2L

  def qSourceMix(s: SparkSession, dir: String): DataFrame =
    sourceMix(Tables.documents(s, dir))

  /** Data-mixture planning + deterministic sampling — the step that
    * turns a heterogeneous corpus into a training mix: give every
    * source an equal share of the global budget, but never more than
    * it has (integer water-filling). The level L is the largest
    * integer with Σ min(avail_i, L) ≤ B; quotas are min(avail, L)
    * with the integer remainder spread one doc each to the first
    * sources (by name) that still have headroom. L falls out in
    * CLOSED FORM from one pass over the sources sorted by
    * availability: taking the i−1 smallest sources fully and leveling
    * the rest gives candidate (B − p_{i−1}) DIV (n−i+1), valid when
    * avail_{i−1} fits under it — the true level is the max valid
    * candidate (the optimum's own split produces exactly L and any
    * valid candidate is feasible, so none exceeds the optimum).
    *
    * Sampling is then deterministic and seedless: each source keeps
    * its `quota` lowest docs by (md5(doc_id), doc_id) — a stable
    * pseudo-random order both engines compute identically; the
    * per-source digest of sampled ids makes the oracle pin the exact
    * SAMPLE, not just its size.
    *
    * Scale shape: the plan (level, quotas) is computed on the
    * per-source aggregate — source-cardinality rows, so its
    * unpartitioned windows are control-plane sized by construction —
    * and the corpus-side work is one combinable count plus one
    * hash-ordered row_number per source partition (a single shuffle);
    * the quota table joins back as a broadcast. */
  private[graft] def sourceMix(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val av = docs.groupBy($"source").agg(count(lit(1)).as("avail"))
    val tot = av.agg(sum($"avail").as("total"), count(lit(1)).as("n"))
      .select($"total", $"n", expr(s"total DIV $MixBudgetDen").as("b"))
    val wOrd = Window.orderBy($"avail", $"source")
    val lvl = av.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(wOrd))
      .withColumn("pprev", coalesce(
        sum($"avail").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("aprev", coalesce(lag($"avail", 1).over(wOrd), lit(0L)))
      .withColumn("lcand", expr("(b - pprev) DIV (n - i + 1)"))
      // negative-numerator candidates are invalid in both engines
      // before division semantics could diverge: avail ≥ 1 ⇒ aprev ≥ 1
      // on any row whose prefix already exceeds the budget
      .filter($"aprev" <= $"lcand")
      .agg(max($"lcand").as("lvl"))
    val based = av.crossJoin(broadcast(lvl))
      .withColumn("base", least($"avail", $"lvl"))
    val sb = based.agg(sum($"base").as("sbase"))
    val wName = Window.orderBy($"source")
    val quotas = based.crossJoin(broadcast(sb)).crossJoin(broadcast(tot))
      .withColumn("elig", ($"avail" > $"lvl").cast("long"))
      .withColumn("erank", sum($"elig").over(wName))
      .withColumn("quota", $"base" +
        when($"elig" === 1L && $"erank" <= $"b" - $"sbase", 1L).otherwise(0L))
      .select($"source", $"avail", $"quota")
    val sampW = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val sampled = docs.select($"source", $"doc_id")
      .withColumn("rn", row_number().over(sampW))
      .join(broadcast(quotas.select($"source", $"quota")), Seq("source"))
      .filter($"rn" <= $"quota")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled"),
        expr("md5(array_join(transform(array_sort(collect_list(doc_id)), " +
          "x -> cast(x as string)), ','))").as("sample_md5"))
    quotas.join(sampled, Seq("source"), "left")
      .select($"source", $"avail", $"quota",
        coalesce($"n_sampled", lit(0L)).as("n_sampled"),
        coalesce($"sample_md5", md5(lit(""))).as("sample_md5"))
      .orderBy($"source")
  }

  val qSourceMixSql: String =
    s"""WITH av AS (SELECT source, COUNT(*) AS avail FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(avail) AS BIGINT) AS total, COUNT(*) AS n,
       |        CAST(SUM(avail) AS BIGINT) // $MixBudgetDen AS b FROM av),
       |ord AS (SELECT source, avail,
       |         ROW_NUMBER() OVER (ORDER BY avail, source) AS i,
       |         COALESCE(CAST(SUM(avail) OVER (ORDER BY avail, source
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |           0) AS pprev,
       |         COALESCE(LAG(avail) OVER (ORDER BY avail, source), 0) AS aprev
       |       FROM av),
       |lvl AS (SELECT MAX((b - pprev) // (n - i + 1)) AS lvl
       |        FROM ord, tot WHERE aprev <= (b - pprev) // (n - i + 1)),
       |base AS (SELECT source, avail, LEAST(avail, lvl) AS base, lvl
       |         FROM av, lvl),
       |sb AS (SELECT CAST(SUM(base) AS BIGINT) AS sbase FROM base),
       |qt AS (SELECT source, avail, CAST(base + CASE WHEN avail > lvl AND
       |          SUM(CASE WHEN avail > lvl THEN 1 ELSE 0 END)
       |            OVER (ORDER BY source) <= b - sbase
       |          THEN 1 ELSE 0 END AS BIGINT) AS quota
       |       FROM base, sb, tot),
       |smp AS (SELECT x.source, x.doc_id FROM (
       |         SELECT d.source, d.doc_id,
       |           ROW_NUMBER() OVER (PARTITION BY d.source
       |             ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
       |         FROM documents d) x
       |        JOIN qt ON qt.source = x.source AND x.rn <= qt.quota),
       |g AS (SELECT source, COUNT(*) AS n_sampled,
       |       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
       |         AS sample_md5
       |      FROM smp GROUP BY 1)
       |SELECT qt.source, qt.avail, qt.quota,
       |  COALESCE(g.n_sampled, 0) AS n_sampled,
       |  COALESCE(g.sample_md5, md5('')) AS sample_md5
       |FROM qt LEFT JOIN g ON g.source = qt.source
       |ORDER BY qt.source""".stripMargin

  // ---------------------------------------------------------------
  /** PII scrubbing: detect and redact e-mail addresses and phone
    * numbers before text enters a training corpus — the mandatory
    * compliance pass of every web-scale pipeline. Output per doc:
    * match counts per PII class and the md5 of the REDACTED text (the
    * fingerprint proves byte-identical redaction without shipping the
    * text through the compare).
    *
    * The synthetic corpus contains no organic PII, so a DETERMINISTIC
    * augmentation (doc_id-derived e-mail / phone suffixes, mirrored
    * exactly in the oracle) stands in for dirty text; the scrubber —
    * the regex detect + replace pipeline — is the operator under
    * test, and it never sees the injection rule.
    *
    * Scale shape: pure per-row regex expressions inside one codegen
    * stage — no shuffle, no UDF; the scan streams and the plan is
    * embarrassingly parallel at any corpus size. */
  def qPiiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val phonePat = "555-[0-9]{4}"
    val aug = Tables.documents(s, dir).select($"doc_id", concat($"text",
      when($"doc_id" % 3 === 0, concat(lit(" mail user"),
        $"doc_id".cast("string"), lit("@example.com"))).otherwise(""),
      when($"doc_id" % 5 < 2, concat(lit(" call 555-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0"))).otherwise(""))
      .as("t"))
    aug.select($"doc_id",
      regexp_count($"t", lit(emailPat)).as("n_email"),
      regexp_count($"t", lit(phonePat)).as("n_phone"),
      md5(regexp_replace(regexp_replace($"t", emailPat, "<EMAIL>"),
        phonePat, "<PHONE>")).as("red_fp"))
      .orderBy($"doc_id")
  }

  /** DuckDB redaction needs the 'g' flag (its regexp_replace is
    * first-match-only by default; Spark's is global). */
  val qPiiScrubSql: String =
    """WITH aug AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 3 = 0
      |         THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 5 < 2
      |         THEN ' call 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |         ELSE '' END AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS INT)
      |    AS n_email,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '555-[0-9]{4}')) AS INT) AS n_phone,
      |  MD5(REGEXP_REPLACE(REGEXP_REPLACE(t, '[a-z0-9]+@[a-z]+\.[a-z]+',
      |    '<EMAIL>', 'g'), '555-[0-9]{4}', '<PHONE>', 'g')) AS red_fp
      |FROM aug ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Integer-quantized "log-probability" per bigram: the number of
    * DECIMAL DIGITS of the corpus bigram count — floor(log10)+1,
    * bit-exact on both engines where float `ln` is not. Monotone in
    * the true log-count, so the ranking it induces matches a real
    * LM-likelihood ranking at this quantization. */
  private def digitsCol(c: org.apache.spark.sql.Column) =
    length(c.cast("string"))

  /** Docs whose mean quantized bigram log-count falls below this
    * (×1000) are flagged — the perplexity-filter gate (CCNet-style):
    * text made of bigrams the corpus has rarely seen is boilerplate,
    * noise, or another language. */
  val LmLowScoreX1000 = 2000L

  /** LM-likelihood quality score: train a bigram language model on
    * the corpus itself (one combinable count aggregate), then score
    * every document by its mean quantized bigram log-count and flag
    * the low-likelihood tail — the classic perplexity filter of
    * web-corpus pipelines, with integer arithmetic standing in for
    * float log-probs so the oracle hash-matches.
    *
    * Scale shape: bigram "training" is a map-combinable groupBy whose
    * key space is the observed-bigram vocabulary (Zipf-bounded, far
    * below corpus size); scoring joins the corpus bigram stream
    * against that count-aggregated table on the bigram key — the
    * exact tfidf/collocations join shape, one row per key on the
    * build side so no posting-list blowup — then folds per-doc with
    * one more combinable aggregate. Three shuffles total, all on
    * keys whose cardinality grows sub-linearly with the data. */
  def qLmScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val toks = docs.select($"doc_id",
      expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')").as("lt"))
    val bigs = toks.select($"doc_id", explode(expr(
      "CASE WHEN size(lt) < 2 THEN array() ELSE " +
        "transform(sequence(1, size(lt) - 1), " +
        "i -> struct(element_at(lt, i) AS w1, element_at(lt, i + 1) AS w2)) END"))
      .as("bg"))
      .select($"doc_id", $"bg.w1", $"bg.w2")
    val lm = bigs.groupBy($"w1", $"w2").agg(count(lit(1)).as("c"))
    val scored = bigs.join(lm, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(digitsCol($"c")).as("logp_sum"))
      .withColumn("lm_x1000",
        expr("CAST((1000 * logp_sum) DIV n_bigrams AS BIGINT)"))
    docs.select($"doc_id").join(scored, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        coalesce($"lm_x1000", lit(0L)).as("lm_x1000"))
      .withColumn("low_quality", ($"lm_x1000" < LmLowScoreX1000).cast("int"))
      .orderBy($"doc_id")
  }

  val qLmScoreSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |      x -> x <> '') AS lt FROM documents),
       |bigs AS (SELECT doc_id, unnest(list_transform(range(1, len(lt)),
       |    i -> struct_pack(w1 := lt[i], w2 := lt[i + 1]))) AS bg FROM toks),
       |b AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bigs),
       |lm AS (SELECT w1, w2, COUNT(*) AS c FROM b GROUP BY 1, 2),
       |sc AS (SELECT doc_id, COUNT(*) AS n_bigrams,
       |         SUM(LENGTH(CAST(c AS VARCHAR))) AS logp_sum
       |       FROM b JOIN lm USING (w1, w2) GROUP BY 1),
       |f AS (SELECT d.doc_id,
       |        COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       |        COALESCE(CAST((1000 * sc.logp_sum) // sc.n_bigrams AS BIGINT), 0)
       |          AS lm_x1000
       |      FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)
       |SELECT doc_id, n_bigrams, lm_x1000,
       |  CAST(lm_x1000 < $LmLowScoreX1000 AS INT) AS low_quality
       |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Shard mixing diversity — the check a trainer runs on packed
    * shards: are sources INTERLEAVED, or does a shard degenerate into
    * one source (sequential-source shards destabilize training)?
    * Docs are ordered by a deterministic content-independent
    * interleave key (md5 of the doc id — the "global shuffle" a
    * pipeline would bake in), cut into [[PackBudget]]-token shards on
    * the running token sum, and each shard reports its source
    * composition: distinct sources, the dominant source's share, and
    * Simpson/Gini diversity 1 − Σ(n_s/n)² in exact ppm (an entropy
    * surrogate that stays in integer space — no cross-engine log).
    *
    * Scale shape: the global running sum runs on [[RankSplit]]'s
    * histogram-split running weight (cell-bounded sorts — a plain
    * global window would funnel the corpus through ONE task), then
    * two combinable aggregates ((shard, source) → shard). The
    * RankSplit input is a cheap projection re-derived per pass (its
    * documented contract; the scan is the cost floor anyway). */
  def qMixDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, dir).select($"doc_id", $"source",
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("toks"),
      expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) " +
        "AS BIGINT)").as("h"))
    val ranked = graft.operators.RankSplit.rank(base, Seq.empty, "h",
      Seq("h", "doc_id"), weightCol = Some("toks"))
    val perSrc = ranked
      .withColumn("shard",
        expr(s"(${graft.operators.RankSplit.CumWCol} - toks) DIV $PackBudget"))
      .groupBy($"shard", $"source")
      .agg(count(lit(1)).as("n_s"))
    perSrc.groupBy($"shard")
      .agg(sum($"n_s").as("n_docs"),
        count(lit(1)).as("n_sources"),
        max($"n_s").as("n_top"),
        sum($"n_s" * $"n_s").as("sq"))
      .select($"shard", $"n_docs", $"n_sources",
        expr("CAST((100 * n_top) DIV n_docs AS BIGINT)").as("top_share_pct"),
        expr("CAST(1000000 - (1000000 * sq) DIV (n_docs * n_docs) AS BIGINT)")
          .as("div_ppm"))
      .orderBy($"shard")
  }

  val qMixDiversitySql: String =
    s"""WITH b AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM documents),
       |r AS (SELECT source, toks,
       |    SUM(toks) OVER (ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
       |  FROM b),
       |ps AS (SELECT CAST((cumw - toks) // $PackBudget AS BIGINT) AS shard,
       |    source, COUNT(*) AS n_s
       |  FROM r GROUP BY 1, 2),
       |a AS (SELECT shard, CAST(SUM(n_s) AS BIGINT) AS n_docs,
       |    COUNT(*) AS n_sources, CAST(MAX(n_s) AS BIGINT) AS n_top,
       |    CAST(SUM(n_s * n_s) AS BIGINT) AS sq
       |  FROM ps GROUP BY 1)
       |SELECT shard, n_docs, n_sources,
       |  CAST((100 * n_top) // n_docs AS BIGINT) AS top_share_pct,
       |  CAST(1000000 - (1000000 * sq) // (n_docs * n_docs) AS BIGINT)
       |    AS div_ppm
       |FROM a ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------
  /** Hashed-feature buckets / target slice of the importance weigher. */
  val IwBuckets = 64
  val IwTargetLang = "en"

  /** DSIR-shaped importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much its hashed-feature distribution looks
    * like a TARGET slice (here the `en` documents) relative to the
    * raw corpus, then keep each doc with probability proportional to
    * its per-token importance ratio via a deterministic content-keyed
    * coin. The published method uses hashed n-gram log-likelihood
    * ratios; the checkable contract here keeps the ratio in integer
    * space — per-bucket corpus probabilities in exact ppm, the
    * per-bucket importance ratio in exact permille (both floor
    * divisions, +1-smoothed), a doc's score the exact integer sum of
    * its tokens' bucket ratios — so the DuckDB twin hash-matches;
    * swapping the permille table for trained log-ratios changes the
    * 64 literals, not the plan.
    *
    * Scale shape: the "model" is the 64-bucket histogram — two
    * combinable counts collected as control-plane rows (the literal-
    * codebook convention of q_kmeans_profile) and handed to the
    * native [[graft.functions.IwScoreStats]] kernel as a literal, so
    * scoring is ONE codegen pass per row digesting each token off the
    * raw text bytes (no token array, no explode, no join, no shuffle
    * — and no interpreted higher-order fold, which was the previous
    * shape's whole cost), and the keep/drop coin is a per-row md5 —
    * at 100 TB the selection costs one streaming pass plus two tiny
    * aggregates. */
  def qImportanceWeight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val toks = docs.select($"doc_id", $"lang",
      expr("filter(split(text, ' '), x -> x != '')").as("toks"))
    val hist = toks.select($"lang", explode($"toks").as("tok"))
      .select($"lang", expr("CAST(conv(substring(md5(tok), 1, 2), 16, 10) " +
        s"AS BIGINT) % $IwBuckets").as("b"))
      .groupBy($"b")
      .agg(count(lit(1)).as("raw_n"),
        sum(when($"lang" === IwTargetLang, 1L).otherwise(0L)).as("tgt_n"))
      .collect()
    val rawTot = hist.map(_.getAs[Long]("raw_n")).sum
    val tgtTot = hist.map(_.getAs[Long]("tgt_n")).sum
    require(rawTot > 0 && tgtTot > 0,
      s"importance weighting needs tokens on both sides (raw=$rawTot target=$tgtTot)")
    val ratio = Array.fill(IwBuckets)(0L)
    for (r <- hist) {
      val prPpm = r.getAs[Long]("raw_n") * 1000000L / rawTot
      val ptPpm = r.getAs[Long]("tgt_n") * 1000000L / tgtTot
      ratio(r.getAs[Long]("b").toInt) = (ptPpm + 1L) * 1000L / (prPpm + 1L)
    }
    docs
      .select($"doc_id",
        graft.functions.TextFunctions
          .iwScoreStats($"text", ratio.toSeq).as("st"))
      .select($"doc_id", $"st".getItem(1).as("n_toks"),
        $"st".getItem(0).as("score"))
      .withColumn("srate_milli",
        when($"n_toks" > 0, expr("score DIV n_toks")).otherwise(lit(0L)))
      .withColumn("u_milli", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) " +
          "AS BIGINT) % 2000"))
      .withColumn("keep", ($"u_milli" < $"srate_milli").cast("int"))
      .orderBy($"doc_id")
  }

  /** Oracle twin of [[qImportanceWeight]]: the same ppm/permille
    * integer ratio table built in CTEs, the score via explode + join
    * on the bucket (every token's bucket is in the histogram by
    * construction, so the join is total). */
  val qImportanceWeightSql: String =
    s"""WITH t AS (SELECT doc_id, lang,
       |    list_filter(string_split(text, ' '), x -> x != '') AS toks
       |  FROM documents),
       |tok AS (SELECT doc_id, lang,
       |    ('0x' || substr(md5(x), 1, 2))::BIGINT % $IwBuckets AS b
       |  FROM t, UNNEST(toks) AS u(x)),
       |h AS (SELECT b, COUNT(*) AS raw_n,
       |    SUM(CASE WHEN lang = '$IwTargetLang' THEN 1 ELSE 0 END) AS tgt_n
       |  FROM tok GROUP BY 1),
       |tot AS (SELECT SUM(raw_n) AS raw_tot, SUM(tgt_n) AS tgt_tot FROM h),
       |r AS (SELECT b,
       |    ((tgt_n * 1000000 // tgt_tot) + 1) * 1000
       |      // ((raw_n * 1000000 // raw_tot) + 1) AS ratio
       |  FROM h, tot),
       |sc AS (SELECT tok.doc_id, CAST(SUM(r.ratio) AS BIGINT) AS score
       |  FROM tok JOIN r USING (b) GROUP BY 1),
       |d AS (SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
       |    COALESCE(sc.score, 0) AS score
       |  FROM t LEFT JOIN sc ON sc.doc_id = t.doc_id)
       |SELECT doc_id, n_toks, score,
       |  CASE WHEN n_toks > 0 THEN score // n_toks ELSE 0 END AS srate_milli,
       |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 2000
       |    AS u_milli,
       |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 2000
       |    < CASE WHEN n_toks > 0 THEN score // n_toks ELSE 0 END AS INT) AS keep
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Deterministic train/valid/test split census — the reproducible-
    * split primitive every training pipeline runs before anything
    * else: each document's split is a pure function of its id
    * (md5-bucket 0-999 → 980/10/10 permille), so the assignment is
    * stable across reshuffles, re-ingests, engine versions, and
    * cluster sizes (no RNG seed to version, no row order to pin —
    * the property `rand()`-based splits silently lack). Reports the
    * per-(source, split) census: doc count, char mass, and the
    * realized permille within the source (the split-skew audit — a
    * source whose realized test share drifts far from 10‰ is too
    * small to hold out from).
    *
    * Cross-engine discipline: the bucket is the house hex→int idiom
    * (conv(substr(md5,1,15)) ≡ ('0x'||substr)::BIGINT — 60 bits, so
    * no sign or overflow edge), and the permille is integer DIV
    * against a windowed per-source total cast back to BIGINT (DuckDB
    * windowed SUM promotes to hugeint).
    *
    * Scale shape: one map pass (md5 + two comparisons per row), one
    * combinable (source, split) aggregate, then the permille window
    * over the |sources|×3-row REDUCED frame — corpus-size-independent
    * post-aggregate work. */
  def qHashSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .withColumn("hb", splitBucketCol)
      .withColumn("split", splitCol(col("hb"), 980L, 990L))
    val w = Window.partitionBy($"source")
    d.groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"))
      .withColumn("src_docs", sum($"n_docs").over(w))
      .withColumn("permille", expr("n_docs * 1000 DIV src_docs"))
      .select($"source", $"split", $"n_docs", $"chars", $"src_docs",
        $"permille")
      .orderBy($"source", $"split")
  }

  /** The deterministic md5 split, ONE definition for every consumer
    * (q_hash_sample's production 980/10/10 widths, q_split_leakage's
    * audit widths): the 60-bit house hex→int bucket then threshold
    * CASE. A fix to the bucket idiom lands everywhere or nowhere. */
  private[queries] def splitBucketCol: org.apache.spark.sql.Column =
    expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15)," +
      " 16, 10) AS BIGINT) % 1000")

  private[queries] def splitCol(hb: org.apache.spark.sql.Column,
    trainMilli: Long, validMilli: Long): org.apache.spark.sql.Column =
    when(hb < trainMilli, "train").when(hb < validMilli, "valid")
      .otherwise("test")

  /** SQL twins of [[splitBucketCol]]/[[splitCol]]. */
  private[queries] val splitBucketSql: String =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000"

  private[queries] def splitCaseSql(trainMilli: Long,
    validMilli: Long): String =
    s"""CASE WHEN hb < $trainMilli THEN 'train'
       |         WHEN hb < $validMilli THEN 'valid' ELSE 'test' END"""
      .stripMargin

  /** Oracle twin: identical bucket arithmetic, hugeint sums pinned
    * back to BIGINT. */
  val qHashSampleSql: String =
    s"""WITH d AS (SELECT source, n_chars, $splitBucketSql AS hb
      |  FROM documents),
      |s AS (SELECT source,
      |    ${splitCaseSql(980L, 990L)} AS split,
      |    n_chars
      |  FROM d),
      |a AS (SELECT source, split, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM s GROUP BY 1, 2)
      |SELECT source, split, n_docs, chars,
      |  CAST(SUM(n_docs) OVER (PARTITION BY source) AS BIGINT) AS src_docs,
      |  CAST(n_docs * 1000 // SUM(n_docs) OVER (PARTITION BY source)
      |    AS BIGINT) AS permille
      |FROM a ORDER BY source, split""".stripMargin

  // ---------------------------------------------------------------
  /** Source-concentration census — the one-row corpus diagnostic a
    * mixture planner reads before [[qSourceMix]] levels anything: the
    * Gini coefficient of the per-source document counts AND of the
    * per-source character mass (the two diverge when a source has few
    * huge documents). Exact integer form over sources sorted
    * ascending with rank i (ties broken by name):
    * G·den = Σ(2i−n−1)·v_i = 2·Σi·v_i − (n+1)·Σv_i, den = n·Σv_i —
    * both sides hash the integer numerator and derive the double by
    * ONE division, so the coefficient itself is hash-exact.
    *
    * Scale shape: one combinable per-source aggregate touches the
    * corpus; the rank windows and the final fold run on the
    * |sources|-row frame (control-plane sized by construction — the
    * [[sourceMix]] discipline). Rank·value products stay < 2⁶³ for
    * any real registry (|sources| ≤ 10⁶, chars ≤ 10¹²). */
  def qGini(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val av = Tables.documents(s, dir).groupBy($"source")
      .agg(count(lit(1)).as("c"), sum($"n_chars").as("bs"))
    // |sources|-row unpartitioned windows: control-plane sized
    val wd = Window.orderBy($"c", $"source")
    val wb = Window.orderBy($"bs", $"source")
    av.withColumn("idx", row_number().over(wd).cast("long"))
      .withColumn("ib", row_number().over(wb).cast("long"))
      .agg(
        count(lit(1)).as("n_sources"),
        sum($"c").as("total_docs"),
        sum($"bs").as("total_chars"),
        sum($"idx" * $"c").as("sic"),
        sum($"ib" * $"bs").as("sib"))
      .select(
        $"n_sources", $"total_docs", $"total_chars",
        (lit(2L) * $"sic" - ($"n_sources" + 1) * $"total_docs")
          .as("gini_docs_num"),
        ((lit(2L) * $"sic" - ($"n_sources" + 1) * $"total_docs")
          .cast("double") /
          ($"n_sources" * $"total_docs").cast("double")).as("gini_docs"),
        (lit(2L) * $"sib" - ($"n_sources" + 1) * $"total_chars")
          .as("gini_chars_num"),
        ((lit(2L) * $"sib" - ($"n_sources" + 1) * $"total_chars")
          .cast("double") /
          ($"n_sources" * $"total_chars").cast("double")).as("gini_chars"))
  }

  /** Oracle twin: same ranks, same integer numerators, same single
    * IEEE divisions. */
  val qGiniSql: String =
    """WITH av AS (SELECT source, COUNT(*) AS c,
      |    CAST(SUM(n_chars) AS BIGINT) AS bs
      |  FROM documents GROUP BY 1),
      |t AS (SELECT c, bs,
      |    CAST(ROW_NUMBER() OVER (ORDER BY c, source) AS BIGINT) AS idx,
      |    CAST(ROW_NUMBER() OVER (ORDER BY bs, source) AS BIGINT) AS ib
      |  FROM av),
      |a AS (SELECT COUNT(*) AS n_sources,
      |    CAST(SUM(c) AS BIGINT) AS total_docs,
      |    CAST(SUM(bs) AS BIGINT) AS total_chars,
      |    CAST(SUM(idx*c) AS BIGINT) AS sic,
      |    CAST(SUM(ib*bs) AS BIGINT) AS sib
      |  FROM t)
      |SELECT n_sources, total_docs, total_chars,
      |  2*sic - (n_sources+1)*total_docs AS gini_docs_num,
      |  CAST(2*sic - (n_sources+1)*total_docs AS DOUBLE)
      |    / CAST(n_sources*total_docs AS DOUBLE) AS gini_docs,
      |  2*sib - (n_sources+1)*total_chars AS gini_chars_num,
      |  CAST(2*sib - (n_sources+1)*total_chars AS DOUBLE)
      |    / CAST(n_sources*total_chars AS DOUBLE) AS gini_chars
      |FROM a""".stripMargin

  // ---------------------------------------------------------------
  /** Lexical diversity per source — type–token ratio telemetry, the
    * standard repetitiveness axis of corpus curation (template/spam
    * slices score low TTR, natural prose high; the per-source means
    * are the knobs a mixture planner reads next to q_mix_diversity's
    * shard weights). Per document the type and token counts are ONE
    * codegen expression (split → filter → array_distinct → size) —
    * per-row state is the document's own token list, the same bound
    * q_quality_classifier's aggregate() already carries — and the
    * per-doc TTR is exact integer permille. The source rollup reports
    * the MACRO mean (mean of per-doc permilles, docs weighted
    * equally) and the MICRO pooled ratio (Σtypes/Σtokens, tokens
    * weighted) — the two diverge exactly when short and long
    * documents differ in repetitiveness, which is itself the signal.
    *
    * Scale shape: zero joins, zero explodes — one document scan into
    * ONE combinable |sources|-key aggregate. Empty documents are
    * excluded (no tokens → no ratio). */
  def qTtr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"source",
        expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .select($"source", size($"toks").cast("long").as("n_toks"),
        size(array_distinct($"toks")).cast("long").as("n_types"))
      .filter($"n_toks" > 0)
      .withColumn("ttr_pm", expr("n_types * 1000 DIV n_toks"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_toks").as("toks_total"),
        sum($"n_types").as("types_total"),
        sum($"ttr_pm").as("ttr_pm_sum"))
      .withColumn("ttr_pm_macro", expr("ttr_pm_sum DIV n_docs"))
      .withColumn("ttr_pm_micro", expr("types_total * 1000 DIV toks_total"))
      .select($"source", $"n_docs", $"toks_total", $"types_total",
        $"ttr_pm_macro", $"ttr_pm_micro")
      .orderBy($"source")
  }

  /** Oracle twin: list_distinct per document, identical integer
    * permilles. */
  val qTtrSql: String =
    """WITH t AS (SELECT source,
      |    list_filter(string_split(text, ' '), x -> x != '') AS toks
      |  FROM documents),
      |d AS (SELECT source, len(toks) AS n_toks,
      |    len(list_distinct(toks)) AS n_types
      |  FROM t WHERE len(toks) > 0),
      |a AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_toks) AS BIGINT) AS toks_total,
      |    CAST(SUM(n_types) AS BIGINT) AS types_total,
      |    CAST(SUM(n_types * 1000 // n_toks) AS BIGINT) AS ttr_pm_sum
      |  FROM d GROUP BY 1)
      |SELECT source, n_docs, toks_total, types_total,
      |  CAST(ttr_pm_sum // n_docs AS BIGINT) AS ttr_pm_macro,
      |  CAST(types_total * 1000 // toks_total AS BIGINT) AS ttr_pm_micro
      |FROM a ORDER BY source""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ttr" -> (qTtr _),
    "q_lang_confusion" -> (qLangConfusion _),
    "q_gini" -> (qGini _),
    "q_zipf" -> (qZipf _),
    "q_collocations" -> (qCollocations _),
    "q_tfidf" -> (qTfidf _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_text_quality" -> (qTextQuality _),
    "q_lang_id" -> (qLangId _),
    "q_token_count" -> (qTokenCount _),
    "q_fingerprint" -> (qFingerprint _),
    "q_winnow_fingerprint" -> (qWinnowFingerprint _),
    "q_repetition" -> (qRepetition _),
    "q_pack_shards" -> (qPackShards _),
    "q_gate_stats" -> (qGateStats _),
    "q_chunk" -> (qChunk _),
    "q_source_drift" -> (qSourceDrift _),
    "q_source_mix" -> (qSourceMix _),
    "q_pii_scrub" -> (qPiiScrub _),
    "q_lm_score" -> (qLmScore _),
    "q_importance_weight" -> (qImportanceWeight _),
    "q_mix_diversity" -> (qMixDiversity _),
    "q_hash_sample" -> (qHashSample _))

  val oracles: Map[String, String] = Map(
    "q_ttr" -> qTtrSql,
    "q_lang_confusion" -> qLangConfusionSql,
    "q_gini" -> qGiniSql,
    "q_zipf" -> qZipfSql,
    "q_collocations" -> qCollocationsSql,
    "q_tfidf" -> qTfidfSql,
    "q_heavy_hitters" -> qHeavyHittersSql,
    "q_sample_stratified" -> qSampleStratifiedSql,
    "q_text_quality" -> qTextQualitySql,
    "q_lang_id" -> qLangIdSql,
    "q_token_count" -> qTokenCountSql,
    "q_fingerprint" -> qFingerprintSql,
    "q_winnow_fingerprint" -> qWinnowFingerprintSql,
    "q_repetition" -> qRepetitionSql,
    "q_pack_shards" -> qPackShardsSql,
    "q_gate_stats" -> qGateStatsSql,
    "q_chunk" -> qChunkSql,
    "q_source_drift" -> qSourceDriftSql,
    "q_source_mix" -> qSourceMixSql,
    "q_pii_scrub" -> qPiiScrubSql,
    "q_lm_score" -> qLmScoreSql,
    "q_importance_weight" -> qImportanceWeightSql,
    "q_mix_diversity" -> qMixDiversitySql,
    "q_hash_sample" -> qHashSampleSql)
}
