package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupAnnSpec extends AnyFunSuite {
  import SparkTestSession._

  for ((name, fn) <- queries.Dedup.defs ++ queries.Ann.defs) {
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q_dedup_exact covers every doc and canonical <= doc_id") {
    val df = queries.Dedup.qDedupExact(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter("canonical_id > doc_id").count() == 0)
  }

  test("q_ngram_jaccard finds the planted near-dup pairs, all j >= 50%") {
    val df = queries.Dedup.qNgramJaccard(spark, sf)
    assert(df.count() >= 10, "expected planted near-dup pairs")
    assert(df.filter("jac_pct < 50 OR d1 >= d2").count() == 0)
  }

  test("q_dedup_lsh_pairs recalls most exact-Jaccard pairs") {
    val exact = queries.Dedup.qNgramJaccard(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = queries.Dedup.qDedupLshPairs(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & lsh).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.7, s"LSH recall $recall too low (${exact.size} exact, ${lsh.size} lsh)")
  }

  test("q_dedup_simhash pairs are within hamming 3") {
    val df = queries.Dedup.qDedupSimhash(spark, sf)
    assert(df.filter("hamming > 3 OR d1 >= d2").count() == 0)
  }

  test("q_ann_bruteforce returns exactly k ranked neighbors per query") {
    val df = queries.Ann.qAnnBruteforce(spark, sf).cache()
    val per = df.groupBy("qid").count().collect()
    assert(per.length == 5 && per.forall(_.getLong(1) == 10))
    assert(df.filter("rnk < 1 OR rnk > 10").count() == 0)
    // ranks strictly follow cosine descending within each query
    val bad = df.selectExpr("qid",
      "cosine - lead(cosine) OVER (PARTITION BY qid ORDER BY rnk) AS step")
      .filter("step < 0").count()
    assert(bad == 0)
    df.unpersist()
  }

  test("q_ann_lsh results are a subset of brute-force candidates' buckets") {
    val df = queries.Ann.qAnnLsh(spark, sf)
    assert(df.count() > 0)
    assert(df.filter("rnk > 10").count() == 0)
  }

  test("no cartesian product in the pair plans") {
    for (q <- Seq(queries.Dedup.qNgramJaccard(spark, sf),
      queries.Dedup.qDedupLshPairs(spark, sf),
      queries.Dedup.qDedupSimhash(spark, sf),
      queries.Dedup.qDedupEmbedding(spark, sf))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), "cartesian in pair plan")
    }
  }
}
