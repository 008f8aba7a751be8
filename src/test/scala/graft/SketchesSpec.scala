package graft

import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  import SparkTestSession._

  for ((name, fn) <- queries.Sketches.defs) {
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("q_sketch_distinct is within 5% relative error of the exact distinct count") {
    val approx = queries.Sketches.qSketchDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$k: approx $a vs exact $e exceeds 5% error")
    }
  }

  test("q_sketch_quantile p50/p95/p99 respect exact rank bounds") {
    val rows = queries.Sketches.qSketchQuantile(spark, sf).collect()
    import spark.implicits._
    for (r <- rows) {
      val et = r.getString(0)
      val xs = Tables.events(spark, sf)
        .filter($"event_type" === et)
        .select(org.apache.spark.sql.functions
          .round($"value" * 100).cast("long").as("xc"))
        .collect().map(_.getLong(0)).sorted
      // approx_percentile guarantees a value whose rank is within
      // n/accuracy of the target rank; assert a generous 2% rank band
      def rankOf(v: Long): Double = {
        val below = xs.count(_ <= v).toDouble
        below / xs.length
      }
      for ((q, v) <- Seq(0.50 -> r.getLong(2), 0.95 -> r.getLong(3), 0.99 -> r.getLong(4))) {
        val rk = rankOf(v)
        assert(rk >= q - 0.02 && rankOf(v - 1) <= q + 0.02,
          s"$et p$q: value $v at rank $rk out of band")
      }
    }
  }

  test("q_sketch_cms estimates are one-sided: estimate >= exact for every probe") {
    val rows = queries.Sketches.qSketchCms(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == queries.Sketches.CmsProbes.toSet,
      "every probe word must appear in the synthetic vocabulary")
    for (r <- rows) {
      val (w, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"$w: CMS estimate $est below exact count $exact")
    }
  }

  test("q_sketch_cms estimate equals exact when no bucket collides across all depths") {
    // with 256 buckets x 4 depths over a ~40-word vocabulary, at least
    // one probe word should have a collision-free row; for those the
    // min over depths is EXACTLY the true count — a stronger property
    // than one-sidedness that catches an off-by-one in the cell counts
    val rows = queries.Sketches.qSketchCms(spark, sf).collect()
    assert(rows.exists(r => r.getLong(2) == r.getLong(1)),
      "expected at least one collision-free probe at this vocabulary size")
  }
}
