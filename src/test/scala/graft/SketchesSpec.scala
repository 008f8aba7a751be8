package graft

import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  import SparkTestSession._

  for ((name, fn) <- queries.Sketches.defs) {
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("q_sketch_distinct: exact side matches countDistinct and every HLL++ estimate is in bound") {
    val rows = queries.Sketches.qSketchDistinct(spark, sf).collect()
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    for (r <- rows) {
      assert(r.getLong(2) == exact(r.getString(0)),
        s"${r.getString(0)}: exact_users column disagrees with countDistinct")
      assert(r.getLong(3) == 1L,
        s"${r.getString(0)}: HLL++ estimate out of the 5% in_bound band")
    }
  }

  test("q_sketch_quantile: exact disc percentiles verify against a sort, in_bound everywhere") {
    val rows = queries.Sketches.qSketchQuantile(spark, sf).collect()
    import spark.implicits._
    for (r <- rows) {
      val et = r.getString(0)
      val xs = Tables.events(spark, sf)
        .filter($"event_type" === et)
        .select(org.apache.spark.sql.functions
          .round($"value" * 100).cast("long").as("xc"))
        .collect().map(_.getLong(0)).sorted
      assert(r.getLong(1) == xs.length)
      // the hashed columns are EXACT discrete percentiles: the value
      // at rank ceil(q*n) in the total order, checked by direct sort
      for ((q, v) <- Seq(0.50 -> r.getLong(2), 0.95 -> r.getLong(3), 0.99 -> r.getLong(4))) {
        val want = xs(math.ceil(q * xs.length).toInt - 1)
        assert(v == want, s"$et p$q: got $v, sort says $want")
      }
      assert(r.getLong(5) == 1L, s"$et: approx_percentile out of the rank band")
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

  test("q_sketch_hll_merge: day-merged estimate is lossless vs one-shot and in bound") {
    import org.apache.spark.sql.functions._
    val rows = queries.Sketches.qSketchHllMerge(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one-shot whole-corpus sketch at the same lgK — register-max
    // union must reproduce its estimate EXACTLY (mergeability is
    // lossless for HLL, not just approximately right)
    val oneShot = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(queries.Sketches.HllLgK)))
        .as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = {
      val e = Tables.events(spark, sf).select(col("event_type"),
        col("user_id"), expr("(ts DIV 1000) DIV 86400000000").as("day"))
      e.groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id"), lit(queries.Sketches.HllLgK)).as("sk"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(merged == oneShot,
      s"merged daily sketches diverged from one-shot: $merged vs $oneShot")
    for (r <- rows) {
      val et = r.getString(0)
      assert(r.getLong(2) == exact(et), s"$et exact twin")
      assert(r.getLong(1) > 0, s"$et n_days")
      assert(r.getLong(3) == 1L, s"$et merged estimate out of bound " +
        s"(approx=${merged(et)}, exact=${exact(et)})")
      // the RELEASE gate: the in-plan flag sits at ~6 sigma
      // (HllMergeRelErrMax = 0.10) so a legitimate estimator
      // excursion can never read as a cross-engine parity failure;
      // the TIGHT 3-sigma accuracy contract (5% at lgK=12's ~1.6%
      // rse) is asserted HERE, where the corpus is fixed — a genuine
      // estimator bug between 3 and 6 sigma fails this spec, as
      // telemetry, instead of masquerading as an engine bug in the
      // oracle compare (r15 advice item 4).
      assert(math.abs(merged(et).toDouble - exact(et).toDouble) <=
        exact(et).toDouble * 0.05,
        s"$et merged estimate outside the tight 5% band " +
          s"(approx=${merged(et)}, exact=${exact(et)})")
    }
  }

  test("q_kmv_overlap equals the brute-force KMV sketch and bounds the union estimate") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val k = queries.Sketches.KmvK
    val docs = Tables.documents(spark, sf).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val hs: Map[String, Set[Long]] = docs.groupBy(_._1).map { case (s0, ds) =>
      s0 -> ds.map(d =>
        java.lang.Long.parseLong(md5hex(d._2).take(15), 16)).toSet
    }
    def sketch(xs: Set[Long]): Vector[Long] = xs.toVector.sorted.take(k)
    val got = queries.Sketches.qKmvOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val srcs = hs.keys.toSeq.sorted
    val expPairs = (for {
      a <- srcs; b <- srcs if a < b
    } yield (a, b)).toSet
    assert(got.keySet == expPairs)
    for ((a, b) <- expPairs) {
      val ska = sketch(hs(a)); val skb = sketch(hs(b))
      // mergeability: bottom-k of merged sketches == bottom-k of the union SET
      val merged = (ska ++ skb).distinct.sorted.take(k)
      assert(merged == sketch(hs(a) ++ hs(b)), s"($a,$b) KMV merge property")
      val kUsed = merged.length.toLong
      val kth = merged.last
      val shared = merged.count(h => ska.contains(h) && skb.contains(h)).toLong
      val estU = if (kUsed < k) kUsed.toDouble
        else (k - 1).toDouble * 1152921504606846976.0 / kth.toDouble
      val r = got((a, b))
      assert(r.getAs[Long]("k_used") == kUsed && r.getAs[Long]("kth_h") == kth,
        s"($a,$b) sketch head")
      assert(r.getAs[Long]("shared") == shared, s"($a,$b) shared")
      assert(r.getAs[Long]("jacc_milli") == shared * 1000 / kUsed)
      assert(r.getAs[Double]("est_union") == estU, s"($a,$b) est_union")
      assert(r.getAs[Double]("est_inter") ==
        shared.toDouble / kUsed.toDouble * estU)
      // the set-difference algebra (Theta completeness): the
      // side-exclusive tallies partition the union sketch exactly,
      // and each difference estimate is the same fixed chain
      val onlyA = merged.count(h => ska.contains(h) && !skb.contains(h)).toLong
      val onlyB = merged.count(h => !ska.contains(h) && skb.contains(h)).toLong
      assert(r.getAs[Long]("only_a") == onlyA, s"($a,$b) only_a")
      assert(r.getAs[Long]("only_b") == onlyB, s"($a,$b) only_b")
      assert(onlyA + onlyB + shared == kUsed,
        s"($a,$b) union sketch not partitioned by side tags")
      assert(r.getAs[Double]("est_diff_ab") ==
        onlyA.toDouble / kUsed.toDouble * estU, s"($a,$b) est_diff_ab")
      assert(r.getAs[Double]("est_diff_ba") ==
        onlyB.toDouble / kUsed.toDouble * estU, s"($a,$b) est_diff_ba")
      // each difference estimate must land within the same 4-sigma
      // band of its exact set difference as the union estimator
      val exDiffA = (hs(a) -- hs(b)).size.toDouble
      val exDiffB = (hs(b) -- hs(a)).size.toDouble
      val exUnion = (hs(a) ++ hs(b)).size.toDouble
      val band = 5.0 / math.sqrt(k.toDouble) * exUnion
      assert(math.abs(r.getAs[Double]("est_diff_ab") - exDiffA) <= band,
        s"($a,$b) est_diff_ab vs exact $exDiffA")
      assert(math.abs(r.getAs[Double]("est_diff_ba") - exDiffB) <= band,
        s"($a,$b) est_diff_ba vs exact $exDiffB")
      // the estimator must land within 5/sqrt(k) of the exact union
      // (~4 sigma: deterministic md5 makes this a fixed, replayable check)
      val exact = (hs(a) ++ hs(b)).size.toDouble
      assert(math.abs(estU - exact) <= 5.0 / math.sqrt(k.toDouble) * exact,
        s"($a,$b) est $estU vs exact $exact")
    }
  }

  test("q_sketch_bloom equals the driver-side recompute; fixture proves FP behavior") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def slices(fp: String): Seq[String] =
      (0 until 4).map(i => fp.substring(4 * i, 4 * i + 4))
    def recompute(members: Map[String, Set[String]])
      : Map[String, (Long, Long, Long, Long, Long, Long)] = {
      val global = members.values.flatten.toSet
      members.map { case (src, fps) =>
        val bits = fps.flatMap(fp => slices(fp).toSet)
        val hits = global.filter(fp => slices(fp).forall(bits.contains))
        assert(fps.subsetOf(hits), s"$src: bloom dropped a member")
        val fp = (hits -- fps).size.toLong
        src -> (fps.size.toLong, bits.size.toLong, global.size.toLong,
          hits.size.toLong, fp,
          fp * 1000000L / math.max(global.size.toLong - fps.size, 1L))
      }
    }
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // 1) the registered corpus query vs the exact recompute (at the
    //    2^16-bit size the corpus density is <1% so FP ~ 0 here —
    //    the membership math is what this half checks)
    val ll = queries.Dedup.LineLen
    val segs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        if (toks.isEmpty) Seq.empty
        else (0 to (toks.length - 1) / ll).map(i =>
          (r.getString(0), md5hex(toks.slice(i * ll, i * ll + ll)
            .mkString(" "))))
      }.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(collect(queries.Sketches.qSketchBloom(spark, sf)) ==
      recompute(segs), "corpus census mismatch")
    // 2) a planted DENSE fixture through the same plan body: 5000
    //    members saturate ~27% of the bitmap, so probing with 2000
    //    non-members false-fires w.p. ~0.5% each — P[zero FPs] ~ e^-10
    val fixture = (0 until 5000).map(i => ("a", md5hex(s"member:$i"))) ++
      (0 until 2000).map(i => ("b", md5hex(s"other:$i")))
    val fixtureMap = fixture.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val gotFix = collect(queries.Sketches.bloomCensus(
      fixture.toDF("source", "fp")))
    assert(gotFix == recompute(fixtureMap), "fixture census mismatch")
    assert(gotFix("a")._5 > 0L,
      "dense fixture produced no false positives — FP path untested")
  }
}
