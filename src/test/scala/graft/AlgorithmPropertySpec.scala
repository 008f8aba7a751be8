package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextHashAlgos

/** Statistical/equivalence checks for the custom kernels, independent
  * of the harness corpus (fixed-seed synthetic inputs). */
class AlgorithmPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon")

  private def doc(words: Seq[String]) = words.mkString(" ")

  private def grams(words: Seq[String]): Set[String] =
    words.sliding(3).map(_.mkString(" ")).toSet

  private def exactJ(a: Seq[String], b: Seq[String]): Double = {
    val (ga, gb) = (grams(a), grams(b))
    (ga & gb).size.toDouble / (ga | gb).size
  }

  private def estJ(a: Seq[String], b: Seq[String], k: Int): Double = {
    val sa = TextHashAlgos.minhash(UTF8String.fromString(doc(a)), 3, k).toLongArray()
    val sb = TextHashAlgos.minhash(UTF8String.fromString(doc(b)), 3, k).toLongArray()
    sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
  }

  test("minhash estimates exact 3-gram Jaccard within statistical error") {
    var totalErr = 0.0
    val trials = 40
    for (_ <- 1 to trials) {
      val base = Seq.fill(60)(vocab(rng.nextInt(vocab.size)))
      // mutate a random suffix fraction to vary true similarity
      val cut = 10 + rng.nextInt(45)
      val other = base.take(cut) ++ Seq.fill(60 - cut)(vocab(rng.nextInt(vocab.size)))
      totalErr += math.abs(exactJ(base, other) - estJ(base, other, 256))
    }
    val meanErr = totalErr / trials
    // k=256 => sd ~ sqrt(j(1-j)/256) <= 0.031; mean abs err well under 0.05
    assert(meanErr < 0.05, s"mean |est-exact| = $meanErr")
  }

  test("KMV bottom-K Jaccard: exact at full coverage, within statistical error under it") {
    // the qSourceOverlap estimator in driver form: bottom-K of the
    // union, counted against both bottom-K sketches
    def est(a: Set[Long], b: Set[Long], k: Int): Double = {
      val (ska, skb) = (a.toSeq.sorted.take(k).toSet, b.toSeq.sorted.take(k).toSet)
      val merged = (ska | skb).toSeq.sorted.take(k)
      merged.count(v => ska(v) && skb(v)).toDouble / merged.size
    }
    def randSet(n: Int): Set[Long] =
      Set.fill(n)(rng.nextLong() & Long.MaxValue)
    var totalErr = 0.0
    val trials = 40
    for (_ <- 1 to trials) {
      val shared = randSet(200 + rng.nextInt(200))
      val a = shared ++ randSet(100 + rng.nextInt(300))
      val b = shared ++ randSet(100 + rng.nextInt(300))
      val exact = (a & b).size.toDouble / (a | b).size
      // K >= |A ∪ B|: the sketch IS the set, the estimate is exact
      assert(est(a, b, 4096) == exact)
      totalErr += math.abs(est(a, b, 128) - exact)
    }
    // K=128 => sd ≈ sqrt(j(1-j)/128) <= 0.045; mean abs err well under
    val meanErr = totalErr / trials
    assert(meanErr < 0.07, s"mean |est-exact| = $meanErr")
  }

  test("span dedup conservation: total duplicated windows = windows minus distinct fingerprints") {
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val W = queries.Dedup.SpanW
    // random docs over a small vocab so windows genuinely collide
    val docs = (0L until 30L).map { id =>
      (id, Seq.fill(W + rng.nextInt(4 * W))(vocab(rng.nextInt(6))).mkString(" "))
    }.toDF("doc_id", "text")
    val out = queries.Dedup.spanDedup(docs).collect()
    // per-doc sanity: cross-dups are dups, dups are windows
    for (r <- out) {
      assert(r.getAs[Long]("n_dup_cross") <= r.getAs[Long]("n_dup"))
      assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_win"))
    }
    // conservation: every window beyond its fingerprint's first
    // occurrence is a dup, regardless of which doc holds it
    val totWin = out.map(_.getAs[Long]("n_win")).sum
    val totDup = out.map(_.getAs[Long]("n_dup")).sum
    val distinctFps = docs
      .select(explode(expr(
        s"""transform(sequence(0, size(filter(split(text, ' '), x -> x != '')) - $W),
           |i -> md5(array_join(slice(filter(split(text, ' '), x -> x != ''), i + 1, $W), ' ')))"""
          .stripMargin)).as("fp"))
      .agg(countDistinct($"fp")).head().getLong(0)
    assert(totDup == totWin - distinctFps,
      s"dup conservation broke: $totDup != $totWin - $distinctFps")
  }

  test("native vector kernels equal the declarative HOF results") {
    import SparkTestSession._
    import org.apache.spark.sql.functions._
    val df = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), graft.functions.VectorOps.intVec("embedding").as("iv"))
      .withColumn("native_norm", graft.functions.VectorOps.normSq("iv"))
      .withColumn("hof_norm", expr("aggregate(iv, 0L, (acc, x) -> acc + x * x)"))
      .withColumn("native_dot", graft.functions.VectorOps.dot("iv", "iv"))
      .withColumn("hof_dot",
        expr("aggregate(zip_with(iv, iv, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
    assert(df.filter("native_norm != hof_norm OR native_dot != hof_dot").count() == 0)
    assert(df.filter("native_norm != native_dot").count() == 0) // self-dot == normSq
  }

  test("simhash hamming distance correlates with document overlap") {
    def ham(a: Seq[String], b: Seq[String]): Int = {
      val ha = TextHashAlgos.simhash(UTF8String.fromString(doc(a)))
      val hb = TextHashAlgos.simhash(UTF8String.fromString(doc(b)))
      java.lang.Long.bitCount(ha ^ hb)
    }
    var nearSum = 0
    var farSum = 0
    val trials = 20
    for (_ <- 1 to trials) {
      val base = Seq.fill(80)(vocab(rng.nextInt(vocab.size)))
      val near = base.updated(rng.nextInt(80), vocab(rng.nextInt(vocab.size)))
      val far = Seq.fill(80)(vocab(rng.nextInt(vocab.size)))
      nearSum += ham(base, near)
      farSum += ham(base, far)
    }
    assert(nearSum < farSum, s"near=$nearSum far=$farSum")
    assert(nearSum.toDouble / trials < 4.0, s"near pairs too distant: ${nearSum / trials.toDouble}")
  }

  test("adaptive zone grid is lossless: any pair within radius lands in adjacent cells") {
    // the geometric claim behind q_zone_xmatch: for every pair within
    // the match radius, the probe's 3x3 neighborhood (in the BUILD
    // point's zone, using that zone's bucket count) covers the build
    // point's home cell. Random-pair stress over the full sky incl.
    // polar caps and the ra wrap seam.
    val radius = 1.0
    val nrb = queries.Spatial.zoneRaBuckets(radius, radius).toMap
    def distDeg(ra1: Double, d1: Double, ra2: Double, d2: Double): Double = {
      val r = math.Pi / 180
      val sd = math.sin((d1 - d2) * r / 2)
      val sr = math.sin((ra1 - ra2) * r / 2)
      val h = sd * sd + math.cos(d1 * r) * math.cos(d2 * r) * sr * sr
      math.asin(math.sqrt(h)) * 2 * 180 / math.Pi
    }
    val prng = new scala.util.Random(7)
    var checked = 0
    for (_ <- 1 to 200000) {
      val d1 = prng.nextDouble() * 170 - 85 // data's dec range
      val ra1 = prng.nextDouble() * 360
      // second point biased to be nearby (so many pairs are in-radius)
      val d2 = math.max(-85, math.min(85, d1 + (prng.nextDouble() - 0.5) * 3))
      val ra2 = (ra1 + (prng.nextDouble() - 0.5) * 30 + 360) % 360
      if (distDeg(ra1, d1, ra2, d2) < radius) {
        checked += 1
        val z1 = math.floor((d1 + 90) / radius).toInt
        val z2 = math.floor((d2 + 90) / radius).toInt
        assert(math.abs(z1 - z2) <= 1, s"zones too far: $z1 $z2 ($d1 $d2)")
        val n = nrb(z2) // the build zone's bucket count
        val c1 = math.floor(ra1 * n / 360.0).toInt
        val c2 = math.floor(ra2 * n / 360.0).toInt
        val diff = math.min(math.floorMod(c1 - c2, n), math.floorMod(c2 - c1, n))
        assert(diff <= 1,
          s"ra buckets not adjacent: c1=$c1 c2=$c2 n=$n (ra $ra1/$ra2 dec $d1/$d2)")
      }
    }
    assert(checked > 3000, s"too few in-radius pairs sampled: $checked")
  }

  test("PqAdc kernel equals the declarative LUT fold on random well-formed inputs; strict on corrupt ones") {
    // the native codegen kernel replaced aggregate(zip_with(lut,
    // codes, (l, c) -> l[c])) in the ADC hot path; on well-formed
    // inputs (equal lengths, in-range codes — the only shapes the
    // engine writes) the sums must be identical, including negative
    // distances. On corrupt shapes the HOF was silently NULL (the row
    // would vanish from ranking); the kernel fails loudly instead.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def lutData(lut: Seq[Seq[Long]]) = new GenericArrayData(
      lut.map(row => new GenericArrayData(row.toArray): Any).toArray)
    for (_ <- 1 to 200) {
      val m = 1 + rng.nextInt(12)
      val k = 1 + rng.nextInt(16)
      val lut = Seq.fill(m, k)(rng.nextLong() % 1000000L)
      val codes = Seq.fill(m)(rng.nextInt(k))
      val want = (0 until m).map(i => lut(i)(codes(i))).sum
      val got = graft.functions.VectorKernels.pqAdc(
        lutData(lut), new GenericArrayData(codes.toArray))
      assert(got == want, s"kernel $got != fold $want (m=$m k=$k)")
    }
    val lut2 = Seq(Seq(1L, 2L), Seq(3L, 4L))
    intercept[IllegalArgumentException] { // length mismatch
      graft.functions.VectorKernels.pqAdc(lutData(lut2), new GenericArrayData(Array(1)))
    }
    intercept[IllegalArgumentException] { // out-of-range code
      graft.functions.VectorKernels.pqAdc(lutData(lut2), new GenericArrayData(Array(0, 5)))
    }
  }

  test("winnowing guarantees at least one fingerprint per window span") {
    // Schleimer et al. property: any k+w-1 char run contributes >= 1
    // selected gram; check density on synthetic text
    val text = doc(Seq.fill(100)(vocab(rng.nextInt(vocab.size))))
    val fps = TextHashAlgos.winnow(UTF8String.fromString(text), 8, 4).numElements()
    val grams = text.length - 8 + 1
    assert(fps >= grams / (2 * 4), s"too few fingerprints: $fps of $grams grams")
    assert(fps <= grams, s"more fingerprints than grams")
  }

  test("multiband GLS on seeded random series: power in [0,1], equals the fixed-chain recompute") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val q = queries.TimeSeries
    val prng = new scala.util.Random(1123)
    // arbitrary (not sinusoidal) integer series over random band
    // subsets and random irregular cadence — the property is the
    // ALGEBRA (power is a normalized variance fraction in [0,1] and
    // the engine chain is bit-equal to the reference recompute), not
    // signal recovery
    val rows = (1L to 12L).flatMap { uid =>
      val bands = prng.shuffle(q.GlsBands).take(1 + prng.nextInt(5))
      bands.flatMap { b =>
        val n = 5 + prng.nextInt(60)
        (0 until n).map { _ =>
          (uid, math.abs(prng.nextLong()) % (30L * 86400000000L),
            (prng.nextInt(20001) - 10000).toLong, b)
        }
      }
    }
    val ser = rows.toSeq.toDF("user_id", "tus", "xc", "band")
    val got = q.multibandGlsOver(ser).collect()
      .map(r => r.getLong(0) -> r).toMap
    def recompute(uid: Long): Seq[(Long, Double)] = {
      val mine = rows.filter(_._1 == uid)
      q.PeriodGridUs.flatMap { p =>
        val byBand = mine.groupBy(_._4).map { case (b, rs) =>
          val cs = rs.map { case (_, t, x, _) =>
            val bin = (((t % p) * q.LsBins) / p).toInt
            (x, q.LsCosTab(bin), q.LsSinTab(bin))
          }
          val n = cs.length.toLong
          val sx = cs.map(_._1).sum; val sxx = cs.map(c => c._1 * c._1).sum
          val sc = cs.map(_._2).sum; val ss = cs.map(_._3).sum
          val sxc = cs.map(c => c._1 * c._2).sum
          val sxs = cs.map(c => c._1 * c._3).sum
          val scc = cs.map(c => c._2 * c._2).sum
          val sss = cs.map(c => c._3 * c._3).sum
          val scs = cs.map(c => c._2 * c._3).sum
          b -> Map(
            "ccn" -> (n * scc - sc * sc), "ssn" -> (n * sss - ss * ss),
            "csn" -> (n * scs - sc * ss), "xcn" -> (n * sxc - sx * sc),
            "xsn" -> (n * sxs - sx * ss), "xxn" -> (n * sxx - sx * sx),
            "n" -> n)
        }
        def tsum(stat: String): Double = q.GlsBands.map(b =>
          byBand.get(b).map(m => m(stat).toDouble / m("n").toDouble)
            .getOrElse(0.0)).reduceLeft(_ + _)
        val (a, bb, c) = (tsum("ccn"), tsum("csn"), tsum("ssn"))
        val (d, e, sst) = (tsum("xcn"), tsum("xsn"), tsum("xxn"))
        val num = c * d * d - 2.0 * bb * d * e + a * e * e
        val den = (a * c - bb * bb) * sst
        if (den > 0.0) Some((p, num / den)) else None
      }
    }
    var checked = 0
    for (uid <- 1L to 12L) {
      val powers = recompute(uid)
      if (powers.isEmpty) assert(!got.contains(uid), s"degenerate $uid kept")
      else {
        val (bestP, bestPw) = powers.maxBy { case (p, pw) => (pw, -p) }
        assert(powers.forall { case (_, pw) => pw >= 0.0 && pw <= 1.0 + 1e-9 },
          s"power left [0,1] for $uid: ${powers.filter(t => t._2 < 0 || t._2 > 1 + 1e-9)}")
        assert(got(uid).getAs[Long]("best_p_us") == bestP, s"argmax $uid")
        assert(got(uid).getAs[Double]("mb_power") == bestPw,
          s"power mismatch $uid (engine ${got(uid).getAs[Double]("mb_power")} vs $bestPw)")
        checked += 1
      }
    }
    assert(checked >= 10, s"only $checked non-degenerate objects — fixture too weak")
  }

  test("Lafler-Kinman on seeded random series: theta equals the fixed-chain recompute") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val q = queries.TimeSeries
    val prng = new scala.util.Random(6397)
    val rows = (1L to 12L).flatMap { uid =>
      val n = 3 + prng.nextInt(70)
      (0 until n).map { _ =>
        (uid, math.abs(prng.nextLong()) % (30L * 86400000000L),
          (prng.nextInt(20001) - 10000).toLong)
      }
    }
    val got = q.laflerKinmanOver(rows.toSeq.toDF("user_id", "tus", "xc"))
      .collect().map(r => r.getLong(0) -> r).toMap
    var checked = 0
    for (uid <- 1L to 12L) {
      val mine = rows.filter(_._1 == uid)
      val thetas = q.PeriodGridUs.flatMap { p =>
        val sorted = mine.map { case (_, t, x) => (t % p, t, x) }.sorted
        val xs = sorted.map(_._3)
        val n = xs.length.toLong
        val sdd = xs.zip(xs.tail).map { case (a, b) => (b - a) * (b - a) }.sum
        val sx = xs.sum; val sxx = xs.map(x => x * x).sum
        val xxn = n * sxx - sx * sx
        if (xxn > 0 && n > 1)
          Some(p -> n.toDouble * sdd.toDouble / xxn.toDouble)
        else None
      }
      if (thetas.isEmpty) assert(!got.contains(uid), s"degenerate $uid kept")
      else {
        val (bestP, bestT) = thetas.minBy { case (p, t) => (t, p) }
        assert(got(uid).getAs[Long]("best_p_us") == bestP, s"argmin $uid")
        assert(got(uid).getAs[Double]("theta") == bestT,
          s"theta mismatch $uid")
        // theta is non-negative by construction (squared steps over a
        // positive variance numerator)
        assert(thetas.forall(_._2 >= 0.0), s"negative theta for $uid")
        checked += 1
      }
    }
    assert(checked >= 10, s"only $checked non-degenerate objects — fixture too weak")
  }

  test("BLS on seeded random series: power in [0,1], equals the window-scan recompute") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val q = queries.TimeSeries
    val prng = new scala.util.Random(2459)
    // arbitrary integer series at random irregular cadence — the
    // property is the ALGEBRA (the explained-variance ratio lands in
    // [0,1] for every valid window and the engine's two-level argmax
    // is bit-equal to a full window scan), not transit recovery
    val rows = (1L to 12L).flatMap { uid =>
      val n = 4 + prng.nextInt(80)
      (0 until n).map { _ =>
        (uid, math.abs(prng.nextLong()) % (30L * 86400000000L),
          (prng.nextInt(20001) - 10000).toLong)
      }
    }
    val got = q.blsOver(rows.toSeq.toDF("user_id", "tus", "xc"))
      .collect().map(r => r.getLong(0) -> r).toMap
    var checked = 0
    for (uid <- 1L to 12L) {
      val mine = rows.filter(_._1 == uid)
      val cand = for {
        p <- q.PeriodGridUs
        bs = mine.map { case (_, t, x) =>
          (x, (((t % p) * q.BlsBins) / p).toInt) }
        n = bs.length.toLong
        sx = bs.map(_._1).sum
        xxn = n * bs.map(c => c._1 * c._1).sum - sx * sx
        w <- 1 to q.BlsMaxW
        st <- 0 until q.BlsBins
        inW = bs.filter { case (_, b) =>
          (b - st + q.BlsBins) % q.BlsBins < w }
        nw = inW.length.toLong
        if nw > 0 && nw < n && xxn > 0
        d = n * inW.map(_._1).sum - nw * sx
      } yield (d.toDouble * d.toDouble /
          ((nw.toDouble * (n - nw).toDouble) * xxn.toDouble),
        -p, -st, -w)
      if (cand.isEmpty) assert(!got.contains(uid), s"degenerate $uid kept")
      else {
        assert(cand.forall(c => c._1 >= 0.0 && c._1 <= 1.0 + 1e-9),
          s"power left [0,1] for $uid")
        val best = cand.max
        val r = got(uid)
        assert(r.getAs[Double]("bls_power") == best._1 &&
          r.getAs[Long]("best_p_us") == -best._2 &&
          r.getAs[Long]("w_start") == -best._3.toLong &&
          r.getAs[Long]("w_width") == -best._4.toLong,
          s"argmax mismatch $uid")
        checked += 1
      }
    }
    assert(checked >= 10, s"only $checked non-degenerate objects — fixture too weak")
  }
}
