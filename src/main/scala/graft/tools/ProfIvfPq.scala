package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev forensic tool (like [[ProfCc]]/[[ProfAssoc]]): stage-by-stage
  * cost breakdown of q_ann_ivfpq's in-plan job ladder — head collect,
  * coarse IVF training, residual materialization, residual-PQ
  * training, and the ADC search/re-rank — against
  * `SPARK_GRAFT_SF_DIR`. */
object ProfIvfPq {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.sql("select 1").count()
    t("cold: q_ann_ivfpq") {
      graft.SparkEntry.queries("q_ann_ivfpq")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    t("warm: q_ann_ivfpq") {
      graft.SparkEntry.queries("q_ann_ivfpq")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    import graft.queries.Ann._
    import spark.implicits._
    val e = t("persist intEmb + count") {
      val x = intEmb(spark, sf).persist(); x.count(); x
    }
    val head = t("pqHead collect")(pqHead(e, 13))
    val lists = t("ivfTrainFrom (2 iters)")(
      ivfTrainFrom(e, ivfSeedOf(head), pin = false))
    val res = t("residualFrame (localCheckpoint)")(residualFrame(e, lists))
    val pq = t("pqTrain on residuals (2 iters)")(
      pqTrain(res.select($"vec_id", $"iv"), seedBase = IvfPqSeedBase))
    t("withCodes + select + noop write") {
      withCodes(res, pq).select($"vec_id", $"codes", $"acid")
        .write.format("noop").mode("overwrite").save()
    }
    t("q_ann_pq (for comparison)") {
      graft.SparkEntry.queries("q_ann_pq")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    // A/B the two pqTrain aggregate shapes interleaved in one JVM
    // (cross-JVM runs disagreed by 1.5x on the same binary).
    val ein = res.select($"vec_id", $"iv")
    val wideHead = pqHead(e, IvfPqSeedBase + 8)
    val abSeed = pqSeedOf(wideHead, IvfPqSeedBase)
    for (rep <- 1 to 3) {
      t(s"pqTrainFrom NEW (fused) rep$rep")(pqTrainFrom(ein, abSeed))
      t(s"pqTrain OLD (2-explode) rep$rep")(pqTrainOldShape(ein, abSeed))
    }
    spark.stop()
  }

  /** The r13 pqTrainFrom aggregate shape, verbatim, for A/B. */
  private def pqTrainOldShape(df: org.apache.spark.sql.DataFrame,
    seed: Seq[Seq[Seq[Long]]], iters: Int = 2): Seq[Seq[Seq[Long]]] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    import graft.queries.Ann.withCodes
    val PqM = 8; val PqK = 8; val PqSub = 8
    var cent = seed
    for (_ <- 1 to iters) {
      val stats = withCodes(df.select($"vec_id", $"iv"), cent)
        .select($"iv", posexplode($"codes").as(Seq("m", "code")))
        .select($"m", $"code",
          posexplode(expr(s"slice(iv, m * $PqSub + 1, $PqSub)")).as(Seq("d", "v")))
        .groupBy($"m", $"code", $"d")
        .agg(sum($"v").as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          Math.floorDiv(r.getLong(3), r.getLong(4)))).toMap
      cent = (0 until PqM).map(m => (0 until PqK).map(k => (0 until PqSub).map(d =>
        stats.getOrElse((m, k, d), cent(m)(k)(d)))))
    }
    cent
  }
}
