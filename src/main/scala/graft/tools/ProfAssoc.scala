package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev forensic tool (like [[ProfCc]]): stage-by-stage cost breakdown
  * of q_assoc_delta's warm read path — lifecycle maintenance
  * (replay-guarded ensure calls) vs the base∪delta probe itself —
  * against `SPARK_GRAFT_SF_DIR`. */
object ProfAssoc {
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
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.sql("select 1").count()
    t("warm: q_assoc_delta") {
      graft.SparkEntry.queries("q_assoc_delta")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    t("q_assoc_delta again") {
      graft.SparkEntry.queries("q_assoc_delta")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    import graft.queries.Spatial
    import org.apache.spark.sql.functions._
    val haloT = t("ensureHaloTable")(Spatial.ensureHaloTable(spark, sf))
    val deltaP = t("ensureDeltaStore")(Spatial.ensureDeltaStore(spark, sf))
    val probe = Spatial.withHomeCell(
      Spatial.detections(spark, sf).selectExpr("det_k AS k", "ra", "decl"),
      Spatial.haloGeometry(spark, haloT)._2)
    t("basePairs count") {
      Spatial.xmatchStored(probe,
        Spatial.haloTableFor(spark, haloT, 1.0), 1.0).count()
    }
    // the delta store uses its own finer geometry — probe must match
    val deltaProbe = Spatial.withHomeCell(
      Spatial.detections(spark, sf).selectExpr("det_k AS k", "ra", "decl"),
      Spatial.DeltaZoneHeight)
      .repartition(col("cell"))
    val dp = Spatial.xmatchStored(deltaProbe,
      broadcast(Spatial.deltaObjects(spark, deltaP)), 1.0)
    println("--- deltaPairs plan:")
    println(dp.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("Filter")).take(12).mkString("\n"))
    println("deltaPairs rows = " + t("deltaPairs count")(dp.count()))
    println("deltaObjects rows = " +
      t("deltaObjects count")(Spatial.deltaObjects(spark, deltaP).count()))
    t("q_assoc_history (shared ensure)") {
      graft.SparkEntry.queries("q_assoc_history")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    t("q_xmatch_stored (halo only)") {
      graft.SparkEntry.queries("q_xmatch_stored")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
