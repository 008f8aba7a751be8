package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev forensic tool (the [[ProfAssoc]] pattern): stage-by-stage cost
  * breakdown of the MOPS motion family — transient derivation,
  * tracklet pair grid, chain join, fit — against SPARK_GRAFT_SF_DIR,
  * so the r19 optimization round attacks the measured stage instead of
  * the guessed one. */
object ProfMotion {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.sql("select 1").count()
    import graft.queries.Spatial
    // warm-up: JVM + codegen + parquet footers
    t("warm-up q_tracklets")(noop(
      graft.SparkEntry.queries("q_tracklets")(spark, sf)))

    val tr = t("transientFrame (checkpoint)")(
      Spatial.transientFrame(spark, sf))
    println("  transients rows = " + t("  count")(tr.count()))
    val pairs = t("trackletPairs noop")(
      { noop(Spatial.trackletPairs(spark, sf)) })
    val pinned = t("trackletPairs localCheckpoint")(
      Spatial.trackletPairs(spark, sf).localCheckpoint(true))
    println("  pairs rows = " + pinned.count())
    val ch = Spatial.chainFrame(pinned)
    t("chainFrame over pinned (noop)")(noop(ch))
    println("  chains rows = " + ch.count())
    t("q_tracklets")(noop(graft.SparkEntry.queries("q_tracklets")(spark, sf)))
    t("q_track_chains")(noop(
      graft.SparkEntry.queries("q_track_chains")(spark, sf)))
    t("q_track_motion")(noop(
      graft.SparkEntry.queries("q_track_motion")(spark, sf)))
    t("q_track_motion again")(noop(
      graft.SparkEntry.queries("q_track_motion")(spark, sf)))
    t("q_track_motion_sampled")(noop(
      graft.SparkEntry.queries("q_track_motion_sampled")(spark, sf)))
    spark.stop()
  }
}
