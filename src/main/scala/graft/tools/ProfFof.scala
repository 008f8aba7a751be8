package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev forensic tool (the [[ProfMotion]] pattern): stage-by-stage cost
  * breakdown of q_fof_groups — control-plane count vs the linking-pair
  * grid vs the contracted-CC closure — against `SPARK_GRAFT_SF_DIR`,
  * so the optimization rounds attack the measured stage. */
object ProfFof {
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
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.sql("select 1").count()
    t("warm-up q_fof_groups")(noop(
      graft.SparkEntry.queries("q_fof_groups")(spark, sf)))
    import graft.queries.Spatial
    val pts = Spatial.points(spark, sf)
    val n = t("control-plane count")(pts.count())
    val link = Spatial.fofLinkDeg(n)
    println(s"  n = $n, link = $link deg")
    val pairs = t("linking-pair grid (pin)") {
      val p = Spatial.fofPairsForProf(spark, sf).localCheckpoint(true)
      println("  pairs = " + p.count()); p
    }
    t("contractedComponents over pinned")(noop(
      graft.queries.Dedup.contractedComponents(pairs)))
    t("q_fof_groups again")(noop(
      graft.SparkEntry.queries("q_fof_groups")(spark, sf)))
    spark.stop()
  }
}
