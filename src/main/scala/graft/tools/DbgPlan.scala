package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: bisect which composition layer makes q_transit_recovery's
  * PLANNING blow up (r19 opt round forensic). */
object DbgPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    import spark.implicits._
    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f
      val n = df.queryExecution.optimizedPlan.collect { case p => p }.size
      println(f"$name%-28s plan_nodes=$n " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val q = graft.queries.TimeSeries
    val ser = q.series(spark, sf)
    val nc = q.transitInjCells.size.toLong
    val nb = 16
    def aug = ser
      .filter($"user_id".isNotNull)
      .withColumn("c", explode(typedLit(q.transitInjCells)))
      .filter($"event_id" % 8 < $"c._3")
      .withColumn("p_inj",
        element_at(typedLit(q.PeriodGridUs), ($"user_id" % 16).cast("int") + 1))
      .withColumn("b_inj", expr(s"((tus % p_inj) * $nb) DIV p_inj"))
      .withColumn("hit",
        ($"b_inj" - $"user_id" % nb + nb) % nb < lit(1L) + $"user_id" % 3)
      .select(($"user_id" * nc + $"c._1").as("user_id"), $"tus",
        ($"xc" - when($"hit", $"c._2").otherwise(0L)).as("xc"))
    t("gate(ser)")(q.transitCandidatesOver(ser))
    t("gate(aug)")(q.transitCandidatesOver(aug))
    t("qTransitRecovery")(q.qTransitRecovery(spark, sf))
    t("qEbRecovery")(q.qEbRecovery(spark, sf))
    t("qEbRecoverySampled")(q.qEbRecoverySampled(spark, sf))
    spark.stop()
  }
}
