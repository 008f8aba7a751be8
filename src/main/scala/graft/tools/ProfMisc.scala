package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev forensic tool (the [[ProfAssoc]] pattern): stage-level cost of
  * the r19 optimization round's second-wave targets. */
object ProfMisc {
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
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def q(n: String) = graft.SparkEntry.queries(n)(spark, sf)
    spark.sql("select 1").count()
    t("warm q01")(noop(q("q01_pricing_summary")))

    // --- weighted median ---
    val li = graft.Tables.lineitem(spark, sf).select($"l_returnflag",
      $"l_orderkey", $"l_linenumber",
      round($"l_extendedprice" * 100).cast("long").as("pc"),
      $"l_quantity".cast("long").as("qty"))
    t("wm: raw li scan noop")(noop(li))
    t("wm: assignCells (digest + join)")(noop(
      graft.operators.RankSplit.assignCells(li, Seq("l_returnflag"), "pc")))
    t("wm: digest only")(noop(
      li.groupBy($"l_returnflag").agg(expr(
        "approx_percentile(pc, array(0.5), 1000)").as("s"))))
    t("q_weighted_median")(noop(q("q_weighted_median")))
    t("q_weighted_median again")(noop(q("q_weighted_median")))

    // --- profile ---
    t("q_profile")(noop(q("q_profile")))
    t("profile: 6 distinct one agg")(noop(
      graft.Tables.orders(spark, sf).agg(
        countDistinct($"o_orderkey"), countDistinct($"o_custkey"),
        countDistinct($"o_orderstatus"), countDistinct($"o_totalprice"),
        countDistinct($"o_orderdate"), countDistinct($"o_orderpriority"))))
    t("profile: 1 distinct")(noop(
      graft.Tables.orders(spark, sf).agg(countDistinct($"o_orderkey"))))

    // --- xmatch ambiguous ---
    t("q_xmatch_ambiguous")(noop(q("q_xmatch_ambiguous")))
    t("q_xmatch_2cat")(noop(q("q_xmatch_2cat")))

    // --- contain / edit dist ---
    val docs = graft.Tables.documents(spark, sf)
    t("contain: char gramming noop")(noop(
      docs.filter(length($"text") >= 8)
        .select($"doc_id", explode(array_distinct(expr(
          "transform(sequence(1, length(text) - 7), i -> xxhash64(substring(text, i, 8)))")))
          .as("gram"))))
    t("q_dedup_contain")(noop(q("q_dedup_contain")))
    t("q_edit_dist_pairs")(noop(q("q_edit_dist_pairs")))

    // --- ce period ---
    t("q_ce_period")(noop(q("q_ce_period")))
    t("q_ntile")(noop(q("q_ntile")))
    t("q_skyline")(noop(q("q_skyline")))
    spark.stop()
  }
}
