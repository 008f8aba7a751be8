package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev forensic tool (like [[graft.Explain]]): stage-by-stage cost
  * breakdown of q_dedup_clusters — pair generation vs the CC loop vs
  * the composed query — against `SPARK_GRAFT_SF_DIR`. */
object ProfCc {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.sql("select 1").count()
    // warm the input cache once
    t("warm: full query") {
      graft.SparkEntry.queries("q_dedup_clusters")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    val docs = graft.Tables.documents(spark, sf)
    val pairs = t("pairs: build+materialize") {
      val p = graft.queries.Dedup.ngramJaccardPairs(docs)
        .select("d1", "d2").localCheckpoint(true)
      p.count(); p
    }
    t("cc: over cached pairs") {
      graft.queries.Dedup.connectedComponents(
        docs.select(docs("doc_id")), pairs)
        .write.format("noop").mode("overwrite").save()
    }
    t("full query again") {
      graft.SparkEntry.queries("q_dedup_clusters")(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    t("pairs again") {
      graft.queries.Dedup.ngramJaccardPairs(docs)
        .select("d1", "d2").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
