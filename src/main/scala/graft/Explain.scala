package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump formatted plans for the headline queries (plan
  * audit: pushdown, pruning, join strategies, codegen spans). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    // SPARK_GRAFT_EXPLAIN_EXECUTE=1: materialize first, then print the
    // FINAL adaptive plan (AQE join selection, stage/exchange reuse,
    // skew splits are only visible post-execution).
    val execute = sys.env.get("SPARK_GRAFT_EXPLAIN_EXECUTE").contains("1")
    for (n <- names) {
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // drive df's OWN QueryExecution (a noop write would execute a
      // separate one and leave this plan initial), without collecting
      // any rows to the driver
      if (execute) df.queryExecution.toRdd.foreachPartition(_ => ())
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
