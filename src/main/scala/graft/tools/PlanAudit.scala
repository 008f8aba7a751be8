package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints the scale red-flags of named
  * registry queries — cartesian products, broadcast nested loops,
  * every file scan (to eyeball ReadSchema/PushedFilters pruning) and
  * the exchange count. Usage:
  *   sbt "runMain graft.tools.PlanAudit q_a q_b [--sf=<dir>]"
  * Keeps the per-round "would this plan survive a 100× scale-up?"
  * review a one-liner instead of ad-hoc explain() spelunking. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val (flags, queries) = args.partition(_.startsWith("--"))
    val unknown = flags.filterNot(_.startsWith("--sf="))
    require(unknown.isEmpty, s"unknown flags: ${unknown.mkString(" ")} (only --sf=<dir>)")
    val badQ = queries.filterNot(graft.SparkEntry.queries.contains)
    require(badQ.isEmpty, s"unknown queries: ${badQ.mkString(" ")}")
    val sf = flags.collectFirst { case f if f.startsWith("--sf=") => f.stripPrefix("--sf=") }
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- queries.toSeq) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      println("CartesianProduct: " + plan.contains("CartesianProduct"))
      println("BroadcastNestedLoop: " + plan.contains("BroadcastNestedLoop"))
      plan.linesIterator.filter(_.contains("FileScan"))
        .foreach(s => println("SCAN: " + s.trim.take(220)))
      println("Exchanges: " + plan.linesIterator.count(_.trim.contains("Exchange")))
    }
    spark.stop()
  }
}
