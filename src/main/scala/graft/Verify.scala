package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query subset, for focused
    // re-verification of one oracle without the full 100+-query dump
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // dogfood the library's own extension point: SQL functions,
      // TopK strategy and the row_number-rewrite rule are active for
      // every verified query
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark 4
      // refuses by default; read as Long (nanos since epoch).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // restore cluster-like scan parallelism on the small local files
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape (shared by the marker and oracle dumps below)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Subset mode leaves stale result dirs for unselected queries in
    // place, and the downstream compare walks whichever dirs exist —
    // record WHICH queries this run re-executes so fresh results are
    // distinguishable from leftovers of older code. The marker is
    // written BEFORE the query loop (it records intent) and each
    // selected query's previous result dir is removed up front: a run
    // killed mid-loop then surfaces as MISSING results for the
    // unfinished queries, never as stale dirs compared as fresh. A
    // full run removes any previous marker (everything is fresh).
    val markerPath = Paths.get(s"$outDir/_subset.json")
    Files.deleteIfExists(markerPath)
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
    only.foreach { names =>
      names.toSeq.sorted.foreach(n => rmTree(Paths.get(s"$outDir/$n")))
      Files.writeString(markerPath,
        names.toSeq.sorted.map(q).mkString("[", ",", "]"))
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // ALWAYS dump the full oracle map, even in subset mode: a focused
    // re-run into a previously-full outDir must not shrink
    // oracle_sql.json and silently exempt every other query from the
    // next DuckDB compare (the dump is cheap; the compare walks
    // whichever result dirs exist)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
