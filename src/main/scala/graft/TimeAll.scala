package graft
import org.apache.spark.sql.SparkSession
object TimeAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      val t0 = System.nanoTime()
      spark.sql("select 1").count()
      SparkEntry.queries(n)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$n%-24s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
