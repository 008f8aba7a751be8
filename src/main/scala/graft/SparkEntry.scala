package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreOlap.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreOlap.defs ++ TimeSeries.defs ++ Spatial.defs ++ Text.defs ++
      Dedup.defs ++ Ann.defs ++ Multimodal.defs ++ Sketches.defs ++
      Behavior.defs ++ Quality.defs ++ Bpe.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreOlap.oracles ++ TimeSeries.oracles ++ Spatial.oracles ++
      Text.oracles ++ Dedup.oracles ++ Ann.oracles ++ Multimodal.oracles ++
      Sketches.oracles ++ Behavior.oracles ++ Quality.oracles ++ Bpe.oracles

  /** SQL surface: register every catalog table of `dir` as a temp
    * view so `spark.sql("SELECT ... FROM lineitem ...")` works — the
    * reference's users write SQL, and with `GraftExtensions` active
    * the custom functions (minhash_sig, simhash64, …) resolve there
    * too. Views are lazy; no data moves at registration. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
      }
}
