package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-typed catalog source/sink — the ingest-then-query surface of
  * the reference (Pserv bulk-loads typed catalog tables from external
  * files, with idempotent create/drop management; here: schema-enforced
  * readers for parquet/csv/json plus a partitioned parquet sink).
  *
  * Why explicit schemas: a declared `StructType` means (a) no
  * inference pass over 100 TB of input, (b) the scan's `ReadSchema` is
  * exactly the declared columns — pruning is guaranteed at the source,
  * and (c) type drift in incoming files fails loudly at read time
  * instead of corrupting the catalog.
  */
object Catalog {

  /** Declared schemas for every catalog table (the ingest contract). */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType), // nanos
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  /** Parquet reader with the declared (pruned) schema. */
  def readParquet(s: SparkSession, table: String, path: String): DataFrame =
    s.read.schema(schemas(table)).parquet(path)

  /** CSV ingest (headerless, the reference's bulk-load file shape). */
  def readCsv(s: SparkSession, table: String, path: String): DataFrame =
    s.read.schema(schemas(table))
      .option("header", "false").option("mode", "FAILFAST").csv(path)

  /** JSON-lines ingest with schema enforcement. */
  def readJson(s: SparkSession, table: String, path: String): DataFrame =
    s.read.schema(schemas(table)).option("mode", "FAILFAST").json(path)

  /** Partitioned parquet sink — the catalog's storage layout. The
    * partition column becomes the pruning key for downstream scans
    * (e.g. spatial zone, date bucket). Overwrite = the reference's
    * idempotent drop-and-recreate semantics. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed catalog table: pre-shuffled on the join key at ingest
    * time, so every later equi-join/aggregation on that key is
    * co-located — zero Exchange in the plan (the SURVEY §5 strategy
    * for the recurring fact-fact joins; at 100 TB this converts every
    * repeated orders⋈customer-style shuffle into a local merge).
    * Registered in the session catalog (bucket metadata lives there). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
    numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}
