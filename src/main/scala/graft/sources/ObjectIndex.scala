package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Director index — the reference's single most-used access path:
  * fetch ONE object's full light curve (`WHERE objectId = ?
  * ORDER BY mjd`) without scanning the table. Pserv keeps a
  * director index mapping objectId → chunk so a point lookup touches
  * one shard; the Spark-native equivalent is a deterministic bucket
  * directory (`obkt = user_id % numBuckets`) as the PHYSICAL
  * partition key plus (user_id, ts) sort within each file:
  *
  *  - the `obkt = id % n` equality is a static PARTITION filter —
  *    the scan lists exactly one of n directories (no footer reads
  *    elsewhere, no data reads elsewhere);
  *  - the `user_id = id` equality is a pushed parquet filter, and
  *    because files are sorted by user_id the row-group min/max
  *    stats skip to the handful of row groups holding that object;
  *  - rows inside a row group are already in (user_id, ts) order,
  *    so the per-object time sort is a near-no-op.
  *
  * 100 TB shape: lookup cost is O(one bucket's footers + one
  * object's row groups), independent of table size once numBuckets
  * scales with the data (buckets of a few GB each). The build is a
  * single hash repartition — the same one-time cost as any
  * clustered-layout ingest, amortized over every subsequent lookup.
  * The modulus (not a hash) keeps the bucket computable by ANY
  * client — including non-JVM ones — from the objectId alone, which
  * is exactly what Pserv's director index provides.
  */
object ObjectIndex {
  val DefaultBuckets = 64

  /** Materialize the index layout. `repartition(n, obkt)` makes each
    * write task own exactly one bucket → n files total, no
    * small-file explosion; `sortWithinPartitions` gives the
    * row-group clustering the lookup's min/max skipping relies on. */
  def build(s: SparkSession, dir: String, outPath: String,
    numBuckets: Int = DefaultBuckets): Unit = {
    import s.implicits._
    graft.Tables.events(s, dir)
      .filter($"user_id".isNotNull)
      .withColumn("obkt", pmod($"user_id", lit(numBuckets)).cast("int"))
      .repartition(numBuckets, $"obkt")
      .sortWithinPartitions($"user_id", $"ts", $"event_id")
      .write.mode("overwrite").partitionBy("obkt").parquet(outPath)
  }

  /** Incremental maintenance: append a delta batch into its bucket
    * directories (same hash discipline, one new file per non-empty
    * bucket, sorted within). Lookups stay single-directory — they now
    * read the bucket's few files instead of one; periodic
    * [[Catalog.compactPartitions]] over `obkt=` folds them back to
    * one file per bucket. The delta repartition touches only delta
    * rows: maintenance cost tracks the BATCH, never the index. */
  def append(s: SparkSession, delta: org.apache.spark.sql.DataFrame,
    outPath: String, numBuckets: Int = DefaultBuckets): Unit = {
    import s.implicits._
    delta
      .filter($"user_id".isNotNull)
      .withColumn("obkt", pmod($"user_id", lit(numBuckets)).cast("int"))
      .repartition(numBuckets, $"obkt")
      .sortWithinPartitions($"user_id", $"ts", $"event_id")
      .write.mode("append").partitionBy("obkt").parquet(outPath)
  }

  /** One micro-batch of streaming index maintenance, factored out so
    * the spec can replay it. The batch lands under
    * `obkt=<b>/ibatch=<batchId>` with DYNAMIC partition overwrite —
    * the same replay-idempotence discipline as
    * [[graft.streaming.EventStream.applyIngestBatch]]: an
    * at-least-once foreachBatch replay overwrites ITS OWN
    * subpartitions instead of duplicating rows. `lookup` is
    * unaffected: `obkt` stays the first-level partition key, so the
    * scan still lists exactly one bucket tree. */
  def applyIndexBatch(batch: org.apache.spark.sql.DataFrame, batchId: Long,
    outPath: String, numBuckets: Int = DefaultBuckets): Unit =
    if (!batch.isEmpty) {
      import batch.sparkSession.implicits._
      batch
        .filter($"user_id".isNotNull)
        .withColumn("obkt", pmod($"user_id", lit(numBuckets)).cast("int"))
        .withColumn("ibatch", lit(batchId))
        .repartition(numBuckets, $"obkt")
        .sortWithinPartitions($"user_id", $"ts", $"event_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("obkt", "ibatch")
        .parquet(outPath)
    }

  /** Streaming director-index maintenance: every micro-batch of the
    * event stream lands in its bucket directories exactly once across
    * restarts; point lookups stay single-bucket throughout. Callers
    * own the returned query's lifecycle. */
  def ingestStream(events: org.apache.spark.sql.DataFrame, outPath: String,
    checkpointPath: String, numBuckets: Int = DefaultBuckets)
    : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyIndexBatch(b.toDF(), id, outPath, numBuckets)
      }
      .option("checkpointLocation", checkpointPath)
      .start()

  /** Point lookup against the index layout. Returns the same
    * projection as `TimeSeries.qObjectLookup` over the flat table —
    * the spec asserts both the parity and that the scan read exactly
    * one bucket directory. */
  def lookup(s: SparkSession, path: String, objectId: Long,
    numBuckets: Int = DefaultBuckets): DataFrame = {
    import s.implicits._
    s.read.parquet(path)
      .filter($"obkt" === (objectId % numBuckets).toInt &&
        $"user_id" === objectId)
      .select($"user_id", $"event_id", expr("ts DIV 1000").as("tus"),
        round($"value" * 100).cast("long").as("xc"), $"event_type")
      .orderBy($"tus", $"event_id")
  }
}
