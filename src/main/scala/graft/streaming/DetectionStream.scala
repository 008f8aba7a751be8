package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.queries.Spatial

/** Streaming nightly association — the detections twin of the corpus
  * ingest ([[DocStream]]): each micro-batch of fresh detections
  * (det_k, ra, decl) runs one [[Spatial.associateBatch]] against the
  * STORED object halo table ([[Spatial.writeXmatchHalo]] — the
  * chunk-overlap layout, so the object side is never exchanged; the
  * batch pays one small-side exchange) and lands in TWO replay-guarded
  * stores:
  *
  *  - the MATCH table (detection→object pairs — the science product
  *    [[Spatial.qAssocHistory]] reads), and
  *  - the TRANSIENT table (detections with no object within the
  *    radius — [[Spatial.qTransientRate]]'s feed, and the input an
  *    object-creation path consumes).
  *
  * `foreachBatch` is at-least-once; both appends key their batch_id
  * partition and skip when it already exists, so a replayed
  * micro-batch appends nothing — at-least-once delivery becomes
  * exactly-once contents, the [[DocStream]] discipline applied to the
  * spatial association. 100 TB shape: per-batch cost tracks the
  * batch (association join + one partition-pruned match read), never
  * the object catalog or the accumulated history.
  */
object DetectionStream {

  /** Start the continuous association over a detection stream. The
    * exactly-once story is the standard pair: checkpointed source
    * offsets give stable batch ids across restarts, and
    * [[Spatial.associateBatch]]'s batch-keyed idempotent appends make
    * a re-delivered micro-batch a no-op. Callers own the returned
    * query's lifecycle. */
  def start(detStream: DataFrame, objHalo: DataFrame, matchPath: String,
    transientPath: String, checkpointPath: String, radius: Double,
    zoneHeight: Double = 5.0): StreamingQuery =
    detStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Spatial.associateBatch(batch.sparkSession, batch, objHalo,
          matchPath, transientPath, batchId, radius, zoneHeight)
        ()
      }
      .start()
}
