package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered semi join: shrink the FACT side before its
  * shuffle by probing a Bloom filter built from the dim side's keys.
  *
  * The classic 100 TB shape: `fact ⋈ σ(dim)` where the filtered dim
  * is too big to broadcast as a hash relation but its KEY SET fits a
  * few MB of Bloom bits. A plain shuffle join moves every fact row;
  * with the prefilter only rows that (probably) have a partner are
  * shuffled — at 1% match rate that is a ~100× cut of the dominant
  * exchange. False positives (rate `fpp`) survive the prefilter but
  * are removed by the exact semi join that follows, so the result is
  * EXACTLY the semi join and the ANSI oracle holds unchanged; false
  * negatives are impossible by the Bloom contract.
  *
  * The filter is built distributed (treeAggregate inside
  * `stat.bloomFilter` — executors build partial filters, the driver
  * only merges bitsets) and ships to probe tasks as one reference
  * object inside whole-stage codegen, the same mechanism Spark's own
  * runtime row-level filtering uses.
  */
object BloomJoin {

  /** `fact` rows whose `factKey` appears in `dim`'s `dimKey` set —
    * exact left-semi semantics, Bloom-accelerated. `expectedKeys`
    * sizes the filter (overestimates only waste bits; underestimates
    * only raise fpp — never correctness). */
  def semi(fact: DataFrame, dim: DataFrame, factKey: String,
    dimKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val probe = ColumnBridge.column(BloomMightContainLong(
      ColumnBridge.expression(fact.col(factKey)), bf))
    fact.filter(probe)
      .join(dim.select(dim.col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}

/** Probe a prebuilt Bloom filter with a bigint key. Non-deterministic
  * answers are impossible (the filter is immutable once built); the
  * expression stays inside whole-stage codegen via a reference
  * object, so the probe costs two hashes per row — no UDF
  * serialization boundary. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"
  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
