package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Spark aggregate
  * (`TypedImperativeAggregate`): at most `k` counters per partial
  * buffer, merged with the mergeable-summaries rule (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): pointwise sum, then subtract the
  * (k+1)-th largest counter and drop non-positives.
  *
  * Guarantee (the reason this is safe as a candidate filter): every
  * item with true frequency > n/(k+1) SURVIVES the sketch — across
  * any partitioning and merge order — and each reported counter
  * undercounts by at most n/(k+1). So "exact heavy hitters above
  * threshold t ≥ n/(k+1)" = MG candidates → exact recount → filter,
  * with NO full-cardinality shuffle: the shuffle carries one ≤ k
  * counter map per partition instead of one row per distinct key.
  * That is the 100 TB shape — the full groupBy this replaces shuffles
  * the entire key universe.
  */
case class MisraGries(child: Expression, k: Int,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1, s"misra_gries requires k >= 1, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
    input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item.clone(), 1L)
        case None =>
          // classic MG decrement step: charge one count off every
          // counter; k+1 distinct items pay together, bounding total
          // decrements by n/(k+1)
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
    b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (key, c) =>
      b1.update(key, b1.getOrElse(key, 0L) + c)
    }
    if (b1.size > k) {
      // mergeable-summaries trim: subtract the (k+1)-th largest
      // counter value, drop non-positives — size back to ≤ k with the
      // same additive-error bound
      val cut = b1.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(b1.remove)
    }
    b1
  }

  /** Deterministic output: (item, residual count) sorted by item. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray.sortBy(_._1)
      .map { case (item, c) =>
        new GenericInternalRow(Array[Any](item, c)): InternalRow
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

object HeavyHitters {
  /** Column API: `misra_gries(col, k)` → array<struct<item,cnt>> of at
    * most k surviving candidates (every item with frequency > n/(k+1)
    * guaranteed present). */
  def misraGries(col: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(col), k).toAggregateExpression())
}
