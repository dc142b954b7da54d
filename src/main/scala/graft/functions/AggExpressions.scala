package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * One-pass SimHash bit-vote aggregate: each input hash votes ±1 on
 * every bit position; the final fingerprint sets bit i iff its vote
 * sum is positive. Replaces the 60-parallel-conditional-sums
 * formulation (60 aggregate buffers, 60 codegen'd update expressions
 * per row) with ONE int[60] buffer updated in a tight loop — same
 * result (sums are order-independent), one buffer to shuffle for the
 * map-side partial aggregation instead of 60 long columns.
 */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    // a NULL hash votes −1 on every bit — the same semantics as the
    // conditional-sum formulation this replaces (when(bit === 1, 1)
    // .otherwise(-1) evaluates NULL to the otherwise branch) and as
    // the DuckDB oracle's CASE WHEN ... ELSE -1
    val v = child.eval(input)
    val hv = if (v == null) 0L else v.asInstanceOf[Long]
    var i = 0
    while (i < bits) {
      if (((hv >> i) & 1L) == 1L) buffer(i) += 1 else buffer(i) -= 1
      i += 1
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var out = 0L
    var i = 0
    while (i < bits) {
      if (buffer(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * bits)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

/** Column-API surface for the native aggregates. */
object Aggs {
  /** One-pass SimHash over a long-hash column. */
  def simhash(hv: Column, bits: Int): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(hv), bits).toAggregateExpression())
}
