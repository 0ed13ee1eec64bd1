package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Aggregation buffer of [[CappedCollectIds]]: the exact element count plus
  * at most `cap` collected values. Once the cap is hit further values only
  * bump the counter — the buffer (and its serialized partial-aggregate wire
  * form) is bounded at `cap` longs for ANY key, however hot.
  */
final class CappedIdsBuffer(var count: Long, val ids: mutable.ArrayBuffer[Long])

/** `graft_capped_collect_ids(id, cap)` — collect_list with a memory bound
  * (r18, guide §5): returns `struct(df: long, ids: array<long>)` where `df`
  * is the EXACT input count and `ids` holds all inputs iff `df < cap`
  * (above that the list is truncated at `cap` elements — enough to witness
  * the overflow, never trusted for contents).
  *
  * The consumer contract is a df-windowed posting list (Dedup.blockedIdPairs:
  * keep keys with df ∈ [2, maxDf], cap = maxDf + 1): every SURVIVING key's
  * list is complete by construction, while a corpus-hot key — a stop-word
  * shingle with df ≫ maxDf — costs one counter plus a bounded list instead
  * of materializing its entire posting set in one aggregation buffer the
  * way a plain `collect_list`-then-filter does (the r17 OOM-at-scale flag
  * this kernel closes). Keeps the single-shuffle aggregate-then-expand
  * shape: the alternative count→filter→semi-join→collect re-shuffles the
  * postings twice.
  */
case class CappedCollectIds(child: Expression, cap: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedIdsBuffer] with UnaryLike[Expression] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT, got ${other.sql}")
  }

  override def createAggregationBuffer(): CappedIdsBuffer =
    new CappedIdsBuffer(0L, mutable.ArrayBuffer.empty[Long])

  override def update(b: CappedIdsBuffer, input: InternalRow): CappedIdsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      b.count += 1L
      if (b.ids.length < cap) b.ids += v.asInstanceOf[Long]
    }
    b
  }

  override def merge(b: CappedIdsBuffer, o: CappedIdsBuffer): CappedIdsBuffer = {
    b.count += o.count
    var i = 0
    while (b.ids.length < cap && i < o.ids.length) { b.ids += o.ids(i); i += 1 }
    b
  }

  override def eval(b: CappedIdsBuffer): Any =
    InternalRow(b.count, new GenericArrayData(b.ids.toArray))

  override def serialize(b: CappedIdsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * b.ids.length)
    bb.putLong(b.count)
    bb.putInt(b.ids.length)
    b.ids.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedIdsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val n = bb.getInt
    val ids = new mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { ids += bb.getLong; i += 1 }
    new CappedIdsBuffer(count, ids)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_capped_collect_ids"
  override def withNewMutableAggBufferOffset(n: Int): CappedCollectIds =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CappedCollectIds =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectIds =
    copy(child = newChild)
}

object CappedCollect {
  /** Column form: `struct(df, ids)` per group — see [[CappedCollectIds]]. */
  def ids(c: Column, cap: Int): Column =
    GraftBridge.column(
      CappedCollectIds(GraftBridge.expression(c), cap).toAggregateExpression())
}
