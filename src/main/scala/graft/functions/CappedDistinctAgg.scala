package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Fixed-capacity distinct-set accumulator: at most `limit` distinct longs,
  * linear-scan membership (limit is small — fan-out caps of 25–30 — so a
  * scan of a primitive array beats any hash structure's constant).
  */
final class LongSetBuffer(val limit: Int) {
  val arr: Array[Long] = new Array[Long](limit)
  var n: Int = 0

  def add(v: Long): Unit = {
    if (n >= limit) return
    var i = 0
    while (i < n) { if (arr(i) == v) return; i += 1 }
    arr(n) = v
    n += 1
  }
}

/** Native `collect_set` with a HARD O(cap) state bound — the
  * [[CappedCollectSet.CappedDistinct]] contract re-expressed as a Catalyst
  * `TypedImperativeAggregate` so the hot path is primitive.
  *
  * Why the rewrite: the `Aggregator`/`udaf` form pays an immutable
  * `Map[Long, Long]` allocation per input row plus an ExpressionEncoder
  * round-trip per buffer — measured 89 s to build sf10's 14.7M order
  * baskets vs 11.6 s for the built-in `collect_set`. This form updates a
  * primitive `Array[Long]` in place (no boxing, no per-row allocation) and
  * serializes as packed longs only at the partial/final boundary, matching
  * built-in speed while keeping the bound `collect_set` lacks.
  *
  * Exactness contract (same proof as CappedCollectSet): the buffer admits
  * `cap + 1` distinct values. If a key's true distinct count is ≤ cap, every
  * partial holds a subset of the true set, so no truncation ever occurs and
  * eval returns the complete sorted set. Truncation requires observing
  * ≥ cap + 2 distinct values — which already proves the key is over the cap,
  * and the downstream `size(ss) <= cap` filter drops it; WHICH cap + 1
  * survivors the buffer kept is then irrelevant. Under that filter the
  * output is row-for-row identical to `sort_array(collect_set(x))`.
  *
  * Null handling matches `collect_set`: null inputs are skipped.
  */
case class CappedDistinctAgg(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongSetBuffer] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = capExpr

  private lazy val cap: Int = capExpr.eval(InternalRow.empty) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"capped_distinct cap must be an integer literal, got $other")
  }
  private def limit: Int = cap + 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"capped_distinct expects a BIGINT column, got ${child.dataType.simpleString}")
    else if (!capExpr.foldable || (capExpr.dataType != IntegerType &&
        capExpr.dataType != LongType))
      TypeCheckResult.TypeCheckFailure("capped_distinct cap must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_distinct"

  override def createAggregationBuffer(): LongSetBuffer = new LongSetBuffer(limit)

  override def update(buf: LongSetBuffer, input: InternalRow): LongSetBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: LongSetBuffer, b: LongSetBuffer): LongSetBuffer = {
    // over the proof threshold: any limit-sized union prefix carries the
    // over-cap verdict; the elements themselves no longer matter
    var i = 0
    while (i < b.n && a.n < a.limit) { a.add(b.arr(i)); i += 1 }
    a
  }

  override def eval(buf: LongSetBuffer): Any = {
    val out = java.util.Arrays.copyOf(buf.arr, buf.n)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: LongSetBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongSetBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new LongSetBuffer(limit)
    var i = 0
    while (i < n) { buf.arr(i) = bb.getLong; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CappedDistinctAgg =
    copy(child = newLeft, capExpr = newRight)
}
