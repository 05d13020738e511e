package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType}

import scala.collection.mutable

/** `collect_list` with a HARD cap on aggregation-buffer growth — the
  * bounded-state kernel behind single-shuffle LSH bucket capping
  * (ADVICE r10 #2).
  *
  * The capped-bucket pattern (`groupBy(key).agg(collect_list(id))` then
  * `filter(size <= maxBucket)`) has the right PLAN shape — one shuffle,
  * the cap as a post-aggregation filter — but the built-in collect_list
  * materializes a pathological bucket's ENTIRE member list in
  * aggregation state before the size filter ever sees it: one
  * boilerplate fingerprint shared by 10M documents is a 10M-element
  * ArrayBuffer inside a single task. This variant stops appending at
  * `limit` elements, in BOTH the partial (map-side) and merge paths, so
  * per-group state is O(limit) no matter how hot the key.
  *
  * Semantics: a group with more than `limit` input rows yields SOME
  * `limit`-subset (partition-order-dependent); a group with at most
  * `limit` rows yields exactly its full list (any truncation needs
  * total length > limit, and merges only ever truncate past it).
  * Callers distinguish the two cases by sizing: collect with
  * `limit = maxBucket + 1` and filter `size <= maxBucket` — kept groups
  * are complete and deterministic, over-cap groups are dropped before
  * their contents matter. Like collect_list, output order is not
  * deterministic; downstream must be order-insensitive.
  */
case class CollectListCapped(
    child: Expression, limit: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(limit > 0, s"limit must be positive, got $limit")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length >= limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    // append element-wise up to the cap instead of delegating to
    // `buffer ++= other`: both sides are already <= limit, but their
    // concatenation is not, and the whole point is never holding more
    // than `limit` elements
    val it = other.iterator
    while (buffer.length < limit && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CollectListCapped =
    copy(child = newChild)

  override def prettyName: String = "collect_list_capped"
}

/** Column-level API for the aggregate kernels. */
object aggkernels {

  /** [[CollectListCapped]]: collect at most `limit` values per group
    * with O(limit) aggregation state. To cap groups at `maxBucket`
    * members, collect with `limit = maxBucket + 1` and filter
    * `size(...) <= maxBucket`.
    */
  def collect_list_capped(c: Column, limit: Int): Column =
    Bridge.column(CollectListCapped(Bridge.expression(c), limit)
      .toAggregateExpression())
}
