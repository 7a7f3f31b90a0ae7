package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for Spark's internal bounded-heap top-k collector
  * (`private[aggregate] case class CollectTopK` — the engine behind
  * `Dataset` top-k optimizations). Exposed for
  * [[graft.operators.GroupTopKPipe]]'s aggregate mode: a
  * TypedImperativeAggregate whose partial state is a BoundedPriorityQueue
  * of at most `num` elements, so the shuffle carries k rows PER GROUP PER
  * PARTITION instead of every row through a window sort — the map-side
  * combine shape per-group top-k needs at 100 TB.
  *
  * `reverse = true` keeps the SMALLEST `num` elements by the child's
  * ordering and emits them ascending (which is why GroupTopKPipe encodes
  * descending top-k by ORDER-REVERSING the score — negation / bitwise
  * NOT — before handing it to the heap; verified empirically in
  * GroupTopKSpec).
  */
object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, num, reverse)
}
