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
  * `reverse = true` keeps the LARGEST `num` elements by the child's
  * ordering (verified empirically in GroupTopKSpec — the flag name is
  * about the queue's internal ordering, not the output order).
  */
object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, num, reverse)
}
