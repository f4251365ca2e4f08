package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[aggregate]` aggregates.
  *
  * `CollectTopK` is Spark's bounded-heap top-k `Collect`: it keeps the k
  * largest child values under the child type's interpreted ordering, with
  * PARTIAL (map-side) aggregation — each map task's buffer never exceeds k
  * elements per group. Spark itself only reaches it through
  * `ReplaceDistinctWithAggregate`-era internals; surfacing it lets top-k
  * per group run without shuffling and sorting the whole input the way a
  * `row_number().over(window) <= k` plan does.
  */
object GraftAggBridge {
  def collectTopK(e: Expression, k: Int): Expression =
    CollectTopK(e, k, reverse = false).toAggregateExpression()
}
