package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense ranking of a BOUNDED (≤k-row, post-top-k) result without a
  * partitionless `Window.orderBy()` — that window plans fine here (its
  * input is never the corpus) but emits Spark's "Moving all data to a
  * single partition" warning on every run, which reads as an incident in
  * 100 TB logs. Instead: collect the ≤k rows into ONE sorted array (a
  * global aggregate — bounded by construction) and posexplode the rank
  * back out, the q61 idiom.
  *
  * Rank order is (value DESC, id ASC), the `row_number` tie rule both call
  * sites used. The array sorts ASCENDING by (value, −id) so the reversed
  * position `n − pos` yields exactly that order; id negation is exact for
  * longs (doc ids are non-negative, far from Long.MinValue).
  */
private[graft] object BoundedRank {

  /** (value desc, id asc) row_number over a ≤k-row df → (idOut, rankOut). */
  def byValueDesc(
      bounded: DataFrame,
      value: Column,
      id: Column,
      idOut: String,
      rankOut: String
  ): DataFrame =
    bounded
      .agg(sort_array(collect_list(struct(value.as("v"), (-id).as("ni"), id.as("i")))).as("arr"))
      .select(size(col("arr")).as("n"), posexplode(col("arr")).as(Seq("pos", "s")))
      .select(col("s.i").as(idOut), (col("n") - col("pos")).as(rankOut))
}
