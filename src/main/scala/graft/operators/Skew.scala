package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Skew-mitigation: two-phase salted aggregation.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reducer — at
  * 100 TB a single skewed key (one language, one event type, one tenant)
  * stalls the stage. Salting splits each key into `buckets` sub-groups for
  * the wide shuffle, then combines the per-salt partials with a second,
  * tiny shuffle over (key × buckets) rows.
  *
  * The salt is a deterministic per-row hash (no `rand()` — keeps retries /
  * speculative tasks consistent), so results are stable and exactly equal
  * to the unsalted aggregation.
  */
object Skew {

  /** count + exact decimal sum of `valueCol` per `keyCol`, salted. */
  def saltedCountSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      buckets: Int
  ): DataFrame = {
    val salt: Column = pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(buckets.toLong))
    df.withColumn("_salt", salt)
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_sum")
      )
      .groupBy(col(keyCol))
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_sum")).cast("double").as("total")
      )
  }

  // --- B18 q17: salted aggregation over the (naturally hot-keyed) events --
  def q17(spark: SparkSession, dir: String): DataFrame =
    saltedCountSum(Tables.events(spark, dir), "event_type", "value", buckets = 16)
      .orderBy(col("event_type"))

  // Oracle is the PLAIN aggregation — salting must be result-invariant.
  val q17Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
