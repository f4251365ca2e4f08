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

  // --- q150: join-skew advisor ----------------------------------------------

  /** Parallelism the advisor sizes hot keys against — the cluster's
    * shuffle-partition count (32 on the test rig; the output records it
    * so the advice is self-describing at any setting).
    */
  val AdvisorTasks = 32L

  /** Heavy hitters the advisor reports. */
  val AdvisorTopK = 10

  /** The measurement [[saltedCountSum]]'s salt factor should come FROM:
    * per heaviest join key on the fact side (events.user_id — the key
    * every per-user join and aggregation shuffles on), the exact row
    * count, its corpus share, and the salt factor a co-partitioned join
    * needs — `salt_k = ⌈n_key / ⌈N/tasks⌉⌉`, i.e. how many tasks' worth
    * of rows the ONE reducer owning that key would otherwise absorb.
    * `salt_k = 1` means the key fits a single task and salting would only
    * add shuffle; `salt_k > 1` is the bucket count that levels it. Run
    * before a 100 TB campaign, this table decides which keys get salted
    * ([[saltedCountSum]]), which dimension rows get replicated, and
    * whether AQE skew-join thresholds need lowering.
    *
    * Scale shape: ONE map-side-combined keyed count (the only corpus
    * pass), a TakeOrdered top-K on (n desc, key asc), and the 1-row total
    * broadcast back. Determinism: exact longs, one fixed divide shape
    * for the share, integer ceiling arithmetic for `salt_k`, total-order
    * tie-break on the key.
    */
  def skewAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val top = counts
      .orderBy(col("n_events").desc, col("user_id").asc)
      .limit(AdvisorTopK)
    top
      .crossJoin(broadcast(counts.groupBy().agg(
        sum(col("n_events")).as("n_total"))))
      .withColumn("target_rows", expr(s"(n_total + $AdvisorTasks - 1) DIV $AdvisorTasks"))
      .select(
        col("user_id"),
        col("n_events"),
        round(col("n_events").cast("double") / col("n_total").cast("double"), 6).as("share"),
        col("target_rows"),
        expr("(n_events + target_rows - 1) DIV target_rows").as("salt_k"))
      .orderBy(col("n_events").desc, col("user_id").asc)
  }

  /** q150 oracle: identical count/top-K/tie-break, integer ceilings, and
    * divide shape (HUGEINT total cast back to BIGINT).
    */
  val skewAdvisorSql: String =
    s"""WITH q150c AS MATERIALIZED (
       |  SELECT user_id, count(*)::BIGINT AS n_events FROM events GROUP BY user_id),
       |q150t AS (SELECT CAST(sum(n_events) AS BIGINT) AS n_total FROM q150c),
       |q150k AS (
       |  SELECT user_id, n_events FROM q150c
       |  ORDER BY n_events DESC, user_id ASC LIMIT $AdvisorTopK)
       |SELECT k.user_id, k.n_events,
       |  round(k.n_events::DOUBLE / t.n_total::DOUBLE, 6) AS share,
       |  CAST((t.n_total + $AdvisorTasks - 1) // $AdvisorTasks AS BIGINT) AS target_rows,
       |  CAST((k.n_events + (t.n_total + $AdvisorTasks - 1) // $AdvisorTasks - 1)
       |    // ((t.n_total + $AdvisorTasks - 1) // $AdvisorTasks) AS BIGINT) AS salt_k
       |FROM q150k k, q150t t
       |ORDER BY k.n_events DESC, k.user_id ASC""".stripMargin
}
