package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-write co-location: the 100 TB answer to repeated fact-fact
  * joins. Writing both sides bucketed (and sorted) on the join key lets
  * every subsequent join/aggregation on that key run with ZERO exchange —
  * the shuffle is paid once at write time, not per query.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (overwriting). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int
  ): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previous session's in-memory catalog may have left the managed
    // location behind — clear it or the write fails LOCATION_ALREADY_EXISTS.
    // Resolve the path through the catalog (not warehouse.dir + name) so a
    // non-default database/catalog layout still targets the right location.
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Bucket lineitem + orders on orderkey, then a revenue rollup whose join
    * needs no shuffle on either side.
    */
  def cobucketedRevenue(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    val li = graft.core.Tables.lineitem(spark, dir)
    val o  = graft.core.Tables.orders(spark, dir)
    writeBucketed(li.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")), "graft_li_b", "l_orderkey", buckets)
    writeBucketed(o.select(col("o_orderkey"), col("o_orderpriority")), "graft_o_b", "o_orderkey", buckets)
    spark
      .table("graft_li_b")
      .join(spark.table("graft_o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue")
      )
      .orderBy(col("o_orderpriority"))
  }
}
