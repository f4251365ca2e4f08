package graft.sinks

import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Output sinks. The reference writes SQLite via dynamic INSERTs
  * (`core.rs:688-718`); the Spark-native equivalents are the generic JDBC
  * writer (same code path would target SQLite given its driver jar — proven
  * here against embedded Derby) and partitioned parquet for lake-scale
  * output.
  */
object Sinks {

  /** JDBC sink. `batchsize` keeps executor→DB round-trips amortized; each
    * partition writes through its own connection, so write parallelism =
    * partition count (repartition the input to control DB fan-in).
    */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty,
      mode: String = "overwrite",
      batchSize: Int = 1000
  ): Unit = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, quoted(table), p)
  }

  /** Identifier quoting equivalent to the reference's
    * get_valid_sqlite_identifier (core.rs:81-83); HealthKit table names
    * (`HKQuantityTypeIdentifier…`) are plain identifiers, but quote anyway.
    */
  private def quoted(table: String): String = "\"" + table.replace("\"", "\"\"") + "\""

  /** Parquet lake sink, optionally partitioned (the 100 TB path). */
  def writeParquet(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Nil,
      mode: String = "overwrite"
  ): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Sharded compressed-JSONL export — the interchange format training
    * pipelines consume. Shard membership is `pmod(xxhash64(<key>), shards)`:
    * content-stable (re-export of the same corpus lands each row in the
    * same shard regardless of cluster size or partitioning), and
    * `repartition` on the shard id makes file count = shard count exactly,
    * so downstream loaders see a stable layout. Codec is Spark-native
    * (gzip/zstd — no extra deps).
    */
  def writeJsonlShards(
      df: DataFrame,
      path: String,
      keyCol: String,
      shards: Int,
      codec: String = "gzip",
      mode: String = "overwrite"
  ): Unit = {
    import org.apache.spark.sql.functions.{col, pmod, xxhash64}
    df.withColumn("shard", pmod(xxhash64(col(keyCol)), org.apache.spark.sql.functions.lit(shards)))
      .repartition(shards, col("shard"))
      .write
      .mode(mode)
      .option("compression", codec)
      .partitionBy("shard")
      .json(path)
  }
}
