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

  /** E45: generic JDBC UPSERT for `foreachBatch` — MERGE semantics on any
    * JDBC target (update the matched key, insert the miss; works on
    * engines without MERGE INTO, e.g. SQLite). Built for UPDATE-mode
    * streaming aggregates, whose batches carry each touched key ONCE
    * with its new ABSOLUTE total: the write is then idempotent — a
    * replayed batch rewrites the same values instead of double-adding
    * deltas, which is what makes checkpoint recovery exactly-once in
    * EFFECT without a transaction log (the additive-delta alternative
    * needs batch-id fencing). Each partition writes through its own
    * connection in one transaction; `maxConnections` caps DB fan-in.
    * Distinct keys never collide across partitions (one row per key per
    * batch), so partition-parallel upserts are race-free — EXCEPT when a
    * speculative or retried duplicate task attempt replays a partition
    * concurrently with the original: both attempts can miss the UPDATE
    * and both INSERT the same key. The target table MUST therefore carry
    * a UNIQUE/PRIMARY KEY constraint on `keyCols`; the second INSERT then
    * fails with a duplicate-key SQLException (SQLState 23xxx), which this
    * sink catches and converts back into the UPDATE it raced — restoring
    * exactly-once in effect. Without the constraint the race silently
    * duplicates rows (alternatively disable `spark.speculation`).
    */
  def upsertJdbc(
      batch: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      valCols: Seq[String],
      props: Map[String, String] = Map.empty,
      maxConnections: Int = 8
  ): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = keyCols ++ valCols
    def qc(c: String) = "\"" + c.replace("\"", "\"\"") + "\""
    val update =
      s"UPDATE ${quoted(table)} SET ${valCols.map(c => s"${qc(c)} = ?").mkString(", ")}" +
        s" WHERE ${keyCols.map(c => s"${qc(c)} = ?").mkString(" AND ")}"
    val insert =
      s"INSERT INTO ${quoted(table)} (${cols.map(qc).mkString(", ")})" +
        s" VALUES (${cols.map(_ => "?").mkString(", ")})"
    val projected = batch.select(cols.map(col): _*)
    val nKeys = keyCols.size
    val nConn = math.max(1, math.min(maxConnections, projected.rdd.getNumPartitions))
    projected.coalesce(nConn).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val p = new Properties()
          props.foreach { case (k, v) => p.setProperty(k, v) }
          val conn = java.sql.DriverManager.getConnection(url, p)
          try {
            conn.setAutoCommit(false)
            val up  = conn.prepareStatement(update)
            val ins = conn.prepareStatement(insert)
            try {
              rows.foreach { r =>
                var i = 1
                valCols.indices.foreach { vi => up.setObject(i, r.get(nKeys + vi)); i += 1 }
                keyCols.indices.foreach { ki => up.setObject(i, r.get(ki)); i += 1 }
                if (up.executeUpdate() == 0) {
                  cols.indices.foreach(ci => ins.setObject(ci + 1, r.get(ci)))
                  // a savepoint fences the INSERT: on engines where any
                  // statement error aborts the whole transaction
                  // (PostgreSQL, SQLState 25P02), the duplicate-key
                  // recovery below must roll back to it or the UPDATE
                  // retry would itself fail
                  val sp =
                    try conn.setSavepoint()
                    catch { case _: java.sql.SQLFeatureNotSupportedException => null }
                  try {
                    ins.executeUpdate()
                    // release eagerly: thousands of live savepoints in one
                    // batch transaction are server-side state (PostgreSQL
                    // subtransaction IDs); not all drivers support release
                    if (sp != null) {
                      try conn.releaseSavepoint(sp)
                      catch { case _: java.sql.SQLException => () }
                    }
                  } catch {
                    // duplicate-key (SQLState class 23: integrity
                    // constraint violation) = a racing duplicate task
                    // attempt inserted this key first — fall back to the
                    // UPDATE we raced; absolute-total batches make the
                    // rewrite idempotent
                    case e: java.sql.SQLException
                        if e.getSQLState != null && e.getSQLState.startsWith("23") =>
                      if (sp != null) {
                        conn.rollback(sp)
                        // ROLLBACK TO keeps the savepoint alive (PostgreSQL):
                        // release it too, or each conflicted row leaks one
                        // server-side subtransaction ID for the rest of the
                        // batch transaction — the accumulation the eager
                        // release on the success path exists to avoid
                        try conn.releaseSavepoint(sp)
                        catch { case _: java.sql.SQLException => () }
                      }
                      // `up` still holds this row's parameters
                      if (up.executeUpdate() == 0) throw e
                  }
                }
              }
              conn.commit()
            } finally { up.close(); ins.close() }
          } finally conn.close()
        }
    }
  }

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
