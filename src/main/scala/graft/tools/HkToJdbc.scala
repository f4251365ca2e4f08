package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sinks.Sinks
import graft.sources.HealthKitXml

/** One-command CLI parity with the reference
  * (`healthkit-to-sqlite export.zip sqlite://healthkit.db`, main.rs:23-40):
  *
  *   runMain graft.tools.HkToJdbc <export.zip> <jdbcUrl> [--lenient] [--first-seen]
  *
  * Composes the whole A1→A7 pipeline: archive parse → schema inference →
  * per-type tables → JDBC sink, with per-table progress output. `--lenient`
  * turns corrupt archives into counted skips instead of job failures.
  * `--first-seen` selects the migration-compat typing mode (a column is
  * typed by its FIRST value in document order, core.rs:219-230) instead of
  * the whole-column type lattice. Given a SQLite JDBC driver jar the same
  * code targets sqlite: URLs; in this environment it is proven against
  * embedded Derby.
  */
object HkToJdbc {

  /** Parse `zipPath` and write every inferred table to `jdbcUrl`.
    * Returns (table, rows written), sorted by table name.
    */
  def run(
      spark: SparkSession,
      zipPath: String,
      jdbcUrl: String,
      lenient: Boolean = false,
      firstSeen: Boolean = false
  ): Seq[(String, Long)] = {
    val tables = HealthKitXml
      .tables(spark, Seq(zipPath), persist = true, lenient = lenient, firstSeenTypes = firstSeen)
    tables.toSeq.sortBy(_._1).map { case (name, df) =>
      // persist around write+count so the table projection runs once, not
      // once per action (the parsed elements are cached, but each table's
      // filter+cast would still re-execute)
      val cached = df.persist()
      try {
        Sinks.writeJdbc(cached, jdbcUrl, name)
        val n = cached.count()
        println(s"[hk-to-jdbc] $name: $n rows")
        name -> n
      } finally cached.unpersist()
    }
  }

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    if (positional.length != 2)
      sys.error("usage: HkToJdbc <export.zip> <jdbcUrl> [--lenient] [--first-seen]")
    val Array(zipPath, jdbcUrl) = positional
    val lenient   = args.contains("--lenient")
    val firstSeen = args.contains("--first-seen")

    val spark = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("hk-to-jdbc")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val written = run(spark, zipPath, jdbcUrl, lenient, firstSeen)
      println(s"[hk-to-jdbc] done: ${written.length} tables, ${written.map(_._2).sum} rows total")
    } finally spark.stop()
  }
}
