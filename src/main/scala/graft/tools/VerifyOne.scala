package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run ONE SparkEntry query to parquet plus a one-entry
  * oracle_sql.json, so `tools/oracle_check.py` can pre-flight a single
  * query without re-running the whole Verify suite.
  *
  *   runMain graft.tools.VerifyOne <name>[,<name>...] [sfDir] [outDir]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val names  = args.headOption.map(_.split(',').toSeq).getOrElse {
      System.err.println("usage: VerifyOne <name>[,<name>...] [sfDir] [outDir]"); sys.exit(2)
    }
    val sfDir  = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(2).getOrElse("/tmp/verify_one")
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules", graft.core.GraftSession.OptimizerExclusions)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names
      .flatMap(n => SparkEntry.oracleSql.get(n).map(sql => s"${q(n)}: ${q(sql)}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[verify-one] wrote ${names.mkString(",")} to $outDir")
    spark.stop()
  }
}
