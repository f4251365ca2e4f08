package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries (best of N) without running
  * the whole bench. Usage:
  *   SPARK_GRAFT_SF_DIR=… runMain graft.tools.QBench q51_gram_coverage q54_…
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val dir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.optimizer.excludedRules", graft.core.GraftSession.OptimizerExclusions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$dir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.CacheScope.drain(spark)
        dt
      }
      println(f"[qbench] $name: best ${times.min}%.3f s (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
