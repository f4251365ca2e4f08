package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time each session-shared stage build in prewarm order
  * (exactly Bench's shared block), best-effort, one labeled line each.
  *
  *   SPARK_GRAFT_SF_DIR=… runMain graft.tools.StageBench
  */
object StageBench {
  def main(args: Array[String]): Unit = {
    val dir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.optimizer.excludedRules", graft.core.GraftSession.OptimizerExclusions)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$dir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    graft.operators.SharedStages.prewarm(spark, dir).foreach { case (name, build) =>
      val t0 = System.nanoTime()
      try { build(); println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s") }
      catch { case e: Throwable => println(s"[stage] $name FAILED: ${e.getMessage}") }
    }
    graft.operators.SharedStages.release(spark)
    spark.stop()
  }
}
