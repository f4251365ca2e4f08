package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev timing harness: noop-write the named queries (comma-separated
  * substrings) against a data dir, best-of-N, Bench's exact session shape —
  * for perf chases without paying the full bench.
  *
  * `sbt "runMain graft.tools.TimeQueries /root/testdata/sf0.1 q120,q121 3"`
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir   = args(0)
    val pats  = args(1).split(",").toSeq
    val reps  = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => pats.exists(n.contains))
    // one untimed warmup round for JIT/codegen/file listing
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[time] warmup $n: ${e.getMessage}") }
      finally graft.core.CacheScope.drain(spark)
    }
    names.foreach { n =>
      val ts = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable => System.err.println(s"[time] $n: ${e.getMessage}"); None }
        finally graft.core.CacheScope.drain(spark)
      }
      println(f"[time] $n best=${if (ts.nonEmpty) ts.min else -1.0}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    graft.operators.SharedStages.release(spark)
    spark.stop()
  }
}
