package graft.operators

// Throwaway r15 profiling harness for the nearDupPairs redesign (deleted
// before round close).
object ScratchND {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.optimizer.excludedRules", graft.core.GraftSession.OptimizerExclusions)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[nd] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = VectorOps.emb(spark, dir)
    time("emb count")(println("n=" + e.count()))
    val planes = VectorOps.nearDupPlanesFor(spark, dir)
    println(s"planes=$planes tables=${VectorOps.nearDupTablesFor(planes)}")
    time("candidateVolume")(println("vol=" + VectorOps.candidateVolume(spark, dir)))
    // NEW pipeline, staged
    val full = VectorOps.nearDupPairsRaw(spark, e, planes)
    for (i <- 1 to 2)
      time(s"NEW full pipeline run$i")(
        full.write.format("noop").mode("overwrite").save())
    println("=== NEW plan ===")
    full.explain("formatted")
    graft.core.CacheScope.drain(spark)
    spark.stop()
  }
}

// sf1 variant: ensure the 10x corpus, then time the stage build there.
object ScratchNDSf1 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.optimizer.excludedRules", graft.core.GraftSession.OptimizerExclusions)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[nd-sf1] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sf1 = time("ensure sf1")(
      graft.tools.ScaleData.ensure(spark, "/root/testdata/sf0.1", "/tmp/graft_sf1"))
    val e = VectorOps.emb(spark, sf1)
    time("emb count")(println("n=" + e.count()))
    val planes = VectorOps.nearDupPlanesFor(spark, sf1)
    println(s"planes=$planes tables=${VectorOps.nearDupTablesFor(planes)}")
    time("candidateVolume")(println("vol=" + VectorOps.candidateVolume(spark, sf1)))
    val full = VectorOps.nearDupPairsRaw(spark, e, planes)
    for (i <- 1 to 2)
      time(s"NEW sf1 pipeline run$i")(full.write.format("noop").mode("overwrite").save())
    // exactPairs at sf1 too (the other structural trade)
    time("exactPairs sf1 build")(
      { graft.operators.SharedStages.exactPairs(spark, sf1); () })
    graft.operators.SharedStages.release(spark)
    graft.core.CacheScope.drain(spark)
    spark.stop()
  }
}
