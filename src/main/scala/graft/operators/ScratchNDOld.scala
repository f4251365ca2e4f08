package graft.operators

// Throwaway r15 A/B: the r14 (payload-carrying) nearDup pipeline, inline,
// timed at sf1 on this box (deleted before round close).
object ScratchNDOld {
  import org.apache.spark.sql.functions._
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
    graft.GraftExtensions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[nd-old] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dirs = Seq("/root/testdata/sf0.1", "/tmp/graft_sf1/sf1")
    for (dir0 <- dirs) {
      val dir = if (new java.io.File(dir0).isDirectory) dir0
                else graft.tools.ScaleData.ensure(spark, "/root/testdata/sf0.1", "/tmp/graft_sf1")
      val e = VectorOps.emb(spark, dir)
      val planes = VectorOps.nearDupPlanesFor(spark, dir)
      val tables = VectorOps.nearDupTablesFor(planes)
      val emitted = e
        .select(
          xxhash64(col("vec_id")).as("h"),
          col("vec_id").as("id"),
          col("v"), col("nrm"),
          posexplode(array((0 until tables).map(t =>
            graft.functions.Expressions.hyperplane_bucket(col("v"), t, planes)): _*))
            .as(Seq("tbl", "hb")))
        .select(
          col("h"), col("id"), col("v"), col("nrm"), col("tbl"),
          explode(expr(
            s"""concat(
               |  array(named_struct('bucket', hb, 'home', true)),
               |  transform(sequence(0, ${planes - 1}),
               |            p -> named_struct('bucket', cast(hb ^ shiftleft(1, p) AS int),
               |                              'home', false)))""".stripMargin)).as("be"))
        .select(
          struct(col("h"), col("id"), col("be.home").as("home"), col("v"), col("nrm")).as("m"),
          col("tbl"), col("be.bucket").as("bucket"))
      val old = emitted
        .groupBy(col("tbl"), col("bucket"))
        .agg(count(lit(1)).as("nb"),
          graft.functions.Expressions.collect_topk(col("m"), TextOps.MaxBucket).as("ms"))
        .filter(col("nb") >= 2 && expr("exists(ms, x -> x.home)"))
        .select(col("ms"))
        .select(explode(expr(
          """flatten(transform(filter(ms, a -> a.home), a ->
            |  transform(filter(ms, b -> b.id > a.id OR (NOT b.home AND b.id < a.id)), b ->
            |    struct(least(a.id, b.id) AS a_id, greatest(a.id, b.id) AS b_id,
            |           graft_dot(a.v, b.v) / (a.nrm * b.nrm) AS sim))))""".stripMargin)).as("p"))
        .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"), col("p.sim").as("sim"))
        .filter(col("sim") >= VectorOps.NearDupThreshold)
        .distinct()
      for (i <- 1 to 2)
        time(s"OLD pipeline $dir run$i")(old.write.format("noop").mode("overwrite").save())
      graft.core.CacheScope.drain(spark)
    }
    spark.stop()
  }
}
