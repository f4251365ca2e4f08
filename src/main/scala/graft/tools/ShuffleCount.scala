package graft.tools

/** Dev tool: print each query's static-plan shuffle count exactly as
  * PlanGuardSpec's budget rule measures it (`Exchange (hash|range)
  * partitioning` occurrences in `executedPlan.toString` — persisted
  * subtrees re-print per consumer, like the budgets assume). Optional
  * arg: a regex filter over query names (default: the q12x tail).
  */
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val dir    = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val filter = args.lift(1).getOrElse("q12[0-9].*")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, f) =>
      if (n.matches(filter)) {
        val p = f(spark, dir).queryExecution.executedPlan.toString
        val c = "Exchange (hash|range)partitioning".r.findAllIn(p).length
        println(s"SHUF $n $c")
      }
    }
    spark.stop()
  }
}
