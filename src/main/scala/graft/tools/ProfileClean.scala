package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the clean pipeline (dev tool): where do
  * q27/q33's seconds go — shingle cache build, candidate gen, verify
  * joins, or the dedup/gate/anti-join frame around them?
  */
object ProfileClean {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.core.Tables.documents(spark, dir)
    time("warmup docs count")(docs.count())

    // stage 1+2 of clean: exact dedup + quality gates, no near-dup removal
    val keep = docs.groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val toks = split(trim(col("text")), "\\s+")
    val gated = docs
      .join(keep, Seq("doc_id"), "left_semi")
      .withColumn("n_tokens", size(toks))
      .filter(col("n_tokens") >= 8)
    time("dedup+gates only")(gated.write.format("noop").mode("overwrite").save())

    time("q27 cold (incl. cache build)")(
      graft.operators.TextOps.ngramJaccard(spark, dir).write.format("noop").mode("overwrite").save())
    time("q27 warm (cache hit)")(
      graft.operators.TextOps.ngramJaccard(spark, dir).write.format("noop").mode("overwrite").save())
    time("q33 warm (cache hit)")(
      graft.operators.CleanPipeline.clean(spark, dir).write.format("noop").mode("overwrite").save())
    time("q33 again")(
      graft.operators.CleanPipeline.clean(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
