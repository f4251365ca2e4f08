package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the minhash pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warmup count")(docs.count())
    val toks = split(trim(col("text")), "\\s+")
    val sh = docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    time("shingle+hash count")(sh.count())
    val mins = (0 until 32).map(i => min(xxhash64(col("h"), lit(i))).as(s"s$i"))
    val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    time("signatures")(sig.write.format("noop").mode("overwrite").save())
    val bandStructs = (0 until 8).map { b =>
      val cols = (0 until 4).map(r => col(s"s${b * 4 + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    time("bands")(bands.write.format("noop").mode("overwrite").save())
    val buckets = bands.groupBy(col("band"), col("bh"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    time("buckets")(buckets.write.format("noop").mode("overwrite").save())
    val pairs = buckets
      .select(array_sort(col("ids")).as("ids"))
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids)), b ->
          |    struct(a AS doc_a, b AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b")).distinct()
    time("pairs")(pairs.write.format("noop").mode("overwrite").save())
    time("pairs again")(pairs.write.format("noop").mode("overwrite").save())
    time("pairs orderBy")(
      pairs.orderBy(col("doc_a"), col("doc_b")).write.format("noop").mode("overwrite").save())
    time("q25 actual")(
      graft.operators.TextOps.minhashLsh(spark, dir).write.format("noop").mode("overwrite").save())
    time("q27 actual")(
      graft.operators.TextOps.ngramJaccard(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
