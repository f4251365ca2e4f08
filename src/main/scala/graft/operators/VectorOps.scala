package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Expressions.hyperplane_bucket

/** §2.C similarity-search operators over the `embeddings` table
  * (array<float> column).
  *
  * Scale posture: the brute-force path broadcasts a SMALL query set against
  * the corpus (linear scan, no shuffle of the corpus); the LSH paths bucket
  * the corpus with random hyperplanes so the join shuffles on bucket ids and
  * candidate volume stays near-linear. Dot products run inside codegen'd
  * higher-order functions (`zip_with`/`aggregate`) on double arrays.
  */
object VectorOps {

  /** embeddings with the float vector upcast to double + precomputed norm.
    * Zero-norm vectors are dropped: they carry no direction, and their
    * cosine is NaN — which Spark sorts ABOVE all real values, so one zero
    * vector would otherwise claim rank 1 of every query's top-k.
    */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v")
      )
      .withColumn("nrm", sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))
      .filter(col("nrm") > 0)

  private val dot: Column =
    expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  // --- C9 q28: brute-force cosine top-k (oracled; ids+rank only) -----------
  val QueryCount = 8
  val TopK       = 5

  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .select(col("q_id"), col("n_id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= TopK)
      .orderBy(col("q_id"), col("rk"))
  }

  val cosineTopKSql: String =
    s"""SELECT q_id, n_id, rk FROM (
       | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |    ORDER BY list_cosine_similarity(q.vd, c.vd) DESC, c.vec_id) AS rk
       | FROM (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings WHERE vec_id < $QueryCount) q,
       |      (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings) c
       | WHERE q.vec_id <> c.vec_id)
       |WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  // --- C10 q29: hyperplane-LSH bucketed ANN top-k (rows-only) --------------
  // 6 planes → 64 buckets: at this corpus size each bucket holds a handful
  // of vectors; at 100 TB raise planes (and add multi-probe) so bucket size
  // stays bounded — the join below shuffles on bucket only.
  val AnnPlanes = 6
  val AnnTopK   = 3

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("bucket", hyperplane_bucket(col("v"), 0, AnnPlanes))
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .select(col("q_id"), col("n_id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= AnnTopK)
      .orderBy(col("q_id"), col("rk"))
  }

  // --- C10b q32: IVF-style bucketed ANN ------------------------------------
  // Coarse quantizer: NCells fixed centroid vectors (here: a deterministic
  // prefix of the corpus standing in for trained k-means centroids — the
  // assignment/probe machinery is identical). Every vector is assigned
  // map-side to its nearest centroid; a query probes its NProbe closest
  // cells only, so the scan touches ~NProbe/NCells of the corpus. At
  // 100 TB: train real centroids on a sample, broadcast them (tiny), keep
  // the corpus partitioned/bucketed by cell id.
  val IvfCells  = 16
  val IvfProbes = 4

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val centroids = e
      .filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))
    // map-side cell assignment: broadcast centroids, keep best cell per vec
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell"))
    val assigned = e
      .crossJoin(broadcast(centroids))
      .withColumn(
        "csim",
        expr("aggregate(zip_with(v, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          (col("nrm") * col("cn"))
      )
      .withColumn("cell_rank", row_number().over(wAssign))
      .filter(col("cell_rank") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    // queries probe their NProbe nearest cells
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("cell"))
    val probes = e
      .filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(centroids))
      .withColumn(
        "csim",
        expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          (col("qn") * col("cn"))
      )
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= IvfProbes)
      .select(col("q_id"), col("qv"), col("qn"), col("cell"))
    // search only within probed cells
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    assigned
      .select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .select(col("q_id"), col("n_id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= AnnTopK)
      .orderBy(col("q_id"), col("rk"))
  }

  // --- C11 q30: embedding-cosine near-dup pairs via multi-table LSH --------
  // 6 independent 5-plane tables: P(candidate | cos θ) = 1-(1-(1-θ/π)^5)^6 —
  // ~40 % recall at cos≥0.35 on random data (recall/cost dial: raise tables
  // for more), while candidate volume stays a fraction of n². Exact cosine
  // filter afterwards.
  val NearDupTables    = 6
  val NearDupPlanes    = 5
  val NearDupThreshold = 0.35

  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val tables = (0 until NearDupTables).map { t =>
      struct(lit(t).as("tbl"), hyperplane_bucket(col("v"), t, NearDupPlanes).as("bucket"))
    }
    val bucketed = e
      .select(col("vec_id"), col("v"), col("nrm"), explode(array(tables: _*)).as("b"))
      .select(col("vec_id"), col("v"), col("nrm"), col("b.tbl").as("tbl"), col("b.bucket").as("bucket"))
    // one-pass bucket → pair expansion via the shared (MaxBucket-capped)
    // helper — degenerate buckets can't explode quadratically — deduped
    // across tables BEFORE paying for the dot product
    val cand = TextOps
      .bucketPairs(
        bucketed.select(col("tbl"), col("bucket"), col("vec_id")),
        Seq("tbl", "bucket"),
        "vec_id"
      )
      .select(col("doc_a").as("a_id"), col("doc_b").as("b_id"))
    cand
      .join(e.select(col("vec_id").as("a_id"), col("v").as("qv"), col("nrm").as("qn")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("v").as("cv"), col("nrm").as("cn")), "b_id")
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .filter(col("sim") >= NearDupThreshold)
      .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
