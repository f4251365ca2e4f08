package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** End-to-end training-data cleaning pipeline — the composition the
  * individual §2.C operators exist for:
  *
  *   1. exact dedup          (md5 groupBy, keep lowest doc_id)
  *   2. quality filter       (length + stopword-ratio gates)
  *   3. near-dup removal     (MinHash-LSH candidates → exact Jaccard ≥ 0.9
  *                            → drop the higher doc_id of each pair)
  *
  * Every stage is a DataFrame transform: the dedups shuffle on content
  * hashes / LSH buckets only, filters are map-side, and the near-dup drop
  * is a broadcast-able anti-join against the (tiny) victim set — the same
  * plan shape survives a 1000-executor corpus.
  */
object CleanPipeline {

  val MinTokens   = 8
  val MaxStopRatio = 0.6
  val JaccardCut  = 0.9

  /** Cleaned corpus: doc_id + text + per-doc stats of survivors. */
  def clean(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    // 1. exact dedup
    val keep = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exactDeduped = docs.join(keep, Seq("doc_id"), "left_semi")

    // 2. quality gates (map-side); tokenization + stopword list shared with
    // TextOps.qualityScore so metric and gate can't diverge
    val toks = split(trim(col("text")), "\\s+")
    val gated = exactDeduped
      .withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio", TextOps.stopCountExpr / col("n_tokens"))
      .filter(col("n_tokens") >= MinTokens && col("stop_ratio") <= MaxStopRatio)

    // 3. near-dup removal: verified pairs → drop the higher id, but ONLY
    // when the kept (lower-id) member itself survived the earlier stages —
    // otherwise a pair whose keeper was quality-gated would lose BOTH copies
    val keptSide = gated.select(col("doc_id").as("doc_a"))
    val victims = TextOps
      .ngramJaccard(spark, dir)
      .filter(col("jaccard") >= JaccardCut)
      .join(keptSide, Seq("doc_a"), "left_semi")
      .select(col("doc_b").as("doc_id"))
      .distinct()
    gated
      .join(broadcast(victims), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"), round(col("stop_ratio"), 4).as("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  /** queries entry (rows-only): survivor stats per corpus. */
  def q33(spark: SparkSession, dir: String): DataFrame = clean(spark, dir)
}
