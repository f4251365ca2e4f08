package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-statistics / monitoring operators: the measurements a data-recipe
  * team runs BETWEEN curation passes — distribution drift between sources
  * (q71), per-document salient terms (q73), and filter-threshold calibration
  * (q74). Like [[CurationOps]], every operator collapses the corpus to a
  * bounded statistics table in one scan and is oracled exactly against
  * DuckDB at test scale.
  */
object StatsOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  // --- q71: per-source distribution drift (KL divergence) ------------------

  val DriftBuckets = 128

  /** Per-source distribution drift: `KL(P_source ‖ P_corpus)` over hashed
    * unigram buckets, add-one smoothed — the monitoring statistic that
    * answers "which source's language is unlike the rest of the mix?"
    * (crawl-snapshot regressions, contaminated shards, template floods all
    * show up as KL spikes long before eyeballing samples would catch them).
    * Hashing bounds the distribution at [[DriftBuckets]] buckets regardless
    * of vocabulary — the same trick that makes q57's importance models
    * tractable at 100 TB.
    *
    * Scale shape: ONE corpus scan collapses map-side to the
    * |sources|×[[DriftBuckets]] count table (persisted — every downstream
    * statistic derives from it, none re-scans the corpus); per-source
    * totals, per-bucket corpus totals, and the corpus grand total are all
    * tiny aggregates OF that table, broadcast-joined back onto the full
    * 0..B-1 bucket universe. Summing over the FULL support (not just
    * corpus-present buckets) is what makes both smoothed distributions sum
    * to exactly 1 — and therefore the statistic a true KL, non-negative by
    * Gibbs' inequality. Output is |sources| rows.
    *
    * Float determinism: each bucket's term is
    * `p_sf · ln((c_sf+1)(N+B) / ((c_f+1)(n_s+B)))` — integer products
    * (exact in BIGINT and, below 2^53, in DOUBLE; the sf0.1 corpus peaks
    * ~2^40), one correctly-rounded division each, and the per-source sum
    * folds ascending by bucket on both engines. The final KL rounds to 6
    * (the q49/q57 ln-ulp rule). At corpora where the products would pass
    * 2^53, split the ln into a sum of per-factor lns — 1 ulp per term,
    * still absorbed by the rounding.
    */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame = {
    val B = DriftBuckets
    val counts = docs(spark, dir)
      .select(col("source"), TextOps.toks.as("toks"))
      .select(col("source"), explode(expr(s"transform(toks, t -> pmod(xxhash64(t), $B))")).as("f"))
      .groupBy(col("source"), col("f"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val feats  = spark.range(0, B).toDF("f")                              // the full support
    val srcTot = counts.groupBy(col("source")).agg(sum(col("c")).as("n_s")) // |sources| rows
    val bktTot = counts.groupBy(col("f")).agg(sum(col("c")).as("cf"))     // ≤ B rows
    val grand  = bktTot.agg(sum(col("cf")).as("nn"))                      // 1 row
    srcTot
      .crossJoin(broadcast(feats))
      .join(broadcast(counts), Seq("source", "f"), "left")
      .na.fill(0L, Seq("c"))
      .join(broadcast(bktTot), Seq("f"), "left")
      .na.fill(0L, Seq("cf"))
      .crossJoin(broadcast(grand))
      .withColumn(
        "term",
        ((col("c") + lit(1L)).cast("double") / (col("n_s") + lit(B.toLong)).cast("double")) *
          log(((col("c") + lit(1L)) * (col("nn") + lit(B.toLong))).cast("double") /
            ((col("cf") + lit(1L)) * (col("n_s") + lit(B.toLong))).cast("double")))
      .groupBy(col("source"), col("n_s"))
      .agg(expr("aggregate(array_sort(collect_list(struct(f, term))), 0D, (a, x) -> a + x.term)")
        .as("kl"))
      .select(col("source"), col("n_s").as("n_tok"), round(col("kl"), 6).as("kl_drift"))
      .orderBy(col("source"))
  }

  /** Oracle: distinct token strings hashed once through the [[graft.functions.DuckHash]]
    * chain (the q68 pattern), joined back to instances; same smoothing, same
    * single-division rationals, same ascending-bucket fold.
    */
  lazy val sourceDriftSql: String = {
    import graft.functions.DuckHash._
    val B = DriftBuckets
    val ctes = ArrayBuffer[(String, String)](
      "q71u" ->
        s"""(SELECT source, unnest(toks) AS w
           |  FROM (SELECT source, ${TextOps.DuckToks} AS toks FROM documents))""".stripMargin,
      "q71d" -> s"(SELECT w, ${bytesOf("w")} AS b FROM (SELECT DISTINCT w FROM q71u))"
    )
    val hw = hashBytesChain("q71h", "q71d", Seq("w"), "42", "hs")
    ctes ++= hw.ctes
    ctes += ("q71f" -> s"(SELECT w, (((${toSigned("hs")} % $B) + $B) % $B) AS f FROM ${hw.last})")
    ctes += ("q71c" ->
      "(SELECT source, f, count(*) AS c FROM q71u JOIN q71f USING (w) GROUP BY source, f)")
    ctes += ("q71s" -> "(SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM q71c GROUP BY source)")
    ctes += ("q71g" -> "(SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM q71c GROUP BY f)")
    ctes += ("q71n" -> "(SELECT CAST(sum(cf) AS BIGINT) AS nn FROM q71g)")
    ctes += ("q71b" -> s"(SELECT unnest(range(0, $B)) AS f)")
    ctes += ("q71x" ->
      """(SELECT s.source, s.n_s, b.f, coalesce(g.cf, 0) AS cf, q71n.nn, coalesce(c.c, 0) AS c
        |  FROM q71s s CROSS JOIN q71b b CROSS JOIN q71n
        |  LEFT JOIN q71g g ON g.f = b.f
        |  LEFT JOIN q71c c ON c.source = s.source AND c.f = b.f)""".stripMargin)
    ctes += ("q71w" ->
      s"""(SELECT source, n_s, f,
         |    ((c + 1)::DOUBLE / (n_s + $B)::DOUBLE) *
         |      ln(((c + 1) * (nn + $B))::DOUBLE / ((cf + 1) * (n_s + $B))::DOUBLE) AS term
         |  FROM q71x)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT source, n_s AS n_tok,
        |  round(list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY f)), (a, b) -> a + b),
        |        6) AS kl_drift
        |FROM q71w GROUP BY source, n_s ORDER BY source""".stripMargin
    )
  }
}
