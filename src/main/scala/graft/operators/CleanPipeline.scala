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

    // 1. exact dedup — rank within content-hash groups and keep the lowest
    // doc_id: ONE scan of documents and ONE shuffle (by md5), where a
    // groupBy-then-semi-join shape would scan the corpus twice and shuffle
    // twice. Same result as q20's keep-min-doc_id rule.
    val wDedup = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text")))
      .orderBy(col("doc_id"))
    val exactDeduped = docs
      .withColumn("rn", row_number().over(wDedup))
      .filter(col("rn") === 1)
      .drop("rn")

    // 2. quality gates (map-side); tokenization + stopword list shared with
    // TextOps.qualityScore so metric and gate can't diverge
    val toks = split(trim(col("text")), "\\s+")
    val gated = exactDeduped
      .withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio", TextOps.stopCountExpr / col("n_tokens"))
      .filter(col("n_tokens") >= MinTokens && col("stop_ratio") <= MaxStopRatio)

    // 3. near-dup removal: verified pairs → drop the higher id, but ONLY
    // when the kept (lower-id) member itself survived the earlier stages —
    // otherwise a pair whose keeper was quality-gated would lose BOTH copies.
    // No broadcast hint on the victim set: it is proportional to the corpus
    // dup rate (NOT a dimension table), so a forced broadcast would OOM at
    // high dup rates. AQE picks broadcast at runtime when it IS small.
    val keptSide = gated.select(col("doc_id").as("doc_a"))
    val victims = TextOps
      .ngramJaccardPairs(spark, dir, minJaccard = JaccardCut)
      .join(keptSide, Seq("doc_a"), "left_semi")
      .select(col("doc_b").as("doc_id"))
      .distinct()
    gated
      .join(victims, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"), round(col("stop_ratio"), 4).as("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  /** queries entry: survivor stats per corpus. */
  def q33(spark: SparkSession, dir: String): DataFrame = clean(spark, dir)

  /** DuckDB oracle: the same three stages with EXACT all-pairs Jaccard for
    * stage 3. The shingle/pairs CTEs and the tokenize/stop-count fragments
    * are shared with q27's / q22's oracles ([[TextOps.DuckShingleCte]],
    * [[TextOps.duckStopCount]]) so the composed pipeline can't drift from
    * the operators it composes; the LSH-vs-exact equivalence caveats are
    * documented at [[TextOps.ngramJaccardSql]].
    */
  // --- q100: per-source funnel report over the cleaning pipeline ------------

  /** The corpus-build funnel: per (source, stage), how many documents and
    * tokens survive each stage of [[clean]] — the accounting table every
    * corpus refresh publishes ("where did my data go?"). Stages share the
    * EXACT semantics of q33 (same window rule, same gates, same
    * keeper-aware victim set), so funnel stage 4 sums to q33's output by
    * construction.
    *
    * Scale shape: one corpus scan computes every per-doc stat + flags (the
    * md5 window is q33's single content-hash shuffle; victims ride the
    * bounded pair set); each doc then EXPLODES into one row per stage it
    * survives (≤ 4) and one aggregate produces the whole report —
    * stage-at-a-time re-scans would cost 4 corpus passes for the same
    * numbers.
    */
  def funnelReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = split(trim(col("text")), "\\s+")
    val base = docs.select(
      col("doc_id"),
      col("source"),
      size(toks).as("n_tokens"),
      TextOps.stopCountExpr.as("n_stop"),
      md5(col("text")).as("h"))
    val wDedup = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h"))
      .orderBy(col("doc_id"))
    val flagged = base
      .withColumn("s2", row_number().over(wDedup) === 1)
      .withColumn(
        "s3",
        col("s2") && col("n_tokens") >= MinTokens &&
          (col("n_stop") / col("n_tokens")) <= MaxStopRatio)
    val victims = TextOps
      .ngramJaccardPairs(spark, dir, minJaccard = JaccardCut)
      .join(flagged.filter(col("s3")).select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .select(col("doc_b").as("doc_id"))
      .distinct()
      .withColumn("isv", lit(true))
    flagged
      .join(victims, Seq("doc_id"), "left")
      .withColumn("s4", col("s3") && col("isv").isNull)
      .select(
        col("source"),
        col("n_tokens"),
        explode(expr(
          """filter(array('1_raw',
            |  IF(s2, '2_exact_dedup', NULL),
            |  IF(s3, '3_quality', NULL),
            |  IF(s4, '4_near_dup', NULL)), x -> x IS NOT NULL)""".stripMargin)).as("stage"))
      .groupBy(col("source"), col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("source"), col("stage"))
  }

  /** q100 oracle: the q33 chain's own CTE fragments, one stage table per
    * rung, unioned into the same (source, stage) rollup.
    */
  lazy val funnelReportSql: String =
    s"""WITH q100b AS (
       |  SELECT doc_id, source, len(${TextOps.DuckToks}) AS n_tokens,
       |    ${TextOps.duckStopCount} AS n_stop
       |  FROM documents),
       |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |q100s2 AS (SELECT b.* FROM q100b b JOIN keep USING (doc_id)),
       |q100s3 AS (SELECT * FROM q100s2
       |  WHERE n_tokens >= $MinTokens AND n_stop / n_tokens <= $MaxStopRatio),
       |${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |victims AS (
       |  SELECT DISTINCT p.doc_b AS doc_id
       |  FROM pairs p JOIN q100s3 g ON p.doc_a = g.doc_id
       |  WHERE p.jaccard >= $JaccardCut),
       |q100s4 AS (
       |  SELECT s.* FROM q100s3 s LEFT JOIN victims v USING (doc_id)
       |  WHERE v.doc_id IS NULL)
       |SELECT source, stage, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
       |FROM (
       |  SELECT source, '1_raw' AS stage, n_tokens FROM q100b
       |  UNION ALL SELECT source, '2_exact_dedup', n_tokens FROM q100s2
       |  UNION ALL SELECT source, '3_quality', n_tokens FROM q100s3
       |  UNION ALL SELECT source, '4_near_dup', n_tokens FROM q100s4)
       |GROUP BY source, stage
       |ORDER BY source, stage""".stripMargin

  val cleanSql: String =
    s"""WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |gated AS (
       |  SELECT doc_id, n_tokens, n_stop / n_tokens AS stop_ratio FROM (
       |    SELECT doc_id,
       |      len(${TextOps.DuckToks}) AS n_tokens,
       |      ${TextOps.duckStopCount} AS n_stop
       |    FROM documents JOIN keep USING (doc_id))
       |  WHERE n_tokens >= $MinTokens AND n_stop / n_tokens <= $MaxStopRatio
       |),
       |${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |victims AS (
       |  SELECT DISTINCT p.doc_b AS doc_id
       |  FROM pairs p JOIN gated g ON p.doc_a = g.doc_id
       |  WHERE p.jaccard >= $JaccardCut
       |)
       |SELECT g.doc_id, g.n_tokens, round(g.stop_ratio, 4) AS stop_ratio
       |FROM gated g LEFT JOIN victims v ON g.doc_id = v.doc_id
       |WHERE v.doc_id IS NULL
       |ORDER BY g.doc_id""".stripMargin

  // --- q145: gram-diversity survival through the clean pipeline ----------------

  /** Diversity-survival audit of the cleaning chain: per source, how many
    * distinct 3-gram shingles the RAW corpus had vs how many survive
    * q33's full pipeline (exact dedup → quality gates → near-dup
    * removal) — the check that cleaning removed REDUNDANCY, not
    * DIVERSITY. Dedup is supposed to drop copies of things the corpus
    * still has; a source whose retention collapses here lost unique
    * content to an over-aggressive gate, which no survivor-count funnel
    * (q100) can see because it counts documents, not information.
    *
    * Scale shape: the (doc, gram, source) grain is the session-shared
    * shingle stage exploded once and persisted; both rollups are
    * distinct-then-count on (source, gram); the survivor filter is one
    * doc-keyed semi-join against q33's output. Integers until the one
    * rounded ratio.
    */
  def gramSurvival(spark: SparkSession, dir: String): DataFrame = {
    val sg = graft.core.CacheScope.persist(
      graft.operators.SharedStages
        .shingles(spark, dir)
        .select(col("doc_id"), explode(col("shingles")).as("gram"))
        .join(
          Tables.documents(spark, dir).select(col("doc_id"), col("source")),
          "doc_id"))
    val raw = sg
      .select(col("source"), col("gram")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_grams_raw"))
    val kept = sg
      .join(clean(spark, dir).select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("source"), col("gram")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_grams_kept"))
    raw
      .join(kept, Seq("source"), "left")
      .select(
        col("source"),
        col("n_grams_raw"),
        coalesce(col("n_grams_kept"), lit(0L)).as("n_grams_kept"),
        round(
          coalesce(col("n_grams_kept"), lit(0L)).cast("double") /
            col("n_grams_raw").cast("double"),
          6).as("retention"))
      .orderBy(col("source"))
  }

  /** q145 oracle: the q33 survivor chain verbatim + the shared shingle
    * CTE and identical distinct rollups.
    */
  lazy val gramSurvivalSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |q145g AS MATERIALIZED (
       |  SELECT s.doc_id, d.source, g.gram
       |  FROM sh s JOIN documents d ON d.doc_id = s.doc_id,
       |    unnest(s.shingles) AS g(gram)),
       |q145k AS MATERIALIZED (SELECT doc_id FROM ($cleanSql)),
       |q145r AS (
       |  SELECT source, count(*)::BIGINT AS n_grams_raw FROM (
       |    SELECT DISTINCT source, gram FROM q145g) GROUP BY source),
       |q145s AS (
       |  SELECT source, count(*)::BIGINT AS n_grams_kept FROM (
       |    SELECT DISTINCT g.source, g.gram FROM q145g g
       |    WHERE g.doc_id IN (SELECT doc_id FROM q145k)) GROUP BY source)
       |SELECT r.source, r.n_grams_raw,
       |  coalesce(s.n_grams_kept, 0)::BIGINT AS n_grams_kept,
       |  round(coalesce(s.n_grams_kept, 0)::DOUBLE / r.n_grams_raw::DOUBLE, 6) AS retention
       |FROM q145r r LEFT JOIN q145s s USING (source)
       |ORDER BY r.source""".stripMargin

  // --- q156: cleaning-gate ablation ------------------------------------------

  /** Marginal attribution for the cleaning pipeline's gates: per gate,
    * how many documents fail it when every gate is evaluated
    * INDEPENDENTLY (`n_fail`), and how many fail ONLY it (`n_only`) — the
    * number that would be saved by relaxing exactly that gate. q100's
    * funnel reads the gates SEQUENTIALLY, so a doc dropped at stage 2
    * never reaches stage 3 and the funnel can't say which single gate a
    * tightening/loosening decision actually owns; the ablation view is
    * the complement every threshold review asks for ("if we drop the
    * stop-ratio gate, what do we get back — and is it just the dup pool
    * again?"). The near-dup flag here is keeper-agnostic (victim of ANY
    * verified pair), deliberately independent of the other gates.
    *
    * Scale shape: ONE corpus scan computes tokens/stopwords/md5, the
    * keeper window is q33's single content-hash shuffle, victims ride the
    * session-shared verified-pair stage, and each doc explodes onto the
    * fixed 4-gate list before one ≤4-group aggregate; the 1-row total
    * broadcasts. Determinism: integer counts, the q33 gate constants,
    * fixed divide-round shapes.
    */
  def gateAblation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = split(trim(col("text")), "\\s+")
    val base = docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      TextOps.stopCountExpr.as("n_stop"),
      md5(col("text")).as("h"))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val victims = TextOps
      .ngramJaccardPairs(spark, dir, minJaccard = JaccardCut)
      .select(col("doc_b").as("doc_id"))
      .distinct()
      .withColumn("hit", lit(true))
    val flags = base
      .withColumn("f_dup", row_number().over(w) =!= 1)
      .join(victims, Seq("doc_id"), "left")
      .select(
        col("f_dup"),
        (col("n_tokens") < MinTokens).as("f_len"),
        (col("n_stop") / col("n_tokens") > MaxStopRatio).as("f_stop"),
        coalesce(col("hit"), lit(false)).as("f_near"))
    def g(name: String, f: org.apache.spark.sql.Column, others: Seq[org.apache.spark.sql.Column]) =
      struct(
        lit(name).as("gate"),
        f.as("f"),
        others.foldLeft(f)((acc, o) => acc && !o).as("only"))
    val gates = array(
      g("1_exact_dup", col("f_dup"), Seq(col("f_len"), col("f_stop"), col("f_near"))),
      g("2_min_length", col("f_len"), Seq(col("f_dup"), col("f_stop"), col("f_near"))),
      g("3_stop_ratio", col("f_stop"), Seq(col("f_dup"), col("f_len"), col("f_near"))),
      g("4_near_dup", col("f_near"), Seq(col("f_dup"), col("f_len"), col("f_stop"))))
    flags
      .select(explode(gates).as("x"))
      .groupBy(col("x.gate").as("gate"))
      .agg(
        sum(when(col("x.f"), 1L).otherwise(0L)).as("n_fail"),
        sum(when(col("x.only"), 1L).otherwise(0L)).as("n_only"))
      .crossJoin(broadcast(docs.groupBy().agg(count(lit(1)).as("n"))))
      .select(
        col("gate"),
        col("n_fail"),
        col("n_only"),
        round(col("n_fail").cast("double") / col("n").cast("double"), 6).as("pct_fail"),
        round(col("n_only").cast("double") / col("n").cast("double"), 6).as("pct_only"))
      .orderBy(col("gate"))
  }

  /** q156 oracle: q33's shared tokenize/stop/shingle/pair fragments, the
    * identical independent flag definitions, and the same 4-way unpivot.
    */
  lazy val gateAblationSql: String =
    s"""WITH q156b AS MATERIALIZED (
       |  SELECT doc_id, len(${TextOps.DuckToks}) AS n_tokens,
       |    ${TextOps.duckStopCount} AS n_stop, md5(text) AS h
       |  FROM documents),
       |q156k AS (SELECT h, MIN(doc_id) AS keeper FROM q156b GROUP BY h),
       |${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q156v AS (SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE jaccard >= $JaccardCut),
       |q156f AS MATERIALIZED (
       |  SELECT b.doc_id,
       |    (b.doc_id <> k.keeper) AS f_dup,
       |    (b.n_tokens < $MinTokens) AS f_len,
       |    (b.n_stop / b.n_tokens > $MaxStopRatio) AS f_stop,
       |    (v.doc_id IS NOT NULL) AS f_near
       |  FROM q156b b JOIN q156k k USING (h) LEFT JOIN q156v v USING (doc_id)),
       |q156n AS (SELECT count(*)::BIGINT AS n FROM q156b),
       |q156g AS (
       |  SELECT '1_exact_dup' AS gate, f_dup AS f,
       |    (f_dup AND NOT f_len AND NOT f_stop AND NOT f_near) AS only_f FROM q156f
       |  UNION ALL SELECT '2_min_length', f_len,
       |    (f_len AND NOT f_dup AND NOT f_stop AND NOT f_near) FROM q156f
       |  UNION ALL SELECT '3_stop_ratio', f_stop,
       |    (f_stop AND NOT f_dup AND NOT f_len AND NOT f_near) FROM q156f
       |  UNION ALL SELECT '4_near_dup', f_near,
       |    (f_near AND NOT f_dup AND NOT f_len AND NOT f_stop) FROM q156f)
       |SELECT gate,
       |  CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
       |  CAST(sum(CASE WHEN only_f THEN 1 ELSE 0 END) AS BIGINT) AS n_only,
       |  round(CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS DOUBLE) / n.n::DOUBLE, 6) AS pct_fail,
       |  round(CAST(sum(CASE WHEN only_f THEN 1 ELSE 0 END) AS DOUBLE) / n.n::DOUBLE, 6) AS pct_only
       |FROM q156g, q156n n
       |GROUP BY gate, n.n
       |ORDER BY gate""".stripMargin
}
