package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** q71's KL formula as a pure function over one collected histogram —
    * shared with the E16 streaming drift monitor so the windowed statistic
    * and the batch statistic cannot diverge: same full-support smoothing,
    * same single-division rationals, same `StrictMath.log` (what Spark's
    * `log` evaluates), same ascending-bucket fold from 0.0.
    */
  def driftKl(hist: Seq[(Long, Long)], refCf: Map[Long, Long], refN: Long, buckets: Int): (Long, Double) = {
    val cs = hist.toMap
    val nS = hist.map(_._2).sum
    var kl = 0.0
    var f  = 0L
    while (f < buckets) {
      val c   = cs.getOrElse(f, 0L)
      val cf  = refCf.getOrElse(f, 0L)
      val psf = (c + 1).toDouble / (nS + buckets).toDouble
      kl += psf * StrictMath.log(
        ((c + 1) * (refN + buckets)).toDouble / ((cf + 1) * (nS + buckets)).toDouble)
      f += 1
    }
    (nS, kl)
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

  // --- q73: per-document top TF-IDF terms -----------------------------------

  val TfidfTopK = 3

  /** The [[TfidfTopK]] most salient terms of every document by TF-IDF
    * (`tf · ln(N/df)`) — per-doc keyword extraction, the cheap labelless
    * cousin of topic tagging: common across the corpus ⇒ downweighted,
    * frequent within the doc ⇒ upweighted. Complements q34 (corpus-global
    * top terms) and q49 (query-conditioned BM25) with a per-document view.
    *
    * Scale shape: term frequencies aggregate once on (doc, term) with
    * map-side combine (persisted — both the document-frequency rollup and
    * the scoring join consume it; the corpus is scanned ONCE); df is a
    * vocabulary-bounded aggregate of that table; N is a one-row broadcast.
    * The per-doc rank window partitions on doc_id with group size bounded
    * by the DOCUMENT's distinct-term count — unlike a corpus-keyed window,
    * this cannot degenerate at scale (the q61 heap is for unbounded
    * groups; a document is not one).
    *
    * Determinism: idf is ONE ln of a single division of exact integers,
    * rounded to 6 (the q49 ulp rule) BEFORE the tf multiply and the rank —
    * so the ordering key is engine-identical and ties break on the term
    * string.
    */
  def tfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    val d  = docs(spark, dir)
    val tf = d
      .select(col("doc_id"), explode(TextOps.toks).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n     = d.agg(count(lit(1)).as("n"))
    val w     = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn(
        "tfidf",
        col("tf").cast("double") * round(log(col("n").cast("double") / col("df").cast("double")), 6))
      .select(col("doc_id"), col("term"), row_number().over(w).as("rk"), col("tfidf"))
      .filter(col("rk") <= TfidfTopK)
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Oracle: same integer tf/df/N, same rounded one-ln idf, same
    * (score desc, term asc) total order.
    */
  val tfidfTermsSql: String =
    s"""WITH q73tf AS MATERIALIZED (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(${TextOps.DuckToks}) AS term FROM documents)
       |  GROUP BY doc_id, term),
       |q73df AS MATERIALIZED (SELECT term, count(*) AS df FROM q73tf GROUP BY term),
       |q73n AS (SELECT count(*) AS n FROM documents),
       |q73s AS (
       |  SELECT doc_id, term,
       |    tf::DOUBLE * round(ln(n::DOUBLE / df::DOUBLE), 6) AS tfidf
       |  FROM q73tf JOIN q73df USING (term) CROSS JOIN q73n)
       |SELECT doc_id, term, rk, tfidf FROM (
       |  SELECT doc_id, term, tfidf,
       |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rk
       |  FROM q73s)
       |WHERE rk <= $TfidfTopK
       |ORDER BY doc_id, rk""".stripMargin

  // --- q74: filter-threshold calibration sweep ------------------------------

  val SweepSteps = 20 // thresholds i/50 for i = 0..20 → 0.00, 0.02, …, 0.40
  val SweepScale = 50

  /** Operating-point calibration for a quality gate: sweep a keep-threshold
    * over a per-document score and report the confusion counts +
    * precision/recall/F1 at every threshold — the table a pipeline owner
    * reads to pick WHERE to cut before a filter ships (every "keep if
    * score ≥ t" gate in this repo — q22/q33/E9 — implies someone chose t;
    * this operator is how). Score here: q22's stopword ratio (shared
    * expression, so the calibrated gate and the deployed gate can't
    * diverge); weak label: the corpus' own `lang = 'en'` tag.
    *
    * Scale shape: ONE corpus scan bins each doc's score map-side
    * (`floor(ratio·SweepScale)` clamped) and collapses to a ≤ (bins+1)×2
    * (bin, label) count table; the threshold sweep is then a bounded
    * theta-join (21 thresholds × ≤42 count rows, broadcast) — per-threshold
    * confusion counts WITHOUT a per-threshold corpus pass or a corpus ×
    * thresholds fan-out. Adding thresholds costs nothing at any corpus
    * size.
    *
    * Determinism: bin boundaries compare `floor(ratio·50) ≥ i` on an
    * IEEE-identical product of one exact division; confusion counts are
    * exact integers; precision/recall/F1 are short pinned-shape division
    * chains of those integers (no ln, no rounding needed). Degenerate
    * thresholds (no predicted positives) yield NULL precision/F1 on both
    * engines.
    */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir)
      .select(
        (col("lang") === "en").as("pos"),
        least(
          floor((TextOps.stopCountExpr.cast("double") / size(TextOps.toks).cast("double")) *
            lit(SweepScale.toDouble)),
          lit(SweepSteps.toLong)).as("bin"))
      .groupBy(col("bin"), col("pos"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val npos = counts.filter(col("pos")).agg(sum(col("c")).as("np"))
    spark.range(0, SweepSteps + 1).toDF("i")
      .join(broadcast(counts), col("bin") >= col("i"), "left")
      .groupBy(col("i"))
      .agg(
        coalesce(sum(when(col("pos"), col("c"))), lit(0L)).as("tp"),
        coalesce(sum(when(!col("pos"), col("c"))), lit(0L)).as("fp"))
      .crossJoin(broadcast(npos))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double")))
      .withColumn("recall", col("tp").cast("double") / col("np").cast("double"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall"))))
      .select(
        (col("i").cast("double") / lit(SweepScale.toDouble)).as("threshold"),
        col("tp"), col("fp"), (col("np") - col("tp")).as("fn"),
        col("precision"), col("recall"), col("f1"))
      .orderBy(col("threshold"))
  }

  // --- q76: per-source dataset report card ----------------------------------

  /** The "dataset card" rollup: one row per source with the numbers a data
    * recipe quotes — document/token/char volume, English share, stopword
    * token share, and exact-duplicate rate. This is the composition layer
    * over the per-doc operators (q20's dup evidence, q22's quality
    * numerators, q23's label) that turns them into source-level
    * accept/reject/weight decisions (q53/q70 consume exactly these
    * volumes).
    *
    * Scale shape: ONE corpus scan computes all per-doc metrics map-side;
    * the exact-dup owner comes from one md5-keyed window (q52's idiom — no
    * join-back), then everything collapses to a |sources|-row aggregate.
    * Determinism: every reported ratio is ONE double division of exact
    * integer sums (never a mean of per-doc floats — same information,
    * no float-accumulation order to pin).
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val wH = Window.partitionBy(col("h"))
    docs(spark, dir)
      .select(
        col("doc_id"), col("source"),
        (col("lang") === "en").cast("long").as("is_en"),
        col("n_chars"),
        size(TextOps.toks).cast("long").as("n_tok"),
        TextOps.stopCountExpr.cast("long").as("n_stop"),
        md5(col("text")).as("h"))
      .withColumn("is_dup", (col("doc_id") > min(col("doc_id")).over(wH)).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("is_en")).as("n_en"),
        sum(col("n_stop")).as("n_stop"),
        sum(col("is_dup")).as("n_dup"))
      .select(
        col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_en").cast("double") / col("n_docs").cast("double")).as("pct_en"),
        (col("n_stop").cast("double") / col("n_tokens").cast("double")).as("stop_share"),
        (col("n_dup").cast("double") / col("n_docs").cast("double")).as("dup_rate"))
      .orderBy(col("source"))
  }

  /** Oracle: md5 agrees across engines (hex strings), sums are exact
    * integers, each ratio is one identical division.
    */
  lazy val datasetCardSql: String = {
    import graft.operators.TextOps.{duckStopCount, DuckToks}
    s"""WITH q76d AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
       |    n_chars, len($DuckToks) AS n_tok, $duckStopCount AS n_stop,
       |    md5(text) AS h
       |  FROM documents),
       |q76w AS MATERIALIZED (
       |  SELECT *, CASE WHEN doc_id > min(doc_id) OVER (PARTITION BY h) THEN 1 ELSE 0 END AS is_dup
       |  FROM q76d)
       |SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  CAST(sum(is_en) AS BIGINT)::DOUBLE / count(*)::DOUBLE AS pct_en,
       |  CAST(sum(n_stop) AS BIGINT)::DOUBLE / CAST(sum(n_tok) AS BIGINT)::DOUBLE AS stop_share,
       |  CAST(sum(is_dup) AS BIGINT)::DOUBLE / count(*)::DOUBLE AS dup_rate
       |FROM q76w GROUP BY source ORDER BY source""".stripMargin
  }

  // --- q77: per-source Zipf slope --------------------------------------------

  val ZipfTopN = 100

  /** Zipf-law fit per source: the least-squares slope of `ln f` against
    * `ln rank` over the source's [[ZipfTopN]] most frequent terms. Natural
    * language sits near slope −1; template floods and synthetic/boilerplate
    * text bend the curve (flat head = keyword stuffing, cliff = tiny
    * effective vocabulary) — a one-number corpus-health check next to
    * q71's drift and q58's entropy.
    *
    * Scale shape: one (source, term) frequency aggregate (vocabulary-
    * bounded, map-side combine), a per-source rank window that
    * WindowGroupLimit caps at [[ZipfTopN]] rows per partition, then ALL
    * regression sums fold over ≤[[ZipfTopN]]-element arrays per source —
    * the fit itself costs nothing at any corpus size.
    *
    * Determinism: x/y are single rounded lns of exact integers (the q49
    * rule); the four regression sums fold in rank order on both engines;
    * the slope is one fixed-shape expression of those sums, rounded to 6.
    */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("f").desc, col("term"))
    docs(spark, dir)
      .select(col("source"), explode(TextOps.toks).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("f"))
      .select(col("source"), col("f"), row_number().over(w).as("rk"))
      .filter(col("rk") <= ZipfTopN)
      .select(
        col("source"), col("rk"),
        round(log(col("rk").cast("double")), 6).as("x"),
        round(log(col("f").cast("double")), 6).as("y"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        expr("aggregate(array_sort(collect_list(struct(rk, x))), 0D, (a, s) -> a + s.x)").as("sx"),
        expr("aggregate(array_sort(collect_list(struct(rk, y))), 0D, (a, s) -> a + s.y)").as("sy"),
        expr("aggregate(array_sort(collect_list(struct(rk, x, y))), 0D, (a, s) -> a + s.x * s.y)")
          .as("sxy"),
        expr("aggregate(array_sort(collect_list(struct(rk, x))), 0D, (a, s) -> a + s.x * s.x)")
          .as("sxx"))
      .select(
        col("source"),
        col("n").cast("long").as("n_terms"),
        round(
          when(col("n") >= 2,
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))),
          6).as("zipf_slope"))
      .orderBy(col("source"))
  }

  /** Oracle: same rounded lns, same rank-ordered folds, same slope shape. */
  val zipfSlopeSql: String =
    s"""WITH q77f AS MATERIALIZED (
       |  SELECT source, term, count(*) AS f
       |  FROM (SELECT source, unnest(${TextOps.DuckToks}) AS term FROM documents)
       |  GROUP BY source, term),
       |q77p AS MATERIALIZED (
       |  SELECT source, rk, round(ln(rk::DOUBLE), 6) AS x, round(ln(f::DOUBLE), 6) AS y
       |  FROM (SELECT source, f,
       |          row_number() OVER (PARTITION BY source ORDER BY f DESC, term) AS rk
       |        FROM q77f)
       |  WHERE rk <= $ZipfTopN),
       |q77a AS (
       |  SELECT source, count(*)::DOUBLE AS n,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY rk)), (a, b) -> a + b) AS sx,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(y ORDER BY rk)), (a, b) -> a + b) AS sy,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(x * y ORDER BY rk)), (a, b) -> a + b) AS sxy,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(x * x ORDER BY rk)), (a, b) -> a + b) AS sxx
       |  FROM q77p GROUP BY source)
       |SELECT source, CAST(n AS BIGINT) AS n_terms,
       |  round(CASE WHEN n >= 2
       |        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS zipf_slope
       |FROM q77a ORDER BY source""".stripMargin

  /** Oracle: identical binning product, identical integer confusion counts,
    * identical division shapes.
    */
  lazy val thresholdSweepSql: String = {
    import graft.operators.TextOps.{duckStopCount, DuckToks}
    s"""WITH q74b AS MATERIALIZED (
       |  SELECT (lang = 'en') AS pos,
       |    least(CAST(floor((ns::DOUBLE / nt::DOUBLE) * $SweepScale) AS BIGINT),
       |          $SweepSteps) AS bin
       |  FROM (SELECT lang, $duckStopCount AS ns, len($DuckToks) AS nt FROM documents)),
       |q74c AS MATERIALIZED (SELECT bin, pos, count(*) AS c FROM q74b GROUP BY bin, pos),
       |q74p AS (SELECT CAST(sum(c) AS BIGINT) AS np FROM q74c WHERE pos),
       |q74t AS (SELECT unnest(range(0, ${SweepSteps + 1})) AS i),
       |q74j AS (
       |  SELECT i,
       |    coalesce(CAST(sum(CASE WHEN pos THEN c END) AS BIGINT), 0) AS tp,
       |    coalesce(CAST(sum(CASE WHEN NOT pos THEN c END) AS BIGINT), 0) AS fp
       |  FROM q74t LEFT JOIN q74c ON bin >= i GROUP BY i),
       |q74m AS (
       |  SELECT i, tp, fp, np,
       |    CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp)::DOUBLE END AS precision,
       |    tp::DOUBLE / np::DOUBLE AS recall
       |  FROM q74j CROSS JOIN q74p)
       |SELECT i::DOUBLE / $SweepScale AS threshold, tp, fp, np - tp AS fn,
       |  precision, recall,
       |  CASE WHEN precision + recall > 0
       |       THEN 2.0 * precision * recall / (precision + recall) END AS f1
       |FROM q74m ORDER BY threshold""".stripMargin
  }

  // --- q79: exact quantile normalization without a global sort -------------

  /** Floor on how many range partitions the rank shuffle spreads over
    * (32 = the local bench's core count, keeping the driver's bench
    * numbers comparable across its core-count runs).
    */
  val RankPartitions = 32

  /** r14: the ACTUAL range-partition count is scale-adaptive —
    * `max(floor, session default parallelism)` — instead of a constant
    * tuned for local mode: on a cluster `defaultParallelism` is
    * executors × cores, so each rank task sorts corpus/P rows at any
    * size, while every local/driver core-count configuration still sees
    * exactly the old 32 (defaultParallelism ≤ 32 there, so the floor
    * rules). Rank VALUES are partition-count-independent by construction
    * (exact per-partition counts + broadcast prefix offsets; pinned by
    * LayoutInvarianceSpec), so this changes no query's answer anywhere.
    */
  private def rankPartitions(df: DataFrame): Int =
    math.max(RankPartitions, df.sparkSession.sparkContext.defaultParallelism)

  /** Exact corpus-wide and within-source percentile of each document's
    * stop-word ratio (q22's score) — quantile normalization, the step that
    * turns a raw filter score into a calibrated "keep the best X%" cut that
    * is comparable across sources with different score distributions.
    *
    * `percent_rank()` over an unpartitioned window is the textbook spelling
    * and a 100 TB suicide note: Spark plans it as ONE task holding the
    * whole corpus. This is the scale-correct exact equivalent:
    *
    *   1. `repartitionByRange(score)` — each partition owns a contiguous
    *      score range, ties all land in one partition (range partitioning
    *      sends equal keys to equal partitions);
    *   2. per-partition strictly-less counts via an ordinary KEYED window
    *      (`partitionBy(pid)`, `rank()-1`) — P parallel sorts of n/P rows;
    *   3. partition-prefix offsets computed ON the ≤P-row (pid → count)
    *      table and broadcast-joined back — the corpus-side cost is one
    *      codegen'd hash-join probe per row (no window, no
    *      single-partition stage, no interpreted per-row lambda);
    *   4. strictly_less = prefix + local, pct = less/(n−1) — one exact
    *      integer division, identical bits to DuckDB's `percent_rank()`.
    *
    * The within-source ranks reuse the same machinery keyed by (source,
    * score) — per-source sorts also spread over all P partitions, so one
    * giant source cannot pin a task the way `Window.partitionBy(source)
    * .orderBy(score)` would. AQE only ever coalesces ADJACENT shuffle
    * partitions, which preserves both the range ordering and tie
    * colocation, so the counts are layout-independent.
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the corpus-wide and the per-source rank each range-shuffle
    // this scored table — without the cache the tokenize+score chain runs
    // once per consumer (and the helpers' own persist then only dedups
    // their internal sampling pass, not the shared upstream)
    val scored = graft.core.CacheScope.persist(
      docs(spark, dir)
        .select(
          col("doc_id"),
          col("source"),
          (TextOps.stopCountExpr / size(TextOps.toks)).as("score")))

    val corpus = strictlyLess(scored, Nil, "score", "less_c", cacheInput = false)
      .withColumnRenamed("n_s", "n")
    val bySrc = strictlyLess(
      scored.select(col("doc_id"), col("source"), col("score")),
      Seq("source"), "score", "less_s", cacheInput = false)
      .select(col("doc_id"), col("less_s"), col("n_s"))

    corpus
      .join(bySrc, "doc_id")
      .select(
        col("doc_id"),
        col("source"),
        col("score"),
        when(col("n") === 1L, lit(0.0))
          .otherwise(col("less_c").cast("double") / (col("n") - 1L).cast("double"))
          .as("pct_corpus"),
        when(col("n_s") === 1L, lit(0.0))
          .otherwise(col("less_s").cast("double") / (col("n_s") - 1L).cast("double"))
          .as("pct_source"))
      .orderBy(col("doc_id"))
  }

  /** Strictly-less-than-count of `valueCol` within each `parts` group
    * (empty `parts` = the whole corpus), plus the group size `n_s` — the
    * range-partition + keyed-window + prefix-fold plan described on
    * [[quantileNormalize]], shared with q82's sort-free doc ranking.
    * Output: input columns + `out` + `n_s`.
    */
  private[operators] def strictlyLess(
      df: DataFrame,
      parts: Seq[String],
      valueCol: String,
      out: String,
      cacheInput: Boolean
  ): DataFrame = strictlyLess(df, parts, Seq(valueCol), out, cacheInput)

  /** Multi-column variant: strictly-less on the lexicographic tuple of
    * `valueCols` — with a unique tiebreaker column appended this is a
    * distributed, sort-free `row_number() - 1`.
    */
  private[operators] def strictlyLess(
      df: DataFrame,
      parts: Seq[String],
      valueCols: Seq[String],
      out: String,
      cacheInput: Boolean = true
  ): DataFrame = {
    val rangeCols = parts.map(col) ++ valueCols.map(col)
    // r14: two fixes in one shape. (1) `repartitionByRange` executes its
    // input twice — a range-boundary sampling job plus the real shuffle —
    // so an uncached upstream ran end-to-end twice per rank call.
    // `cacheInput` persists the (already projected, narrow) rank input,
    // trading that recompute for one MEMORY_AND_DISK write of exactly the
    // rows the shuffle moves anyway; callers pass FALSE when the input is
    // cheap to recompute or already cached (a bare scan projection, a
    // post-aggregate histogram whose shuffle files get reused, or a
    // caller-persisted frame), where the extra materialization is pure
    // loss. (2) the downstream count/offset/window consumers previously
    // relied on Spark REUSING the one range exchange for a consistent
    // `spark_partition_id` — a reuse a cached input (and AQE stage
    // re-planning generally) can silently break, and range boundaries are
    // NOT deterministic across separate executions (the partitioner's
    // sample seeds from the fresh RDD id). The eager localCheckpoint
    // freezes (row, pid) ONCE; every consumer reads the same blocks, so
    // rank integrity no longer depends on exchange-reuse luck. CacheScope
    // frees both at end of query.
    val src = if (cacheInput) graft.core.CacheScope.persist(df) else df
    val keyed = graft.core.CacheScope.checkpoint(
      src
        .repartitionByRange(rankPartitions(df), rangeCols: _*)
        .withColumn("pid", spark_partition_id()))
    val groupCols = col("pid") +: parts.map(col)
    val partCounts = keyed.groupBy(groupCols: _*).agg(count(lit(1)).as("pc"))
    // Partition-prefix offsets and group sizes, computed ON the ≤
    // P×|groups| count table (folding its own collected array — tiny²
    // work), then broadcast-JOINED back by (pid, group). The corpus-side
    // per-row cost is one codegen'd hash-join probe — an earlier draft
    // folded the array per corpus row, which put an interpreted
    // higher-order lambda on the 100 TB hot path.
    val sKey = parts.headOption.map(p => col(p).as("g")).getOrElse(lit(0).as("g"))
    val gRef = parts.headOption.map(col).getOrElse(lit(0))
    val offsets = partCounts
      .crossJoin(broadcast(
        partCounts.agg(collect_list(struct(col("pid").as("p"), sKey, col("pc").as("c"))).as("pcs"))))
      .withColumn("g0", gRef)
      .select(
        (col("pid") +: parts.map(col)) ++ Seq(
          expr("aggregate(filter(pcs, x -> x.p < pid AND x.g = g0), 0L, (a, x) -> a + x.c)")
            .as("off"),
          expr("aggregate(filter(pcs, x -> x.g = g0), 0L, (a, x) -> a + x.c)").as("n_s")): _*)
    val w = Window.partitionBy(groupCols: _*).orderBy(valueCols.map(col): _*)
    keyed
      .join(broadcast(offsets), "pid" +: parts, "inner")
      .withColumn(out, col("off") + rank().over(w).cast("long") - 1L)
      .drop("pid", "off")
  }

  /** Inclusive running sum of `weightCol` (a long) in ascending
    * lexicographic (`keyCols`) order — the distributed, sort-free
    * `sum(w) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)`. Same shape as
    * [[strictlyLess]]: range-partition on the key tuple (each partition
    * owns a contiguous key range), per-partition running sums via an
    * ordinary KEYED window, partition-prefix weight offsets computed on
    * the ≤P-row (pid → total) table and broadcast-joined back. `keyCols`
    * must totally order the rows (append a unique tiebreaker) or the
    * running sum is not well defined. Output: input columns + `out`.
    */
  private[operators] def prefixSum(
      df: DataFrame,
      keyCols: Seq[String],
      weightCol: String,
      out: String,
      cacheInput: Boolean = true
  ): DataFrame = {
    // optional input persist + eager checkpoint around the range shuffle —
    // see strictlyLess (sampling re-runs the upstream; consumers need one
    // frozen pid assignment)
    val src = if (cacheInput) graft.core.CacheScope.persist(df) else df
    val keyed = graft.core.CacheScope.checkpoint(
      src
        .repartitionByRange(rankPartitions(df), keyCols.map(col): _*)
        .withColumn("pid", spark_partition_id()))
    val partTotals = keyed.groupBy(col("pid")).agg(sum(col(weightCol)).as("pw"))
    val offsets = partTotals
      .crossJoin(broadcast(
        partTotals.agg(collect_list(struct(col("pid").as("p"), col("pw").as("w"))).as("pws"))))
      .select(
        col("pid"),
        expr("aggregate(filter(pws, x -> x.p < pid), 0L, (a, x) -> a + x.w)").as("off"))
    val w = Window.partitionBy(col("pid")).orderBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .join(broadcast(offsets), Seq("pid"))
      .withColumn(out, col("off") + sum(col(weightCol)).over(w))
      .drop("pid", "off")
  }

  /** Grouped [[prefixSum]]: inclusive running sum of `weightCol` within
    * each `parts` group (empty = whole input, ≤1 group column supported —
    * [[strictlyLess]]'s contract) in ascending `orderCols` order, plus the
    * group total `n_s` — the distributed replacement for
    * `sum(w) OVER (PARTITION BY g ORDER BY v)` + `sum(w) OVER (PARTITION
    * BY g)` when the group count is small but a group's row count is
    * data-dependent (e.g. a value histogram whose cardinality grows with
    * the corpus). Range-partitions on (group, order) so every window task
    * holds one contiguous slice; per-(pid, group) weight offsets and group
    * totals are folded on the ≤P×|groups| totals table and broadcast-
    * joined back. Output: input columns + `out` + `n_s`.
    */
  private[operators] def groupedPrefixSum(
      df: DataFrame,
      parts: Seq[String],
      orderCols: Seq[String],
      weightCol: String,
      out: String,
      cacheInput: Boolean = true
  ): DataFrame = {
    require(parts.length <= 1, "groupedPrefixSum supports at most one group column")
    val rangeCols = (parts ++ orderCols).map(col)
    // optional input persist + eager checkpoint around the range shuffle —
    // see strictlyLess (sampling re-runs the upstream; consumers need one
    // frozen pid assignment)
    val src = if (cacheInput) graft.core.CacheScope.persist(df) else df
    val keyed = graft.core.CacheScope.checkpoint(
      src
        .repartitionByRange(rankPartitions(df), rangeCols: _*)
        .withColumn("pid", spark_partition_id()))
    val groupCols  = col("pid") +: parts.map(col)
    val partTotals = keyed.groupBy(groupCols: _*).agg(sum(col(weightCol)).as("pw"))
    val sKey = parts.headOption.map(p => col(p).as("g")).getOrElse(lit(0).as("g"))
    val gRef = parts.headOption.map(col).getOrElse(lit(0))
    val offsets = partTotals
      .crossJoin(broadcast(
        partTotals.agg(collect_list(struct(col("pid").as("p"), sKey, col("pw").as("w"))).as("pws"))))
      .withColumn("g0", gRef)
      .select(
        (col("pid") +: parts.map(col)) ++ Seq(
          expr("aggregate(filter(pws, x -> x.p < pid AND x.g = g0), 0L, (a, x) -> a + x.w)")
            .as("off"),
          expr("aggregate(filter(pws, x -> x.g = g0), 0L, (a, x) -> a + x.w)").as("n_s")): _*)
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .join(broadcast(offsets), "pid" +: parts, "inner")
      .withColumn(out, col("off") + sum(col(weightCol)).over(w))
      .drop("pid", "off")
  }

  // --- q88: curriculum / epoch ordering --------------------------------------

  /** Deterministic curriculum order: every document given a unique global
    * training position that (a) goes quality-first WITHIN each source
    * (stop-ratio desc — the natural-language-ness score — with doc_id
    * tiebreak) and (b) round-robins ACROSS sources, so an epoch reading
    * positions in order sees sources interleaved instead of concatenated —
    * the standard mitigation for source-ordering drift in streaming-style
    * training loops. `pos = within_source_rank · |sources| + source_index`
    * is collision-free by construction and a pure function of content, so
    * re-sharding the corpus cannot reorder an epoch.
    *
    * Scale shape: the within-source rank is [[strictlyLess]] on the
    * (−score, doc_id) tuple — the sort-free row_number, spread over all
    * partitions even for one giant source; the source index is a
    * when-chain literal from the collected sorted source list (sources
    * are a bounded named set — the model-collection rule).
    */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        (TextOps.stopCountExpr / size(TextOps.toks)).as("score"))
      .withColumn("nscore", -col("score"))
    val srcNames = scored.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    val srcIdx = srcNames.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (acc, (s, i)) => acc.when(col("source") === s, i) }
      .otherwise(-1)
    strictlyLess(scored, Seq("source"), Seq("nscore", "doc_id"), "o_s")
      .select(
        col("doc_id"),
        col("source"),
        col("score"),
        (col("o_s") * lit(srcNames.length.toLong) + srcIdx.cast("long")).as("pos"))
      .orderBy(col("pos"))
  }

  /** Oracle: textbook windows — `row_number()-1` per source on the same
    * (score DESC, doc_id) order, `dense_rank()-1` over source names — and
    * the same collision-free position formula.
    */
  lazy val curriculumOrderSql: String = {
    import graft.operators.TextOps.{duckStopCount, DuckToks}
    s"""WITH q88s AS MATERIALIZED (
       |  SELECT doc_id, source, ns / nt AS score
       |  FROM (SELECT doc_id, source, $duckStopCount AS ns, len($DuckToks) AS nt
       |        FROM documents)),
       |q88n AS (SELECT count(DISTINCT source)::BIGINT AS nsrc FROM q88s)
       |SELECT doc_id, source, score,
       |  ((row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) - 1)
       |    * nsrc + (dense_rank() OVER (ORDER BY source) - 1))::BIGINT AS pos
       |FROM q88s CROSS JOIN q88n
       |ORDER BY pos""".stripMargin
  }

  // --- q86: language-ID confusion matrix ------------------------------------

  /** Classifier evaluation for the q23 language identifier: the confusion
    * matrix of (gold lang label × predicted lang_guess) with per-gold-class
    * share — the report that says WHERE the n-gram heuristic fails (which
    * languages bleed into which), not just how often. Completes the
    * evaluation layer: q74 calibrates filters, q84 audits dedup recall,
    * q85 audits ANN recall, this audits the classifier the routing
    * decisions depend on.
    *
    * Scale shape: prediction is q23's map-side expression; the matrix is
    * one (gold, guess) aggregate — ≤ |langs|² rows out of one corpus scan;
    * the share is one exact-integer division against the per-gold rollup
    * of the matrix itself (no second corpus pass).
    */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val preds = TextOps.langId(spark, dir).select(col("doc_id"), col("lang_guess"))
    val mat = docs(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(preds, "doc_id")
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
      .persist() // ≤ |langs|² rows; read again by its own per-gold rollup
    val tot = mat.groupBy(col("lang")).agg(sum(col("n")).as("n_lang"))
    mat
      .join(broadcast(tot), "lang")
      .select(
        col("lang"),
        col("lang_guess"),
        col("n"),
        (col("n").cast("double") / col("n_lang").cast("double")).as("share"),
        (col("lang") === col("lang_guess")).as("correct"))
      .orderBy(col("lang"), col("lang_guess"))
  }

  /** Oracle: q23's engine-exact statement embedded, same rollup, one
    * BIGINT-pinned division.
    */
  lazy val langidConfusionSql: String =
    s"""WITH q86p AS MATERIALIZED (
       |  SELECT doc_id, lang_guess FROM (${TextOps.langIdSql})),
       |q86m AS MATERIALIZED (
       |  SELECT d.lang, p.lang_guess, count(*)::BIGINT AS n
       |  FROM documents d JOIN q86p p ON p.doc_id = d.doc_id
       |  GROUP BY d.lang, p.lang_guess),
       |q86t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM q86m GROUP BY lang)
       |SELECT m.lang, m.lang_guess, m.n,
       |  m.n::DOUBLE / t.n_lang::DOUBLE AS share,
       |  (m.lang = m.lang_guess) AS correct
       |FROM q86m m JOIN q86t t ON t.lang = m.lang
       |ORDER BY m.lang, m.lang_guess""".stripMargin

  // --- E18 support: snapshot score-CDF model --------------------------------

  val CdfBins = 64

  /** Bounded calibration model for the E18 streaming quantile gate: the
    * corpus snapshot's stop-ratio score distribution as a fixed-width
    * histogram — (bin → count) plus the extent and total. ≤ [[CdfBins]]+1
    * rows collected regardless of corpus size (the E11/E12/E14
    * model-collection shape); the corpus pass is one map-side binning +
    * one ≤[[CdfBins]]-row aggregate.
    */
  def scoreCdfModel(spark: SparkSession, dir: String): (Seq[(Int, Long)], Double, Double, Long) = {
    val scored = docs(spark, dir)
      .select((TextOps.stopCountExpr / size(TextOps.toks)).as("score"))
      .persist()
    val Array(ext) = scored.agg(min(col("score")).as("mn"), max(col("score")).as("mx")).collect()
    val (mn, mx)   = (ext.getDouble(0), ext.getDouble(1))
    val w          = (mx - mn) / CdfBins
    val bin =
      if (w == 0.0) lit(0)
      else greatest(lit(0), least(lit(CdfBins - 1), floor((col("score") - mn) / w).cast("int")))
    val hist = scored
      .groupBy(bin.as("b"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .toSeq
    (hist, mn, mx, hist.map(_._2).sum)
  }

  /** The E18 gate's percentile estimate as a pure function — the SAME
    * binning ops (subtract, divide, floor, clamp) and the same
    * one-division step CDF the streaming expression evaluates, so stream
    * and driver cannot diverge: pct(x) = (snapshot values in strictly
    * lower bins) / n, i.e. q79's percent-rank at bin resolution.
    */
  def cdfPct(hist: Seq[(Int, Long)], mn: Double, mx: Double, n: Long, x: Double): Double = {
    val w = (mx - mn) / CdfBins
    val b =
      if (w == 0.0) 0
      else math.max(0, math.min(CdfBins - 1, math.floor((x - mn) / w).toInt))
    val below = hist.filter(_._1 < b).map(_._2).sum
    below.toDouble / n.toDouble
  }

  // --- q82: Heaps-law vocabulary growth ------------------------------------

  val HeapsCheckpoints = 20

  /** Vocabulary growth along the corpus (Heaps' law `V ≈ K·nᵝ`): at each of
    * [[HeapsCheckpoints]] prefix checkpoints of the doc_id order, the
    * running doc count, token count, and DISTINCT-BIGRAM count, plus the
    * fitted log-log slope β — the statistic that says whether a corpus is
    * still yielding new vocabulary (β ≈ 0.5 for natural text) or has gone
    * templated/repetitive (β → 0), and a direct health check on tokenizer
    * budgets as the corpus scales. The vocabulary unit is word BIGRAMS:
    * closed-vocabulary corpora (like the synthetic test tables) saturate
    * their unigram list almost immediately, which degenerates the fit,
    * while combination growth keeps the statistic informative — and at
    * real-corpus scale the machinery is identical either way.
    *
    * "Running distinct count" is the textbook cumulative-window killer;
    * here it needs no distinct-over-prefix at all: each term's FIRST
    * position is one `groupBy(term).min(rank)` aggregate (map-side
    * combine), ranks come sort-free from [[strictlyLess]] (q79's
    * range-partition machinery — doc_id is unique, so strictly-less IS the
    * rank), and vocab(c) is a cumulative sum of the ≤C-bucket first-rank
    * histogram, folded from one broadcast array. Checkpoint thresholds are
    * `⌊c·N/20⌋` in pure integer arithmetic; a rank's bucket is the count
    * of thresholds ≤ it — a 20-term fold, exact on both engines.
    *
    * Float determinism: β's regression inputs are ONE rounded ln of exact
    * integers per checkpoint (q73's rule), summed in checkpoint order
    * (q77's rule), slope one fixed-shape expression rounded to 6.
    */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val c = HeapsCheckpoints
    // r15: persist ONLY the narrow (doc_id, n_tok) projection. The r14
    // spelling persisted the full per-doc bigram `terms` arrays too — but
    // the terms are consumed exactly ONCE (the first-rank explode below),
    // so materializing them bought nothing and the driver's r14 bench
    // measured q82 +1.8 s for it (corpus-bigram arrays through the block
    // store). The narrow table feeds the rank machinery and the doc count.
    val perDocN = graft.core.CacheScope.persist(
      docs(spark, dir)
        .select(col("doc_id"), size(TextOps.toks).cast("long").as("n_tok")))
    // persisted: read by the doc histogram AND the bigram first-rank join —
    // without the cache the whole range-rank subtree replays per consumer
    val ranked = graft.core.CacheScope.persist(
      strictlyLess(perDocN, Nil, "doc_id", "rk", cacheInput = false))
    // bucket of rank r0 = 1 + how many thresholds ⌊k·nn/C⌋ are ≤ it (reads
    // columns `r0` and `nn`, exact integer arithmetic)
    val bucketExpr =
      expr(s"1 + aggregate(sequence(1, $c), 0, (a, k) -> a + if((k * nn) div $c <= r0, 1, 0))")
    val docStats = ranked
      .withColumn("nn", col("n_s"))
      .withColumn("r0", col("rk"))
      .withColumn("b", bucketExpr)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("dc"), sum(col("n_tok")).as("tc"))
    val nRow = perDocN.agg(count(lit(1)).as("nn"))
    // r15: the bigram table never meets a join at all. `rk` is STRICTLY
    // MONOTONE in doc_id (it counts doc_ids strictly less, and doc_id is
    // unique), so each term's first RANK is the rank of its first DOC:
    // min(rk) ≡ rk(min(doc_id)). The explode aggregates map-side —
    // groupBy(term).min(doc_id), then a second collapse to (first_doc →
    // term count) at ≤|docs| rows — and only NARROW doc-grain tables meet
    // the rank join, so no planner estimate can flip a broadcast onto a
    // bigram-array side. This also runs the interpreted bucket fold per
    // DOC instead of per TERM.
    //
    // The bigram arrays explode FRESH off the scan (no cache): safe only
    // because every graft session excludes InferFiltersFromGenerate
    // ([[graft.core.GraftSession.OptimizerExclusions]]) — with the rule
    // on, the inferred pre-Generate filter inlines this lambda at the
    // scan and `toks[i]` indexing re-runs split(text) per element
    // (measured 12.6 s for this explode alone at sf0.1, vs 0.7 s
    // excluded).
    val termStats = docs(spark, dir)
      .select(col("doc_id"), TextOps.toks.as("toks"))
      .select(
        col("doc_id"),
        expr("""if(size(toks) < 2, array(),
                array_distinct(transform(sequence(0, size(toks) - 2),
                  i -> concat_ws(' ', toks[i], toks[i+1]))))""").as("terms"))
      .select(explode(col("terms")).as("term"), col("doc_id"))
      .groupBy(col("term"))
      .agg(min(col("doc_id")).as("d0"))
      .groupBy(col("d0"))
      .agg(count(lit(1)).as("vc0"))
      .join(ranked.select(col("doc_id").as("d0"), col("rk").as("r0")), "d0")
      .crossJoin(broadcast(nRow))
      .withColumn("b", bucketExpr)
      .groupBy(col("b"))
      .agg(sum(col("vc0")).as("vc"))
    val cps = spark.range(1, c + 1).toDF("cp")
      .crossJoin(broadcast(docStats.agg(collect_list(struct(col("b"), col("dc"), col("tc"))).as("ds"))))
      .crossJoin(broadcast(termStats.agg(collect_list(struct(col("b"), col("vc"))).as("vs"))))
      .select(
        col("cp").cast("int").as("checkpoint"),
        expr("aggregate(filter(ds, x -> x.b <= cp), 0L, (a, x) -> a + x.dc)").as("n_docs"),
        expr("aggregate(filter(ds, x -> x.b <= cp), 0L, (a, x) -> a + x.tc)").as("n_tokens"),
        expr("aggregate(filter(vs, x -> x.b <= cp), 0L, (a, x) -> a + x.vc)").as("vocab"))
      .persist() // ≤C rows; read by the fit and again by the output join
    val fit = cps
      .filter(col("n_tokens") > 0 && col("vocab") > 0)
      .select(
        col("checkpoint"),
        round(log(col("n_tokens").cast("double")), 6).as("x"),
        round(log(col("vocab").cast("double")), 6).as("y"))
      .agg(
        count(lit(1)).cast("double").as("nf"),
        expr("aggregate(array_sort(collect_list(struct(checkpoint, x))), 0D, (a, s) -> a + s.x)").as("sx"),
        expr("aggregate(array_sort(collect_list(struct(checkpoint, y))), 0D, (a, s) -> a + s.y)").as("sy"),
        expr("aggregate(array_sort(collect_list(struct(checkpoint, x, y))), 0D, (a, s) -> a + s.x * s.y)").as("sxy"),
        expr("aggregate(array_sort(collect_list(struct(checkpoint, x))), 0D, (a, s) -> a + s.x * s.x)").as("sxx"))
    cps
      .crossJoin(broadcast(fit))
      .select(
        col("checkpoint"), col("n_docs"), col("n_tokens"), col("vocab"),
        // `+ 0.0` pins IEEE −0.0 to +0.0 — a flat fit's numerator can
        // cancel to a zero whose SIGN differs across engines
        (round(
          when(col("nf") >= 2 && (col("nf") * col("sxx") - col("sx") * col("sx")) =!= 0.0,
            (col("nf") * col("sxy") - col("sx") * col("sy")) /
              (col("nf") * col("sxx") - col("sx") * col("sx"))),
          6) + 0.0).as("heaps_beta"))
      .orderBy(col("checkpoint"))
  }

  /** Oracle: `row_number()` over doc_id as the rank (DuckDB can afford the
    * single sort at test scale), the same 20-term threshold-count bucket
    * fold, cumulative sums as ≤C-row theta-join rollups, q77's ordered-list
    * regression folds.
    */
  lazy val heapsLawSql: String = {
    val c = HeapsCheckpoints
    s"""WITH q82d AS MATERIALIZED (
       |  SELECT doc_id, len(toks)::BIGINT AS n_tok,
       |    CASE WHEN len(toks) < 2 THEN []
       |         ELSE list_distinct(list_transform(generate_series(1, len(toks) - 1),
       |                i -> toks[i] || ' ' || toks[i+1])) END AS terms,
       |    row_number() OVER (ORDER BY doc_id) - 1 AS rk,
       |    count(*) OVER () AS nn
       |  FROM (SELECT doc_id, ${TextOps.DuckToks} AS toks FROM documents)),
       |q82db AS (SELECT *, 1 + len(list_filter(range(1, ${c + 1}), k -> (k * nn) // $c <= rk)) AS b
       |          FROM q82d),
       |q82doc AS (SELECT b, count(*) AS dc, sum(n_tok) AS tc FROM q82db GROUP BY b),
       |q82tf AS (SELECT term, min(rk) AS r0, min(nn) AS nn
       |          FROM (SELECT unnest(terms) AS term, rk, nn FROM q82db) GROUP BY term),
       |q82v AS (SELECT b, count(*) AS vc
       |         FROM (SELECT 1 + len(list_filter(range(1, ${c + 1}), k -> (k * nn) // $c <= r0)) AS b
       |               FROM q82tf) GROUP BY b),
       |q82i AS (SELECT unnest(range(1, ${c + 1})) AS cp),
       |q82c1 AS (SELECT cp, CAST(coalesce(sum(dc), 0) AS BIGINT) AS n_docs,
       |            CAST(coalesce(sum(tc), 0) AS BIGINT) AS n_tokens
       |          FROM q82i LEFT JOIN q82doc ON b <= cp GROUP BY cp),
       |q82c2 AS (SELECT cp, CAST(coalesce(sum(vc), 0) AS BIGINT) AS vocab
       |          FROM q82i LEFT JOIN q82v ON b <= cp GROUP BY cp),
       |q82cp AS (SELECT cp, n_docs, n_tokens, vocab FROM q82c1 JOIN q82c2 USING (cp)),
       |q82p AS (SELECT cp, round(ln(n_tokens::DOUBLE), 6) AS x, round(ln(vocab::DOUBLE), 6) AS y
       |         FROM q82cp WHERE n_tokens > 0 AND vocab > 0),
       |q82a AS (SELECT count(*)::DOUBLE AS nf,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY cp)), (a, b) -> a + b) AS sx,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(y ORDER BY cp)), (a, b) -> a + b) AS sy,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(x * y ORDER BY cp)), (a, b) -> a + b) AS sxy,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(x * x ORDER BY cp)), (a, b) -> a + b) AS sxx
       |  FROM q82p)
       |SELECT cp::INTEGER AS checkpoint, n_docs, n_tokens, vocab,
       |  round(CASE WHEN nf >= 2 AND (nf * sxx - sx * sx) != 0
       |        THEN (nf * sxy - sx * sy) / (nf * sxx - sx * sx) END, 6) + 0.0 AS heaps_beta
       |FROM q82cp CROSS JOIN q82a ORDER BY checkpoint""".stripMargin
  }

  /** Oracle: the textbook window spelling — `rank()-1` over the same keys,
    * same guarded division. DuckDB can afford the single-sort plan at test
    * scale; agreement pins that the distributed plan IS percent_rank.
    */
  lazy val quantileNormalizeSql: String = {
    import graft.operators.TextOps.{duckStopCount, DuckToks}
    s"""WITH q79s AS MATERIALIZED (
       |  SELECT doc_id, source, ns / nt AS score
       |  FROM (SELECT doc_id, source, $duckStopCount AS ns, len($DuckToks) AS nt
       |        FROM documents))
       |SELECT doc_id, source, score,
       |  CASE WHEN count(*) OVER () = 1 THEN 0.0
       |       ELSE (rank() OVER (ORDER BY score) - 1)::DOUBLE
       |            / ((count(*) OVER ()) - 1)::DOUBLE END AS pct_corpus,
       |  CASE WHEN count(*) OVER (PARTITION BY source) = 1 THEN 0.0
       |       ELSE (rank() OVER (PARTITION BY source ORDER BY score) - 1)::DOUBLE
       |            / ((count(*) OVER (PARTITION BY source)) - 1)::DOUBLE END AS pct_source
       |FROM q79s ORDER BY doc_id""".stripMargin
  }

  // --- q108: chi-square independence audit -----------------------------------

  /** Chi-square independence audit of event type × hour-of-day — the
    * statistical tripwire that answers "does behavior depend on time of
    * day, and WHICH cells drive it?" (seasonality checks, bot-traffic
    * hunts — a scraper hammering one event type at 4am lights up exactly
    * one cell). Emits the full contingency table over the (type × hour)
    * UNIVERSE — including zero cells, whose contribution is their full
    * expectation; dropping them understates the statistic.
    *
    * Scale shape: ONE corpus scan collapses map-side to the ≤|types|×24
    * count matrix (persisted — marginals derive from it, nothing
    * re-scans); the universe is the |types|×|hours| marginal cross join —
    * bounded by construction — and expected/contrib are per-cell codegen'd
    * arithmetic. Determinism: counts are exact integers; `expected` and
    * `contrib` are fixed-order double expressions ((r·c)/N, d·d/e — no
    * `pow`, whose libm vs JVM rounding could differ), so bits match.
    */
  def chisqIndependence(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables
      .events(spark, dir)
      .select(col("event_type"), hour(col("ts")).as("hod"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowTot = m.groupBy(col("event_type")).agg(sum(col("n")).as("n_type"))
    val colTot = m.groupBy(col("hod")).agg(sum(col("n")).as("n_hod"))
    val tot    = m.agg(sum(col("n")).as("n_all"))
    val diff   = col("n").cast("double") - col("expected")
    rowTot
      .crossJoin(broadcast(colTot))
      .join(m, Seq("event_type", "hod"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .withColumn(
        "expected",
        col("n_type").cast("double") * col("n_hod").cast("double") / col("n_all").cast("double"))
      .select(
        col("event_type"),
        col("hod"),
        col("n"),
        col("n_type"),
        col("n_hod"),
        col("expected"),
        (diff * diff / col("expected")).as("contrib"))
      .orderBy(col("event_type"), col("hod"))
  }

  /** q108 oracle: same universe build (marginal cross join ← left join
    * counts), same fixed-order arithmetic — multiplication, never `pow`.
    */
  val chisqIndependenceSql: String =
    """WITH q108m AS MATERIALIZED (
      |  SELECT event_type, hour(ts)::INTEGER AS hod, count(*)::BIGINT AS n
      |  FROM events GROUP BY 1, 2),
      |q108r AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type FROM q108m GROUP BY 1),
      |q108c AS (SELECT hod, CAST(sum(n) AS BIGINT) AS n_hod FROM q108m GROUP BY 1),
      |q108t AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM q108m)
      |SELECT r.event_type, c.hod, coalesce(m.n, 0)::BIGINT AS n, r.n_type, c.n_hod,
      |  r.n_type::DOUBLE * c.n_hod::DOUBLE / t.n_all::DOUBLE AS expected,
      |  (coalesce(m.n, 0)::DOUBLE - r.n_type::DOUBLE * c.n_hod::DOUBLE / t.n_all::DOUBLE)
      |    * (coalesce(m.n, 0)::DOUBLE - r.n_type::DOUBLE * c.n_hod::DOUBLE / t.n_all::DOUBLE)
      |    / (r.n_type::DOUBLE * c.n_hod::DOUBLE / t.n_all::DOUBLE) AS contrib
      |FROM q108r r CROSS JOIN q108c c CROSS JOIN q108t t
      |LEFT JOIN q108m m ON m.event_type = r.event_type AND m.hod = c.hod
      |ORDER BY r.event_type, c.hod""".stripMargin

  // --- q109: Pareto frontier (multi-objective selection) ---------------------

  /** Pareto frontier over (length, lexical diversity): the documents no
    * other document beats on BOTH token count and distinct-token count —
    * multi-objective corpus selection's non-dominated set (pick exemplars
    * without collapsing two incomparable quality axes into one weighted
    * score). A doc is dominated iff some other doc is ≥ on both axes and
    * strictly > on at least one.
    *
    * Scale shape: domination against ALL docs needs only the per-token-
    * count max-vocab table (≤ |token-count domain| rows out of one
    * map-side aggregate): dominated ⇔ max vocab among strictly-longer
    * docs ≥ own vocab, OR max vocab at equal length > own vocab. The
    * suffix max is an ordered fold over the collected domain table (the
    * q61 idiom — no single-partition Window.orderBy), and the corpus-side
    * cost is one broadcast hash-join probe per row. Integers only — exact.
    */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val m = docs(spark, dir)
      .select(
        col("doc_id"),
        size(TextOps.toks).cast("long").as("tokens"),
        size(array_distinct(TextOps.toks)).cast("long").as("vocab"))
    val byTok = m.groupBy(col("tokens")).agg(max(col("vocab")).as("maxv"))
    val suffix = byTok
      .crossJoin(broadcast(
        byTok.agg(collect_list(struct(col("tokens").as("t"), col("maxv").as("v"))).as("tv"))))
      .select(
        col("tokens"),
        col("maxv"),
        expr("aggregate(filter(tv, x -> x.t > tokens), -1L, (a, x) -> CASE WHEN x.v > a THEN x.v ELSE a END)")
          .as("maxv_gt"))
    m.join(broadcast(suffix), "tokens")
      .filter(!(col("maxv_gt") >= col("vocab") || col("maxv") > col("vocab")))
      .select(col("doc_id"), col("tokens"), col("vocab"))
      .orderBy(col("tokens").desc, col("vocab").desc, col("doc_id"))
  }

  /** q109 oracle: the textbook NOT EXISTS domination anti-join — quadratic,
    * affordable at test scale; agreement PROVES the max-vocab suffix plan
    * computes the same frontier.
    */
  val paretoFrontierSql: String =
    s"""WITH q109m AS MATERIALIZED (
       |  SELECT doc_id, len(toks)::BIGINT AS tokens, len(list_distinct(toks))::BIGINT AS vocab
       |  FROM (SELECT doc_id, ${TextOps.DuckToks} AS toks FROM documents))
       |SELECT doc_id, tokens, vocab FROM q109m d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM q109m o
       |  WHERE o.tokens >= d.tokens AND o.vocab >= d.vocab
       |    AND (o.tokens > d.tokens OR o.vocab > d.vocab))
       |ORDER BY tokens DESC, vocab DESC, doc_id""".stripMargin

  // --- q124: Poisson-bootstrap confidence intervals --------------------------

  val BootReps = 32

  /** Cumulative Poisson(1) CDF × 1e6, floored — the integer cut-offs that
    * turn a uniform hash bucket into a bootstrap resample weight
    * (P(w=0)=e⁻¹, P(w=1)=e⁻¹, …). One shared constant list generates BOTH
    * engines' CASE chains, so the weights are identical by construction.
    */
  val PoissonCuts: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)

  /** Per-source bootstrap confidence interval on mean document length —
    * the error bar that belongs on every q76-style dataset-card statistic:
    * "src7 averages 412 chars" means nothing without "±how much". Classic
    * resampling needs the corpus R times; the Poisson bootstrap
    * (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
    * Google 2012) observes that resampling N-of-N ≈ giving each row an
    * independent Poisson(1) replicate weight — ONE scan computes all
    * [[BootReps]] replicates, and the weight is a pure hash of
    * (doc_id, rep): deterministic, shuffle-free, embarrassingly parallel.
    * The interval is the (2nd, 31st) order statistic of the 32 replicate
    * means — a ~94% percentile-bootstrap CI with NO distributional
    * assumption and NO float quantile interpolation to disagree on.
    *
    * Scale shape: the ×[[BootReps]] expansion is map-side (broadcast
    * nested-loop against a 32-row range — no shuffle); the only shuffle
    * is the (source, rep) aggregate, ≤ |sources|·32 output rows;
    * everything after is windowing over that bounded table. Determinism:
    * weights are integer CASEs on a shared xxhash64 bucket, replicate
    * means are one integer-sum division, order statistics replace
    * quantile math.
    */
  /** Spark-side Poisson(1) weight from a [0, 1e6) hash bucket — the CASE
    * chain over [[PoissonCuts]], shared by q124 and q126.
    */
  private[operators] def poissonWeight(
      m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    PoissonCuts.zipWithIndex.foldRight(
      lit(PoissonCuts.length.toLong): org.apache.spark.sql.Column) { (ck, acc) =>
      when(m < lit(ck._1), lit(ck._2.toLong)).otherwise(acc)
    }

  /** DuckDB-side CASE over the same cuts (same operator, same order). */
  private[operators] def poissonCaseSql(mExpr: String): String =
    "CASE " +
      PoissonCuts.zipWithIndex.map { case (c, k) => s"WHEN $mExpr < $c THEN $k" }.mkString(" ") +
      s" ELSE ${PoissonCuts.length} END"

  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir).select(col("doc_id"), col("source"), col("n_chars"))
    val reps = spark.range(BootReps).select(col("id").as("rep"))
    val repMeans = base
      .crossJoin(broadcast(reps))
      .withColumn("m", pmod(xxhash64(col("doc_id") * lit(64L) + col("rep")), lit(1000000L)))
      .withColumn("w", poissonWeight(col("m")))
      .groupBy(col("source"), col("rep"))
      .agg(sum(col("w") * col("n_chars")).as("sw"), sum(col("w")).as("n_w"))
      .select(col("source"), col("rep"),
        (col("sw").cast("double") / col("n_w").cast("double")).as("mean_r"))
    val byMean = Window.partitionBy(col("source")).orderBy(col("mean_r"), col("rep"))
    val ci = repMeans
      .withColumn("rn", row_number().over(byMean))
      .groupBy(col("source"))
      .agg(
        max(when(col("rn") === 2, col("mean_r"))).as("lo"),
        max(when(col("rn") === BootReps - 1, col("mean_r"))).as("hi"))
    base
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sc"))
      .join(ci, "source")
      .select(
        col("source"),
        col("n_docs"),
        round(col("sc").cast("double") / col("n_docs").cast("double"), 6).as("mean_chars"),
        round(col("lo"), 6).as("ci_lo"),
        round(col("hi"), 6).as("ci_hi"))
      .orderBy(col("source"))
  }

  /** q124 oracle: the [[graft.functions.DuckHash]] xxhash64 emulation on
    * `doc_id·64 + rep`, the SAME [[PoissonCuts]]-generated CASE, and the
    * same order-statistic pivot — integer arithmetic until the final
    * divisions.
    */
  lazy val bootstrapCiSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q124in" ->
        s"""(SELECT source, n_chars, r.rep, (doc_id * 64 + r.rep)::HUGEINT AS l
           | FROM documents, (SELECT unnest(range(0, $BootReps))::BIGINT AS rep) r)""".stripMargin
    )
    val ch = new SqlChain("q124h", "q124in", Seq("source", "n_chars", "rep", "l"))
    hashLongLevels(ch, toUnsigned("l"), "42", "h")
    ctes ++= ch.ctes
    val wCase = poissonCaseSql("m")
    ctes += ("q124m" ->
      s"""(SELECT source, n_chars, rep,
         |    (((${toSigned("h")} % 1000000) + 1000000) % 1000000)::BIGINT AS m FROM ${ch.last})""".stripMargin)
    ctes += ("q124w" -> s"(SELECT source, n_chars, rep, ($wCase)::BIGINT AS w FROM q124m)")
    ctes += ("q124r" ->
      """(SELECT source, rep, sum(w * n_chars)::DOUBLE / sum(w)::DOUBLE AS mean_r
        |  FROM q124w GROUP BY source, rep)""".stripMargin)
    ctes += ("q124k" ->
      """(SELECT source, rep, mean_r,
        |    row_number() OVER (PARTITION BY source ORDER BY mean_r, rep) AS rn FROM q124r)""".stripMargin)
    ctes += ("q124c" ->
      s"""(SELECT source,
         |    max(CASE WHEN rn = 2 THEN mean_r END) AS lo,
         |    max(CASE WHEN rn = ${BootReps - 1} THEN mean_r END) AS hi
         |  FROM q124k GROUP BY source)""".stripMargin)
    ctes += ("q124o" ->
      "(SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sc FROM documents GROUP BY source)")
    assemble(
      ctes.toSeq,
      """SELECT o.source, o.n_docs,
        |  round(o.sc::DOUBLE / o.n_docs::DOUBLE, 6) AS mean_chars,
        |  round(c.lo, 6) AS ci_lo, round(c.hi, 6) AS ci_hi
        |FROM q124o o JOIN q124c c USING (source)
        |ORDER BY o.source""".stripMargin
    )
  }

  // --- q126: A/B uplift with cluster-bootstrap CI ----------------------------

  /** Hash-randomized A/B uplift report: users split 50/50 into control/
    * treatment arms by `xxhash64(user_id) mod 2` (the q40 assignment
    * discipline — stable, content-blind, reproducible), and each event
    * type reports both arms' mean event value, the uplift (treatment −
    * control), and a cluster-bootstrap CI on that uplift. The bootstrap
    * resamples USERS, not events (q124's Poisson-weight trick at the user
    * grain): event values within a user are correlated, and an event-level
    * resample would understate the variance — the classic A/B analysis
    * mistake this operator is shaped to avoid.
    *
    * Scale shape: ONE keyed shuffle collapses events to the (user, type)
    * grain; arm and replicate weights are pure in-row hash expressions of
    * user_id (+rep) — no randomness state, no join; the ×[[BootReps]]
    * expansion rides the bounded user grain (not raw events) map-side;
    * the replicate aggregate is ≤ |types|·32 rows and everything after is
    * windowing over it. Determinism: value sums ride DECIMAL, weights are
    * integer CASEs, each replicate uplift is one fixed divide/subtract
    * shape, and the CI is order statistics over (uplift, rep) — replicates
    * where either arm drew total weight 0 are excluded, with rank bounds
    * `(2, cnt−1)` degrading to `(1, cnt)` below 4 survivors.
    */
  def abUplift(spark: SparkSession, dir: String): DataFrame = {
    val ug = graft.core.CacheScope.persist(
      Tables
        .events(spark, dir)
        .select(col("user_id"), col("event_type"), col("value").cast("decimal(18,2)").as("v"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_u"), sum(col("v")).as("sv_u")))
    val arm  = pmod(xxhash64(col("user_id")), lit(2L))
    val reps = spark.range(BootReps).select(col("id").as("rep"))
    val point = ug
      .withColumn("arm", arm)
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("arm") === 0, col("n_u"))).as("n_c"),
        sum(when(col("arm") === 1, col("n_u"))).as("n_t"),
        sum(when(col("arm") === 0, col("sv_u"))).as("sv_c"),
        sum(when(col("arm") === 1, col("sv_u"))).as("sv_t"))
      .select(
        col("event_type"), col("n_c"), col("n_t"),
        (col("sv_c").cast("double") / col("n_c").cast("double")).as("mean_c"),
        (col("sv_t").cast("double") / col("n_t").cast("double")).as("mean_t"))
    val repUplift = ug
      .crossJoin(broadcast(reps))
      .withColumn("arm", arm)
      .withColumn("m", pmod(xxhash64(col("user_id") * lit(64L) + col("rep")), lit(1000000L)))
      .withColumn("w", poissonWeight(col("m")))
      .groupBy(col("event_type"), col("rep"))
      .agg(
        sum(when(col("arm") === 1, col("w") * col("sv_u"))).as("svt"),
        sum(when(col("arm") === 1, col("w") * col("n_u"))).as("nt"),
        sum(when(col("arm") === 0, col("w") * col("sv_u"))).as("svc"),
        sum(when(col("arm") === 0, col("w") * col("n_u"))).as("nc"))
      .filter(col("nt") > 0 && col("nc") > 0)
      .select(
        col("event_type"), col("rep"),
        (col("svt").cast("double") / col("nt").cast("double") -
          col("svc").cast("double") / col("nc").cast("double")).as("uplift_r"))
    val byType = Window.partitionBy(col("event_type"))
    val ci = repUplift
      .withColumn("rn", row_number().over(byType.orderBy(col("uplift_r"), col("rep"))))
      .withColumn("cnt", count(lit(1)).over(byType))
      .groupBy(col("event_type"))
      .agg(
        max(when(col("rn") === when(col("cnt") >= 4, 2).otherwise(1), col("uplift_r"))).as("lo"),
        max(when(col("rn") === when(col("cnt") >= 4, col("cnt") - 1).otherwise(col("cnt")),
          col("uplift_r"))).as("hi"),
        max(col("cnt")).cast("long").as("n_reps"))
    point
      .join(ci, "event_type")
      .select(
        col("event_type"), col("n_c"), col("n_t"),
        round(col("mean_c"), 6).as("mean_c"),
        round(col("mean_t"), 6).as("mean_t"),
        round(col("mean_t") - col("mean_c"), 6).as("uplift"),
        round(col("lo"), 6).as("ci_lo"),
        round(col("hi"), 6).as("ci_hi"),
        col("n_reps"))
      .orderBy(col("event_type"))
  }

  /** q126 oracle: both hash chains through [[graft.functions.DuckHash]]
    * (arm on user_id, weights on user_id·64+rep), the shared Poisson CASE,
    * and identical divide/subtract/order-statistic shapes.
    */
  lazy val abUpliftSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q126u" ->
        """(SELECT user_id, event_type, count(*)::BIGINT AS n_u,
          |  sum(CAST(value AS DECIMAL(18,2))) AS sv_u
          | FROM events GROUP BY user_id, event_type)""".stripMargin,
      "q126du" -> "(SELECT DISTINCT user_id, user_id::HUGEINT AS l FROM q126u)"
    )
    val chA = new SqlChain("q126ha", "q126du", Seq("user_id", "l"))
    hashLongLevels(chA, toUnsigned("l"), "42", "ha")
    ctes ++= chA.ctes
    ctes += ("q126arm" ->
      s"(SELECT user_id, (((${toSigned("ha")} % 2) + 2) % 2)::BIGINT AS arm FROM ${chA.last})")
    ctes += ("q126g" ->
      s"""(SELECT u.user_id, r.rep, (u.user_id * 64 + r.rep)::HUGEINT AS l2
         | FROM (SELECT DISTINCT user_id FROM q126u) u,
         |   (SELECT unnest(range(0, $BootReps))::BIGINT AS rep) r)""".stripMargin)
    val chW = new SqlChain("q126hw", "q126g", Seq("user_id", "rep", "l2"))
    hashLongLevels(chW, toUnsigned("l2"), "42", "hw")
    ctes ++= chW.ctes
    ctes += ("q126w" ->
      s"""(SELECT user_id, rep, (${poissonCaseSql("m")})::BIGINT AS w FROM
         |  (SELECT user_id, rep,
         |    (((${toSigned("hw")} % 1000000) + 1000000) % 1000000)::BIGINT AS m FROM ${chW.last}))""".stripMargin)
    ctes += ("q126r" ->
      """(SELECT u.event_type, w.rep,
        |    sum(CASE WHEN a.arm = 1 THEN w.w * u.sv_u END) AS svt,
        |    sum(CASE WHEN a.arm = 1 THEN w.w * u.n_u END) AS nt,
        |    sum(CASE WHEN a.arm = 0 THEN w.w * u.sv_u END) AS svc,
        |    sum(CASE WHEN a.arm = 0 THEN w.w * u.n_u END) AS nc
        |  FROM q126u u JOIN q126arm a USING (user_id) JOIN q126w w USING (user_id)
        |  GROUP BY 1, 2)""".stripMargin)
    ctes += ("q126v" ->
      """(SELECT event_type, rep, svt::DOUBLE / nt::DOUBLE - svc::DOUBLE / nc::DOUBLE AS uplift_r
        |  FROM q126r WHERE nt > 0 AND nc > 0)""".stripMargin)
    ctes += ("q126k" ->
      """(SELECT event_type, rep, uplift_r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY uplift_r, rep) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt FROM q126v)""".stripMargin)
    ctes += ("q126ci" ->
      """(SELECT event_type,
        |    max(CASE WHEN rn = (CASE WHEN cnt >= 4 THEN 2 ELSE 1 END) THEN uplift_r END) AS lo,
        |    max(CASE WHEN rn = (CASE WHEN cnt >= 4 THEN cnt - 1 ELSE cnt END) THEN uplift_r END) AS hi,
        |    max(cnt)::BIGINT AS n_reps
        |  FROM q126k GROUP BY event_type)""".stripMargin)
    ctes += ("q126p" ->
      """(SELECT u.event_type,
        |    sum(CASE WHEN a.arm = 0 THEN u.n_u END)::BIGINT AS n_c,
        |    sum(CASE WHEN a.arm = 1 THEN u.n_u END)::BIGINT AS n_t,
        |    sum(CASE WHEN a.arm = 0 THEN u.sv_u END)::DOUBLE /
        |      sum(CASE WHEN a.arm = 0 THEN u.n_u END)::DOUBLE AS mean_c,
        |    sum(CASE WHEN a.arm = 1 THEN u.sv_u END)::DOUBLE /
        |      sum(CASE WHEN a.arm = 1 THEN u.n_u END)::DOUBLE AS mean_t
        |  FROM q126u u JOIN q126arm a USING (user_id) GROUP BY 1)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT p.event_type, p.n_c, p.n_t,
        |  round(p.mean_c, 6) AS mean_c, round(p.mean_t, 6) AS mean_t,
        |  round(p.mean_t - p.mean_c, 6) AS uplift,
        |  round(c.lo, 6) AS ci_lo, round(c.hi, 6) AS ci_hi, c.n_reps
        |FROM q126p p JOIN q126ci c USING (event_type)
        |ORDER BY p.event_type""".stripMargin
    )
  }

  // --- q127: quality-signal calibration against dup ground truth -------------

  val CalCuts: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** Calibration of a quality signal against duplication ground truth: docs
    * decile-bucketed by q22's stop-word ratio (the naturalness signal),
    * each decile reporting its verified-near-dup membership rate — the
    * "is this filter actually predictive?" check a curation team runs
    * before spending a threshold on a signal. A flat dup-rate curve means
    * the signal is noise for this corpus; a monotone one justifies q74's
    * threshold sweep on it.
    *
    * Scale shape: scores are one corpus scan; the dup set is the
    * session-shared verified-pair stage (dup-rate-bounded); decile
    * boundaries are ⌈p·N⌉ ORDER STATISTICS from the score histogram
    * (q125's rank-based rule). stop_ratio is an unrounded double, so the
    * histogram's cardinality grows with distinct (n_stop, n_tokens)
    * pairs — data-dependent — and the cumulative counts therefore ride
    * [[groupedPrefixSum]] (range-partitioned slices + broadcast prefix
    * offsets), never a single-task window; the 9 cuts broadcast as
    * one row and docs bucket map-side. Per-decile mean score quantizes
    * each score to integer micro-units FIRST, then an order-free integer
    * `sum` (the q72/q163 rule) — a decile holds n/10 docs, so an ordered
    * `collect_list` fold here would be executor-OOM state at corpus
    * scale, and long-sum headroom (2^63 / 10^6) holds to ~9·10^12 docs
    * per decile.
    */
  def qualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextOps.ngramJaccardPairs(spark, dir)
    val dups = pairs
      .select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val flagged = graft.core.CacheScope.persist(
      TextOps
        .qualityScored(spark, dir)
        .select(col("doc_id"), col("stop_ratio").as("v"))
        .join(dups.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"), col("v"), coalesce(col("is_dup"), lit(false)).as("is_dup")))
    val ranked = groupedPrefixSum(
      flagged.groupBy(col("v")).agg(count(lit(1)).as("c")),
      Nil, Seq("v"), "c", "cum", cacheInput = false)
      .withColumnRenamed("n_s", "n")
    // ONE pass computes all 9 cuts (q125's exploded-probabilities shape)
    val cuts = ranked
      .withColumn("p", explode(expr(CalCuts.map(p => s"${p}D").mkString("array(", ", ", ")"))))
      .filter(col("cum") >= ceil(col("p") * col("n").cast("double")))
      .groupBy(col("p"))
      .agg(min(col("v")).as("q"))
    val aggs = CalCuts.zipWithIndex.map { case (p, i) =>
      max(when(col("p") === lit(p), col("q"))).as(s"c${i + 1}")
    }
    val wide = cuts.groupBy().agg(aggs.head, aggs.tail: _*)
    val decile = CalCuts.indices
      .map(i => when(col("v") > col(s"c${i + 1}"), 1L).otherwise(0L))
      .foldLeft(lit(1L): org.apache.spark.sql.Column)(_ + _)
    flagged
      .crossJoin(broadcast(wide))
      .withColumn("decile", decile)
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
        sum(expr("CAST(round(v * 1000000, 0) AS BIGINT)")).as("sv"))
      .select(
        col("decile"),
        col("n_docs"),
        col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs").cast("double"), 6).as("dup_rate"),
        round(col("sv").cast("double") / (col("n_docs") * lit(1000000L)).cast("double"), 6)
          .as("mean_score"))
      .orderBy(col("decile"))
  }

  /** q127 oracle: exact all-pairs Jaccard ground truth (q27's oracle),
    * q22's stop-ratio SQL, the same ⌈p·N⌉ order-statistic cuts, and the
    * same micro-quantized order-free integer sum.
    */
  lazy val qualityCalibrationSql: String = {
    val cutsList = CalCuts.mkString("[", ", ", "]")
    val decileExpr = "(1 " +
      CalCuts.indices.map(i => s"+ (CASE WHEN s.v > w.c${i + 1} THEN 1 ELSE 0 END)").mkString(" ") +
      ")::BIGINT"
    val wideCols = CalCuts.zipWithIndex
      .map { case (p, i) => s"max(CASE WHEN p = $p THEN q END) AS c${i + 1}" }
      .mkString(",\n    ")
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q127d AS (SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}
       |    UNION ALL SELECT doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold})),
       |q127s AS MATERIALIZED (
       |  SELECT q.doc_id, q.stop_ratio AS v,
       |    (q.doc_id IN (SELECT doc_id FROM q127d)) AS is_dup
       |  FROM (${TextOps.qualityScoreSql}) q),
       |q127h AS (SELECT v, count(*)::BIGINT AS c FROM q127s GROUP BY v),
       |q127r AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM q127h),
       |q127c AS (SELECT p, min(v) AS q
       |  FROM q127r, (SELECT unnest($cutsList) AS p)
       |  WHERE cum >= ceil(p * n::DOUBLE) GROUP BY p),
       |q127w AS (SELECT
       |    $wideCols
       |  FROM q127c),
       |q127b AS (SELECT s.doc_id, s.v, s.is_dup, $decileExpr AS decile
       |  FROM q127s s, q127w w)
       |SELECT decile, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup,
       |  round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6) AS dup_rate,
       |  round(sum(CAST(round(v * 1000000, 0) AS BIGINT))::DOUBLE
       |    / (count(*) * 1000000)::DOUBLE, 6) AS mean_score
       |FROM q127b GROUP BY decile
       |ORDER BY decile""".stripMargin
  }

  // --- q128: per-source n-gram novelty ---------------------------------------

  /** Marginal n-gram contribution per source: with sources in a fixed
    * (lexicographic) acquisition order, how many of each source's distinct
    * 3-gram shingles are NEW — first contributed by that source — versus
    * already covered by earlier sources. This is the "what does adding
    * this source actually buy?" table a data-mixing team consults before
    * paying for a crawl: a source whose novelty_rate ≈ 0 duplicates the
    * mix's existing coverage regardless of its size (the acquisition-order
    * view of q51's corpus-wide gram coverage and q54's pairwise overlap).
    *
    * Scale shape: the shingle explode collapses immediately to the
    * (source, gram) grain (distinct — one keyed shuffle, map-side
    * combinable); first-owners are a gram-keyed `min(source)` aggregate of
    * that grain; both rollups are ≤|sources| rows and the cumulative sum
    * windows over ≤|sources| rows. The gram universe never joins itself.
    */
  def sourceNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sg = graft.core.CacheScope.persist(
      graft.operators.SharedStages
        .shingles(spark, dir)
        .select(col("doc_id"), explode(col("shingles")).as("gram"))
        .join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), col("gram"))
        .distinct())
    val tot = graft.core.CacheScope.persist(
      sg.groupBy(col("source")).agg(count(lit(1)).as("n_grams")))
    // r14.2: the first-owner argmin runs at the corpus-gram grain, and
    // min(STRING) has no hash-aggregable buffer — the old plan silently
    // SortAggregated, sorting every partition of the gram grain. Sources
    // are a bounded named set (the model-collection rule), so the min
    // rides a DICTIONARY int: the ≤|sources| dictionary is collected off
    // the already-aggregated totals table IN SPARK'S OWN SORT ORDER (so
    // index order ≡ the engine's string order even off-ASCII), and the
    // winning index decodes back through the same literal.
    val srcs = tot.select(col("source")).orderBy(col("source")).collect().map(_.getString(0))
    val dict = typedLit(srcs.zipWithIndex.toMap)
    val firsts = sg
      .groupBy(col("gram"))
      .agg(min(element_at(dict, col("source"))).as("si"))
      .groupBy(element_at(typedLit(srcs), col("si") + 1).as("source"))
      .agg(count(lit(1)).as("n_new"))
    tot
      .join(firsts, Seq("source"), "left")
      .select(col("source"), col("n_grams"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn(
        "novelty_rate",
        round(col("n_new").cast("double") / col("n_grams").cast("double"), 6))
      .withColumn("cum_distinct", sum(col("n_new")).over(Window.orderBy(col("source"))))
      .orderBy(col("source"))
  }

  /** q128 oracle: the shared shingle CTE, the same (source, gram) grain
    * and min-source first-owner rule, integer counts throughout.
    */
  lazy val sourceNoveltySql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |q128sg AS MATERIALIZED (
       |  SELECT DISTINCT d.source, g.gram
       |  FROM sh, documents d, unnest(sh.shingles) AS g(gram)
       |  WHERE sh.doc_id = d.doc_id),
       |q128t AS (SELECT source, count(*)::BIGINT AS n_grams FROM q128sg GROUP BY source),
       |q128f AS (
       |  SELECT source, count(*)::BIGINT AS n_new FROM (
       |    SELECT gram, min(source) AS source FROM q128sg GROUP BY gram)
       |  GROUP BY source)
       |SELECT t.source, t.n_grams, coalesce(f.n_new, 0)::BIGINT AS n_new,
       |  round(coalesce(f.n_new, 0)::DOUBLE / t.n_grams::DOUBLE, 6) AS novelty_rate,
       |  CAST(sum(coalesce(f.n_new, 0)) OVER (ORDER BY t.source) AS BIGINT) AS cum_distinct
       |FROM q128t t LEFT JOIN q128f f USING (source)
       |ORDER BY t.source""".stripMargin

  // --- q143: per-document novelty score ----------------------------------------

  /** Per-document novelty: what fraction of a document's distinct 3-gram
    * shingles appear in NO other document — the doc-level complement of
    * q128's source-level novelty, and the practical "is this document
    * new information or remix?" score: a high-uniq doc contributes
    * genuinely novel n-grams to training, a near-zero one is assembled
    * entirely from phrases the corpus already has (mosaic/boilerplate)
    * even when no single near-dup pair catches it.
    *
    * Scale shape: document frequencies are ONE gram-keyed aggregate of
    * the session-shared shingle stage (shingle lists are per-doc
    * distinct, so df counts documents); the join-back is gram-keyed on
    * the same grain; the per-doc rollup and metadata join are doc-keyed.
    * Integers until the one rounded ratio. Docs under 3 tokens have no
    * shingles and are absent, matching the shingle stage's contract.
    */
  def docNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sg = graft.core.CacheScope.persist(
      graft.operators.SharedStages
        .shingles(spark, dir)
        .select(col("doc_id"), explode(col("shingles")).as("gram")))
    val dfreq = sg.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    sg.join(dfreq, "gram")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .select(
        col("doc_id"),
        col("source"),
        col("n_shingles"),
        col("n_unique"),
        round(col("n_unique").cast("double") / col("n_shingles").cast("double"), 6)
          .as("uniq_rate"))
      .orderBy(col("doc_id"))
  }

  /** q143 oracle: the shared shingle CTE + identical df/rollup shapes. */
  lazy val docNoveltySql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |q143i AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS gram FROM sh),
       |q143f AS (SELECT gram, count(*)::BIGINT AS df FROM q143i GROUP BY gram),
       |q143d AS (
       |  SELECT i.doc_id, count(*)::BIGINT AS n_shingles,
       |    sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique
       |  FROM q143i i JOIN q143f f USING (gram)
       |  GROUP BY i.doc_id)
       |SELECT d.doc_id, doc.source, d.n_shingles, d.n_unique,
       |  round(d.n_unique::DOUBLE / d.n_shingles::DOUBLE, 6) AS uniq_rate
       |FROM q143d d JOIN documents doc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // --- q146: token-concentration Gini per source -------------------------------

  /** Per-source Gini coefficient of token mass across documents — "does
    * 1% of this source's documents hold half its tokens?" — the
    * inequality statistic that separates a balanced corpus from one
    * whose token budget is secretly a few mega-documents (which then
    * dominate training mixes weighted by tokens, q53's exact failure
    * mode). Uses the rank identity on the VALUE HISTOGRAM: documents
    * with token count v and preceding cumulative count C occupy ranks
    * C+1..C+c, so `Σ rank·v = v·(c·C + c(c+1)/2)` — the whole Gini
    * computes from (source, token-count) counts with no per-row window,
    * no sort of the corpus, and pure integer arithmetic until the final
    * division (`G = (2·Σrank·v − (n+1)·Σv) / (n·Σv)`).
    */
  def tokenGini(spark: SparkSession, dir: String): DataFrame = {
    val hist = docs(spark, dir)
      .select(col("source"), size(TextOps.toks).cast("long").as("v"))
      .groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c"))
    val byS = Window.partitionBy(col("source"))
    hist
      .withColumn("cum", sum(col("c")).over(byS.orderBy(col("v"))))
      .withColumn("cprev", col("cum") - col("c"))
      .withColumn(
        "term2", // v·(2·c·C + c·(c+1)) ≡ 2·Σ rank·v over the tie run — no halving
        col("v").cast("decimal(38,0)") *
          (lit(2).cast("decimal(38,0)") * col("c").cast("decimal(38,0)") *
            col("cprev").cast("decimal(38,0)") +
            col("c").cast("decimal(38,0)") * (col("c") + 1).cast("decimal(38,0)")))
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_docs"),
        sum(col("v").cast("decimal(38,0)") * col("c").cast("decimal(38,0)")).as("st"),
        sum(col("term2")).as("srv2"))
      .select(
        col("source"),
        col("n_docs"),
        col("st").cast("long").as("total_tokens"),
        round(
          (col("srv2").cast("double") -
            (col("n_docs") + 1).cast("double") * col("st").cast("double")) /
            (col("n_docs").cast("double") * col("st").cast("double")),
          6).as("gini"))
      .orderBy(col("source"))
  }

  /** q146 oracle: identical histogram rank identity with HUGEINT
    * arithmetic and the same final divide shape.
    */
  val tokenGiniSql: String =
    s"""WITH q146h AS MATERIALIZED (
       |  SELECT source, len(${TextOps.DuckToks})::BIGINT AS v, count(*)::BIGINT AS c
       |  FROM documents GROUP BY 1, 2),
       |q146r AS (
       |  SELECT source, v, c,
       |    sum(c) OVER (PARTITION BY source ORDER BY v) - c AS cprev
       |  FROM q146h),
       |q146t AS (
       |  SELECT source,
       |    sum(c)::BIGINT AS n_docs,
       |    sum(v::HUGEINT * c) AS st,
       |    sum(v::HUGEINT * (2 * c::HUGEINT * cprev + c::HUGEINT * (c + 1))) AS srv2
       |  FROM q146r GROUP BY source)
       |SELECT source, n_docs, st::BIGINT AS total_tokens,
       |  round((srv2::DOUBLE - (n_docs + 1)::DOUBLE * st::DOUBLE)
       |    / (n_docs::DOUBLE * st::DOUBLE), 6) AS gini
       |FROM q146t ORDER BY source""".stripMargin

  // --- q147: column profile (Deequ-style data quality summary) -----------------

  /** One-pass column profiler for the documents table — the Deequ/
    * dbt-test-style data-quality summary every ingest publishes before
    * anything downstream trusts the data: per column, row count, null
    * count, exact distinct count, and min/max (as strings, so one output
    * schema covers every column type). A column whose distinct count
    * equals the row count is a key; one whose null rate jumped is a
    * broken upstream field — this table is where both show up first.
    *
    * Scale shape: the table melts map-side to (column, value-string)
    * pairs (×|columns| expansion, no shuffle) and ONE keyed aggregate
    * computes every statistic; the distinct count is exact (per-column
    * value domains here are row-bounded; swap in q42's KMV for columns
    * whose domain explodes). String min/max compare in binary collation
    * on both engines; numeric columns cast via plain CAST, identical
    * text both sides.
    */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val melted = Tables
      .documents(spark, dir)
      .select(explode(expr(
        cols.map(c => s"struct('$c' AS c, CAST($c AS STRING) AS v)").mkString("array(", ", ", ")")))
        .as("x"))
      .select(col("x.c").as("column_name"), col("x.v").as("v"))
    melted
      .groupBy(col("column_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"))
      .orderBy(col("column_name"))
  }

  /** q147 oracle: the same melt + single aggregate (count(DISTINCT)
    * ignores NULLs on both engines; min/max are binary-collation).
    */
  lazy val columnProfileSql: String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val melt = cols
      .map(c => s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS v FROM documents")
      .mkString("\n  UNION ALL ")
    s"""WITH q147m AS MATERIALIZED (
       |  $melt)
       |SELECT column_name, count(*)::BIGINT AS n_rows,
       |  sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       |  count(DISTINCT v)::BIGINT AS n_distinct,
       |  min(v) AS min_val, max(v) AS max_val
       |FROM q147m GROUP BY column_name
       |ORDER BY column_name""".stripMargin
  }

  // --- q137: KS drift of length distributions ---------------------------------

  /** Per-source Kolmogorov–Smirnov drift on document length: the max
    * absolute gap between each source's length CDF and the corpus CDF,
    * plus the length at which it opens — the distribution-shape
    * complement to q71's vocabulary KL (KL sees WHAT a source says, KS
    * sees what SHAPE its documents are: a crawler that started truncating
    * pages moves KS long before vocabulary drifts). Evaluated at every
    * observed value, which is exactly sufficient for discrete two-sample
    * KS with right-continuous step CDFs.
    *
    * Scale shape: the corpus collapses to (source, length) counts in ONE
    * map-side-combinable aggregate; the evaluation grid is
    * |sources| × |distinct lengths| (value-domain-bounded, never rows);
    * both CDFs are cumulative-count windows over that grid; per-source
    * totals broadcast. Determinism: cumulative counts are exact longs,
    * each CDF value one division, the argmax location is `min(v)` among
    * exact-equal maxima.
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.core.CacheScope.persist(
      docs(spark, dir)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c")))
    val corp = h
      .groupBy(col("v"))
      .agg(sum(col("c")).as("cc"))
      .withColumn("cumc", sum(col("cc")).over(Window.partitionBy(lit(1)).orderBy(col("v"))))
      .select(col("v"), col("cumc"))
    val nSrc = h.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val nTot = h.agg(sum(col("c")).as("n"))
    val grid = corp
      .crossJoin(h.select(col("source")).distinct())
      .join(h, Seq("source", "v"), "left")
      .withColumn(
        "cums",
        sum(coalesce(col("c"), lit(0L)))
          .over(Window.partitionBy(col("source")).orderBy(col("v"))))
    val diffs = graft.core.CacheScope.persist(
      grid
        .join(broadcast(nSrc), "source")
        .crossJoin(broadcast(nTot))
        .select(col("source"), col("v"), col("ns"),
          abs(
            col("cums").cast("double") / col("ns").cast("double") -
              col("cumc").cast("double") / col("n").cast("double")).as("diff")))
    diffs
      .groupBy(col("source")).agg(max(col("diff")).as("ks_raw"))
      .join(diffs, "source")
      .filter(col("diff") === col("ks_raw"))
      .groupBy(col("source"))
      .agg(
        max(col("ns")).as("n_docs"),
        round(max(col("ks_raw")), 6).as("ks"),
        min(col("v")).as("ks_at"))
      .orderBy(col("source"))
  }

  /** q137 oracle: same grid, cumulative windows, and min-among-equal-
    * maxima location rule.
    */
  val ksDriftSql: String =
    """WITH q137h AS MATERIALIZED (
      |  SELECT source, n_chars AS v, count(*)::BIGINT AS c
      |  FROM documents GROUP BY 1, 2),
      |q137corp AS (
      |  SELECT v, sum(cc) OVER (ORDER BY v) AS cumc FROM (
      |    SELECT v, sum(c)::BIGINT AS cc FROM q137h GROUP BY v)),
      |q137ns AS (SELECT source, sum(c)::BIGINT AS ns FROM q137h GROUP BY source),
      |q137n AS (SELECT sum(c)::BIGINT AS n FROM q137h),
      |q137g AS (
      |  SELECT s.source, c.v, c.cumc,
      |    sum(coalesce(h.c, 0)) OVER (PARTITION BY s.source ORDER BY c.v) AS cums
      |  FROM q137corp c
      |  CROSS JOIN (SELECT DISTINCT source FROM q137h) s
      |  LEFT JOIN q137h h ON h.source = s.source AND h.v = c.v),
      |q137d AS MATERIALIZED (
      |  SELECT g.source, g.v, ns.ns,
      |    abs(g.cums::DOUBLE / ns.ns::DOUBLE - g.cumc::DOUBLE / n.n::DOUBLE) AS diff
      |  FROM q137g g JOIN q137ns ns USING (source) CROSS JOIN q137n n),
      |q137m AS (SELECT source, max(diff) AS ks_raw FROM q137d GROUP BY source)
      |SELECT d.source, max(d.ns)::BIGINT AS n_docs,
      |  round(max(m.ks_raw), 6) AS ks, min(d.v)::BIGINT AS ks_at
      |FROM q137d d JOIN q137m m ON m.source = d.source AND d.diff = m.ks_raw
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin

  // --- q134: lognormal length fit per source ---------------------------------

  /** Per-source lognormal fit of document length: method-of-moments
    * (μ, σ) of `ln n_chars` plus the ACTUAL median length — the
    * distributional fingerprint a dataset card should carry instead of a
    * bare mean (length distributions are famously lognormal-ish, and a
    * source whose σ collapses is a template farm; comparing `e^μ` to the
    * actual median is the one-glance lognormality check, left to the
    * reader to exponentiate — `exp` is deliberately NOT computed here,
    * since engine libm `exp` is not guaranteed bit-identical while
    * everything emitted is).
    *
    * Determinism: logs are rounded to 6 dp then quantized to integers
    * (the q73 round-the-log + q72 quantize disciplines composed), so
    * moments come from exact integer sums in any aggregation order; the
    * median is a ⌈N/2⌉ order statistic on integer chars. Scale shape:
    * ONE map-side pass to (source, ln-bucket/char) grains, per-source
    * moments and rank scans over bounded histograms.
    */
  def lognormalFit(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.core.CacheScope.persist(
      docs(spark, dir)
        .filter(col("n_chars") > 0)
        .select(
          col("source"),
          col("n_chars"),
          expr("CAST(round(round(ln(CAST(n_chars AS DOUBLE)), 6) * 1000000, 0) AS BIGINT)")
            .as("lq")))
    val moments = base
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("lq")).as("sl"),
        sum(col("lq").cast("decimal(38,0)") * col("lq").cast("decimal(38,0)")).as("sl2"))
      .select(
        col("source"), col("n_docs"),
        (col("sl").cast("double") / col("n_docs").cast("double")).as("mu_q"),
        (col("sl2").cast("double") / col("n_docs").cast("double")).as("m2_q"))
    val byS = Window.partitionBy(col("source"))
    val med = base
      .groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(byS.orderBy(col("n_chars"))))
      .withColumn("n", sum(col("c")).over(byS))
      .filter(col("cum") >= ceil(lit(0.5) * col("n").cast("double")))
      .groupBy(col("source"))
      .agg(min(col("n_chars")).as("median_chars"))
    moments
      .join(med, "source")
      .select(
        col("source"),
        col("n_docs"),
        round(col("mu_q") / lit(1000000.0), 6).as("mu"),
        round(sqrt(col("m2_q") - col("mu_q") * col("mu_q")) / lit(1000000.0), 6).as("sigma"),
        col("median_chars"))
      .orderBy(col("source"))
  }

  /** q134 oracle: identical round-then-quantize log buckets, HUGEINT
    * moments, and the ⌈N/2⌉ rank median.
    */
  val lognormalFitSql: String =
    """WITH q134b AS MATERIALIZED (
      |  SELECT source, n_chars,
      |    CAST(round(round(ln(n_chars::DOUBLE), 6) * 1000000, 0) AS BIGINT) AS lq
      |  FROM documents WHERE n_chars > 0),
      |q134m AS (
      |  SELECT source, count(*)::BIGINT AS n_docs,
      |    sum(lq)::DOUBLE / count(*)::DOUBLE AS mu_q,
      |    sum(lq::HUGEINT * lq)::DOUBLE / count(*)::DOUBLE AS m2_q
      |  FROM q134b GROUP BY source),
      |q134h AS (
      |  SELECT source, n_chars, count(*)::BIGINT AS c FROM q134b GROUP BY 1, 2),
      |q134r AS (
      |  SELECT source, n_chars,
      |    sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS n
      |  FROM q134h),
      |q134d AS (
      |  SELECT source, min(n_chars)::BIGINT AS median_chars
      |  FROM q134r WHERE cum >= ceil(0.5 * n::DOUBLE) GROUP BY source)
      |SELECT m.source, m.n_docs,
      |  round(m.mu_q / 1000000.0, 6) AS mu,
      |  round(sqrt(m.m2_q - m.mu_q * m.mu_q) / 1000000.0, 6) AS sigma,
      |  d.median_chars
      |FROM q134m m JOIN q134d d USING (source)
      |ORDER BY m.source""".stripMargin

  // --- q155: order-invariant content manifest --------------------------------

  /** The dataset checksum manifest a 100 TB snapshot publishes so any
    * replica, migration, or re-partition can be verified WITHOUT a global
    * sort: per table, the row count plus three ORDER-INVARIANT
    * fingerprints of the canonical row rendering — `bit_xor` of the
    * per-row xxhash64, and the min/max row hash. Two copies with equal
    * manifests hold the same rows regardless of file layout, partition
    * count, or row order — exactly what q92/q149-style re-layouts need to
    * prove they changed ARRANGEMENT, not CONTENT (the XOR fold is blind
    * to duplicated-pair insertion, which row count + min/max bracket in
    * practice; a manifest mismatch always localizes to one table).
    *
    * Scale shape: one map-side hash projection per table and ONE
    * all-combining aggregate each (count/xor/min/max all have map-side
    * partials) — no shuffle beyond the 1-row combines, no sort anywhere.
    * Determinism: the canonical rendering is integers (ids, micros,
    * cents) and raw strings joined on the \\u001f unit separator —
    * every field renders identically in both engines.
    */
  def contentManifest(spark: SparkSession, dir: String): DataFrame = {
    val sep = "\u001f"
    def leg(src: DataFrame, tbl: String, canon: org.apache.spark.sql.Column): DataFrame =
      src
        .select(xxhash64(canon).as("h"))
        .groupBy()
        .agg(
          count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_fp"),
          min(col("h")).as("min_h"),
          max(col("h")).as("max_h"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("xor_fp"), col("min_h"), col("max_h"))
    val ev = Tables.events(spark, dir)
    val evCanon = concat_ws(
      sep,
      col("event_id"),
      unix_micros(col("ts")),
      col("user_id"),
      col("event_type"),
      (col("value").cast("decimal(18,2)") * lit(100)).cast("long"),
      col("props"))
    val doc = Tables.documents(spark, dir)
    val docCanon =
      concat_ws(sep, col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
    leg(ev, "events", evCanon)
      .unionByName(leg(doc, "documents", docCanon))
      .orderBy(col("tbl"))
  }

  /** q155 oracle: the DuckHash byte-chain xxhash64 of the identical
    * canonical rendering, same order-free combines.
    */
  lazy val contentManifestSql: String = {
    import graft.functions.DuckHash._
    def legSql(pfx: String, tbl: String, srcSel: String): (Seq[(String, String)], String) = {
      val ctes = ArrayBuffer[(String, String)](s"${pfx}c" -> s"($srcSel)")
      ctes += (s"${pfx}b" -> s"(SELECT ${bytesOf("s")} AS b FROM ${pfx}c)")
      val ch = hashBytesChain(s"${pfx}h", s"${pfx}b", Seq.empty, "42", "hh")
      ctes ++= ch.ctes
      val fin =
        s"""SELECT '$tbl' AS tbl, count(*)::BIGINT AS n_rows,
           |  bit_xor(${toSigned("hh")})::BIGINT AS xor_fp,
           |  CAST(min(${toSigned("hh")}) AS BIGINT) AS min_h,
           |  CAST(max(${toSigned("hh")}) AS BIGINT) AS max_h
           |FROM ${ch.last}""".stripMargin
      (ctes.toSeq, fin)
    }
    val sep = "chr(31)"
    val (evC, evF) = legSql(
      "q155e",
      "events",
      s"""SELECT concat_ws($sep, event_id, epoch_us(ts), user_id, event_type,
         |  (CAST(value AS DECIMAL(18,2)) * 100)::BIGINT, props) AS s FROM events""".stripMargin)
    val (docC, docF) = legSql(
      "q155d",
      "documents",
      s"SELECT concat_ws($sep, doc_id, lang, source, n_chars, text) AS s FROM documents")
    assemble(evC ++ docC, s"SELECT * FROM (($evF) UNION ALL ($docF)) ORDER BY tbl")
  }

  // --- q184: FK fan-out / orphan profile ---------------------------------------

  /** The star schema's FK relationships, as (name, parent table, pk,
    * child table, fk). */
  val FkRels: Seq[(String, String, String, String, String)] = Seq(
    ("customer->orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("nation->customer", "nation", "n_nationkey", "customer", "c_nationkey"),
    ("nation->supplier", "nation", "n_nationkey", "supplier", "s_nationkey"),
    ("orders->lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"))

  /** FK fan-out and orphan profile over the star schema — the join
    * CARDINALITY facts q157's broadcast-vs-shuffle planner and any skew
    * screen need as input, and the structural complement of q105 (q105
    * counts constraint VIOLATIONS; q184 profiles the relationship SHAPE):
    * per FK edge — parent and child populations, childless parents, the
    * min/avg/max children per parent (min over ALL parents, so a 0 means
    * sparse coverage), orphan child rows, and the hot-parent factor
    * max/avg that predicts per-key join skew (q150's advisor exists
    * because of exactly these keys). A fan-out profile that shifts
    * between snapshots is also the first symptom of an upstream load
    * bug.
    *
    * Scale shape: per relationship ONE child-side keyed aggregate to the
    * parent-key grain + a full-outer join against the (distinct) parent
    * keys — both sides bounded by the dimension's key domain; the four
    * profile rows union. Determinism: longs + one divide-round each for
    * avg and hot factor.
    */
  def fkProfile(spark: SparkSession, dir: String): DataFrame = {
    def rel(name: String, pt: String, pk: String, ct: String, fk: String): DataFrame = {
      val parents = Tables.t(spark, dir, pt).select(col(pk).as("k")).distinct()
      val kids    = Tables.t(spark, dir, ct).groupBy(col(fk).as("k")).agg(count(lit(1)).as("c"))
      parents
        .withColumn("isp", lit(1L))
        .join(kids, Seq("k"), "full_outer")
        .groupBy()
        .agg(
          coalesce(sum(col("isp")), lit(0L)).as("n_parents"),
          coalesce(sum(when(col("isp").isNotNull, col("c"))), lit(0L)).as("n_children"),
          coalesce(sum(when(col("isp").isNotNull && col("c").isNull, 1L)), lit(0L))
            .as("n_childless"),
          coalesce(sum(when(col("isp").isNull, col("c"))), lit(0L)).as("n_orphan_rows"),
          coalesce(min(when(col("isp").isNotNull, coalesce(col("c"), lit(0L)))), lit(0L))
            .as("min_fanout"),
          coalesce(max(when(col("isp").isNotNull, coalesce(col("c"), lit(0L)))), lit(0L))
            .as("max_fanout"))
        .select(
          lit(name).as("rel"),
          col("n_parents"),
          col("n_children"),
          col("n_childless"),
          col("n_orphan_rows"),
          col("min_fanout"),
          round(col("n_children").cast("double") / col("n_parents").cast("double"), 6)
            .as("avg_fanout"),
          col("max_fanout"),
          when(col("n_children") > 0,
            round(col("max_fanout").cast("double") * col("n_parents").cast("double") /
              col("n_children").cast("double"), 6)).as("hot_factor"))
    }
    FkRels
      .map { case (n, pt, pk, ct, fk) => rel(n, pt, pk, ct, fk) }
      .reduce(_ unionByName _)
      .orderBy(col("rel"))
  }

  /** q184 oracle: identical per-relationship full-outer profile and
    * divide shapes.
    */
  val fkProfileSql: String = {
    def leg(name: String, pt: String, pk: String, ct: String, fk: String): String =
      s"""SELECT '$name' AS rel, n_parents, n_children, n_childless, n_orphan_rows,
         |  min_fanout,
         |  round(n_children::DOUBLE / n_parents::DOUBLE, 6) AS avg_fanout,
         |  max_fanout,
         |  CASE WHEN n_children > 0 THEN
         |    round(max_fanout::DOUBLE * n_parents::DOUBLE / n_children::DOUBLE, 6)
         |  END AS hot_factor
         |FROM (
         |  SELECT coalesce(sum(isp), 0)::BIGINT AS n_parents,
         |    coalesce(sum(CASE WHEN isp IS NOT NULL THEN c END), 0)::BIGINT AS n_children,
         |    coalesce(sum(CASE WHEN isp IS NOT NULL AND c IS NULL THEN 1 END), 0)::BIGINT
         |      AS n_childless,
         |    coalesce(sum(CASE WHEN isp IS NULL THEN c END), 0)::BIGINT AS n_orphan_rows,
         |    coalesce(min(CASE WHEN isp IS NOT NULL THEN coalesce(c, 0) END), 0)::BIGINT
         |      AS min_fanout,
         |    coalesce(max(CASE WHEN isp IS NOT NULL THEN coalesce(c, 0) END), 0)::BIGINT
         |      AS max_fanout
         |  FROM (SELECT DISTINCT $pk AS k, 1::BIGINT AS isp FROM $pt) p
         |  FULL OUTER JOIN (SELECT $fk AS k, count(*)::BIGINT AS c FROM $ct GROUP BY 1) kk
         |    USING (k))""".stripMargin
    FkRels
      .map { case (n, pt, pk, ct, fk) => s"(${leg(n, pt, pk, ct, fk)})" }
      .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY rel")
  }

  // --- q181: mass-weighted length quantiles ------------------------------------

  /** Mass-weighted document-length quantiles per source (+ `_ALL`): the
    * smallest length L such that documents of length ≤ L hold ≥ p of the
    * source's total CHARACTER MASS — "half the corpus bytes live in docs
    * shorter than X", the number sequence-length budgeting (q158) and
    * shard planning (q167) actually need. Doc-COUNT percentiles (q43)
    * answer a different question and diverge badly under heavy tails:
    * one 10 MB doc moves the mass median while the count median never
    * sees it. Thresholds are the exact lower weighted quantile — pure
    * integer rule `cumw·den ≥ W·num`, no interpolation, no division.
    *
    * Scale shape: ONE map-side-combinable aggregate to the
    * (source, length) histogram grain; the `_ALL` rollup derives from
    * the histogram itself; cumulative weights are per-source windows
    * over that bounded table (≤ |sources|·|distinct lengths|).
    * Determinism: longs end to end.
    */
  def weightedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val hist0 = graft.core.CacheScope.persist(
      Tables
        .documents(spark, dir)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(sum(col("n_chars")).as("w")))
    val hist = hist0.unionByName(
      hist0
        .groupBy(col("v"))
        .agg(sum(col("w")).as("w"))
        .select(lit("_ALL").as("source"), col("v"), col("w")))
    val win = Window
      .partitionBy(col("source"))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cumw", sum(col("w")).over(win))
    val tot = hist.groupBy(col("source")).agg(sum(col("w")).as("w_total"))
    cum
      .join(broadcast(tot), "source")
      .groupBy(col("source"), col("w_total"))
      .agg(
        min(when(col("cumw") * 4 >= col("w_total"), col("v"))).as("p25"),
        min(when(col("cumw") * 2 >= col("w_total"), col("v"))).as("p50"),
        min(when(col("cumw") * 4 >= col("w_total") * 3, col("v"))).as("p75"),
        min(when(col("cumw") * 10 >= col("w_total") * 9, col("v"))).as("p90"))
      .select(col("source"), col("w_total"), col("p25"), col("p50"), col("p75"), col("p90"))
      .orderBy(col("source"))
  }

  /** q181 oracle: identical histogram grain, `_ALL` rollup, cumulative
    * windows, and the integer `cumw·den ≥ W·num` threshold rule.
    */
  val weightedQuantilesSql: String =
    """WITH q181h AS MATERIALIZED (
      |  SELECT source, n_chars AS v, CAST(sum(n_chars) AS BIGINT) AS w
      |  FROM documents GROUP BY 1, 2),
      |q181u AS (
      |  SELECT * FROM q181h
      |  UNION ALL
      |  SELECT '_ALL', v, CAST(sum(w) AS BIGINT) FROM q181h GROUP BY v),
      |q181c AS (
      |  SELECT source, v, w,
      |    CAST(sum(w) OVER (PARTITION BY source ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
      |    CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS w_total
      |  FROM q181u)
      |SELECT source, w_total,
      |  CAST(min(CASE WHEN cumw * 4 >= w_total THEN v END) AS BIGINT) AS p25,
      |  CAST(min(CASE WHEN cumw * 2 >= w_total THEN v END) AS BIGINT) AS p50,
      |  CAST(min(CASE WHEN cumw * 4 >= w_total * 3 THEN v END) AS BIGINT) AS p75,
      |  CAST(min(CASE WHEN cumw * 10 >= w_total * 9 THEN v END) AS BIGINT) AS p90
      |FROM q181c GROUP BY source, w_total ORDER BY source""".stripMargin

  // --- q180: manifest-diff backfill planner ------------------------------------

  /** Deterministic simulated-loss modulus: the "replica" drops every
    * event_id ≡ 0 (mod this) — a reproducible stand-in for a lossy copy. */
  val BackfillDropMod = 997L

  /** Manifest-diff backfill planner — the CONSUMER of the q155/E34
    * fingerprint layer: given the per-hour (count, xor-fingerprint)
    * manifests of the source of truth and a replica (here: a
    * deterministic 1/[[BackfillDropMod]] event drop), find every hour
    * whose envelope mismatches and compact them into CONSECUTIVE backfill
    * ranges (the classic gaps-and-islands collapse) with the rows missing
    * per range — exactly the work order a recovery job takes ("re-copy
    * hours 07..09, 211 rows"), instead of a per-hour mismatch list that a
    * scheduler would re-fragment. An hour missing from the replica
    * entirely is a mismatch of its whole count.
    *
    * Scale shape: both manifests are ONE map-side-combinable aggregate to
    * the |hours| grain (xor/count have partials); the diff join, island
    * numbering (row_number over the ≤|hours| mismatch table — bounded, a
    * deliberate exception to the no-global-window rule, like q149's
    * boundary pick), and range rollup all ride that tiny table.
    * Determinism: xor is order-free, counts are longs, island keys are
    * integer hr − rank.
    */
  def backfillPlan(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(
        (unix_micros(date_trunc("hour", col("ts"))) / lit(3600000000L)).cast("long").as("hr"),
        col("event_id"),
        xxhash64(col("event_id")).as("h"))
    def manifest(df: DataFrame) =
      df.groupBy(col("hr")).agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
    val full = manifest(ev)
    val rep  = manifest(ev.filter(pmod(col("event_id"), lit(BackfillDropMod)) =!= 0))
    val mism = full
      .join(rep.select(col("hr"), col("n").as("n_r"), col("x").as("x_r")), Seq("hr"), "left")
      .filter(col("n_r").isNull || col("n") =!= col("n_r") || col("x") =!= col("x_r"))
      .select(col("hr"), (col("n") - coalesce(col("n_r"), lit(0L))).as("miss"))
    val w = Window.orderBy(col("hr"))
    mism
      .withColumn("grp", col("hr") - row_number().over(w))
      .groupBy(col("grp"))
      .agg(
        min(col("hr")).as("h0"),
        max(col("hr")).as("h1"),
        count(lit(1)).as("n_hours"),
        sum(col("miss")).as("n_rows_missing"))
      .select(
        date_format(timestamp_micros(col("h0") * lit(3600000000L)), "yyyy-MM-dd HH")
          .as("start_hour"),
        date_format(timestamp_micros(col("h1") * lit(3600000000L)), "yyyy-MM-dd HH")
          .as("end_hour"),
        col("n_hours"),
        col("n_rows_missing"))
      .orderBy(col("start_hour"))
  }

  /** q180 oracle: the q126-style exact xxhash64(long) emulation feeding
    * both manifests, the same left-join diff, and the identical
    * hr − row_number island key.
    */
  lazy val backfillPlanSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q180e" ->
        """(SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr, event_id,
          |   event_id::HUGEINT AS l FROM events)""".stripMargin)
    val ch = new SqlChain("q180h", "q180e", Seq("hr", "event_id", "l"))
    hashLongLevels(ch, toUnsigned("l"), "42", "hh")
    ctes ++= ch.ctes
    ctes += ("q180x" ->
      s"(SELECT hr, event_id, ${toSigned("hh")}::BIGINT AS h FROM ${ch.last})")
    ctes += ("q180f" ->
      "(SELECT hr, count(*)::BIGINT AS n, bit_xor(h)::BIGINT AS x FROM q180x GROUP BY hr)")
    ctes += ("q180r" ->
      s"""(SELECT hr, count(*)::BIGINT AS n, bit_xor(h)::BIGINT AS x FROM q180x
         |  WHERE event_id % $BackfillDropMod <> 0 GROUP BY hr)""".stripMargin)
    ctes += ("q180m" ->
      """(SELECT f.hr, f.n - coalesce(r.n, 0) AS miss
        |  FROM q180f f LEFT JOIN q180r r ON r.hr = f.hr
        |  WHERE r.hr IS NULL OR f.n <> r.n OR f.x <> r.x)""".stripMargin)
    ctes += ("q180g" ->
      "(SELECT hr, miss, hr - ROW_NUMBER() OVER (ORDER BY hr) AS grp FROM q180m)")
    assemble(
      ctes.toSeq,
      """SELECT strftime(make_timestamp(min(hr) * 3600000000), '%Y-%m-%d %H') AS start_hour,
        |  strftime(make_timestamp(max(hr) * 3600000000), '%Y-%m-%d %H') AS end_hour,
        |  count(*)::BIGINT AS n_hours,
        |  CAST(sum(miss) AS BIGINT) AS n_rows_missing
        |FROM q180g GROUP BY grp ORDER BY start_hour""".stripMargin)
  }

  // --- q178: A/B sample-ratio-mismatch gate -----------------------------------

  /** χ²₁ critical value at α = 0.05 — the standard SRM alarm threshold. */
  val SrmCritical = 3.841459

  /** Sample-ratio-mismatch gate over q126's hash randomization — the
    * FIRST check an experimentation pipeline runs, before any uplift
    * number is read: under `xxhash64(user_id) mod 2` the two arms must
    * split 50/50 up to sampling noise; a significant imbalance (per event
    * type, or overall) means the assignment, logging, or filtering is
    * broken and every downstream metric is biased — the classic silent
    * A/B killer. Per type and `_ALL`: distinct users per arm, the
    * two-cell χ² statistic ((n_c − n_t)²/N — exact integer numerator),
    * and the alarm flag against [[SrmCritical]].
    *
    * Scale shape: ONE distinct to the (user, type) grain (persisted);
    * both the per-type counts and the overall distinct-user fold derive
    * from that bounded table; arms are in-row hash expressions (no join,
    * no state). Determinism: pure integer counts, one divide-round, the
    * flag compares the unrounded statistic to a shared literal.
    */
  def srmGate(spark: SparkSession, dir: String): DataFrame = {
    val ut = graft.core.CacheScope.persist(
      Tables.events(spark, dir).select(col("user_id"), col("event_type")).distinct())
    val arm = pmod(xxhash64(col("user_id")), lit(2L))
    def counts(df: DataFrame) = df
      .withColumn("arm", arm)
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treatment"))
    val perType = ut.groupBy(col("event_type"))
      .agg(
        sum(when(arm === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(arm === 1, 1L).otherwise(0L)).as("n_treatment"))
    val overall = counts(ut.select(col("user_id")).distinct())
      .select(lit("_ALL").as("event_type"), col("n_control"), col("n_treatment"))
    val d    = col("n_control") - col("n_treatment")
    val stat = (d * d).cast("double") / (col("n_control") + col("n_treatment")).cast("double")
    perType
      .unionByName(overall)
      .select(
        col("event_type"),
        col("n_control"),
        col("n_treatment"),
        round(stat, 6).as("chisq"),
        (stat > lit(SrmCritical)).as("srm_alarm"))
      .orderBy(col("event_type"))
  }

  /** q178 oracle: identical user-type grain, q126's exact xxhash64 arm
    * emulation, integer χ² numerator, and the same literal threshold.
    */
  lazy val srmGateSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q178u" -> "(SELECT DISTINCT user_id, event_type FROM events)",
      "q178du" -> "(SELECT DISTINCT user_id, user_id::HUGEINT AS l FROM q178u)")
    val ch = new SqlChain("q178h", "q178du", Seq("user_id", "l"))
    hashLongLevels(ch, toUnsigned("l"), "42", "ha")
    ctes ++= ch.ctes
    ctes += ("q178arm" ->
      s"(SELECT user_id, (((${toSigned("ha")} % 2) + 2) % 2)::BIGINT AS arm FROM ${ch.last})")
    ctes += ("q178a" ->
      "(SELECT u.user_id, u.event_type, a.arm FROM q178u u JOIN q178arm a USING (user_id))")
    assemble(
      ctes.toSeq,
      s"""SELECT event_type, n_control, n_treatment,
         |  round(((n_control - n_treatment) * (n_control - n_treatment))::DOUBLE
         |    / (n_control + n_treatment)::DOUBLE, 6) AS chisq,
         |  ((n_control - n_treatment) * (n_control - n_treatment))::DOUBLE
         |    / (n_control + n_treatment)::DOUBLE > $SrmCritical AS srm_alarm
         |FROM (
         |  SELECT event_type,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment
         |  FROM q178a GROUP BY event_type
         |  UNION ALL
         |  SELECT '_ALL',
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT),
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM q178arm)
         |ORDER BY event_type""".stripMargin)
  }

  // --- q174: mergeable moments profile + variance decomposition ---------------

  val MomentShards = 4L

  /** Mergeable moments profile of `value` per event type — the
    * sufficient-statistics pattern that makes distribution profiling a
    * one-pass, arbitrarily-mergeable operation at 100 TB: per
    * deterministic shard (event_id mod [[MomentShards]] — stand-in for
    * files/days/regions) the exact integer power sums S₀..S₄ over
    * cent-quantized values; shards merge by ADDITION (the algebra q161
    * certifies for HLL's max-merge, trivial-but-load-bearing here), and
    * mean/sd/skewness/excess-kurtosis all fall out of the merged vector
    * by method of moments. The row also carries the law-of-total-variance
    * decomposition (within-shard vs between-shard variance) — the table
    * that catches the classic parallel-profiling bug of averaging
    * per-shard variances (drops the between component exactly when
    * shards are skewed, e.g. value drift by day).
    *
    * Scale shape: ONE map-side-combinable aggregate to the
    * |types|×[[MomentShards]] grain; merge, decomposition, and stats are
    * tiny-table folds and broadcasts. Determinism: power sums ride
    * DECIMAL(38,0) (v⁴ overflows BIGINT; Σv⁴ < 10³⁰ at 10¹² rows);
    * within/between terms are per-shard float shapes quantized to integer
    * cents² BEFORE the order-free sum (the q163 rule); skew/kurt are
    * scale-invariant so they evaluate in the cent domain with one pinned
    * expression shape — divides, multiplies, and correctly-rounded
    * sqrts only — before the 6-dp round; degenerate types (zero
    * variance) yield NULL skew/kurt.
    */
  /** Cent-quantized `value` for the moment envelopes, with a LOUD domain
    * guard: under Spark's non-ANSI default an out-of-range DECIMAL(38,0)
    * product returns NULL silently, which would zero a power sum while
    * the DuckDB HUGEINT oracle errors — the documented `Σv⁴ < 10³⁸`
    * envelope must fail loudly instead. |v| < 10⁷ cents (|value| <
    * \$100k) keeps v⁴ < 10²⁸, so the per-cell sum stays inside
    * DECIMAL(38,0) for 10¹⁰ rows; anything outside raises at the row
    * that broke the contract. Shared by batch q174 and streaming E38 so
    * the two cannot diverge on the domain rule.
    */
  private[graft] def centMomentValue: org.apache.spark.sql.Column = {
    val raw = (col("value").cast("decimal(18,2)") * lit(100)).cast("decimal(38,0)")
    when(abs(raw) < lit(10000000L), raw).otherwise(
      raise_error(concat(
        lit("moments: |value| outside the cent-quantized domain (>= 1e5): "),
        col("value").cast("string"))))
  }

  /** Post-aggregation tripwire for the DECIMAL(38,0) power sums: under
    * non-ANSI Spark an overflowing SUM returns NULL silently while the
    * DuckDB HUGEINT oracle raises. [[centMomentValue]] never emits NULL,
    * so a NULL sum over n > 0 input rows can ONLY be decimal overflow —
    * the documented Σ|v|⁴ < 10³⁸ envelope (safe to 10¹⁰ rows per cell at
    * |v| < 10⁷) failing. Raise at the aggregate instead of letting the
    * envelope zero the profile; shared by batch q174 and streaming E38 so
    * both legs enforce the same contract the oracle enforces.
    */
  private[graft] def guardedPowerSum(sumCol: String, nCol: String): org.apache.spark.sql.Column =
    when(col(nCol) > 0L && col(sumCol).isNull,
      raise_error(lit(s"moments: DECIMAL(38,0) overflow in $sumCol — " +
        "the power-sum envelope was exceeded (shrink the cell grain or the value domain)")))
      .otherwise(col(sumCol)).as(sumCol)

  def momentsProfile(spark: SparkSession, dir: String): DataFrame = {
    val v = centMomentValue
    val cells = graft.core.CacheScope.persist(
      Tables
        .events(spark, dir)
        .select(col("event_type"), pmod(col("event_id"), lit(MomentShards)).as("shard"),
          v.as("v"))
        .groupBy(col("event_type"), col("shard"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("v")).as("s1"),
          sum(col("v") * col("v")).as("s2"),
          sum(col("v") * col("v") * col("v")).as("s3"),
          sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
        .select(col("event_type"), col("shard"), col("n"),
          guardedPowerSum("s1", "n"), guardedPowerSum("s2", "n"),
          guardedPowerSum("s3", "n"), guardedPowerSum("s4", "n")))
    val merged = cells
      .groupBy(col("event_type"))
      .agg(
        sum(col("n")).as("mn"),
        sum(col("s1")).as("m1"),
        sum(col("s2")).as("m2s"),
        sum(col("s3")).as("m3s"),
        sum(col("s4")).as("m4s"))
      .select(col("event_type"), col("mn"),
        guardedPowerSum("m1", "mn"), guardedPowerSum("m2s", "mn"),
        guardedPowerSum("m3s", "mn"), guardedPowerSum("m4s", "mn"))
      .withColumn("mu", col("m1").cast("double") / col("mn").cast("double"))
    val dec = cells
      .join(broadcast(merged.select(col("event_type"), col("mu"))), "event_type")
      .selectExpr(
        "event_type",
        // within: n_s·m2_s, quantized to integer cents² before the sum
        """CAST(round(CAST(n AS DOUBLE) *
             (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))),
             0) AS BIGINT) AS wq""",
        // between: n_s·(mu_s − mu)², same quantization
        """CAST(round(CAST(n AS DOUBLE) *
             (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - mu) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - mu),
             0) AS BIGINT) AS bq""")
      .groupBy(col("event_type"))
      .agg(sum(col("wq")).as("w"), sum(col("bq")).as("b"))
    merged
      .join(broadcast(dec), "event_type")
      .selectExpr(
        "event_type",
        "mn AS n",
        "round(mu / 100.0, 6) AS mean",
        """round(sqrt(CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu) / 100.0, 6) AS sd""",
        """CASE WHEN CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu > 0.0 THEN
             round((CAST(m3s AS DOUBLE) / CAST(mn AS DOUBLE) - 3.0 * mu * (CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE)) + 2.0 * mu * mu * mu)
               / (sqrt(CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu)
                  * sqrt(CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu)
                  * sqrt(CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu)), 6)
           END AS skewness""",
        """CASE WHEN CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu > 0.0 THEN
             round((CAST(m4s AS DOUBLE) / CAST(mn AS DOUBLE)
                    - 4.0 * mu * (CAST(m3s AS DOUBLE) / CAST(mn AS DOUBLE))
                    + 6.0 * mu * mu * (CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE))
                    - 3.0 * mu * mu * mu * mu)
               / ((CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu)
                  * (CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu)) - 3.0, 6)
           END AS kurt_excess""",
        "round((CAST(w AS DOUBLE) / CAST(mn AS DOUBLE)) / 10000.0, 6) AS within_var",
        "round((CAST(b AS DOUBLE) / CAST(mn AS DOUBLE)) / 10000.0, 6) AS between_var",
        "round((CAST(m2s AS DOUBLE) / CAST(mn AS DOUBLE) - mu * mu) / 10000.0, 6) AS total_var")
      .orderBy(col("event_type"))
  }

  /** q174 oracle: identical cent quantization, HUGEINT power sums, the
    * same quantize-before-sum decomposition terms, and every float
    * expression spelled in the same shape (left-assoc products, one
    * divide per ratio) before the 6-dp rounds.
    */
  val momentsProfileSql: String = {
    val S = MomentShards
    s"""WITH q174c AS MATERIALIZED (
       |  SELECT event_type, event_id % $S AS shard, count(*)::BIGINT AS n,
       |    sum(v)::HUGEINT AS s1, sum(v*v)::HUGEINT AS s2,
       |    sum(v*v*v)::HUGEINT AS s3, sum(v*v*v*v)::HUGEINT AS s4
       |  FROM (SELECT event_type, event_id,
       |          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS v FROM events)
       |  GROUP BY 1, 2),
       |q174m AS (
       |  SELECT event_type, CAST(sum(n) AS BIGINT) AS mn,
       |    CAST(sum(s1) AS HUGEINT) AS m1, CAST(sum(s2) AS HUGEINT) AS m2s,
       |    CAST(sum(s3) AS HUGEINT) AS m3s, CAST(sum(s4) AS HUGEINT) AS m4s,
       |    CAST(sum(s1) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS mu
       |  FROM q174c GROUP BY 1),
       |q174d AS (
       |  SELECT c.event_type,
       |    CAST(sum(CAST(round(CAST(c.n AS DOUBLE) *
       |      (CAST(c.s2 AS DOUBLE) / CAST(c.n AS DOUBLE)
       |       - (CAST(c.s1 AS DOUBLE) / CAST(c.n AS DOUBLE)) * (CAST(c.s1 AS DOUBLE) / CAST(c.n AS DOUBLE))),
       |      0) AS BIGINT)) AS BIGINT) AS w,
       |    CAST(sum(CAST(round(CAST(c.n AS DOUBLE) *
       |      (CAST(c.s1 AS DOUBLE) / CAST(c.n AS DOUBLE) - m.mu) * (CAST(c.s1 AS DOUBLE) / CAST(c.n AS DOUBLE) - m.mu),
       |      0) AS BIGINT)) AS BIGINT) AS b
       |  FROM q174c c JOIN q174m m USING (event_type) GROUP BY 1)
       |SELECT m.event_type, m.mn AS n,
       |  round(m.mu / 100.0, 6) AS mean,
       |  round(sqrt(CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu) / 100.0, 6) AS sd,
       |  CASE WHEN CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu > 0.0 THEN
       |    round((CAST(m.m3s AS DOUBLE) / CAST(m.mn AS DOUBLE) - 3.0 * m.mu * (CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE)) + 2.0 * m.mu * m.mu * m.mu)
       |      / (sqrt(CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu)
       |         * sqrt(CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu)
       |         * sqrt(CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu)), 6)
       |  END AS skewness,
       |  CASE WHEN CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu > 0.0 THEN
       |    round((CAST(m.m4s AS DOUBLE) / CAST(m.mn AS DOUBLE)
       |           - 4.0 * m.mu * (CAST(m.m3s AS DOUBLE) / CAST(m.mn AS DOUBLE))
       |           + 6.0 * m.mu * m.mu * (CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE))
       |           - 3.0 * m.mu * m.mu * m.mu * m.mu)
       |      / ((CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu)
       |         * (CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu)) - 3.0, 6)
       |  END AS kurt_excess,
       |  round((CAST(d.w AS DOUBLE) / CAST(m.mn AS DOUBLE)) / 10000.0, 6) AS within_var,
       |  round((CAST(d.b AS DOUBLE) / CAST(m.mn AS DOUBLE)) / 10000.0, 6) AS between_var,
       |  round((CAST(m.m2s AS DOUBLE) / CAST(m.mn AS DOUBLE) - m.mu * m.mu) / 10000.0, 6) AS total_var
       |FROM q174m m JOIN q174d d USING (event_type)
       |ORDER BY m.event_type""".stripMargin
  }

  // --- q195: unseen-vocabulary mass (Good-Turing / Chao1) --------------------

  /** "How much vocabulary have we NOT seen yet?" — the data-acquisition
    * question q82's Heaps fit answers by extrapolating a growth CURVE;
    * this answers it from the frequency SPECTRUM at the current corpus
    * size, per source and for the pooled corpus: Good-Turing unseen mass
    * `P₀ = N₁/N` (the probability the next token drawn is a new type —
    * Good 1953), and the bias-corrected Chao1 richness floor
    * `V + N₁(N₁−1)/(2(N₂+1))` (Chao 1984) with its implied vocabulary
    * deficit. A source with high P₀ is under-sampled — more data from it
    * buys new types, not repeats; the `_ALL` row prices the pooled
    * corpus. Singletons/doubletons are exactly what fuzzy dedup and
    * boilerplate stripping perturb, so re-reading this table after a q33
    * pass shows whether cleaning ate the long tail (q145's gram-survival
    * question at the vocabulary grain).
    *
    * Scale shape: ONE explode → (source, token) count (map-side combine,
    * one shuffle); the per-source spectrum is a second keyed aggregate on
    * the (source, token, c) grain, and the `_ALL` spectrum re-aggregates
    * that same persisted grain by token (sum of per-source counts — no
    * second corpus scan). Pure integer sums; one divide-round per ratio.
    */
  def unseenMass(spark: SparkSession, dir: String): DataFrame = {
    val st = graft.core.CacheScope.persist(
      docs(spark, dir)
        .select(col("source"), explode(TextOps.toks).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c")))
    val spectrum = (g: org.apache.spark.sql.RelationalGroupedDataset) =>
      g.agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n2"))
    val per = spectrum(st.groupBy(col("source")))
    val all = spectrum(
      st.groupBy(col("tok")).agg(sum(col("c")).as("c")).withColumn("source", lit("_ALL"))
        .groupBy(col("source")))
    per
      .unionByName(all)
      .select(
        col("source"), col("n_tokens"), col("vocab"), col("n1"), col("n2"),
        round(col("n1").cast("double") / col("n_tokens").cast("double"), 6).as("p_unseen"),
        round(
          col("vocab").cast("double") +
            (col("n1") * (col("n1") - lit(1L))).cast("double") /
            (lit(2L) * (col("n2") + lit(1L))).cast("double"),
          6).as("chao1"))
      .orderBy(col("source"))
  }

  /** Oracle: same spectrum algebra on the same token grain; integer
    * numerators/denominators built before the single divide-round, so the
    * only double op per ratio is one division (identical both engines).
    */
  lazy val unseenMassSql: String = {
    import graft.functions.DuckHash._
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](
      "q195t" ->
        s"""(SELECT source, tok, count(*)::BIGINT AS c
           |  FROM (SELECT source, unnest(${TextOps.DuckToks}) AS tok FROM documents)
           |  WHERE tok <> '' GROUP BY 1, 2)""".stripMargin,
      "q195a" ->
        """(SELECT '_ALL' AS source, tok, CAST(sum(c) AS BIGINT) AS c
          |  FROM q195t GROUP BY 2)""".stripMargin,
      "q195u" -> "(SELECT * FROM q195t UNION ALL SELECT * FROM q195a)",
      "q195s" ->
        """(SELECT source,
          |    CAST(sum(c) AS BIGINT) AS n_tokens,
          |    count(*)::BIGINT AS vocab,
          |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          |  FROM q195u GROUP BY 1)""".stripMargin
    )
    assemble(
      ctes.toSeq,
      """SELECT source, n_tokens, vocab, n1, n2,
        |  round(n1::DOUBLE / n_tokens::DOUBLE, 6) AS p_unseen,
        |  round(vocab::DOUBLE + CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(2 * (n2 + 1) AS DOUBLE), 6) AS chao1
        |FROM q195s
        |ORDER BY source""".stripMargin)
  }

  // --- q196: pairwise source distributional divergence -----------------------

  /** Pairwise Jensen-Shannon divergence matrix over hashed unigram
    * distributions — the redundancy question q71 (each source vs the
    * pooled mix) and q54 (exact shingle overlap) leave open: WHICH PAIRS
    * of sources say the same things in the same proportions? A near-zero
    * JS pair is a candidate for collapsing in q53/q70's mixing weights
    * (two crawls of the same site, a mirror, a re-crawl) long before
    * shingle-level dedup would prove it document by document; JS is
    * symmetric and bounded (≤ ln 2), so one number per pair ranks the
    * whole |sources|² design space.
    *
    * Same scale machinery as q71: ONE corpus scan collapses map-side to
    * the |sources|×[[DriftBuckets]] count grid; add-one smoothing over
    * the FULL bucket universe makes both distributions sum to exactly 1
    * (a true JS); the pair join runs on the bounded grid (never the
    * corpus), |pairs|·B cells. Exactness: each bucket term uses ln of an
    * EXACT INTEGER ratio — `2(c₁+1)(n₂+B)` over the shared mixed
    * denominator — rounded once (q49/q57 rule), folded ascending by
    * bucket; products stay < 2⁵³ at any n this library meets (the q71
    * split-ln note applies beyond).
    */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val B = DriftBuckets
    val counts = graft.core.CacheScope.persist(
      docs(spark, dir)
        .select(col("source"), TextOps.toks.as("toks"))
        .select(col("source"), explode(expr(s"transform(toks, t -> pmod(xxhash64(t), $B))")).as("f"))
        .groupBy(col("source"), col("f"))
        .agg(count(lit(1)).as("c")))
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    // full smoothed support: every source × every bucket 0..B-1 — an
    // in-row sequence explode on the tiny totals table, no join
    val universe = totals
      .select(col("source"), col("n"), explode(expr(s"sequence(0L, ${B - 1}L)")).as("f"))
    val grid = universe
      .join(counts, Seq("source", "f"), "left")
      .select(col("source"), col("f"), col("n"), coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.select(
      col("source").as("source_a"), col("f"),
      col("n").as("n_a"), col("c").as("c_a"))
    val b = grid.select(
      col("source").as("source_b"), col("f"),
      col("n").as("n_b"), col("c").as("c_b"))
    a.join(b, Seq("f"))
      .filter(col("source_a") < col("source_b"))
      .withColumn("den",
        (col("c_a") + lit(1L)) * (col("n_b") + lit(B.toLong)) +
          (col("c_b") + lit(1L)) * (col("n_a") + lit(B.toLong)))
      .withColumn("term",
        (col("c_a") + lit(1L)).cast("double") / (col("n_a") + lit(B.toLong)).cast("double") *
          round(log(
            (lit(2L) * (col("c_a") + lit(1L)) * (col("n_b") + lit(B.toLong))).cast("double") /
              col("den").cast("double")), 6) +
          (col("c_b") + lit(1L)).cast("double") / (col("n_b") + lit(B.toLong)).cast("double") *
          round(log(
            (lit(2L) * (col("c_b") + lit(1L)) * (col("n_a") + lit(B.toLong))).cast("double") /
              col("den").cast("double")), 6))
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        expr("aggregate(array_sort(collect_list(struct(f, term))), 0D, (a, x) -> a + x.term)")
          .as("ts"))
      .select(
        col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        round(col("ts") * 0.5, 6).as("js_div"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Oracle: same grid, same exact-integer ln ratios rounded once, same
    * bucket-ordered fold and final half-round.
    */
  lazy val sourceDivergenceSql: String = {
    import graft.functions.DuckHash._
    val B = DriftBuckets
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](
      "q196t" ->
        s"""(SELECT source, tok FROM
           |  (SELECT source, unnest(${TextOps.DuckToks}) AS tok FROM documents))""".stripMargin,
      "q196d" -> s"(SELECT tok, ${bytesOf("tok")} AS b FROM (SELECT DISTINCT tok FROM q196t))"
    )
    val hb = hashBytesChain("q196hx", "q196d", Seq("tok"), "42", "hs")
    ctes ++= hb.ctes
    ctes += ("q196f" ->
      s"(SELECT tok, ((${toSigned("hs")} % $B) + $B) % $B AS f FROM ${hb.last})")
    ctes += ("q196c" ->
      """(SELECT source, f, count(*)::BIGINT AS c
        |  FROM q196t JOIN q196f USING (tok) GROUP BY 1, 2)""".stripMargin)
    ctes += ("q196n" -> "(SELECT source, CAST(sum(c) AS BIGINT) AS n FROM q196c GROUP BY 1)")
    ctes += ("q196u" ->
      s"""(SELECT t.source, t.n, u.range::BIGINT AS f
         |  FROM q196n t, range(0, $B) u)""".stripMargin)
    ctes += ("q196g" ->
      """(SELECT u.source, u.f, u.n, coalesce(c.c, 0)::BIGINT AS c
        |  FROM q196u u LEFT JOIN q196c c ON c.source = u.source AND c.f = u.f)""".stripMargin)
    ctes += ("q196p" ->
      s"""(SELECT a.source AS source_a, b.source AS source_b, a.f,
         |    a.n AS n_a, a.c AS c_a, b.n AS n_b, b.c AS c_b,
         |    (a.c + 1) * (b.n + $B) + (b.c + 1) * (a.n + $B) AS den
         |  FROM q196g a JOIN q196g b ON a.f = b.f AND a.source < b.source)""".stripMargin)
    ctes += ("q196e" ->
      s"""(SELECT source_a, source_b, f, n_a, n_b,
         |    CAST(c_a + 1 AS DOUBLE) / CAST(n_a + $B AS DOUBLE)
         |      * round(ln(CAST(2 * (c_a + 1) * (n_b + $B) AS DOUBLE) / CAST(den AS DOUBLE)), 6)
         |    + CAST(c_b + 1 AS DOUBLE) / CAST(n_b + $B AS DOUBLE)
         |      * round(ln(CAST(2 * (c_b + 1) * (n_a + $B) AS DOUBLE) / CAST(den AS DOUBLE)), 6) AS term
         |  FROM q196p)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT source_a, source_b, max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
        |  round(list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY f)), (a, b) -> a + b) * 0.5, 6) AS js_div
        |FROM q196e GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)
  }

  // --- q207: A/B sample-size (power) planner ---------------------------------

  /** Experiment-design planner — the PROSPECTIVE complement of q126's
    * retrospective uplift test and q178's SRM gate: from each event type's
    * observed mean/variance, the per-arm sample size a two-sided
    * α=0.05 / power=0.80 two-arm t-test needs to detect a relative lift of
    * {1,2,5,10}% of the mean (`n = 2·(z_{.975}+z_{.80})²·σ²/δ²`), and
    * whether the CURRENT traffic could even feed two such arms. This is
    * the "can we measure it before we ship it" table a 100 TB event lake
    * answers from one scan.
    *
    * Scale shape: ONE map-side-combinable (type) aggregate of integer cent
    * sums; the MDE grid is a 4-way literal explode of the bounded per-type
    * table. Exactness: n/Σv/Σv² are exact integers (the q174 cent domain
    * guard); every derived stat is a fixed-order expression over those
    * integers with z-constants as literals, rounded once per leg; the
    * ceil'd sample size is integer-exact on both engines.
    */
  val PowerMdeGrid: Seq[Int]   = Seq(1, 2, 5, 10)
  val PowerZSum: Double        = 2.801585 // z_{0.975} + z_{0.80}

  def powerPlanner(spark: SparkSession, dir: String): DataFrame = {
    val grid = array(PowerMdeGrid.map(lit): _*)
    Tables
      .events(spark, dir)
      .select(col("event_type"), centMomentValue.as("v"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .withColumn("mu", col("s1").cast("double") / col("n").cast("double"))
      .withColumn(
        "varc",
        when(
          col("n") > 1,
          (col("s2").cast("double") - col("mu") * col("s1").cast("double")) /
            (col("n") - 1).cast("double")).otherwise(lit(0.0)))
      .withColumn("mde_pct", explode(grid))
      .withColumn("delta", abs(col("mu")) * col("mde_pct").cast("double") / lit(100.0))
      .select(
        col("event_type"),
        col("n"),
        round(col("mu") / lit(100.0), 6).as("mean"),
        round(sqrt(greatest(col("varc"), lit(0.0))) / lit(100.0), 6).as("sd"),
        col("mde_pct"),
        round(col("delta") / lit(100.0), 6).as("mde_abs"),
        when(col("delta") <= 0.0 || col("varc") <= 0.0, lit(null).cast("long"))
          .otherwise(
            ceil(
              lit(2.0) * lit(PowerZSum) * lit(PowerZSum) * col("varc") /
                (col("delta") * col("delta"))).cast("long"))
          .as("n_per_arm"))
      .withColumn(
        "feasible",
        when(col("n_per_arm").isNull, lit(false))
          .otherwise(col("n_per_arm") * 2 <= col("n")))
      .orderBy(col("event_type"), col("mde_pct"))
  }

  /** q207 oracle: identical integer cent sums (HUGEINT → cast), the same
    * fixed-order float expressions and z literals, the same ceil'd BIGINT.
    */
  val powerPlannerSql: String = {
    val z = PowerZSum
    val grid = PowerMdeGrid.map(p => s"($p)").mkString(", ")
    s"""WITH q207a AS (
       |  SELECT event_type, count(*)::BIGINT AS n,
       |    sum(v)::HUGEINT AS s1, sum(v*v)::HUGEINT AS s2
       |  FROM (SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS v FROM events)
       |  GROUP BY 1),
       |q207b AS (
       |  SELECT event_type, n,
       |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
       |    CASE WHEN n > 1 THEN
       |      (CAST(s2 AS DOUBLE) - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s1 AS DOUBLE))
       |        / CAST(n - 1 AS DOUBLE)
       |    ELSE 0.0 END AS varc
       |  FROM q207a),
       |q207c AS (
       |  SELECT b.*, g.mde_pct,
       |    abs(b.mu) * CAST(g.mde_pct AS DOUBLE) / 100.0 AS delta
       |  FROM q207b b CROSS JOIN (VALUES $grid) g(mde_pct))
       |SELECT event_type, n,
       |  round(mu / 100.0, 6) AS mean,
       |  round(sqrt(greatest(varc, 0.0)) / 100.0, 6) AS sd,
       |  mde_pct::INTEGER AS mde_pct,
       |  round(delta / 100.0, 6) AS mde_abs,
       |  CASE WHEN delta <= 0.0 OR varc <= 0.0 THEN NULL
       |       ELSE CAST(ceil(2.0 * $z * $z * varc / (delta * delta)) AS BIGINT) END AS n_per_arm,
       |  CASE WHEN delta <= 0.0 OR varc <= 0.0 THEN FALSE
       |       ELSE CAST(ceil(2.0 * $z * $z * varc / (delta * delta)) AS BIGINT) * 2 <= n END AS feasible
       |FROM q207c
       |ORDER BY event_type, mde_pct""".stripMargin
  }

  // --- q208: pairwise source Wasserstein (earth-mover) drift ------------------

  /** Exact pairwise 1-Wasserstein (earth-mover) distance between every two
    * sources' document-length distributions — the drift metric that
    * completes q71 (KL over hashed buckets), q137 (KS sup-gap), and q196
    * (Jensen-Shannon): KL/JS saturate on disjoint supports and KS sees
    * only the worst single point, while W₁ = ∫|F_a − F_b| measures HOW FAR
    * mass must move in the metric itself (characters here) — the number a
    * mixing planner can act on ("source X's docs run ~340 chars longer"),
    * robust to binning because there are no bins.
    *
    * Exactness: W₁ between empirical CDFs is piecewise-constant between
    * observed values, so the integral is the finite sum
    * `Σ_i |cumA_i·n_b − cumB_i·n_a| · (v_{i+1} − v_i) / (n_a·n_b)` over
    * the merged sorted support — ALL integer arithmetic, with the
    * cumulative counts cast to DECIMAL(38,0) BEFORE the cum·n products
    * (a long·long product wraps at 2^63 ≈ 3·10⁹ docs/source; in decimal
    * the products and Σ ≤ n²·maxlen < 10³² hold to 10¹² docs/source)
    * and exactly one divide + 6-dp round at the end, replayed verbatim
    * by the HUGEINT oracle.
    *
    * Scale shape: ONE keyed aggregate collapses the corpus to the
    * (source, length) histogram (map-side combinable; cells bounded by
    * |sources|·length-domain); the |S|² pair expansion, merged-support
    * union, pair-keyed cumulative windows, and the final fold all run on
    * that bounded table — broadcast equi-joins, no BNLJ, nothing
    * data-proportional after the first shuffle.
    */
  def wassersteinDrift(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.core.CacheScope.persist(
      Tables
        .documents(spark, dir)
        .groupBy(col("source"), col("n_chars").cast("long").as("v"))
        .agg(count(lit(1)).as("c")))
    val n = h.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val pairs = n
      .select(col("source").as("sa"), col("n").as("na"))
      .crossJoin(n.select(col("source").as("sb"), col("n").as("nb")))
      .filter(col("sa") < col("sb"))
    val ptsA = broadcast(pairs)
      .join(h.select(col("source").as("sa"), col("v"), col("c")), "sa")
      .select(col("sa"), col("sb"), col("na"), col("nb"), col("v"),
        col("c").as("ca"), lit(0L).as("cb"))
    val ptsB = broadcast(pairs)
      .join(h.select(col("source").as("sb"), col("v"), col("c")), "sb")
      .select(col("sa"), col("sb"), col("na"), col("nb"), col("v"),
        lit(0L).as("ca"), col("c").as("cb"))
    val w = Window.partitionBy(col("sa"), col("sb")).orderBy(col("v"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ptsA.unionAll(ptsB)
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"), col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      .withColumn("cuma", sum(col("ca")).over(cum))
      .withColumn("cumb", sum(col("cb")).over(cum))
      .withColumn("gap", lead(col("v"), 1).over(w) - col("v"))
      .groupBy(col("sa").as("source_a"), col("sb").as("source_b"),
        col("na").as("n_a"), col("nb").as("n_b"))
      // cumulative counts enter the product as DECIMAL(38,0): a long·long
      // product would wrap silently at 2^63 (~3·10⁹ docs/source) under
      // non-ANSI mode while the HUGEINT oracle stays exact
      .agg(sum(when(col("gap").isNotNull,
        (abs(col("cuma").cast("decimal(38,0)") * col("nb")
          - col("cumb").cast("decimal(38,0)") * col("na")) * col("gap"))
          .cast("decimal(38,0)")).otherwise(lit(0L).cast("decimal(38,0)"))).as("num"))
      .select(
        col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        round(col("num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("w1"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q208 oracle: identical merged-support construction, HUGEINT
    * cumulative products, the same single divide + 6-dp round.
    */
  val wassersteinDriftSql: String =
    """WITH q208h AS MATERIALIZED (
      |  SELECT source, n_chars::BIGINT AS v, count(*)::BIGINT AS c
      |  FROM documents GROUP BY 1, 2),
      |q208n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM q208h GROUP BY 1),
      |q208p AS (
      |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
      |  FROM q208n a, q208n b WHERE a.source < b.source),
      |q208u AS (
      |  SELECT p.sa, p.sb, p.na, p.nb, h.v, h.c AS ca, 0::BIGINT AS cb
      |  FROM q208p p JOIN q208h h ON h.source = p.sa
      |  UNION ALL
      |  SELECT p.sa, p.sb, p.na, p.nb, h.v, 0::BIGINT, h.c
      |  FROM q208p p JOIN q208h h ON h.source = p.sb),
      |q208g AS (
      |  SELECT sa, sb, na, nb, v,
      |    CAST(sum(ca) AS BIGINT) AS ca, CAST(sum(cb) AS BIGINT) AS cb
      |  FROM q208u GROUP BY 1, 2, 3, 4, 5),
      |q208c AS (
      |  SELECT sa, sb, na, nb, v, ca, cb,
      |    CAST(sum(ca) OVER (PARTITION BY sa, sb ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cuma,
      |    CAST(sum(cb) OVER (PARTITION BY sa, sb ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cumb,
      |    lead(v) OVER (PARTITION BY sa, sb ORDER BY v) - v AS gap
      |  FROM q208g)
      |SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b,
      |  round(CAST(sum(CASE WHEN gap IS NOT NULL
      |      THEN abs(cuma * nb - cumb * na) * gap ELSE 0 END) AS DOUBLE)
      |    / (na::DOUBLE * nb::DOUBLE), 6) AS w1
      |FROM q208c
      |GROUP BY sa, sb, na, nb
      |ORDER BY source_a, source_b""".stripMargin

  // --- q211: PSI (population stability index) drift monitor -------------------

  val PsiBucketWidth = 256L
  val PsiEps         = 1e-6

  /** Population Stability Index per source — THE industry-standard drift
    * number (credit scoring, ML monitoring: < 0.1 stable, 0.1–0.25
    * moderate, > 0.25 drifted) completing the drift family: KL (q71) and
    * JS (q196) are its information-theoretic cousins, KS (q137) the
    * sup-gap, W₁ (q208) the metric-space cost — PSI is what the
    * monitoring dashboard an operations team already reads expects.
    * Baseline vs current is the deterministic doc_id hash split (q40's
    * rule, arm = xxhash64 mod 2), so the audit measures the index's
    * NOISE FLOOR on an i.i.d. split — the number to alarm above when the
    * "current" side becomes tomorrow's snapshot. Distributions are
    * [[PsiBucketWidth]]-char length buckets; zero cells clamp to
    * [[PsiEps]] (the standard finite-PSI guard). Small-sample caveat the
    * n_base/n_current columns make visible: with only dozens of docs per
    * source (tiny test SFs) most cells are 0-or-1 and the eps clamp
    * inflates PSI — the i.i.d. noise floor genuinely IS that high there;
    * it collapses as per-source counts grow (sf0.1+).
    *
    * Scale shape: ONE keyed aggregate to the (source, bucket) grain with
    * both halves counted map-side in the same pass; totals broadcast
    * back; PSI terms quantized once to 1e-9 and summed as integers (the
    * q163 rule), bands decided on the INTEGER sum against integer
    * thresholds — no float comparison can flip a band between engines.
    */
  def psiStability(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables
      .documents(spark, dir)
      .select(col("source"), expr(s"n_chars div $PsiBucketWidth").as("bucket"),
        pmod(xxhash64(col("doc_id")), lit(2L)).as("half"))
      .groupBy(col("source"), col("bucket"))
      .agg(
        sum(when(col("half") === 0L, 1L).otherwise(0L)).as("ca"),
        sum(when(col("half") === 1L, 1L).otherwise(0L)).as("cb"))
    val tot = cells.groupBy(col("source"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val pa = greatest(col("ca").cast("double") / col("na").cast("double"), lit(PsiEps))
    val pb = greatest(col("cb").cast("double") / col("nb").cast("double"), lit(PsiEps))
    cells
      .join(broadcast(tot), "source")
      .select(col("source"), col("na"), col("nb"),
        round((pa - pb) * log(pa / pb) * lit(1e9), 0).cast("decimal(38,0)").as("tq"))
      .groupBy(col("source"), col("na"), col("nb"))
      .agg(sum(col("tq")).as("psi_q"))
      .select(
        col("source"),
        col("na").as("n_base"),
        col("nb").as("n_current"),
        round(col("psi_q").cast("double") / lit(1e9), 6).as("psi"),
        when(col("psi_q") < lit(100000000L), "stable")
          .when(col("psi_q") < lit(250000000L), "moderate")
          .otherwise("drifted").as("band"))
      .orderBy(col("source"))
  }

  /** q211 oracle: the emulated xxhash64 arm split, identical epsilon
    * clamp and quantize-once HUGEINT term sums, integer band thresholds.
    */
  lazy val psiStabilitySql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q211in" ->
        s"""(SELECT doc_id, source, n_chars // $PsiBucketWidth AS bucket,
           |  doc_id::HUGEINT AS l FROM documents)""".stripMargin
    )
    val ch = new SqlChain("q211h", "q211in", Seq("doc_id", "source", "bucket", "l"))
    hashLongLevels(ch, toUnsigned("l"), "42", "h")
    ctes ++= ch.ctes
    ctes += ("q211c" ->
      s"""(SELECT source, bucket,
         |    CAST(sum(CASE WHEN (((${toSigned("h")} % 2) + 2) % 2) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN (((${toSigned("h")} % 2) + 2) % 2) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM ${ch.last} GROUP BY 1, 2)""".stripMargin)
    ctes += ("q211t" ->
      """(SELECT source, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |  FROM q211c GROUP BY 1)""".stripMargin)
    ctes += ("q211q" ->
      s"""(SELECT c.source, t.na, t.nb,
         |    CAST(round(
         |      (greatest(c.ca::DOUBLE / t.na::DOUBLE, $PsiEps)
         |        - greatest(c.cb::DOUBLE / t.nb::DOUBLE, $PsiEps))
         |      * ln(greatest(c.ca::DOUBLE / t.na::DOUBLE, $PsiEps)
         |           / greatest(c.cb::DOUBLE / t.nb::DOUBLE, $PsiEps)) * 1e9, 0)
         |      AS HUGEINT) AS tq
         |  FROM q211c c JOIN q211t t USING (source))""".stripMargin)
    ctes += ("q211a" ->
      """(SELECT source, na, nb, CAST(sum(tq) AS HUGEINT) AS psi_q
        |  FROM q211q GROUP BY 1, 2, 3)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT source, na AS n_base, nb AS n_current,
        |  round(CAST(psi_q AS DOUBLE) / 1e9, 6) AS psi,
        |  CASE WHEN psi_q < 100000000 THEN 'stable'
        |       WHEN psi_q < 250000000 THEN 'moderate'
        |       ELSE 'drifted' END AS band
        |FROM q211a
        |ORDER BY source""".stripMargin)
  }

  // --- q216: split-conformal quality-gate calibration --------------------------

  /** Miscoverage levels the gate is calibrated at. */
  val ConformalAlphas: Seq[Double] = Seq(0.01, 0.05, 0.10)

  /** Split-conformal calibration of the q22 stop-ratio signal: on the
    * held-out CALIBRATION split (q40's 'val'), the threshold
    * `t_α = ⌈(n_cal+1)(1−α)⌉-th smallest score` carries the
    * finite-sample guarantee `P(score ≤ t_α) ≥ 1−α` for exchangeable
    * data (Vovk's split-conformal bound — no distributional assumption,
    * no interpolation, an exact order statistic); the 'test' split then
    * measures EMPIRICAL coverage against the target. q74 sweeps
    * thresholds descriptively and q127 audits decile predictiveness —
    * this is the one that ships a threshold with a guarantee attached,
    * and the coverage column is the "is exchangeability actually
    * holding?" tripwire (drift between splits shows up as coverage
    * falling below target).
    *
    * Scale shape: scores are one map-side projection; the calibration
    * order statistic rides the (value-histogram + [[groupedPrefixSum]])
    * machinery — range-partitioned slices + broadcast offsets, never a
    * global window; all three α-cuts come from ONE pass (q125's exploded
    * shape); holdout coverage is a broadcast of the 3-row threshold
    * table against the test scan. Determinism: `(n+1)(1−α)` is the same
    * IEEE product in both engines, thresholds are exact data values,
    * coverage counts are integers.
    */
  def conformalGate(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TrainingOps.{splitBucketCol, splitNameCol}
    val scored = graft.core.CacheScope.persist(
      TextOps.qualityScored(spark, dir)
        .select(col("doc_id"), col("stop_ratio").as("v"))
        .withColumn("split", splitNameCol(splitBucketCol(col("doc_id"))))
        .filter(col("split").isin("val", "test")))
    val alphasArr = ConformalAlphas.map(a => s"${a}D").mkString("array(", ", ", ")")
    val ranked = groupedPrefixSum(
      scored.filter(col("split") === "val").groupBy(col("v")).agg(count(lit(1)).as("c")),
      Nil, Seq("v"), "c", "cum", cacheInput = false)
      .withColumnRenamed("n_s", "n_cal")
    val thresholds = ranked
      .withColumn("alpha", explode(expr(alphasArr)))
      .filter(col("cum") >=
        least(col("n_cal"),
          ceil((col("n_cal") + lit(1L)).cast("double") * (lit(1.0) - col("alpha")))))
      .groupBy(col("alpha"))
      .agg(min(col("v")).as("t"), max(col("n_cal")).as("n_cal"))
    val test = scored.filter(col("split") === "test")
    test
      .crossJoin(broadcast(thresholds))
      .groupBy(col("alpha"), col("t"), col("n_cal"))
      .agg(
        count(lit(1)).as("n_test"),
        sum(when(col("v") <= col("t"), 1L).otherwise(0L)).as("n_covered"))
      .select(
        col("alpha"), col("n_cal"), col("n_test"),
        // published EXACTLY (an order statistic is a data value — the
        // stop-ratio divide is IEEE-exact in both engines), so the E53
        // stream monitor gating on the published column is bit-identical
        // to the batch guarantee leg; a 6-dp display round here once made
        // boundary scores disagree between the two legs
        col("t").as("threshold"),
        col("n_covered"),
        round(col("n_covered").cast("double") / col("n_test").cast("double"), 6)
          .as("coverage"),
        (lit(1.0) - col("alpha")).as("target"))
      .orderBy(col("alpha"))
  }

  // --- q220: exact AUC of the quality signal vs near-dup ground truth -----------

  /** Threshold-free discrimination audit: the exact Mann-Whitney AUC (with
    * midrank tie handling) of q22's stop-ratio signal against verified
    * near-dup membership, plus the Gini (2·AUC−1) — ONE number for "does
    * this signal separate duplicated from clean text at all", upstream of
    * q74's per-threshold operating points and q127's decile calibration
    * (those answer "where to cut"; this answers "is there anything to
    * cut on"; AUC ≈ 0.5 says spend elsewhere). The U statistic doubles to
    * stay integer under ties: `U₂ = Σ_v np_v·(2·negBelow_v + nn_v)`,
    * AUC = U₂ / (2·n⁺·n⁻) — EXACT, no sampling, no binning.
    *
    * Scale shape: dup membership is the session-shared verified-pair
    * stage; the corpus collapses to the (value → pos/neg count) histogram
    * in ONE keyed aggregate; the cumulative negative count rides
    * [[groupedPrefixSum]] (range-partitioned slices + broadcast offsets,
    * never a global window); the U fold is a 1-row DECIMAL(38,0) sum
    * (n⁺·n⁻ products overflow a long past ~3·10⁹ docs). Integers until
    * two guarded divide-rounds.
    */
  def signalAuc(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextOps.ngramJaccardPairs(spark, dir)
    val dups = pairs
      .select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val hist = TextOps
      .qualityScored(spark, dir)
      .select(col("doc_id"), col("stop_ratio").as("v"))
      .join(dups.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
      .select(col("v"), coalesce(col("is_dup"), lit(false)).as("pos"))
      .groupBy(col("v"))
      .agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
    groupedPrefixSum(hist, Nil, Seq("v"), "nn", "cumn", cacheInput = false)
      .withColumnRenamed("n_s", "tn")
      .agg(
        sum(col("np")).as("n_pos"),
        max(col("tn")).as("n_neg"),
        sum(expr("CAST(np AS DECIMAL(38,0)) * (2 * (cumn - nn) + nn)")).as("u2"))
      .select(
        col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("double"))
          .otherwise(round(col("u2").cast("double")
            / (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("auc"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("double"))
          .otherwise(round(
            (col("u2").cast("double")
              - col("n_pos").cast("double") * col("n_neg").cast("double"))
              / (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("gini"))
  }

  /** Oracle: exact all-pairs dup truth (q127's CTE), q22's score SQL, the
    * identical doubled-U integer fold (HUGEINT) and IEEE ratio shapes.
    */
  lazy val signalAucSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q220d AS (SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}
       |    UNION ALL SELECT doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold})),
       |q220s AS (SELECT q.stop_ratio AS v, (d.doc_id IS NOT NULL) AS pos
       |          FROM (${TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")}) q
       |          LEFT JOIN q220d d USING (doc_id)),
       |q220h AS (SELECT v,
       |            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |            CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
       |          FROM q220s GROUP BY v),
       |q220c AS (SELECT np, nn, sum(nn) OVER (ORDER BY v) AS cumn FROM q220h),
       |q220a AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |            (SELECT CAST(sum(nn) AS BIGINT) FROM q220h) AS n_neg,
       |            sum(np::HUGEINT * (2 * (cumn - nn) + nn)) AS u2
       |          FROM q220c)
       |SELECT n_pos, n_neg,
       |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
       |    ELSE round(u2::DOUBLE / (2.0 * n_pos::DOUBLE * n_neg::DOUBLE), 6) END AS auc,
       |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
       |    ELSE round((u2::DOUBLE - n_pos::DOUBLE * n_neg::DOUBLE)
       |      / (n_pos::DOUBLE * n_neg::DOUBLE), 6) END AS gini
       |FROM q220a""".stripMargin

  // --- q224: average precision of the quality signal vs dup truth --------------

  /** Average precision (the exact area under the precision-recall curve,
    * `AP = (1/n⁺) Σ_{positives} P@k`) of q22's stop-ratio signal against
    * verified near-dup membership, plus the prevalence baseline a random
    * ranker scores. q220's AUC weights every negative equally — on a
    * rare-positive corpus (dups are usually <10%) AUC can read 0.9 while
    * the top of the ranked list is still junk; AP is the rank metric that
    * only looks at the top, which is what a "review the K most suspect
    * docs" triage queue actually consumes. AP ≫ prevalence says the
    * signal concentrates dups at the head; AP ≈ prevalence says the
    * pretty AUC is all tail.
    *
    * Scale shape: both global ranks ride [[strictlyLess]] (range-partition
    * + keyed window + broadcast offsets — never a single-task global
    * window): once over the corpus for the running rank k, once over the
    * positives alone for the running positive count j (P@k = j/k exactly,
    * no prefix-sum pass needed). Determinism: the per-positive P@k terms
    * micro-quantize to integers before the order-free sum; one
    * divide-round per output leg.
    */
  def avgPrecision(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextOps.ngramJaccardPairs(spark, dir)
    val dups = pairs
      .select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val scored = TextOps
      .qualityScored(spark, dir)
      .select(col("doc_id"), col("stop_ratio").as("v"))
      .join(dups.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        (-col("v")).as("nv"),
        coalesce(col("is_dup"), lit(false)).as("pos"))
    val ranked = graft.core.CacheScope.persist(
      strictlyLess(scored, Nil, Seq("nv", "doc_id"), "lt")
        .select(col("doc_id"), col("nv"), col("pos"), (col("lt") + 1L).as("k")))
    val totals = ranked
      .groupBy()
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
    val apAgg = strictlyLess(
      ranked.filter(col("pos")).select(col("nv"), col("doc_id"), col("k")),
      Nil, Seq("nv", "doc_id"), "plt", cacheInput = false)
      .select((col("plt") + 1L).as("j"), col("k"))
      .groupBy()
      .agg(sum(expr("CAST(round(1000000.0 * j / k, 0) AS BIGINT)")).as("s"))
    totals
      .crossJoin(apAgg)
      .selectExpr(
        "n", "n_pos",
        "CASE WHEN n_pos > 0 THEN round(CAST(s AS DOUBLE) / 1000000.0" +
          " / CAST(n_pos AS DOUBLE), 6) END AS avg_precision",
        "round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS prevalence")
  }

  /** Oracle: q220's dup truth and score CTEs, ROW_NUMBER ranks with the
    * identical (−v, doc_id) order, and the same micro-quantized P@k fold.
    */
  lazy val avgPrecisionSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q224d AS (SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}
       |    UNION ALL SELECT doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold})),
       |q224s AS (SELECT q.doc_id, -q.stop_ratio AS nv, (d.doc_id IS NOT NULL) AS pos
       |          FROM (${TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")}) q
       |          LEFT JOIN q224d d USING (doc_id)),
       |q224r AS (SELECT doc_id, nv, pos,
       |            ROW_NUMBER() OVER (ORDER BY nv, doc_id) AS k FROM q224s),
       |q224p AS (SELECT ROW_NUMBER() OVER (ORDER BY nv, doc_id) AS j, k
       |          FROM q224r WHERE pos),
       |q224t AS (SELECT count(*)::BIGINT AS n,
       |            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
       |          FROM q224s),
       |q224a AS (SELECT CAST(sum(CAST(round(1000000.0 * j / k, 0) AS BIGINT)) AS BIGINT) AS s
       |          FROM q224p)
       |SELECT n, n_pos,
       |  CASE WHEN n_pos > 0 THEN round(CAST(s AS DOUBLE) / 1000000.0
       |    / CAST(n_pos AS DOUBLE), 6) END AS avg_precision,
       |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS prevalence
       |FROM q224t, q224a""".stripMargin

  // --- q225: permutation p-values + Benjamini-Hochberg FDR gate -----------------

  /** Permutation replicates per metric. */
  val FdrPerms = 100L

  /** BH target FDR as an integer percent (α = 0.10) — kept integral so the
    * step-up comparison is exact cross-multiplied arithmetic.
    */
  val FdrAlphaPct = 10L

  /** Multiple-testing-controlled experiment screening: per event-type
    * metric, a PERMUTATION p-value of the q126 arm uplift (re-randomize
    * the user→arm coin [[FdrPerms]] times via a rep-indexed hash;
    * `p = (1 + #{|u_b| ≥ |u_obs|})/(B_valid + 1)`, the add-one
    * Monte-Carlo estimator), then the Benjamini-Hochberg step-up at
    * α = [[FdrAlphaPct]]% across the metric family — rank p ascending,
    * reject through the largest r with `p_(r) ≤ r·α/m`. q126 reports
    * each metric's CI in isolation; screening five metrics at α = 0.1
    * each inflates the family false-positive rate toward 40%, which is
    * how experiment dashboards end up shipping noise — BH is the
    * standard correction, and the permutation p needs NO normal-CDF
    * (the engines share no erf, and the u statistics are heavy-tailed
    * user sums anyway).
    *
    * Scale shape: q126's bootstrap skeleton — the user×type table
    * persists once, the ×[[FdrPerms]] expansion is a map-side broadcast
    * crossJoin with hash-derived arms (no extra shuffle), per-(type,rep)
    * sums are ONE keyed map-side-combinable aggregate; the hypothesis
    * table is ≤|event types| rows, so the BH rank is an exact integer
    * cross-multiplied self-join on a broadcast-tiny table (p-values with
    * DIFFERENT valid-rep denominators compare as a·b' vs a'·b — no
    * float ordering), and the step-up threshold `a·100·m ≤ r·α%·b` is
    * pure integers. Doubles appear ONLY in the (identically-shaped) u
    * comparisons and the final display rounds.
    */
  def fdrGate(spark: SparkSession, dir: String): DataFrame = {
    val ug = graft.core.CacheScope.persist(
      Tables
        .events(spark, dir)
        .select(col("user_id"), col("event_type"), col("value").cast("decimal(18,2)").as("v"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_u"), sum(col("v")).as("sv_u")))
    val obs = ug
      .withColumn("arm", pmod(xxhash64(col("user_id")), lit(2L)))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("arm") === 0, col("n_u"))).as("nc"),
        sum(when(col("arm") === 1, col("n_u"))).as("nt"),
        sum(when(col("arm") === 0, col("sv_u"))).as("svc"),
        sum(when(col("arm") === 1, col("sv_u"))).as("svt"))
      .filter(col("nt") > 0 && col("nc") > 0)
      .select(
        col("event_type"),
        (col("svt").cast("double") / col("nt").cast("double")
          - col("svc").cast("double") / col("nc").cast("double")).as("u_obs"))
    val reps = spark.range(FdrPerms).select(col("id").as("rep"))
    val perm = ug
      .crossJoin(broadcast(reps))
      .withColumn("parm",
        pmod(xxhash64(col("user_id") * lit(1024L) + col("rep")), lit(2L)))
      .groupBy(col("event_type"), col("rep"))
      .agg(
        sum(when(col("parm") === 0, col("n_u"))).as("nc"),
        sum(when(col("parm") === 1, col("n_u"))).as("nt"),
        sum(when(col("parm") === 0, col("sv_u"))).as("svc"),
        sum(when(col("parm") === 1, col("sv_u"))).as("svt"))
      .filter(col("nt") > 0 && col("nc") > 0)
      .select(
        col("event_type"),
        (col("svt").cast("double") / col("nt").cast("double")
          - col("svc").cast("double") / col("nc").cast("double")).as("u_r"))
    val pvals = perm
      .join(broadcast(obs), "event_type")
      .groupBy(col("event_type"), col("u_obs"))
      .agg(
        count(lit(1)).as("n_valid"),
        sum(when(abs(col("u_r")) >= abs(col("u_obs")), 1L).otherwise(0L)).as("n_ge"))
      .select(
        col("event_type"), col("u_obs"), col("n_valid"),
        (col("n_ge") + 1L).as("a"), (col("n_valid") + 1L).as("b"))
    val hyp = graft.core.CacheScope.persist(pvals)
    val ranked = hyp
      .selectExpr("event_type AS et_s", "u_obs", "n_valid", "a AS a_s", "b AS b_s")
      .join(
        broadcast(hyp.selectExpr("event_type AS et_x", "a AS a_x", "b AS b_x")),
        expr("a_x * b_s < a_s * b_x OR (a_x * b_s = a_s * b_x AND et_x <= et_s)"))
      .groupBy(col("et_s"), col("u_obs"), col("n_valid"), col("a_s"), col("b_s"))
      .agg(count(lit(1)).as("r"))
      .crossJoin(broadcast(hyp.groupBy().agg(count(lit(1)).as("m"))))
    val kstar = ranked
      .groupBy()
      .agg(max(when(expr(s"a_s * 100 * m <= r * $FdrAlphaPct * b_s"), col("r")))
        .as("kstar"))
    ranked
      .crossJoin(broadcast(kstar))
      .selectExpr(
        "et_s AS event_type",
        "round(u_obs, 6) AS uplift_obs",
        "n_valid AS n_perms",
        "round(CAST(a_s AS DOUBLE) / CAST(b_s AS DOUBLE), 6) AS p_value",
        "r AS bh_rank",
        "CASE WHEN kstar IS NOT NULL AND r <= kstar THEN true ELSE false END AS rejected")
      .orderBy(col("event_type"))
  }

  /** q225 oracle: both hash chains through [[graft.functions.DuckHash]]
    * (observed arm on user_id, permuted arm on user_id·1024+rep), the
    * identical IEEE u shapes, and the same integer cross-multiplied BH
    * rank/step-up.
    */
  lazy val fdrGateSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q225u" ->
        """(SELECT user_id, event_type, count(*)::BIGINT AS n_u,
          |  sum(CAST(value AS DECIMAL(18,2))) AS sv_u
          | FROM events GROUP BY user_id, event_type)""".stripMargin,
      "q225du" -> "(SELECT DISTINCT user_id, user_id::HUGEINT AS l FROM q225u)"
    )
    val chA = new SqlChain("q225ha", "q225du", Seq("user_id", "l"))
    hashLongLevels(chA, toUnsigned("l"), "42", "ha")
    ctes ++= chA.ctes
    ctes += ("q225arm" ->
      s"(SELECT user_id, (((${toSigned("ha")} % 2) + 2) % 2)::BIGINT AS arm FROM ${chA.last})")
    ctes += ("q225g" ->
      s"""(SELECT u.user_id, r.rep, (u.user_id * 1024 + r.rep)::HUGEINT AS l2
         | FROM (SELECT DISTINCT user_id FROM q225u) u,
         |   (SELECT unnest(range(0, $FdrPerms))::BIGINT AS rep) r)""".stripMargin)
    val chP = new SqlChain("q225hp", "q225g", Seq("user_id", "rep", "l2"))
    hashLongLevels(chP, toUnsigned("l2"), "42", "hp")
    ctes ++= chP.ctes
    ctes += ("q225parm" ->
      s"""(SELECT user_id, rep, (((${toSigned("hp")} % 2) + 2) % 2)::BIGINT AS parm
         | FROM ${chP.last})""".stripMargin)
    ctes += ("q225o" ->
      """(SELECT event_type,
        |    svt::DOUBLE / nt::DOUBLE - svc::DOUBLE / nc::DOUBLE AS u_obs
        |  FROM (SELECT u.event_type,
        |      sum(CASE WHEN a.arm = 0 THEN u.n_u END)::BIGINT AS nc,
        |      sum(CASE WHEN a.arm = 1 THEN u.n_u END)::BIGINT AS nt,
        |      sum(CASE WHEN a.arm = 0 THEN u.sv_u END) AS svc,
        |      sum(CASE WHEN a.arm = 1 THEN u.sv_u END) AS svt
        |    FROM q225u u JOIN q225arm a USING (user_id) GROUP BY 1)
        |  WHERE nt > 0 AND nc > 0)""".stripMargin)
    ctes += ("q225r" ->
      """(SELECT event_type, rep,
        |    svt::DOUBLE / nt::DOUBLE - svc::DOUBLE / nc::DOUBLE AS u_r
        |  FROM (SELECT u.event_type, p.rep,
        |      sum(CASE WHEN p.parm = 0 THEN u.n_u END)::BIGINT AS nc,
        |      sum(CASE WHEN p.parm = 1 THEN u.n_u END)::BIGINT AS nt,
        |      sum(CASE WHEN p.parm = 0 THEN u.sv_u END) AS svc,
        |      sum(CASE WHEN p.parm = 1 THEN u.sv_u END) AS svt
        |    FROM q225u u JOIN q225parm p USING (user_id) GROUP BY 1, 2)
        |  WHERE nt > 0 AND nc > 0)""".stripMargin)
    ctes += ("q225p" ->
      """(SELECT r.event_type, o.u_obs, count(*)::BIGINT AS n_valid,
        |    (CAST(sum(CASE WHEN abs(r.u_r) >= abs(o.u_obs) THEN 1 ELSE 0 END) AS BIGINT)
        |      + 1) AS a,
        |    (count(*)::BIGINT + 1) AS b
        |  FROM q225r r JOIN q225o o USING (event_type)
        |  GROUP BY 1, 2)""".stripMargin)
    ctes += ("q225k" ->
      """(SELECT s.event_type AS et_s, s.u_obs, s.n_valid, s.a AS a_s, s.b AS b_s,
        |    count(*)::BIGINT AS r
        |  FROM q225p s JOIN q225p x
        |    ON x.a * s.b < s.a * x.b
        |    OR (x.a * s.b = s.a * x.b AND x.event_type <= s.event_type)
        |  GROUP BY 1, 2, 3, 4, 5)""".stripMargin)
    ctes += ("q225m" -> "(SELECT count(*)::BIGINT AS m FROM q225p)")
    ctes += ("q225s" ->
      s"""(SELECT max(CASE WHEN a_s * 100 * m <= r * $FdrAlphaPct * b_s THEN r END) AS kstar
         | FROM q225k, q225m)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT et_s AS event_type,
        |  round(u_obs, 6) AS uplift_obs,
        |  n_valid AS n_perms,
        |  round(CAST(a_s AS DOUBLE) / CAST(b_s AS DOUBLE), 6) AS p_value,
        |  r AS bh_rank,
        |  CASE WHEN kstar IS NOT NULL AND r <= kstar THEN true ELSE false END AS rejected
        |FROM q225k, q225s
        |ORDER BY et_s""".stripMargin)
  }

  // --- q226: CUPED variance-reduced uplift --------------------------------------

  /** CUPED (Deng et al. 2013) variance-reduced experiment readout: per
    * event-type metric, each user's PRE-period activity (days 1–15, the
    * calendar first half — a fixed rule, never a data-dependent scalar)
    * is the covariate X for their POST-period metric Y (days 16+);
    * `θ = cov(X,Y)/var(X)` pooled across arms, the adjusted uplift
    * `Δ_cuped = Δ_raw − θ·(X̄_t − X̄_c)`, and the theoretical variance
    * reduction `ρ² = cov²/(var_x·var_y)` — the standard trick that makes
    * a fixed-traffic experiment read like one 1/(1−ρ²) times larger,
    * because pre-period behavior explains away between-user variance the
    * randomization has to average over. q126's bootstrap CI prices the
    * noise; this REMOVES the predictable part of it.
    *
    * Scale shape: ONE keyed (user, type) aggregate pivots pre/post into
    * integer cent sums (DECIMAL(18,2)·100 → BIGINT, lossless); the per-
    * type moment fold is ONE keyed aggregate with cross-products in
    * DECIMAL(38,0) (cent-sum products overflow a long past ~10⁹ users ×
    * 10⁶ cents); θ/ρ²/uplift arithmetic runs on the ≤|types|-row table
    * in identically-shaped IEEE doubles, one display round per column.
    */
  def cupedUplift(spark: SparkSession, dir: String): DataFrame = {
    val ux = Tables
      .events(spark, dir)
      .select(
        col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"),
        (dayofmonth(col("ts")) <= 15).as("pre"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
        sum(when(col("pre"), 0L).otherwise(col("c"))).as("y"))
      .withColumn("arm", pmod(xxhash64(col("user_id")), lit(2L)))
    ux
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sxt"),
        sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sxc"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("syt"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("syc"))
      .filter(col("nt") > 0 && col("nc") > 0)
      .selectExpr(
        "event_type", "n", "nt", "nc",
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv",
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx",
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy",
        "CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) - CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE) AS dx",
        "CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE) AS dy")
      .selectExpr(
        "event_type", "n AS n_users", "nt AS n_treat", "nc AS n_control",
        "CASE WHEN vx > 0 THEN round(cv / vx, 6) END AS theta",
        "round(dy / 100.0, 6) AS uplift_raw",
        "CASE WHEN vx > 0 THEN round((dy - cv / vx * dx) / 100.0, 6) END AS uplift_cuped",
        "CASE WHEN vx > 0 AND vy > 0 THEN round(cv * cv / (vx * vy), 6) END" +
          " AS var_reduction")
      .orderBy(col("event_type"))
  }

  /** q226 oracle: the arm hash through [[graft.functions.DuckHash]], the
    * identical lossless cent pivot, HUGEINT cross-products, and textually
    * identical θ/ρ²/uplift arithmetic.
    */
  lazy val cupedUpliftSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q226x" ->
        """(SELECT user_id, event_type,
          |    CAST(sum(CASE WHEN EXTRACT(day FROM ts) <= 15
          |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END)
          |      AS BIGINT) AS x,
          |    CAST(sum(CASE WHEN EXTRACT(day FROM ts) <= 15
          |      THEN 0 ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END)
          |      AS BIGINT) AS y
          |  FROM events GROUP BY 1, 2)""".stripMargin,
      "q226du" -> "(SELECT DISTINCT user_id, user_id::HUGEINT AS l FROM q226x)"
    )
    val chA = new SqlChain("q226ha", "q226du", Seq("user_id", "l"))
    hashLongLevels(chA, toUnsigned("l"), "42", "ha")
    ctes ++= chA.ctes
    ctes += ("q226arm" ->
      s"(SELECT user_id, (((${toSigned("ha")} % 2) + 2) % 2)::BIGINT AS arm FROM ${chA.last})")
    ctes += ("q226a" ->
      """(SELECT u.event_type,
        |    count(*)::BIGINT AS n,
        |    CAST(sum(u.x) AS BIGINT) AS sx, CAST(sum(u.y) AS BIGINT) AS sy,
        |    sum(u.x::HUGEINT * u.x) AS sxx, sum(u.x::HUGEINT * u.y) AS sxy,
        |    sum(u.y::HUGEINT * u.y) AS syy,
        |    CAST(sum(CASE WHEN a.arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN a.arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN a.arm = 1 THEN u.x ELSE 0 END) AS BIGINT) AS sxt,
        |    CAST(sum(CASE WHEN a.arm = 0 THEN u.x ELSE 0 END) AS BIGINT) AS sxc,
        |    CAST(sum(CASE WHEN a.arm = 1 THEN u.y ELSE 0 END) AS BIGINT) AS syt,
        |    CAST(sum(CASE WHEN a.arm = 0 THEN u.y ELSE 0 END) AS BIGINT) AS syc
        |  FROM q226x u JOIN q226arm a USING (user_id)
        |  GROUP BY 1)""".stripMargin)
    ctes += ("q226d" ->
      """(SELECT event_type, n, nt, nc,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
        |    CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) - CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE) AS dx,
        |    CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE) AS dy
        |  FROM q226a WHERE nt > 0 AND nc > 0)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT event_type, n AS n_users, nt AS n_treat, nc AS n_control,
        |  CASE WHEN vx > 0 THEN round(cv / vx, 6) END AS theta,
        |  round(dy / 100.0, 6) AS uplift_raw,
        |  CASE WHEN vx > 0 THEN round((dy - cv / vx * dx) / 100.0, 6) END AS uplift_cuped,
        |  CASE WHEN vx > 0 AND vy > 0 THEN round(cv * cv / (vx * vy), 6) END AS var_reduction
        |FROM q226d
        |ORDER BY event_type""".stripMargin)
  }

  // --- q230: Neyman optimal stratified-sample allocation -------------------------

  /** Total sample budget the allocation plan spends. */
  val NeymanBudget = 1000L

  /** Neyman-optimal stratified sampling plan (Neyman 1934): allocate a
    * fixed audit budget of [[NeymanBudget]] draws across source strata
    * proportional to `N_h·S_h` (stratum size × stratum stddev of
    * n_chars), beside the proportional allocation q45 implements — plus
    * the _ALL summary row pricing both designs' estimator variance
    * (`V_prop = ΣW_h·S_h²/n`, `V_ney = (ΣW_h·S_h)²/n`) and the variance
    * gain `1 − V_ney/V_prop`. The planner a QA/labeling campaign runs
    * BEFORE q45 draws anything: when strata differ in spread (a wild
    * crawl source vs a uniform template source), proportional sampling
    * wastes budget on the homogeneous strata; the gain column says
    * exactly how much a Neyman re-weighting buys. Singleton strata
    * (n < 2, no variance estimate) are excluded from the plan and
    * reported via the count gap.
    *
    * Scale shape: ONE keyed aggregate collapses the corpus to ≤|sources|
    * strata rows (integer Σy/Σy² with the square in DECIMAL(38,0) — q174's
    * overflow rule); S_h is IEEE sqrt of an identically-shaped variance;
    * the cross-strata folds `ΣN_h·S_h` / `ΣN_h·S_h²` ride index-ordered
    * array folds on the collected ≤|sources|-row table (the SURVEY §4
    * ordered-fold rule — float sums are order-sensitive, so both engines
    * fold in source order), and every allocation/variance column derives
    * from those two scalars with one divide-round per output.
    */
  def neymanAlloc(spark: SparkSession, dir: String): DataFrame = {
    val strata = graft.core.CacheScope.persist(
      docs(spark, dir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("nh"),
          sum(col("n_chars").cast("long")).as("sy"),
          sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("syy"))
        .filter(col("nh") >= 2L)
        .selectExpr(
          "source", "nh",
          "(CAST(nh AS DOUBLE) * CAST(syy AS DOUBLE)" +
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))" +
            " / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE)) AS s2h")
        .selectExpr("source", "nh", "s2h", "sqrt(s2h) AS sh")
        .selectExpr("*",
          "CAST(nh AS DOUBLE) * sh AS nsh",
          "CAST(nh AS DOUBLE) * s2h AS ns2h"))
    val folds = strata
      .groupBy()
      .agg(
        sum(col("nh")).as("nbig"),
        count(lit(1)).as("n_strata"),
        expr("aggregate(array_sort(collect_list(struct(source, nsh))), " +
          "CAST(0.0 AS DOUBLE), (a, x) -> a + x.nsh)").as("d"),
        expr("aggregate(array_sort(collect_list(struct(source, ns2h))), " +
          "CAST(0.0 AS DOUBLE), (a, x) -> a + x.ns2h)").as("d2"))
    val perStratum = strata
      .crossJoin(broadcast(folds))
      .selectExpr(
        "source",
        "nh AS n_rows",
        "round(sh, 6) AS stddev",
        s"CASE WHEN d > 0 THEN CAST(round($NeymanBudget.0" +
          " * (CAST(nh AS DOUBLE) * sh) / d, 0) AS BIGINT) END AS alloc_neyman",
        s"CAST(round($NeymanBudget.0 * CAST(nh AS DOUBLE) / CAST(nbig AS DOUBLE), 0)" +
          " AS BIGINT) AS alloc_prop",
        "CAST(NULL AS DOUBLE) AS v_prop",
        "CAST(NULL AS DOUBLE) AS v_neyman",
        "CAST(NULL AS DOUBLE) AS variance_gain")
    val summary = folds
      .selectExpr(
        "'_ALL' AS source",
        "nbig AS n_rows",
        "CAST(NULL AS DOUBLE) AS stddev",
        "CAST(NULL AS BIGINT) AS alloc_neyman",
        "CAST(NULL AS BIGINT) AS alloc_prop",
        s"round((d2 / CAST(nbig AS DOUBLE)) / $NeymanBudget.0, 6) AS v_prop",
        s"round((d / CAST(nbig AS DOUBLE)) * (d / CAST(nbig AS DOUBLE))" +
          s" / $NeymanBudget.0, 6) AS v_neyman",
        "CASE WHEN d2 > 0 THEN round(1.0 - ((d / CAST(nbig AS DOUBLE))" +
          " * (d / CAST(nbig AS DOUBLE))) / (d2 / CAST(nbig AS DOUBLE)), 6) END" +
          " AS variance_gain")
    perStratum.unionByName(summary).orderBy(col("source"))
  }

  /** q230 oracle: identical strata moments, the same source-ordered
    * `list_reduce` folds, and textually identical allocation/variance
    * arithmetic.
    */
  lazy val neymanAllocSql: String =
    s"""WITH q230s AS MATERIALIZED (
       |  SELECT source, nh, s2h, sqrt(s2h) AS sh FROM (
       |    SELECT source, nh,
       |      (CAST(nh AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
       |        / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE)) AS s2h
       |    FROM (
       |      SELECT source, count(*)::BIGINT AS nh,
       |        CAST(sum(n_chars::BIGINT) AS BIGINT) AS sy,
       |        sum(n_chars::HUGEINT * n_chars) AS syy
       |      FROM documents GROUP BY 1)
       |    WHERE nh >= 2)),
       |q230f AS (
       |  SELECT CAST(sum(nh) AS BIGINT) AS nbig, count(*)::BIGINT AS n_strata,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(nh AS DOUBLE) * sh ORDER BY source)), (a, b) -> a + b) AS d,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(nh AS DOUBLE) * s2h ORDER BY source)), (a, b) -> a + b) AS d2
       |  FROM q230s)
       |SELECT source, n_rows, stddev, alloc_neyman, alloc_prop, v_prop, v_neyman,
       |  variance_gain
       |FROM (
       |  SELECT s.source, s.nh AS n_rows, round(s.sh, 6) AS stddev,
       |    CASE WHEN f.d > 0 THEN CAST(round($NeymanBudget.0
       |      * (CAST(s.nh AS DOUBLE) * s.sh) / f.d, 0) AS BIGINT) END AS alloc_neyman,
       |    CAST(round($NeymanBudget.0 * CAST(s.nh AS DOUBLE)
       |      / CAST(f.nbig AS DOUBLE), 0) AS BIGINT) AS alloc_prop,
       |    CAST(NULL AS DOUBLE) AS v_prop,
       |    CAST(NULL AS DOUBLE) AS v_neyman,
       |    CAST(NULL AS DOUBLE) AS variance_gain
       |  FROM q230s s, q230f f
       |  UNION ALL
       |  SELECT '_ALL', f.nbig, CAST(NULL AS DOUBLE),
       |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       |    round((f.d2 / CAST(f.nbig AS DOUBLE)) / $NeymanBudget.0, 6),
       |    round((f.d / CAST(f.nbig AS DOUBLE)) * (f.d / CAST(f.nbig AS DOUBLE))
       |      / $NeymanBudget.0, 6),
       |    CASE WHEN f.d2 > 0 THEN round(1.0 - ((f.d / CAST(f.nbig AS DOUBLE))
       |      * (f.d / CAST(f.nbig AS DOUBLE))) / (f.d2 / CAST(f.nbig AS DOUBLE)), 6) END
       |  FROM q230f f)
       |ORDER BY source""".stripMargin

  // --- q231: covariate-balance SMD audit ----------------------------------------

  /** The conventional imbalance trip level (Austin 2009). */
  val SmdTrip = 0.1

  /** Covariate-balance audit of the experiment assignment: per event-type
    * metric, the standardized mean difference
    * `SMD = (X̄_t − X̄_c) / √((s²_t + s²_c)/2)` of the PRE-period
    * covariate (q226's X — calendar days 1–15 activity, fixed before any
    * treatment effect can exist) between the two hash arms, with the
    * conventional `|SMD| ≤ 0.1` verdict. q178's SRM gate catches broken
    * assignment by COUNT; this catches it by COMPOSITION — a coin that
    * passes SRM can still land the heavy users on one side, which biases
    * Δ and silently breaks q226's θ (CUPED assumes the covariate is
    * balanced). The pre-experiment health check every readout should
    * gate on.
    *
    * Scale shape: q226's ONE keyed (user, type) pivot to integer cents,
    * then ONE ≤|types|-row moment aggregate (squares in DECIMAL(38,0));
    * means/variances/SMD in identically-shaped IEEE doubles on exact
    * integer inputs; the verdict compares the RAW double (bit-identical
    * both legs) so no rounded value ever decides it.
    */
  def smdBalance(spark: SparkSession, dir: String): DataFrame = {
    val ux = Tables
      .events(spark, dir)
      .select(
        col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"),
        (dayofmonth(col("ts")) <= 15).as("pre"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"))
      .withColumn("arm", pmod(xxhash64(col("user_id")), lit(2L)))
    ux
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sxt"),
        sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sxc"),
        sum(when(col("arm") === 1, expr("CAST(x AS DECIMAL(38,0)) * x"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sxxt"),
        sum(when(col("arm") === 0, expr("CAST(x AS DECIMAL(38,0)) * x"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sxxc"))
      .filter(col("nt") >= 2L && col("nc") >= 2L)
      .selectExpr(
        "event_type", "nt", "nc",
        "CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) AS mt",
        "CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE) AS mc",
        "(CAST(nt AS DOUBLE) * CAST(sxxt AS DOUBLE)" +
          " - CAST(sxt AS DOUBLE) * CAST(sxt AS DOUBLE))" +
          " / (CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE)) AS vt",
        "(CAST(nc AS DOUBLE) * CAST(sxxc AS DOUBLE)" +
          " - CAST(sxc AS DOUBLE) * CAST(sxc AS DOUBLE))" +
          " / (CAST(nc AS DOUBLE) * CAST(nc - 1 AS DOUBLE)) AS vc")
      .selectExpr(
        "event_type", "nt AS n_treat", "nc AS n_control",
        "round(mt / 100.0, 6) AS mean_treat",
        "round(mc / 100.0, 6) AS mean_control",
        "CASE WHEN sqrt((vt + vc) / 2.0) > 0" +
          " THEN round((mt - mc) / sqrt((vt + vc) / 2.0), 6) END AS smd",
        s"CASE WHEN sqrt((vt + vc) / 2.0) > 0" +
          s" THEN abs((mt - mc) / sqrt((vt + vc) / 2.0)) <= $SmdTrip END AS balanced")
      .orderBy(col("event_type"))
  }

  /** q231 oracle: the arm hash through [[graft.functions.DuckHash]], the
    * identical cent pivot, HUGEINT squares, and textually identical
    * SMD arithmetic (verdict on the raw double both legs).
    */
  lazy val smdBalanceSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q231x" ->
        """(SELECT user_id, event_type,
          |    CAST(sum(CASE WHEN EXTRACT(day FROM ts) <= 15
          |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END)
          |      AS BIGINT) AS x
          |  FROM events GROUP BY 1, 2)""".stripMargin,
      "q231du" -> "(SELECT DISTINCT user_id, user_id::HUGEINT AS l FROM q231x)"
    )
    val chA = new SqlChain("q231ha", "q231du", Seq("user_id", "l"))
    hashLongLevels(chA, toUnsigned("l"), "42", "ha")
    ctes ++= chA.ctes
    ctes += ("q231arm" ->
      s"(SELECT user_id, (((${toSigned("ha")} % 2) + 2) % 2)::BIGINT AS arm FROM ${chA.last})")
    ctes += ("q231a" ->
      """(SELECT u.event_type,
        |    CAST(sum(CASE WHEN a.arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN a.arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN a.arm = 1 THEN u.x ELSE 0 END) AS BIGINT) AS sxt,
        |    CAST(sum(CASE WHEN a.arm = 0 THEN u.x ELSE 0 END) AS BIGINT) AS sxc,
        |    sum(CASE WHEN a.arm = 1 THEN u.x::HUGEINT * u.x ELSE 0 END) AS sxxt,
        |    sum(CASE WHEN a.arm = 0 THEN u.x::HUGEINT * u.x ELSE 0 END) AS sxxc
        |  FROM q231x u JOIN q231arm a USING (user_id)
        |  GROUP BY 1)""".stripMargin)
    ctes += ("q231d" ->
      """(SELECT event_type, nt, nc,
        |    CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) AS mt,
        |    CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE) AS mc,
        |    (CAST(nt AS DOUBLE) * CAST(sxxt AS DOUBLE)
        |      - CAST(sxt AS DOUBLE) * CAST(sxt AS DOUBLE))
        |      / (CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE)) AS vt,
        |    (CAST(nc AS DOUBLE) * CAST(sxxc AS DOUBLE)
        |      - CAST(sxc AS DOUBLE) * CAST(sxc AS DOUBLE))
        |      / (CAST(nc AS DOUBLE) * CAST(nc - 1 AS DOUBLE)) AS vc
        |  FROM q231a WHERE nt >= 2 AND nc >= 2)""".stripMargin)
    assemble(
      ctes.toSeq,
      s"""SELECT event_type, nt AS n_treat, nc AS n_control,
         |  round(mt / 100.0, 6) AS mean_treat,
         |  round(mc / 100.0, 6) AS mean_control,
         |  CASE WHEN sqrt((vt + vc) / 2.0) > 0
         |    THEN round((mt - mc) / sqrt((vt + vc) / 2.0), 6) END AS smd,
         |  CASE WHEN sqrt((vt + vc) / 2.0) > 0
         |    THEN abs((mt - mc) / sqrt((vt + vc) / 2.0)) <= $SmdTrip END AS balanced
         |FROM q231d
         |ORDER BY event_type""".stripMargin)
  }

  // --- q232: deterministic Neyman stratified draw -------------------------------

  /** Executes q230's allocation plan: per stratum, the `alloc_neyman`
    * documents with the SMALLEST draw hash (xxhash64 of doc_id — the
    * deterministic, seedable uniform draw q45/q67 use), plus the
    * representativeness audit a drawn sample ships with — sample mean
    * n_chars vs the stratum mean and the relative deviation. q230 PLANS
    * the budget; this SPENDS it, reproducibly (re-running on the same
    * snapshot draws the identical sample — the property audits need).
    *
    * Scale shape: the per-stratum draw is [[graft.functions.Expressions.collect_topk]]
    * over `(~hash, ~doc_id)` structs — a bounded ≤[[NeymanBudget]]-element
    * map-side heap per stratum, NEVER a per-stratum sort or global
    * window (the q61/q192 plan); the allocation table joins back as a
    * ≤|sources| broadcast; the audit is one keyed integer aggregate per
    * stratum. Bitwise NOT (never unary minus — Long.MinValue wraps)
    * order-reverses both heap keys.
    */
  def neymanDraw(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Expressions.collect_topk
    val alloc = neymanAlloc(spark, dir)
      .filter(col("source") =!= "_ALL")
      .select(col("source"), coalesce(col("alloc_neyman"), lit(0L)).as("alloc"))
    val pop = docs(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pop"), sum(col("n_chars").cast("long")).as("sy_pop"))
    val drawn = docs(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long").as("nch"),
        xxhash64(col("doc_id")).as("h"))
      .groupBy(col("source"))
      .agg(collect_topk(
        struct(expr("~h").as("ih"), expr("~doc_id").as("iid"), col("nch")),
        NeymanBudget.toInt).as("top"))
      .select(col("source"), posexplode(reverse(array_sort(col("top")))))
      .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
        col("col.nch").as("nch"))
    drawn
      .join(broadcast(alloc), "source")
      .filter(col("rk") <= col("alloc"))
      .groupBy(col("source"), col("alloc"))
      .agg(count(lit(1)).as("n_drawn"), sum(col("nch")).as("sy_s"))
      .join(broadcast(pop), "source")
      .selectExpr(
        "source", "alloc AS alloc_target", "n_drawn",
        "round(CAST(sy_s AS DOUBLE) / CAST(n_drawn AS DOUBLE), 6) AS mean_sample",
        "round(CAST(sy_pop AS DOUBLE) / CAST(n_pop AS DOUBLE), 6) AS mean_stratum",
        "CASE WHEN sy_pop > 0 THEN round((CAST(sy_s AS DOUBLE) / CAST(n_drawn AS DOUBLE)" +
          " - CAST(sy_pop AS DOUBLE) / CAST(n_pop AS DOUBLE))" +
          " / (CAST(sy_pop AS DOUBLE) / CAST(n_pop AS DOUBLE)), 6) END AS rel_dev")
      .orderBy(col("source"))
  }

  /** q232 oracle: q230's plan as a derived table, the draw hash through
    * [[graft.functions.DuckHash]], ROW_NUMBER in the identical
    * (signed hash, doc_id) order, and the same audit arithmetic.
    */
  lazy val neymanDrawSql: String = {
    import graft.functions.DuckHash._
    val allocSql = neymanAllocSql.stripSuffix("ORDER BY source")
    val ctes = ArrayBuffer[(String, String)](
      "q232dd" -> "(SELECT doc_id, source, n_chars, doc_id::HUGEINT AS l FROM documents)"
    )
    val chH = new SqlChain("q232hh", "q232dd", Seq("doc_id", "source", "n_chars", "l"))
    hashLongLevels(chH, toUnsigned("l"), "42", "hh")
    ctes ++= chH.ctes
    ctes += ("q232rk" ->
      s"""(SELECT source, n_chars::BIGINT AS nch,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ${toSigned("hh")}, doc_id) AS rk
         |  FROM ${chH.last})""".stripMargin)
    ctes += ("q232al" ->
      s"""(SELECT source, coalesce(alloc_neyman, 0) AS alloc
         | FROM ($allocSql) WHERE source <> '_ALL')""".stripMargin)
    ctes += ("q232p" ->
      """(SELECT source, count(*)::BIGINT AS n_pop,
        |    CAST(sum(n_chars::BIGINT) AS BIGINT) AS sy_pop
        |  FROM documents GROUP BY 1)""".stripMargin)
    ctes += ("q232s" ->
      """(SELECT r.source, a.alloc, count(*)::BIGINT AS n_drawn,
        |    CAST(sum(r.nch) AS BIGINT) AS sy_s
        |  FROM q232rk r JOIN q232al a USING (source)
        |  WHERE r.rk <= a.alloc
        |  GROUP BY 1, 2)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT s.source, s.alloc AS alloc_target, s.n_drawn,
        |  round(CAST(s.sy_s AS DOUBLE) / CAST(s.n_drawn AS DOUBLE), 6) AS mean_sample,
        |  round(CAST(p.sy_pop AS DOUBLE) / CAST(p.n_pop AS DOUBLE), 6) AS mean_stratum,
        |  CASE WHEN p.sy_pop > 0 THEN round((CAST(s.sy_s AS DOUBLE) / CAST(s.n_drawn AS DOUBLE)
        |    - CAST(p.sy_pop AS DOUBLE) / CAST(p.n_pop AS DOUBLE))
        |    / (CAST(p.sy_pop AS DOUBLE) / CAST(p.n_pop AS DOUBLE)), 6) END AS rel_dev
        |FROM q232s s JOIN q232p p USING (source)
        |ORDER BY s.source""".stripMargin)
  }

  // --- q217: padding-waste batching economics ----------------------------------

  /** Batch sizes the padding audit prices. */
  val PadBatchSizes: Seq[Int] = Seq(8, 16, 32)

  /** Padding-waste economics of fixed-size batching: every document
    * padded to its batch's longest member, under the two standard
    * batching policies — 'hash' (content-stable shuffle order, the
    * default dataloader) and 'length' (sorted bucketing, the classic
    * mitigation) — for batch sizes {8, 16, 32}: docs, batches, real vs
    * padded token mass, waste, and utilization. The gap between the two
    * policies' waste IS the payoff of adding a length-bucketing stage to
    * the loader, priced before anyone builds it (q50 packs sequences
    * into fixed windows; this prices the NON-packing loader everyone
    * actually starts with; q158 prices seq-len budgets).
    *
    * Scale shape: both global orders ride [[strictlyLess]] — the
    * range-partition + keyed-window + broadcast-offset sort-free
    * row_number, never a single-task global window; batch assignment is
    * a map-side integer divide, per-batch stats are one keyed aggregate
    * (≤n/8 groups, map-side combinable), and the final rollup is 6 rows.
    * Pure integer arithmetic until one divide-round per row.
    */
  def paddingWaste(spark: SparkSession, dir: String): DataFrame = {
    // persisted: both policy ranks range-shuffle this token-count table —
    // uncached, the tokenize pass ran once per policy per sampling pass
    val base = graft.core.CacheScope.persist(
      docs(spark, dir)
        .select(col("doc_id"), size(TextOps.toks).cast("long").as("n_tok")))
    // r15: BOTH policy orders ride ONE grouped rank pass — the union
    // carries each doc twice with a per-policy ordering key (`k1` = hash
    // for 'hash', token count for 'length'; doc_id breaks ties), and
    // [[strictlyLess]] grouped by policy range-partitions on
    // (policy, k1, doc_id), so each policy's rank is computed over its
    // own contiguous slice. One range shuffle + one pid checkpoint where
    // the r14 spelling scheduled two full rank-machinery passes (its two
    // sampling jobs, two checkpoints and two offset folds were the
    // query's dominant stage count). Per-policy ranks are identical: the
    // group column partitions the union exactly into the two old inputs.
    val both = base
      .withColumn("policy", explode(expr("array('hash', 'length')")))
      .withColumn(
        "k1",
        when(col("policy") === "hash", xxhash64(col("doc_id"))).otherwise(col("n_tok")))
    val rankedBoth = strictlyLess(
      both, Seq("policy"), Seq("k1", "doc_id"), "o", cacheInput = false)
      .select(col("policy"), col("o"), col("n_tok"))
    val bArr = PadBatchSizes.map(b => s"${b}L").mkString("array(", ", ", ")")
    rankedBoth
      .withColumn("b", explode(expr(bArr)))
      .select(col("policy"), col("b"), expr("o div b").as("batch"), col("n_tok"))
      .groupBy(col("policy"), col("b"), col("batch"))
      .agg(count(lit(1)).as("nb"), max(col("n_tok")).as("mx"), sum(col("n_tok")).as("tot"))
      .groupBy(col("policy"), col("b").as("batch_size"))
      .agg(
        sum(col("nb")).as("n_docs"),
        count(lit(1)).as("n_batches"),
        sum(col("tot")).as("total_tokens"),
        sum(col("nb") * col("mx")).as("padded_tokens"))
      .select(
        col("policy"), col("batch_size"), col("n_docs"), col("n_batches"),
        col("total_tokens"), col("padded_tokens"),
        (col("padded_tokens") - col("total_tokens")).as("waste_tokens"),
        round(col("total_tokens").cast("double") / col("padded_tokens").cast("double"), 6)
          .as("utilization"))
      .orderBy(col("policy"), col("batch_size"))
  }

  /** Oracle: emulated xxhash64 for the hash order, ROW_NUMBER−1 global
    * ranks (windows are fine oracle-side), identical integer batch math.
    */
  lazy val paddingWasteSql: String = {
    import graft.functions.DuckHash._
    val bList = PadBatchSizes.mkString("[", ", ", "]")
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](
      "q217in" ->
        s"(SELECT doc_id, doc_id::HUGEINT AS l, len(${TextOps.DuckToks})::BIGINT AS n_tok FROM documents)")
    val ch = new SqlChain("q217h", "q217in", Seq("doc_id", "l", "n_tok"))
    hashLongLevels(ch, toUnsigned("l"), "42", "h")
    ctes ++= ch.ctes
    ctes += ("q217r" ->
      s"(SELECT doc_id, n_tok, CAST(${toSigned("h")} AS BIGINT) AS hk FROM ${ch.last})")
    ctes += ("q217o" ->
      """(SELECT 'hash' AS policy, ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1 AS o, n_tok
        |  FROM q217r
        | UNION ALL
        | SELECT 'length', ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) - 1, n_tok
        |  FROM q217r)""".stripMargin)
    ctes += ("q217b" ->
      s"""(SELECT policy, b, o // b AS batch, n_tok
         | FROM q217o, (SELECT unnest($bList)::BIGINT AS b) bs)""".stripMargin)
    ctes += ("q217pb" ->
      """(SELECT policy, b, batch, count(*) AS nb, max(n_tok) AS mx,
        |    CAST(sum(n_tok) AS BIGINT) AS tot
        |  FROM q217b GROUP BY policy, b, batch)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT policy, b AS batch_size,
        |  CAST(sum(nb) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_batches,
        |  CAST(sum(tot) AS BIGINT) AS total_tokens,
        |  CAST(sum(nb * mx) AS BIGINT) AS padded_tokens,
        |  CAST(sum(nb * mx) - sum(tot) AS BIGINT) AS waste_tokens,
        |  round(CAST(sum(tot) AS BIGINT)::DOUBLE
        |    / CAST(sum(nb * mx) AS BIGINT)::DOUBLE, 6) AS utilization
        |FROM q217pb GROUP BY policy, b
        |ORDER BY policy, batch_size""".stripMargin)
  }

  /** Oracle: q40's emulated-hash split, q22's score SQL, the identical
    * ⌈(n+1)(1−α)⌉ IEEE arithmetic, histogram-cumulative order statistic
    * (windows are fine oracle-side), and integer coverage counts.
    */
  lazy val conformalGateSql: String = {
    import graft.functions.DuckHash._
    import graft.operators.TrainingOps.{SplitTrainPct, SplitValPct}
    val alphasList = ConformalAlphas.mkString("[", ", ", "]")
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](
      "q216in" -> "(SELECT doc_id, doc_id::HUGEINT AS l FROM documents)")
    val ch = new SqlChain("q216h", "q216in", Seq("doc_id", "l"))
    hashLongLevels(ch, toUnsigned("l"), "42", "h")
    ctes ++= ch.ctes
    ctes += ("q216sp" ->
      s"""(SELECT doc_id,
         |   CASE WHEN bucket < $SplitTrainPct THEN 'train'
         |        WHEN bucket < $SplitValPct THEN 'val' ELSE 'test' END AS split
         | FROM (SELECT doc_id, (((${toSigned("h")} % 100) + 100) % 100)::INTEGER AS bucket
         |       FROM ${ch.last}))""".stripMargin)
    ctes += ("q216s" ->
      s"""(SELECT q.doc_id, q.stop_ratio AS v, sp.split
         | FROM (${TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")}) q
         | JOIN q216sp sp USING (doc_id)
         | WHERE sp.split IN ('val', 'test'))""".stripMargin)
    ctes += ("q216hist" ->
      """(SELECT v, count(*) AS c,
        |    sum(count(*)) OVER (ORDER BY v) AS cum,
        |    sum(count(*)) OVER () AS n_cal
        | FROM q216s WHERE split = 'val' GROUP BY v)""".stripMargin)
    ctes += ("q216thr" ->
      s"""(SELECT alpha, min(v) AS t, max(n_cal)::BIGINT AS n_cal FROM (
         |   SELECT h.*, a.alpha FROM q216hist h, (SELECT unnest($alphasList) AS alpha) a)
         | WHERE cum >= least(n_cal::DOUBLE,
         |     ceil((n_cal + 1)::DOUBLE * (1.0 - alpha)))
         | GROUP BY alpha)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT t.alpha, t.n_cal,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  t.t AS threshold,
        |  CAST(sum(CASE WHEN s.v <= t.t THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  round(CAST(sum(CASE WHEN s.v <= t.t THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
        |    / count(*)::DOUBLE, 6) AS coverage,
        |  1.0 - t.alpha AS target
        |FROM (SELECT * FROM q216s WHERE split = 'test') s, q216thr t
        |GROUP BY t.alpha, t.n_cal, t.t
        |ORDER BY t.alpha""".stripMargin)
  }

  // --- q233/q234 shared: score-vs-dup-truth calibration bins --------------------

  val CalibBins = 10

  /** Shared q233/q234 stage: every document scored with q22's stop-ratio
    * signal, labeled with verified near-dup membership (q220's truth), the
    * score micro-quantized to an integer (the §4 quantize-then-integer-sum
    * rule) and binned into [[CalibBins]] equal-width score bins. Doc grain —
    * ONE corpus-scan join against the session-shared verified-pair stage.
    */
  private[graft] def calibScored(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextOps.ngramJaccardPairs(spark, dir)
    val dups = pairs
      .select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    TextOps
      .qualityScored(spark, dir)
      .select(col("doc_id"), col("stop_ratio").as("v"))
      .join(dups.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
      .select(
        col("v"),
        coalesce(col("is_dup"), lit(false)).as("pos"),
        expr("CAST(round(v * 1000000.0, 0) AS BIGINT)").as("s_micro"),
        least(floor(col("v") * lit(CalibBins.toDouble)), lit((CalibBins - 1).toLong)).as("bin"))
  }

  /** [[calibScored]] collapsed to the ≤[[CalibBins]]-row bin table: docs,
    * positives, and micro-quantized score mass per bin — every calibration
    * statistic below derives from these three integer columns.
    */
  private def calibBins(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("d"),
        sum(col("s_micro")).as("s"))

  // --- q233: reliability diagram + expected calibration error -------------------

  /** Reliability diagram + expected calibration error of q22's stop-ratio
    * signal against verified near-dup truth: per equal-width score bin the
    * doc count, observed dup rate, mean score, and |accuracy − confidence|
    * gap, plus the n-weighted ECE — the audit that answers "can this
    * signal's VALUE be read as a dup probability, or only its RANK?"
    * (q220's AUC is rank-only; a score can order perfectly and still be
    * wildly miscalibrated — thresholding it as if it were a probability
    * then buys the wrong corpus cut; a big ECE says recalibrate before any
    * probability-shaped use).
    *
    * Scale shape: dup truth is the session-shared verified-pair stage; the
    * corpus collapses map-side to the ≤[[CalibBins]]-row bin table in ONE
    * keyed aggregate. Determinism: scores micro-quantize per doc BEFORE
    * summing (order-free integer sums); each bin's ECE numerator
    * |10⁶·d_b − s_b| is an exact integer (≤ 10⁶·n_b — longs to ~9·10¹²
    * docs per bin; the cross-bin fold rides DECIMAL(38,0) past that), so
    * ECE = Σ|…| / 10⁶ / N is integers until two guarded divide-rounds.
    */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame = {
    val bins = graft.core.CacheScope.persist(calibBins(calibScored(spark, dir)))
    val tot = bins
      .select(col("n"), abs(col("d") * lit(1000000L) - col("s")).as("ad"))
      .agg(
        sum(col("n")).as("n_all"),
        sum(col("ad").cast("decimal(38,0)")).as("ece_num"))
    bins
      .crossJoin(broadcast(tot))
      .select(
        col("bin"),
        col("n").as("n_docs"),
        col("d").as("n_dup"),
        round(col("d").cast("double") / col("n").cast("double"), 6).as("dup_rate"),
        round(col("s").cast("double") / lit(1000000.0) / col("n").cast("double"), 6)
          .as("avg_score"),
        round(abs(col("d") * lit(1000000L) - col("s")).cast("double") / lit(1000000.0)
          / col("n").cast("double"), 6).as("gap"),
        round(col("ece_num").cast("double") / lit(1000000.0) / col("n_all").cast("double"), 6)
          .as("ece"))
      .orderBy(col("bin"))
  }

  /** Oracle: q220's dup-truth and score CTEs, identical micro-quantization
    * and bin rule, HUGEINT ECE numerator, same divide-round shapes.
    */
  lazy val calibrationBinsSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q233d AS (SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}
       |    UNION ALL SELECT doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold})),
       |q233s AS (SELECT q.stop_ratio AS v, (d.doc_id IS NOT NULL) AS pos
       |          FROM (${TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")}) q
       |          LEFT JOIN q233d d USING (doc_id)),
       |q233b AS (SELECT CAST(least(floor(v * ${CalibBins}.0), ${CalibBins - 1}) AS BIGINT) AS bin,
       |            count(*)::BIGINT AS n,
       |            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |            CAST(sum(CAST(round(v * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS s
       |          FROM q233s GROUP BY 1),
       |q233t AS (SELECT CAST(sum(n) AS BIGINT) AS n_all,
       |            sum(abs(d * 1000000 - s)::HUGEINT) AS ece_num FROM q233b)
       |SELECT bin, n AS n_docs, d AS n_dup,
       |  round(d::DOUBLE / n::DOUBLE, 6) AS dup_rate,
       |  round(s::DOUBLE / 1000000.0 / n::DOUBLE, 6) AS avg_score,
       |  round(abs(d * 1000000 - s)::DOUBLE / 1000000.0 / n::DOUBLE, 6) AS gap,
       |  round(t.ece_num::DOUBLE / 1000000.0 / t.n_all::DOUBLE, 6) AS ece
       |FROM q233b, q233t t ORDER BY bin""".stripMargin

  // --- q234: Brier score + Murphy decomposition ----------------------------------

  /** Brier score of q22's stop-ratio signal against dup truth, with
    * Murphy's (1973) decomposition over [[CalibBins]] bins:
    * `Brier = reliability − resolution + uncertainty + within_bin` — the
    * proper-score complement to q233's diagram (ECE says HOW miscalibrated;
    * this splits the total loss into the part recalibration can remove —
    * reliability — the part only a better signal can earn — resolution —
    * and the floor set by base-rate entropy — uncertainty). The 3-term
    * Murphy identity is exact only when every forecast equals its bin
    * mean; for binned CONTINUOUS scores the generalized decomposition
    * (Stephenson et al. 2008) adds within-bin terms (score variance minus
    * twice the score–outcome covariance inside each bin). `within_bin`
    * publishes that residual computed from the same published components,
    * so the 4-term identity closes exactly on the emitted values — a
    * consumer treating the decomposition as exact reads zero residual
    * error, and a LARGE within_bin is itself a signal the bins are too
    * coarse for the score's spread (reliability ≫ 0 with healthy
    * resolution says "recalibrate, don't retrain").
    *
    * Scale shape: the doc grain contributes only integer sums (squared
    * micro-errors ≤ 10¹² per doc, folded in DECIMAL(38,0)); the
    * decomposition is arithmetic over the ≤[[CalibBins]]-row bin table with
    * per-bin terms micro-quantized before the bounded cross-bin fold.
    * Determinism: per-doc error (s_micro − 10⁶·y) is an exact integer;
    * bin terms are identically-shaped IEEE divides both legs; 6-dp rounds
    * absorb the last ulp.
    */
  def brierDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.core.CacheScope.persist(calibScored(spark, dir))
    val moments = scored.agg(
      count(lit(1)).as("n"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(expr(
        """CAST((s_micro - (CASE WHEN pos THEN 1000000 ELSE 0 END))
          |  * (s_micro - (CASE WHEN pos THEN 1000000 ELSE 0 END)) AS DECIMAL(38,0))"""
          .stripMargin)).as("ssq"))
    val bins = calibBins(scored)
    val tot = bins.agg(sum(col("n")).as("nn"), sum(col("d")).as("dd"))
    val relres = bins
      .crossJoin(broadcast(tot))
      .select(
        expr(
          """CAST(round((CAST(s AS DOUBLE) - 1000000.0 * CAST(d AS DOUBLE))
            |  * (CAST(s AS DOUBLE) - 1000000.0 * CAST(d AS DOUBLE))
            |  / 1.0e12 / CAST(n AS DOUBLE) / CAST(nn AS DOUBLE) * 1000000.0, 0) AS BIGINT)"""
            .stripMargin).as("rel_micro"),
        expr(
          """CAST(round((CAST(d AS DOUBLE) * CAST(nn AS DOUBLE)
            |    - CAST(dd AS DOUBLE) * CAST(n AS DOUBLE))
            |  * (CAST(d AS DOUBLE) * CAST(nn AS DOUBLE)
            |    - CAST(dd AS DOUBLE) * CAST(n AS DOUBLE))
            |  / CAST(n AS DOUBLE) / CAST(nn AS DOUBLE) / CAST(nn AS DOUBLE)
            |  / CAST(nn AS DOUBLE) * 1000000.0, 0) AS BIGINT)""".stripMargin).as("res_micro"))
      .agg(sum(col("rel_micro")).as("rel_s"), sum(col("res_micro")).as("res_s"))
    moments
      .crossJoin(relres)
      .crossJoin(tot)
      .select(
        col("n"),
        col("n_pos"),
        round(col("ssq").cast("double") / lit(1.0e12) / col("n").cast("double"), 6).as("brier"),
        round(col("rel_s").cast("double") / lit(1000000.0), 6).as("reliability"),
        round(col("res_s").cast("double") / lit(1000000.0), 6).as("resolution"),
        round(col("dd").cast("double") * (col("nn") - col("dd")).cast("double")
          / col("nn").cast("double") / col("nn").cast("double"), 6).as("uncertainty"))
      // residual from the PUBLISHED 6-dp components: the 4-term identity
      // brier = reliability − resolution + uncertainty + within_bin closes
      // exactly on emitted values (identical IEEE ops both legs)
      .withColumn("within_bin",
        round(col("brier") - col("reliability") + col("resolution") - col("uncertainty"), 6))
  }

  /** Oracle: q233's scored/bin CTEs, HUGEINT squared-error fold, and the
    * textually identical per-bin decomposition arithmetic.
    */
  lazy val brierDecompositionSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q234d AS (SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}
       |    UNION ALL SELECT doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold})),
       |q234s AS (SELECT q.stop_ratio AS v, (d.doc_id IS NOT NULL) AS pos,
       |            CAST(round(q.stop_ratio * 1000000.0, 0) AS BIGINT) AS s_micro,
       |            CAST(least(floor(q.stop_ratio * ${CalibBins}.0), ${CalibBins - 1}) AS BIGINT) AS bin
       |          FROM (${TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")}) q
       |          LEFT JOIN q234d d USING (doc_id)),
       |q234m AS (SELECT count(*)::BIGINT AS n,
       |            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |            sum(((s_micro - (CASE WHEN pos THEN 1000000 ELSE 0 END))
       |              * (s_micro - (CASE WHEN pos THEN 1000000 ELSE 0 END)))::HUGEINT) AS ssq
       |          FROM q234s),
       |q234b AS (SELECT bin, count(*)::BIGINT AS n,
       |            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |            CAST(sum(s_micro) AS BIGINT) AS s
       |          FROM q234s GROUP BY bin),
       |q234t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(d) AS BIGINT) AS dd FROM q234b),
       |q234rr AS (SELECT
       |    CAST(sum(CAST(round((s::DOUBLE - 1000000.0 * d::DOUBLE)
       |      * (s::DOUBLE - 1000000.0 * d::DOUBLE)
       |      / 1.0e12 / n::DOUBLE / t.nn::DOUBLE * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS rel_s,
       |    CAST(sum(CAST(round((d::DOUBLE * t.nn::DOUBLE - t.dd::DOUBLE * n::DOUBLE)
       |      * (d::DOUBLE * t.nn::DOUBLE - t.dd::DOUBLE * n::DOUBLE)
       |      / n::DOUBLE / t.nn::DOUBLE / t.nn::DOUBLE
       |      / t.nn::DOUBLE * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS res_s
       |  FROM q234b, q234t t)
       |SELECT n, n_pos, brier, reliability, resolution, uncertainty,
       |  round(brier - reliability + resolution - uncertainty, 6) AS within_bin
       |FROM (
       |  SELECT m.n, m.n_pos,
       |    round(m.ssq::DOUBLE / 1.0e12 / m.n::DOUBLE, 6) AS brier,
       |    round(rr.rel_s::DOUBLE / 1000000.0, 6) AS reliability,
       |    round(rr.res_s::DOUBLE / 1000000.0, 6) AS resolution,
       |    round(t.dd::DOUBLE * (t.nn - t.dd)::DOUBLE / t.nn::DOUBLE / t.nn::DOUBLE, 6)
       |      AS uncertainty
       |  FROM q234m m, q234rr rr, q234t t)""".stripMargin

  // --- q235: mutual information of source × lang ---------------------------------

  /** Mutual information (nats) between `source` and `lang`, with both
    * marginal entropies and the normalized MI — the association audit a
    * training-mix recipe reads before treating source and language as
    * independent sampling axes (q218's DoReMi weights and q45's stratified
    * draws both assume the grid is roughly a product measure; NMI → 1 says
    * one axis is a proxy for the other and the mix table is really
    * one-dimensional; NMI ≈ 0 licenses the factored design). The exact
    * discrete plug-in estimator: `MI = Σᵢⱼ (nᵢⱼ/N)·ln(nᵢⱼ·N/(rᵢ·cⱼ))`.
    *
    * Scale shape: ONE corpus scan collapses map-side to the
    * ≤|sources|×|langs| contingency table (persisted — marginals and total
    * derive from it); margins broadcast back onto the cells; every term is
    * per-cell codegen'd arithmetic micro-quantized before the bounded fold
    * (the §4 rule). Below 2⁵³ docs the integer products are exact doubles;
    * past that, split the ln into per-factor lns (the q71 note). NMI is
    * computed from the ROUNDED MI and entropies so both legs read the same
    * published values.
    */
  def mutualInformation(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.core.CacheScope.persist(
      docs(spark, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c")))
    val r = cells.groupBy(col("source")).agg(sum(col("c")).as("nr"))
    val cm = cells.groupBy(col("lang")).agg(sum(col("c")).as("nc"))
    val t = cells.agg(sum(col("c")).as("nn"), count(lit(1)).as("n_cells"))
    val mi = cells
      .join(broadcast(r), "source")
      .join(broadcast(cm), "lang")
      .crossJoin(broadcast(t))
      .select(expr(
        """CAST(round((CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
          |  * ln(CAST(c AS DOUBLE) * CAST(nn AS DOUBLE)
          |      / (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)))
          |  * 1000000.0, 0) AS BIGINT)""".stripMargin).as("m"))
      .agg(sum(col("m")).as("mi_s"))
    def entropyOf(margin: DataFrame, cnt: String, out: String) =
      margin
        .crossJoin(broadcast(t))
        .select(expr(
          s"""CAST(round(-(CAST($cnt AS DOUBLE) / CAST(nn AS DOUBLE))
             |  * ln(CAST($cnt AS DOUBLE) / CAST(nn AS DOUBLE))
             |  * 1000000.0, 0) AS BIGINT)""".stripMargin).as("e"))
        .agg(sum(col("e")).as(out))
    mi
      .crossJoin(entropyOf(r, "nr", "hs_s"))
      .crossJoin(entropyOf(cm, "nc", "hl_s"))
      .crossJoin(t)
      .select(
        col("nn").as("n_docs"),
        col("n_cells"),
        round(col("mi_s").cast("double") / lit(1000000.0), 6).as("mi_nats"),
        round(col("hs_s").cast("double") / lit(1000000.0), 6).as("h_source"),
        round(col("hl_s").cast("double") / lit(1000000.0), 6).as("h_lang"),
        when(col("hs_s") > 0L && col("hl_s") > 0L,
          round(
            (round(col("mi_s").cast("double") / lit(1000000.0), 6))
              / sqrt(round(col("hs_s").cast("double") / lit(1000000.0), 6)
                * round(col("hl_s").cast("double") / lit(1000000.0), 6)), 6))
          .as("nmi"))
  }

  /** Oracle: identical contingency/margin CTEs, micro-quantized per-cell
    * terms, and NMI from the same rounded published values.
    */
  lazy val mutualInformationSql: String =
    """WITH q235m AS MATERIALIZED (
      |  SELECT source, lang, count(*)::BIGINT AS c FROM documents GROUP BY 1, 2),
      |q235r AS (SELECT source, CAST(sum(c) AS BIGINT) AS nr FROM q235m GROUP BY 1),
      |q235c AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nc FROM q235m GROUP BY 1),
      |q235t AS (SELECT CAST(sum(c) AS BIGINT) AS nn, count(*)::BIGINT AS n_cells FROM q235m),
      |q235mi AS (SELECT CAST(sum(CAST(round((c::DOUBLE / t.nn::DOUBLE)
      |      * ln(c::DOUBLE * t.nn::DOUBLE / (r.nr::DOUBLE * cc.nc::DOUBLE))
      |      * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS mi_s
      |  FROM q235m m JOIN q235r r USING (source) JOIN q235c cc USING (lang), q235t t),
      |q235hs AS (SELECT CAST(sum(CAST(round(-(nr::DOUBLE / t.nn::DOUBLE)
      |      * ln(nr::DOUBLE / t.nn::DOUBLE) * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS hs_s
      |  FROM q235r, q235t t),
      |q235hl AS (SELECT CAST(sum(CAST(round(-(nc::DOUBLE / t.nn::DOUBLE)
      |      * ln(nc::DOUBLE / t.nn::DOUBLE) * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS hl_s
      |  FROM q235c, q235t t)
      |SELECT t.nn AS n_docs, t.n_cells,
      |  round(mi.mi_s::DOUBLE / 1000000.0, 6) AS mi_nats,
      |  round(hs.hs_s::DOUBLE / 1000000.0, 6) AS h_source,
      |  round(hl.hl_s::DOUBLE / 1000000.0, 6) AS h_lang,
      |  CASE WHEN hs.hs_s > 0 AND hl.hl_s > 0 THEN
      |    round(round(mi.mi_s::DOUBLE / 1000000.0, 6)
      |      / sqrt(round(hs.hs_s::DOUBLE / 1000000.0, 6)
      |        * round(hl.hl_s::DOUBLE / 1000000.0, 6)), 6) END AS nmi
      |FROM q235mi mi, q235hs hs, q235hl hl, q235t t""".stripMargin

  // --- q236: Cramér's V effect size of source × lang ------------------------------

  /** Chi-square independence test of `source` × `lang` with Cramér's V —
    * the EFFECT-SIZE companion to q108's per-cell audit and q235's MI
    * (χ² grows with N, so at corpus scale "significant" is vacuous; V
    * rescales to [0,1] and answers "how strongly does language depend on
    * source", comparable across corpora of any size). Computed over the
    * full |sources|×|langs| universe — zero cells contribute their whole
    * expectation (q108's rule; dropping them understates the statistic).
    *
    * Scale shape: the same persisted contingency table as q235; the
    * universe is the bounded marginal cross join; per-cell (n−e)²/e terms
    * micro-quantize before the bounded fold; V reads the published χ²
    * (one IEEE sqrt, correctly rounded both engines).
    */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.core.CacheScope.persist(
      docs(spark, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c")))
    val r  = cells.groupBy(col("source")).agg(sum(col("c")).as("nr"))
    val cm = cells.groupBy(col("lang")).agg(sum(col("c")).as("nc"))
    val t = cells.agg(
      sum(col("c")).as("nn"),
      countDistinct(col("source")).as("n_src"),
      countDistinct(col("lang")).as("n_lang"))
    val chi = r
      .crossJoin(broadcast(cm))
      .join(cells, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(t))
      .select(expr(
        """CAST(round((CAST(c AS DOUBLE) - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE))
          |  * (CAST(c AS DOUBLE) - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE))
          |  / (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE))
          |  * 1000000.0, 0) AS BIGINT)""".stripMargin).as("x"))
      .agg(sum(col("x")).as("chi_s"))
    chi
      .crossJoin(t)
      .select(
        col("nn").as("n_docs"),
        col("n_src"),
        col("n_lang"),
        ((col("n_src") - 1L) * (col("n_lang") - 1L)).as("dof"),
        round(col("chi_s").cast("double") / lit(1000000.0), 6).as("chi2"),
        when(col("n_src") > 1L && col("n_lang") > 1L,
          round(sqrt(round(col("chi_s").cast("double") / lit(1000000.0), 6)
            / col("nn").cast("double")
            / least(col("n_src") - 1L, col("n_lang") - 1L).cast("double")), 6))
          .as("cramers_v"))
  }

  /** Oracle: q235's contingency CTEs, q108's zero-cell universe rule, the
    * identical micro-quantized per-cell terms and published-χ² V.
    */
  lazy val cramersVSql: String =
    """WITH q236m AS MATERIALIZED (
      |  SELECT source, lang, count(*)::BIGINT AS c FROM documents GROUP BY 1, 2),
      |q236r AS (SELECT source, CAST(sum(c) AS BIGINT) AS nr FROM q236m GROUP BY 1),
      |q236c AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nc FROM q236m GROUP BY 1),
      |q236t AS (SELECT CAST(sum(c) AS BIGINT) AS nn,
      |    count(DISTINCT source)::BIGINT AS n_src,
      |    count(DISTINCT lang)::BIGINT AS n_lang
      |  FROM q236m),
      |q236x AS (SELECT CAST(sum(CAST(round(
      |      (coalesce(m.c, 0)::DOUBLE - r.nr::DOUBLE * cc.nc::DOUBLE / t.nn::DOUBLE)
      |      * (coalesce(m.c, 0)::DOUBLE - r.nr::DOUBLE * cc.nc::DOUBLE / t.nn::DOUBLE)
      |      / (r.nr::DOUBLE * cc.nc::DOUBLE / t.nn::DOUBLE)
      |      * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS chi_s
      |  FROM q236r r CROSS JOIN q236c cc CROSS JOIN q236t t
      |  LEFT JOIN q236m m ON m.source = r.source AND m.lang = cc.lang)
      |SELECT t.nn AS n_docs, t.n_src, t.n_lang,
      |  (t.n_src - 1) * (t.n_lang - 1) AS dof,
      |  round(x.chi_s::DOUBLE / 1000000.0, 6) AS chi2,
      |  CASE WHEN t.n_src > 1 AND t.n_lang > 1 THEN
      |    round(sqrt(round(x.chi_s::DOUBLE / 1000000.0, 6) / t.nn::DOUBLE
      |      / least(t.n_src - 1, t.n_lang - 1)::DOUBLE), 6) END AS cramers_v
      |FROM q236x x, q236t t""".stripMargin

  // --- q238: minimum-detectable-effect / power planner ---------------------------

  /** Φ⁻¹(0.975) and Φ⁻¹(0.8): the two-sided α = 0.05, power = 0.8 normal
    * quantiles — fixed design constants, embedded as the same decimal
    * literal in both legs (a 16-digit decimal string parses to the
    * identical IEEE double in Spark and DuckDB).
    */
  val ZAlphaTwoSided = 1.959963984540054
  val ZPower80       = 0.8416212335729143

  /** Minimum-detectable-effect planner: per event-type metric, the
    * smallest true uplift the CURRENT traffic split could detect at
    * two-sided α = 0.05 with 80 % power —
    * `MDE = (z_{α/2}+z_β)·√(s²·(1/n_t+1/n_c))` — in absolute value units
    * and relative to the control mean. The question every experiment
    * design starts with ("is this metric even powered?"), sitting BEFORE
    * q226's CUPED readout and q225's FDR gate: an MDE_rel of 40 % says
    * don't bother shipping the test; q230 plans label budget, this plans
    * traffic.
    *
    * Scale shape: ONE keyed (user, type) aggregate pivots the corpus to
    * integer cent sums (lossless DECIMAL(18,2)·100 → BIGINT); per-type
    * moments are ONE ≤|types|-row aggregate with squares in
    * DECIMAL(38,0) (cent-sum squares overflow a long past ~10⁹ users ×
    * 10⁶ cents); all planner arithmetic runs on that bounded table in
    * identically-shaped IEEE doubles, one display round per column.
    */
  def mdePower(spark: SparkSession, dir: String): DataFrame = {
    val ux = Tables
      .events(spark, dir)
      .select(
        col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("c")).as("y"))
      .withColumn("arm", pmod(xxhash64(col("user_id")), lit(2L)))
    ux
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("syc"))
      .filter(col("nt") > 0 && col("nc") > 0 && col("n") > 1)
      .selectExpr(
        "event_type", "n", "nt", "nc", "syc",
        """(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
           / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0) AS s2""",
        "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mu")
      .selectExpr(
        "event_type", "n", "nt", "nc", "syc", "s2", "mu",
        // greatest(s2, 0.0): floating-point cancellation on a near-constant
        // metric can drive the variance identity epsilon-negative — sqrt
        // would then publish NaN mde columns while sd_value is NULL
        s"""(CAST($ZAlphaTwoSided AS DOUBLE) + CAST($ZPower80 AS DOUBLE))
            * sqrt(greatest(s2, 0.0) * (1.0 / CAST(nt AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE))) AS mde_c""")
      .selectExpr(
        "event_type", "n AS n_users", "nt AS n_treat", "nc AS n_control",
        "round(mu / 100.0, 6) AS mean_value",
        "CASE WHEN s2 >= 0.0 THEN round(sqrt(s2) / 100.0, 6) END AS sd_value",
        "round(mde_c / 100.0, 6) AS mde_abs",
        """CASE WHEN syc > 0 THEN
             round(mde_c / (CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE)), 6) END AS mde_rel""")
      .orderBy(col("event_type"))
  }

  /** q238 oracle: q226's cent pivot and DuckHash arm, HUGEINT squares,
    * and textually identical planner arithmetic incl. the z literals.
    */
  lazy val mdePowerSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q238x" ->
        """(SELECT user_id, event_type,
          |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
          |  FROM events GROUP BY 1, 2)""".stripMargin,
      "q238du" -> "(SELECT DISTINCT user_id, user_id::HUGEINT AS l FROM q238x)"
    )
    val ch = new SqlChain("q238h", "q238du", Seq("user_id", "l"))
    hashLongLevels(ch, toUnsigned("l"), "42", "h")
    ctes ++= ch.ctes
    ctes += ("q238arm" ->
      s"(SELECT user_id, (((${toSigned("h")} % 2) + 2) % 2)::BIGINT AS arm FROM ${ch.last})")
    ctes += ("q238a" ->
      """(SELECT x.event_type,
        |    count(*)::BIGINT AS n,
        |    CAST(sum(x.y) AS BIGINT) AS sy,
        |    sum(x.y::HUGEINT * x.y) AS syy,
        |    CAST(sum(CASE WHEN a.arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN a.arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN a.arm = 0 THEN x.y ELSE 0 END) AS BIGINT) AS syc
        |  FROM q238x x JOIN q238arm a USING (user_id)
        |  GROUP BY 1)""".stripMargin)
    ctes += ("q238p" ->
      """(SELECT event_type, n, nt, nc, syc,
        |    (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
        |      / n::DOUBLE / (n::DOUBLE - 1.0) AS s2,
        |    sy::DOUBLE / n::DOUBLE AS mu
        |  FROM q238a WHERE nt > 0 AND nc > 0 AND n > 1)""".stripMargin)
    ctes += ("q238m" ->
      s"""(SELECT *,
         |    (CAST($ZAlphaTwoSided AS DOUBLE) + CAST($ZPower80 AS DOUBLE))
         |      * sqrt(greatest(s2, 0.0) * (1.0 / nt::DOUBLE + 1.0 / nc::DOUBLE)) AS mde_c
         |  FROM q238p)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT event_type, n AS n_users, nt AS n_treat, nc AS n_control,
        |  round(mu / 100.0, 6) AS mean_value,
        |  CASE WHEN s2 >= 0.0 THEN round(sqrt(s2) / 100.0, 6) END AS sd_value,
        |  round(mde_c / 100.0, 6) AS mde_abs,
        |  CASE WHEN syc > 0 THEN
        |    round(mde_c / (syc::DOUBLE / nc::DOUBLE), 6) END AS mde_rel
        |FROM q238m ORDER BY event_type""".stripMargin)
  }

  // --- q239: distinct-n lexical diversity per source -----------------------------

  /** Distinct-n diversity (the self-BLEU complement): per source, the
    * distinct-unigram and distinct-bigram ratios — the template/boilerplate
    * detector that catches a source whose documents are individually clean
    * but collectively repetitive (low distinct-2 with normal distinct-1 is
    * the signature of templated text: same phrases, shuffled slots) —
    * upstream of dedup (q25/q27 catch near-identical DOCS; this catches a
    * corpus-level diversity collapse no pair is responsible for).
    *
    * Scale shape: gram tables shuffle once on (source, gram) for the exact
    * distinct counts — the honest cost of exact vocabulary statistics
    * (q82's Heaps-law lane prices how that vocabulary grows; hashing would
    * undercount collisions) — then collapse to ≤|sources| rows. Integers
    * until the two guarded divide-rounds.
    */
  def distinctNgrams(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.core.CacheScope.persist(
      docs(spark, dir).select(col("source"), TextOps.toks.as("toks")))
    def perSource(grams: DataFrame) =
      grams
        .groupBy(col("source"), col("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("total"), count(lit(1)).as("dist"))
    val uni = perSource(base.select(col("source"), explode(col("toks")).as("g")))
    val big = perSource(base.select(col("source"), explode(expr(
      """CASE WHEN size(toks) >= 2 THEN
           transform(sequence(1, size(toks) - 1),
             i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
         ELSE array() END""")).as("g")))
    val nDocs = base.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    nDocs
      .join(uni, Seq("source"), "left")
      .join(big.withColumnRenamed("total", "total2").withColumnRenamed("dist", "dist2"),
        Seq("source"), "left")
      .select(
        col("source"),
        col("n_docs"),
        col("total").as("n_tokens"),
        col("dist").as("distinct_1"),
        round(col("dist").cast("double") / col("total").cast("double"), 6).as("ratio_1"),
        col("total2").as("n_bigrams"),
        col("dist2").as("distinct_2"),
        when(col("total2") > 0L,
          round(col("dist2").cast("double") / col("total2").cast("double"), 6)).as("ratio_2"))
      .orderBy(col("source"))
  }

  /** Oracle: the same regex token split, `list_transform` bigrams
    * (1-based on both sides via `element_at`), exact distinct counts.
    */
  lazy val distinctNgramsSql: String =
    s"""WITH q239d AS MATERIALIZED (
       |  SELECT source, ${TextOps.DuckToks} AS toks FROM documents),
       |q239u AS (SELECT source, CAST(count(*) AS BIGINT) AS total,
       |    count(DISTINCT g)::BIGINT AS dist
       |  FROM (SELECT source, unnest(toks) AS g FROM q239d) GROUP BY source),
       |q239b AS (SELECT source, CAST(count(*) AS BIGINT) AS total2,
       |    count(DISTINCT g)::BIGINT AS dist2
       |  FROM (SELECT source, unnest(list_transform(generate_series(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i + 1])) AS g FROM q239d) GROUP BY source),
       |q239n AS (SELECT source, count(*)::BIGINT AS n_docs FROM q239d GROUP BY source)
       |SELECT n.source, n.n_docs, u.total AS n_tokens, u.dist AS distinct_1,
       |  round(u.dist::DOUBLE / u.total::DOUBLE, 6) AS ratio_1,
       |  b.total2 AS n_bigrams, b.dist2 AS distinct_2,
       |  CASE WHEN b.total2 > 0 THEN round(b.dist2::DOUBLE / b.total2::DOUBLE, 6) END AS ratio_2
       |FROM q239n n LEFT JOIN q239u u USING (source) LEFT JOIN q239b b USING (source)
       |ORDER BY n.source""".stripMargin

  // --- q240: Theil index decomposition of token mass ------------------------------

  /** Theil T inequality of token mass across documents, DECOMPOSED into
    * between-source and within-source components — the additive
    * complement to q146's per-source Gini (Gini says each source's
    * inequality; Theil is the index whose total EXACTLY splits
    * `T = T_between + Σ_s share_s·T_s`, so it answers "is corpus
    * inequality a mix problem or an inside-the-source problem?" —
    * T_between dominating says rebalance the recipe, within dominating
    * says filter inside sources). Per source: its within index and
    * share-weighted contribution; the `_ALL` row carries the between,
    * summed-within, and total indices.
    *
    * Scale shape: the corpus collapses to the doc grain's token counts in
    * one pass (persisted); source totals are ONE keyed aggregate; per-doc
    * `(x/X_s)·ln(x·n_s/X_s)` terms micro-quantize before their per-source
    * integer sum (the §4 rule — same shape as q146's lq fold), and the
    * between/total folds reuse the identical machinery at the
    * ≤|sources|-row and doc grains. `0·ln 0 = 0` by the x > 0 guard.
    */
  def theilDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = graft.core.CacheScope.persist(
      docs(spark, dir).select(col("source"), size(TextOps.toks).cast("long").as("x")))
    val src = graft.core.CacheScope.persist(
      perDoc.groupBy(col("source")).agg(count(lit(1)).as("n_s"), sum(col("x")).as("xs")))
    val tot = src
      .agg(sum(col("n_s")).as("nn"), sum(col("xs")).as("xx"), count(lit(1)).as("g"))
    val within = perDoc
      .join(broadcast(src), "source")
      .select(col("source"), expr(
        """CASE WHEN x > 0 THEN
             CAST(round((CAST(x AS DOUBLE) / CAST(xs AS DOUBLE))
               * ln(CAST(x AS DOUBLE) * CAST(n_s AS DOUBLE) / CAST(xs AS DOUBLE))
               * 1000000.0, 0) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END""").as("tm"))
      .groupBy(col("source"))
      .agg(sum(col("tm")).as("tw"))
    val perSrc = src
      .join(within, Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("source"), col("n_s"), col("xs"), col("nn"), col("xx"), col("tw"),
        expr(
          """CASE WHEN xs > 0 THEN
               CAST(round((CAST(xs AS DOUBLE) / CAST(xx AS DOUBLE))
                 * ln(CAST(xs AS DOUBLE) * CAST(nn AS DOUBLE)
                     / (CAST(xx AS DOUBLE) * CAST(n_s AS DOUBLE)))
                 * 1000000.0, 0) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END""").as("tbm"),
        expr(
          """CAST(round((CAST(xs AS DOUBLE) / CAST(xx AS DOUBLE))
               * (CAST(tw AS DOUBLE) / 1000000.0) * 1000000.0, 0) AS BIGINT)""").as("cw"))
    val persisted = graft.core.CacheScope.persist(perSrc)
    val totalT = perDoc
      .crossJoin(broadcast(tot))
      .select(expr(
        """CASE WHEN x > 0 THEN
             CAST(round((CAST(x AS DOUBLE) / CAST(xx AS DOUBLE))
               * ln(CAST(x AS DOUBLE) * CAST(nn AS DOUBLE) / CAST(xx AS DOUBLE))
               * 1000000.0, 0) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END""").as("tm"))
      .agg(sum(col("tm")).as("tt"))
    val rows = persisted.select(
      col("source"),
      col("n_s").as("n_docs"),
      col("xs").as("n_tokens"),
      round(col("xs").cast("double") / col("xx").cast("double"), 6).as("share"),
      round(col("tw").cast("double") / lit(1000000.0), 6).as("theil_within"),
      round(col("cw").cast("double") / lit(1000000.0), 6).as("within_contrib"),
      lit(null).cast("double").as("theil_between"),
      lit(null).cast("double").as("theil_total"))
    val allRow = persisted
      .agg(
        sum(col("n_s")).as("nd"), sum(col("xs")).as("xt"),
        sum(col("tbm")).as("tb"), sum(col("cw")).as("cws"))
      .crossJoin(totalT)
      .select(
        lit("_ALL").as("source"),
        col("nd").as("n_docs"),
        col("xt").as("n_tokens"),
        lit(1.0).as("share"),
        lit(null).cast("double").as("theil_within"),
        round(col("cws").cast("double") / lit(1000000.0), 6).as("within_contrib"),
        round(col("tb").cast("double") / lit(1000000.0), 6).as("theil_between"),
        round(col("tt").cast("double") / lit(1000000.0), 6).as("theil_total"))
    rows.unionByName(allRow).orderBy(col("source"))
  }

  /** Oracle: same doc/source grains, the identical micro-quantized term
    * shapes at all three grains, NULL-columned per-source vs `_ALL` rows.
    */
  lazy val theilDecompositionSql: String =
    s"""WITH q240d AS MATERIALIZED (
       |  SELECT source, len(${TextOps.DuckToks})::BIGINT AS x FROM documents),
       |q240s AS MATERIALIZED (
       |  SELECT source, count(*)::BIGINT AS n_s, CAST(sum(x) AS BIGINT) AS xs
       |  FROM q240d GROUP BY source),
       |q240t AS (SELECT CAST(sum(n_s) AS BIGINT) AS nn, CAST(sum(xs) AS BIGINT) AS xx,
       |    count(*)::BIGINT AS g FROM q240s),
       |q240w AS (SELECT d.source,
       |    CAST(sum(CASE WHEN d.x > 0 THEN
       |      CAST(round((d.x::DOUBLE / s.xs::DOUBLE)
       |        * ln(d.x::DOUBLE * s.n_s::DOUBLE / s.xs::DOUBLE) * 1000000.0, 0) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS tw
       |  FROM q240d d JOIN q240s s USING (source) GROUP BY d.source),
       |q240p AS MATERIALIZED (SELECT s.source, s.n_s, s.xs, t.nn, t.xx, w.tw,
       |    CASE WHEN s.xs > 0 THEN
       |      CAST(round((s.xs::DOUBLE / t.xx::DOUBLE)
       |        * ln(s.xs::DOUBLE * t.nn::DOUBLE / (t.xx::DOUBLE * s.n_s::DOUBLE))
       |        * 1000000.0, 0) AS BIGINT)
       |    ELSE 0 END AS tbm,
       |    CAST(round((s.xs::DOUBLE / t.xx::DOUBLE)
       |      * (w.tw::DOUBLE / 1000000.0) * 1000000.0, 0) AS BIGINT) AS cw
       |  FROM q240s s LEFT JOIN q240w w USING (source), q240t t),
       |q240tt AS (SELECT CAST(sum(CASE WHEN d.x > 0 THEN
       |      CAST(round((d.x::DOUBLE / t.xx::DOUBLE)
       |        * ln(d.x::DOUBLE * t.nn::DOUBLE / t.xx::DOUBLE) * 1000000.0, 0) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS tt
       |  FROM q240d d, q240t t)
       |SELECT source, n_s AS n_docs, xs AS n_tokens,
       |  round(xs::DOUBLE / xx::DOUBLE, 6) AS share,
       |  round(tw::DOUBLE / 1000000.0, 6) AS theil_within,
       |  round(cw::DOUBLE / 1000000.0, 6) AS within_contrib,
       |  CAST(NULL AS DOUBLE) AS theil_between,
       |  CAST(NULL AS DOUBLE) AS theil_total
       |FROM q240p
       |UNION ALL
       |SELECT '_ALL', p.nd, p.xt, 1.0::DOUBLE,
       |  CAST(NULL AS DOUBLE),
       |  round(p.cws::DOUBLE / 1000000.0, 6),
       |  round(p.tb::DOUBLE / 1000000.0, 6),
       |  round(tt.tt::DOUBLE / 1000000.0, 6)
       |FROM (SELECT CAST(sum(n_s) AS BIGINT) AS nd, CAST(sum(xs) AS BIGINT) AS xt,
       |    CAST(sum(tbm) AS BIGINT) AS tb, CAST(sum(cw) AS BIGINT) AS cws FROM q240p) p,
       |q240tt tt
       |ORDER BY source""".stripMargin

  // --- q241: delete-one-source jackknife of the tokens-per-doc ratio ---------------

  /** Delete-one-group jackknife standard error of the corpus
    * tokens-per-doc ratio — the CI machinery for RATIO metrics, where
    * per-doc variance formulas are wrong because numerator and
    * denominator are random together (Efron 1982; the same reason ratio
    * experiment metrics use delta-method/jackknife): each source is held
    * out once, the ratio recomputed from the REMAINING totals, and the
    * spread of those leave-one-out ratios prices how much any single
    * source steers the corpus average. A CI that jumps when one source
    * drops says the "corpus average" is really that source's average.
    *
    * Scale shape: everything derives from the ≤|sources| totals table —
    * leave-one-out ratios are arithmetic against the broadcast grand
    * totals (never a re-scan per group), micro-quantized before the
    * bounded moment fold; SE and CI read the published sums in
    * identically-shaped IEEE doubles.
    */
  def jackknifeRatio(spark: SparkSession, dir: String): DataFrame = {
    val src = docs(spark, dir)
      .select(col("source"), size(TextOps.toks).cast("long").as("x"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_s"), sum(col("x")).as("xs"))
    val persisted = graft.core.CacheScope.persist(src)
    val tot = persisted
      .agg(sum(col("n_s")).as("nn"), sum(col("xs")).as("xx"), count(lit(1)).as("g"))
    val loo = persisted
      .crossJoin(broadcast(tot))
      .filter(col("nn") > col("n_s"))
      .select(expr(
        """CAST(round(CAST(xx - xs AS DOUBLE) / CAST(nn - n_s AS DOUBLE)
             * 1000000.0, 0) AS BIGINT)""").as("m"))
      .agg(
        count(lit(1)).as("gg"),
        sum(col("m")).as("sm"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("smm"))
    loo
      .crossJoin(tot)
      .selectExpr(
        "g AS n_sources", "gg AS n_used", "nn AS n_docs", "xx AS n_tokens",
        "CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) AS r",
        """CASE WHEN gg > 1 THEN
             sqrt(greatest((CAST(smm AS DOUBLE)
                 - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(gg AS DOUBLE)) / 1.0e12
               * (CAST(gg AS DOUBLE) - 1.0) / CAST(gg AS DOUBLE), 0.0)) END AS se""")
      .selectExpr(
        "n_sources", "n_used", "n_docs", "n_tokens",
        "round(r, 6) AS ratio",
        "round(se, 6) AS jack_se",
        s"round(r - CAST($ZAlphaTwoSided AS DOUBLE) * se, 6) AS ci_lo",
        s"round(r + CAST($ZAlphaTwoSided AS DOUBLE) * se, 6) AS ci_hi")
  }

  /** Oracle: identical totals table, micro-quantized leave-one-out
    * ratios, HUGEINT moment fold, and the same published-sum SE/CI.
    */
  lazy val jackknifeRatioSql: String =
    s"""WITH q241s AS MATERIALIZED (
       |  SELECT source, count(*)::BIGINT AS n_s,
       |    CAST(sum(len(${TextOps.DuckToks})) AS BIGINT) AS xs
       |  FROM documents GROUP BY source),
       |q241t AS (SELECT CAST(sum(n_s) AS BIGINT) AS nn, CAST(sum(xs) AS BIGINT) AS xx,
       |    count(*)::BIGINT AS g FROM q241s),
       |q241l AS (SELECT CAST(round((t.xx - s.xs)::DOUBLE / (t.nn - s.n_s)::DOUBLE
       |      * 1000000.0, 0) AS BIGINT) AS m
       |  FROM q241s s, q241t t WHERE t.nn > s.n_s),
       |q241a AS (SELECT count(*)::BIGINT AS gg, CAST(sum(m) AS BIGINT) AS sm,
       |    sum(m::HUGEINT * m) AS smm FROM q241l),
       |q241f AS (SELECT t.g AS n_sources, a.gg AS n_used, t.nn AS n_docs, t.xx AS n_tokens,
       |    t.xx::DOUBLE / t.nn::DOUBLE AS r,
       |    CASE WHEN a.gg > 1 THEN
       |      sqrt(greatest((a.smm::DOUBLE - a.sm::DOUBLE * a.sm::DOUBLE / a.gg::DOUBLE) / 1.0e12
       |        * (a.gg::DOUBLE - 1.0) / a.gg::DOUBLE, 0.0)) END AS se
       |  FROM q241a a, q241t t)
       |SELECT n_sources, n_used, n_docs, n_tokens,
       |  round(r, 6) AS ratio,
       |  round(se, 6) AS jack_se,
       |  round(r - CAST($ZAlphaTwoSided AS DOUBLE) * se, 6) AS ci_lo,
       |  round(r + CAST($ZAlphaTwoSided AS DOUBLE) * se, 6) AS ci_hi
       |FROM q241f""".stripMargin

  // --- q242: isotonic (PAV) recalibration of the reliability diagram -------------

  /** Isotonic recalibration of q233's reliability diagram: the
    * non-decreasing dup-rate curve closest (weighted least squares) to
    * the observed per-bin rates — pool-adjacent-violators, computed by
    * the interval-minimax identity `iso_i = max_{j≤i} min_{k≥i} rate(j,k)`
    * over the bin table (Ayer et al. 1955; Robertson–Wright–Dykstra 1988,
    * Thm 1.4.4) — the recalibration MAP q234's reliability term says you
    * need: read a score, answer the isotonic dup-rate. Bins where iso
    * differs from raw are exactly the monotonicity violations.
    *
    * Scale shape: the corpus collapses once (q233's shared doc-grain
    * stage) to the ≤[[CalibBins]]-row bin table; the minimax is ≤|bins|³
    * arithmetic over bounded broadcast self-joins — no corpus-sized work
    * after the first aggregate, which is why the minimax identity beats
    * porting the sequential PAV stack here. Determinism: interval rates
    * are single divides of exact integer sums; min/max over identical
    * IEEE doubles agree bit-for-bit.
    */
  def isotonicBins(spark: SparkSession, dir: String): DataFrame = {
    val bins = graft.core.CacheScope.persist(
      calibBins(calibScored(spark, dir)).select(col("bin"), col("n"), col("d")))
    val ivals = bins
      .select(col("bin").as("j"))
      .join(broadcast(bins.select(col("bin").as("k"))), col("j") <= col("k"))
      .join(broadcast(bins), col("bin").between(col("j"), col("k")))
      .groupBy(col("j"), col("k"))
      .agg((sum(col("d")).cast("double") / sum(col("n")).cast("double")).as("rate"))
    val iso = bins
      .select(col("bin"))
      .join(broadcast(ivals), col("j") <= col("bin") && col("k") >= col("bin"))
      .groupBy(col("bin"), col("j"))
      .agg(min(col("rate")).as("mn"))
      .groupBy(col("bin"))
      .agg(max(col("mn")).as("iso"))
    bins
      .join(iso, "bin")
      .select(
        col("bin"),
        col("n").as("n_docs"),
        col("d").as("n_dup"),
        round(col("d").cast("double") / col("n").cast("double"), 6).as("raw_rate"),
        round(col("iso"), 6).as("iso_rate"))
      .orderBy(col("bin"))
  }

  /** Oracle: q233's scored/bin CTEs and the identical bounded interval
    * minimax — same single-divide rates, same min-then-max order.
    */
  lazy val isotonicBinsSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q242d AS (SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}
       |    UNION ALL SELECT doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold})),
       |q242s AS (SELECT q.stop_ratio AS v, (d.doc_id IS NOT NULL) AS pos
       |          FROM (${TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")}) q
       |          LEFT JOIN q242d d USING (doc_id)),
       |q242b AS (SELECT CAST(least(floor(v * ${CalibBins}.0), ${CalibBins - 1}) AS BIGINT) AS bin,
       |            count(*)::BIGINT AS n,
       |            CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS d
       |          FROM q242s GROUP BY 1),
       |q242i AS (SELECT j.bin AS j, k.bin AS k,
       |            CAST(sum(b.d) AS BIGINT)::DOUBLE / CAST(sum(b.n) AS BIGINT)::DOUBLE AS rate
       |          FROM (SELECT bin FROM q242b) j
       |          JOIN (SELECT bin FROM q242b) k ON j.bin <= k.bin
       |          JOIN q242b b ON b.bin BETWEEN j.bin AND k.bin
       |          GROUP BY 1, 2),
       |q242m AS (SELECT b.bin, i.j, min(i.rate) AS mn
       |          FROM (SELECT bin FROM q242b) b
       |          JOIN q242i i ON i.j <= b.bin AND i.k >= b.bin
       |          GROUP BY 1, 2),
       |q242o AS (SELECT bin, max(mn) AS iso FROM q242m GROUP BY bin)
       |SELECT b.bin, b.n AS n_docs, b.d AS n_dup,
       |  round(b.d::DOUBLE / b.n::DOUBLE, 6) AS raw_rate,
       |  round(o.iso, 6) AS iso_rate
       |FROM q242b b JOIN q242o o USING (bin) ORDER BY b.bin""".stripMargin

  // --- q243: group-sequential monitoring looks (O'Brien–Fleming shape) ------------

  /** Group-sequential experiment monitor: one interim "look" per calendar
    * day, per event-type metric — cumulative per-arm event moments, the
    * two-sample z at that look, the information fraction
    * `f = n_cum/n_final`, the O'Brien–Fleming-shaped boundary
    * `z_b = z_{α/2}/√f` (the Lan–DeMets spending approximation —
    * conservative early, nominal at full information), and the crossed
    * flag. The "can I peek?" table: naive repeated z > 1.96 testing
    * inflates false positives roughly 5× over 20 looks; the OBF boundary
    * is what makes daily peeking honest. q238 plans the experiment, THIS
    * monitors it, q226/q225 read it out.
    *
    * Scale shape: ONE keyed (type, day) aggregate collapses the corpus to
    * ≤|types|×D pivoted per-arm integer moment rows (D = the monitored
    * window's ABSOLUTE epoch-day span — days key on datediff-from-epoch
    * like q172/q237/q244, so the same day-of-month in different months
    * never folds into one look; cents; squares in DECIMAL(38,0));
    * cumulative looks ride a per-type sorted-array fold over those ≤D
    * elements (the q172 idiom — bounded by the campaign calendar, never
    * a window over an unbounded partition); z/boundary
    * arithmetic is identically-shaped IEEE doubles on the exact integer
    * cumulative sums, and the crossed verdict compares RAW doubles on
    * both legs (q231's rule).
    */
  def sequentialLooks(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        // absolute epoch-day key (the q172/q237/q244 idiom) — dayofmonth
        // would fold the same day-of-month across months into one look
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).cast("long").as("day"),
        pmod(xxhash64(col("user_id")), lit(2L)).as("arm"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1L, col("c")).otherwise(0L)).as("s1"),
        sum(when(col("arm") === 1L, expr("CAST(c AS DECIMAL(38,0)) * c"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("ss1"),
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0L, col("c")).otherwise(0L)).as("s0"),
        sum(when(col("arm") === 0L, expr("CAST(c AS DECIMAL(38,0)) * c"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("ss0"))
    val packed = byDay
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(
        col("day"), col("n1"), col("s1"), col("ss1"),
        col("n0"), col("s0"), col("ss0")))).as("arr"))
    byDay
      .join(broadcast(packed), "event_type")
      .selectExpr("event_type", "day", "arr",
        "size(filter(arr, e -> e.day <= day)) AS i1")
      .selectExpr("event_type", "day",
        """aggregate(slice(arr, 1, i1),
             named_struct(
               'n1', 0L, 's1', 0L, 'ss1', CAST(0 AS DECIMAL(38,0)),
               'n0', 0L, 's0', 0L, 'ss0', CAST(0 AS DECIMAL(38,0))),
             (a, e) -> named_struct(
               'n1', a.n1 + e.n1, 's1', a.s1 + e.s1, 'ss1', a.ss1 + e.ss1,
               'n0', a.n0 + e.n0, 's0', a.s0 + e.s0, 'ss0', a.ss0 + e.ss0)) AS cum""",
        "aggregate(arr, 0L, (a, e) -> a + e.n1 + e.n0) AS n_final")
      .selectExpr("event_type", "day",
        "cum.n1 AS n1", "cum.n0 AS n0", "n_final",
        "CAST(cum.s1 AS DOUBLE) AS s1d", "CAST(cum.s0 AS DOUBLE) AS s0d",
        "CAST(cum.ss1 AS DOUBLE) AS ss1d", "CAST(cum.ss0 AS DOUBLE) AS ss0d")
      .filter(col("n1") > 1L && col("n0") > 1L)
      .selectExpr("event_type", "day", "n1", "n0", "n_final",
        "s1d / CAST(n1 AS DOUBLE) - s0d / CAST(n0 AS DOUBLE) AS delta",
        """(CAST(n1 AS DOUBLE) * ss1d - s1d * s1d)
           / CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
           + (CAST(n0 AS DOUBLE) * ss0d - s0d * s0d)
           / CAST(n0 AS DOUBLE) / (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE) AS se2""",
        "CAST(n1 + n0 AS DOUBLE) / CAST(n_final AS DOUBLE) AS f")
      .selectExpr(
        "event_type", "day AS look_day",
        "n1 AS n_treat", "n0 AS n_control",
        "round(delta / 100.0, 6) AS uplift",
        "round(f, 6) AS info_frac",
        "CASE WHEN se2 > 0.0 THEN round(delta / sqrt(se2), 6) END AS z",
        s"round(CAST($ZAlphaTwoSided AS DOUBLE) / sqrt(f), 6) AS obf_boundary",
        s"""CASE WHEN se2 > 0.0 THEN
             abs(delta / sqrt(se2)) > CAST($ZAlphaTwoSided AS DOUBLE) / sqrt(f)
           ELSE false END AS crossed""")
      .orderBy(col("event_type"), col("look_day"))
  }

  /** q243 oracle: the DuckHash arm, identical pivoted day moments
    * (HUGEINT squares), window cumulative sums (windows are fine
    * oracle-side), and textually identical z / boundary / crossed shapes.
    */
  lazy val sequentialLooksSql: String = {
    import graft.functions.DuckHash._
    val ctes = ArrayBuffer[(String, String)](
      "q243e" ->
        """(SELECT event_type, date_diff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS day, user_id,
          |    user_id::HUGEINT AS l,
          |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
          |  FROM events)""".stripMargin
    )
    val ch = new SqlChain("q243h", "q243e", Seq("event_type", "day", "user_id", "l", "c"))
    hashLongLevels(ch, toUnsigned("l"), "42", "h")
    ctes ++= ch.ctes
    ctes += ("q243a" ->
      s"""(SELECT event_type, day, c,
         |    (((${toSigned("h")} % 2) + 2) % 2)::BIGINT AS arm FROM ${ch.last})""".stripMargin)
    ctes += ("q243d" ->
      """(SELECT event_type, day,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
        |    sum(CASE WHEN arm = 1 THEN c::HUGEINT * c ELSE 0::HUGEINT END) AS ss1,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS s0,
        |    sum(CASE WHEN arm = 0 THEN c::HUGEINT * c ELSE 0::HUGEINT END) AS ss0
        |  FROM q243a GROUP BY 1, 2)""".stripMargin)
    ctes += ("q243c" ->
      """(SELECT event_type, day,
        |    CAST(sum(n1) OVER w AS BIGINT) AS n1, CAST(sum(s1) OVER w AS DOUBLE) AS s1d,
        |    CAST(sum(ss1) OVER w AS DOUBLE) AS ss1d,
        |    CAST(sum(n0) OVER w AS BIGINT) AS n0, CAST(sum(s0) OVER w AS DOUBLE) AS s0d,
        |    CAST(sum(ss0) OVER w AS DOUBLE) AS ss0d,
        |    CAST(sum(n1 + n0) OVER (PARTITION BY event_type) AS BIGINT) AS n_final
        |  FROM q243d WINDOW w AS (PARTITION BY event_type ORDER BY day))""".stripMargin)
    ctes += ("q243z" ->
      """(SELECT event_type, day, n1, n0, n_final,
        |    s1d / CAST(n1 AS DOUBLE) - s0d / CAST(n0 AS DOUBLE) AS delta,
        |    (CAST(n1 AS DOUBLE) * ss1d - s1d * s1d)
        |      / CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
        |      + (CAST(n0 AS DOUBLE) * ss0d - s0d * s0d)
        |      / CAST(n0 AS DOUBLE) / (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE) AS se2,
        |    CAST(n1 + n0 AS DOUBLE) / CAST(n_final AS DOUBLE) AS f
        |  FROM q243c WHERE n1 > 1 AND n0 > 1)""".stripMargin)
    assemble(
      ctes.toSeq,
      s"""SELECT event_type, day AS look_day, n1 AS n_treat, n0 AS n_control,
         |  round(delta / 100.0, 6) AS uplift,
         |  round(f, 6) AS info_frac,
         |  CASE WHEN se2 > 0.0 THEN round(delta / sqrt(se2), 6) END AS z,
         |  round(CAST($ZAlphaTwoSided AS DOUBLE) / sqrt(f), 6) AS obf_boundary,
         |  CASE WHEN se2 > 0.0 THEN
         |    abs(delta / sqrt(se2)) > CAST($ZAlphaTwoSided AS DOUBLE) / sqrt(f)
         |  ELSE false END AS crossed
         |FROM q243z ORDER BY event_type, look_day""".stripMargin)
  }

  // --- q245: training-mix concentration (HHI / effective sources) ----------------

  /** Herfindahl–Hirschman concentration of the training mix: per language,
    * the HHI of source shares and its reciprocal — the "effective number
    * of sources" (Laakso–Taagepera 1979) — plus the `_ALL` corpus row.
    * The one-number companion to q235's NMI: NMI says whether language and
    * source are entangled; this says how CONCENTRATED each language's
    * supply is (eff_sources ≈ 1 means a language is really a single-source
    * corpus — its dedup, drift, and contamination risk all collapse to
    * that source's; q218's DoReMi weights and q160's fair allocation both
    * read supply diversity before trusting a mix).
    *
    * Scale shape: ONE corpus scan collapses map-side to the
    * ≤|langs|×|sources| contingency table; per-lang totals broadcast
    * back; per-cell share² terms micro-quantize before the bounded fold
    * (§4 rule); the effective count reads the published integer sum.
    */
  def hhiMix(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.core.CacheScope.persist(
      docs(spark, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("c")))
    def conc(grain: DataFrame, label: org.apache.spark.sql.Column) = {
      val t = grain.groupBy(col("g")).agg(sum(col("c")).as("t"), count(lit(1)).as("ns"))
      grain
        .join(broadcast(t), "g")
        .select(col("g"), col("t"), col("ns"), expr(
          """CAST(round((CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
               * (CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0, 0) AS BIGINT)""").as("h"))
        .groupBy(col("g"))
        .agg(max(col("t")).as("n_docs"), max(col("ns")).as("n_sources"), sum(col("h")).as("hs"))
        .select(
          label.as("lang"),
          col("n_docs"),
          col("n_sources"),
          round(col("hs").cast("double") / lit(1000000.0), 6).as("hhi"),
          when(col("hs") > 0L,
            round(lit(1.0) / (col("hs").cast("double") / lit(1000000.0)), 6))
            .as("eff_sources"))
    }
    val perLang = conc(cells.select(col("lang").as("g"), col("source"), col("c")), col("g"))
    val allRow = conc(
      cells.groupBy(col("source")).agg(sum(col("c")).as("c")).select(lit("_ALL").as("g"), col("source"), col("c")),
      lit("_ALL"))
    perLang.unionByName(allRow).orderBy(col("lang"))
  }

  /** Oracle: identical contingency grains, micro-quantized share² folds,
    * and the published-sum effective count, `_ALL` via the source rollup.
    */
  lazy val hhiMixSql: String =
    """WITH q245m AS MATERIALIZED (
      |  SELECT lang, source, count(*)::BIGINT AS c FROM documents GROUP BY 1, 2),
      |q245g AS (SELECT lang AS g, source, c FROM q245m
      |          UNION ALL
      |          SELECT '_ALL', source, CAST(sum(c) AS BIGINT) FROM q245m GROUP BY 2),
      |q245t AS (SELECT g, CAST(sum(c) AS BIGINT) AS t, count(*)::BIGINT AS ns
      |          FROM q245g GROUP BY g),
      |q245h AS (SELECT x.g, max(x.t) AS n_docs, max(x.ns) AS n_sources,
      |            CAST(sum(CAST(round((c::DOUBLE / x.t::DOUBLE)
      |              * (c::DOUBLE / x.t::DOUBLE) * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS hs
      |          FROM (SELECT m.g, m.c, t.t, t.ns FROM q245g m JOIN q245t t USING (g)) x
      |          GROUP BY x.g)
      |SELECT g AS lang, n_docs, n_sources,
      |  round(hs::DOUBLE / 1000000.0, 6) AS hhi,
      |  CASE WHEN hs > 0 THEN round(1.0 / (hs::DOUBLE / 1000000.0), 6) END AS eff_sources
      |FROM q245h ORDER BY lang""".stripMargin

  // --- q246: capture–recapture dup-population estimate ----------------------------

  /** Capture–recapture (Lincoln–Petersen, Chapman-corrected) estimate of
    * the TOTAL near-dup pair population from two independent detectors:
    * the MinHash-LSH verified Jaccard pairs (capture 1) and the SimHash
    * hamming ≤ 3 pairs (capture 2). Each detector has blind spots; the
    * overlap between their catches prices what BOTH miss —
    * `N̂ = (n₁+1)(n₂+1)/(m+1) − 1` with Chapman's variance — turning "we
    * found 40k dup pairs" into "we found 40k of an estimated 46k ± 2k",
    * the honest denominator a dedup-coverage SLA needs (the wildlife
    * estimator applied to corpus dark matter; q219 estimates the dup RATE
    * by sampling, this estimates the undetected remainder).
    *
    * Scale shape: both pair lists are existing bounded pipelines (the
    * session-shared verified-pair stage; q26's banded SimHash); the
    * intersection is ONE equi-join on the canonical (a,b) key; three
    * integer counts feed closed-form arithmetic. Determinism: counts are
    * exact; the estimator is identically-shaped IEEE doubles, one round
    * per published column.
    */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val c1 = graft.core.CacheScope.persist(
      TextOps.ngramJaccardPairs(spark, dir).select(col("doc_a"), col("doc_b")))
    val c2 = graft.core.CacheScope.persist(
      TextOps.simhashPairs(spark, dir).select(col("doc_a"), col("doc_b")))
    val n1 = c1.agg(count(lit(1)).as("n1"))
    val n2 = c2.agg(count(lit(1)).as("n2"))
    val m  = c1.join(c2, Seq("doc_a", "doc_b")).agg(count(lit(1)).as("m"))
    n1.crossJoin(n2).crossJoin(m)
      .selectExpr("n1", "n2", "m",
        """(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
           / CAST(m + 1 AS DOUBLE)) - 1.0 AS est""",
        """(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
           * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE))
           / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE) * CAST(m + 2 AS DOUBLE)) AS var""")
      .selectExpr(
        "n1 AS n_lsh", "n2 AS n_simhash", "m AS n_both",
        "round(est, 6) AS est_total_pairs",
        "round(sqrt(var), 6) AS se",
        "CASE WHEN est > 0.0 THEN round(CAST(n1 AS DOUBLE) / est, 6) END AS capture_rate_lsh",
        "CASE WHEN est > 0.0 THEN round(CAST(n2 AS DOUBLE) / est, 6) END AS capture_rate_simhash")
  }

  /** Oracle: the exact all-pairs Jaccard CTEs (capture 1) and q26's exact
    * SimHash identity (capture 2, embedded as a derived table), the same
    * canonical-pair intersection and Chapman arithmetic.
    */
  lazy val captureRecaptureSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q246a AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}),
       |q246b AS (SELECT doc_a, doc_b FROM (${TextOps.simhashSql.replace("ORDER BY doc_a, doc_b", "")})),
       |q246n AS (SELECT
       |    (SELECT count(*)::BIGINT FROM q246a) AS n1,
       |    (SELECT count(*)::BIGINT FROM q246b) AS n2,
       |    (SELECT count(*)::BIGINT FROM q246a JOIN q246b USING (doc_a, doc_b)) AS m),
       |q246e AS (SELECT n1, n2, m,
       |    (CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE) / CAST(m + 1 AS DOUBLE)) - 1.0 AS est,
       |    (CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
       |      * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE))
       |      / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE) * CAST(m + 2 AS DOUBLE)) AS var
       |  FROM q246n)
       |SELECT n1 AS n_lsh, n2 AS n_simhash, m AS n_both,
       |  round(est, 6) AS est_total_pairs,
       |  round(sqrt(var), 6) AS se,
       |  CASE WHEN est > 0.0 THEN round(CAST(n1 AS DOUBLE) / est, 6) END AS capture_rate_lsh,
       |  CASE WHEN est > 0.0 THEN round(CAST(n2 AS DOUBLE) / est, 6) END AS capture_rate_simhash
       |FROM q246e""".stripMargin

  // --- q247: Lorenz curve of token mass --------------------------------------------

  /** Decile Lorenz curve of token mass across documents — the table behind
    * q146's Gini and q240's Theil (those publish one number; this publishes
    * the curve an allocation decision actually reads: "the top decile holds
    * X% of tokens, the bottom three hold Y%"). Docs rank ascending by
    * token count (doc_id tiebreak), decile = ⌊10·rank/N⌋ — exact integer
    * arithmetic, no float binning.
    *
    * Scale shape: the global rank rides [[strictlyLess]] (range-partition
    * + keyed windows + broadcast offsets — never a single-task window);
    * everything after is a ≤10-row table whose cumulative column folds
    * over a 1-row collected array (the q172 idiom). Integers until the
    * two guarded share divides.
    */
  def lorenzDeciles(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"), size(TextOps.toks).cast("long").as("x"))
    // persisted: totals row + decile fold both read the rank table
    val ranked = graft.core.CacheScope.persist(
      strictlyLess(base, Nil, Seq("x", "doc_id"), "r"))
    val tot = ranked.agg(count(lit(1)).as("nn"), sum(col("x")).as("xx"))
    val dec = ranked
      .crossJoin(broadcast(tot))
      .select(expr("(10 * r) div nn").as("decile"), col("x"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sx"))
    val packed = dec
      .groupBy()
      .agg(sort_array(collect_list(struct(col("decile"), col("sx")))).as("arr"))
    dec
      .crossJoin(broadcast(packed))
      .crossJoin(broadcast(tot))
      .selectExpr("decile", "n_docs", "sx", "xx",
        """aggregate(filter(arr, e -> e.decile <= decile), 0L, (a, e) -> a + e.sx) AS cum""")
      .select(
        col("decile"),
        col("n_docs"),
        col("sx").as("n_tokens"),
        round(col("sx").cast("double") / col("xx").cast("double"), 6).as("token_share"),
        round(col("cum").cast("double") / col("xx").cast("double"), 6).as("cum_token_share"))
      .orderBy(col("decile"))
  }

  /** Oracle: ROW_NUMBER−1 global ranks (windows are fine oracle-side),
    * the identical integer decile rule, and window cumulative shares.
    */
  lazy val lorenzDecilesSql: String =
    s"""WITH q247d AS MATERIALIZED (
       |  SELECT doc_id, len(${TextOps.DuckToks})::BIGINT AS x FROM documents),
       |q247r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, doc_id) - 1 AS r FROM q247d),
       |q247t AS (SELECT count(*)::BIGINT AS nn, CAST(sum(x) AS BIGINT) AS xx FROM q247d),
       |q247g AS (SELECT (10 * r) // nn AS decile, count(*)::BIGINT AS n_docs,
       |    CAST(sum(x) AS BIGINT) AS sx
       |  FROM q247r, q247t GROUP BY 1),
       |q247c AS (SELECT decile, n_docs, sx,
       |    CAST(sum(sx) OVER (ORDER BY decile) AS BIGINT) AS cum FROM q247g)
       |SELECT c.decile, c.n_docs, c.sx AS n_tokens,
       |  round(c.sx::DOUBLE / t.xx::DOUBLE, 6) AS token_share,
       |  round(c.cum::DOUBLE / t.xx::DOUBLE, 6) AS cum_token_share
       |FROM q247c c, q247t t ORDER BY c.decile""".stripMargin

  // --- q248: McNemar detector-disagreement test ------------------------------------

  /** McNemar's paired test (1947) on the two dup detectors' catches — the
    * significance companion to q246's population estimate: of the pairs
    * caught by EXACTLY ONE detector (the discordant cells b = LSH-only,
    * c = SimHash-only), is the asymmetry real or coin-flip noise?
    * `χ² = (b−c)²/(b+c)` against the 1-df critical value — a significant
    * asymmetry says one detector systematically reaches dup structure the
    * other misses (so keep both); a non-significant one says they're
    * interchangeable and the cheaper detector can own the pipeline.
    *
    * Scale shape: the same two bounded pair pipelines and ONE canonical-
    * key equi-join as q246 — the statistic needs only (n₁, n₂, m), three
    * integer counts into closed-form arithmetic with the shared
    * [[SrmCritical]] 1-df cut (q178's rule: the flag compares RAW
    * doubles on both legs).
    */
  def mcnemarDetectors(spark: SparkSession, dir: String): DataFrame = {
    val c1 = graft.core.CacheScope.persist(
      TextOps.ngramJaccardPairs(spark, dir).select(col("doc_a"), col("doc_b")))
    val c2 = graft.core.CacheScope.persist(
      TextOps.simhashPairs(spark, dir).select(col("doc_a"), col("doc_b")))
    val n1 = c1.agg(count(lit(1)).as("n1"))
    val n2 = c2.agg(count(lit(1)).as("n2"))
    val m  = c1.join(c2, Seq("doc_a", "doc_b")).agg(count(lit(1)).as("m"))
    n1.crossJoin(n2).crossJoin(m)
      .selectExpr("n1 - m AS b", "n2 - m AS c", "m")
      .selectExpr(
        "m AS n_both", "b AS n_lsh_only", "c AS n_simhash_only",
        """CASE WHEN b + c > 0 THEN
             round(CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE), 6)
           END AS mcnemar_chi2""",
        s"""CASE WHEN b + c > 0 THEN
             CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE) > $SrmCritical
           ELSE false END AS asymmetric""")
  }

  /** Oracle: q246's pair CTEs and the identical (b, c) discordant-cell
    * arithmetic with the same critical-value literal on the RAW double.
    */
  lazy val mcnemarDetectorsSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q248a AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}),
       |q248b AS (SELECT doc_a, doc_b FROM (${TextOps.simhashSql.replace("ORDER BY doc_a, doc_b", "")})),
       |q248n AS (SELECT
       |    (SELECT count(*)::BIGINT FROM q248a) AS n1,
       |    (SELECT count(*)::BIGINT FROM q248b) AS n2,
       |    (SELECT count(*)::BIGINT FROM q248a JOIN q248b USING (doc_a, doc_b)) AS m),
       |q248d AS (SELECT n1 - m AS b, n2 - m AS c, m FROM q248n)
       |SELECT m AS n_both, b AS n_lsh_only, c AS n_simhash_only,
       |  CASE WHEN b + c > 0 THEN
       |    round(CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE), 6)
       |  END AS mcnemar_chi2,
       |  CASE WHEN b + c > 0 THEN
       |    CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE) > $SrmCritical
       |  ELSE false END AS asymmetric
       |FROM q248d""".stripMargin

  // --- q249: cumulative-gain (lift) deciles of the dup signal ----------------------

  /** Cumulative-gain table of q22's stop-ratio signal against verified
    * near-dup truth: docs ranked by score DESCENDING in deciles, each row
    * the decile's dup count, the CUMULATIVE capture rate ("review the top
    * k×10 % and catch this fraction of all dups"), and the lift over
    * random — the triage-queue planning table behind q224's single AP
    * number (AP says the ranking is good; this says where to CUT the
    * review budget: lift collapsing to 1 marks the decile where the
    * signal stops paying).
    *
    * Scale shape: the global rank rides [[strictlyLess]] on
    * (−score, doc_id) (range-partition + keyed windows + broadcast
    * offsets); decile = ⌊10·rank/N⌋ in exact integer arithmetic;
    * everything after is a ≤10-row table with a 1-row collected-array
    * cumulative fold (q247's shape on the calibration family's truth).
    */
  def liftDeciles(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextOps.ngramJaccardPairs(spark, dir)
    val dups = pairs
      .select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    // persisted: the NARROW scored table feeds the rank machinery (whose
    // range shuffle samples + shuffles it, two executions) AND the totals
    // row. r15: the totals (count + dup count) are rank-INDEPENDENT, so
    // they read this table directly — the r14 spelling persisted the rank
    // OUTPUT for them, a second corpus-grain materialization the driver's
    // bench measured at +1.6 s; the rank table is now consumed exactly
    // once (the decile fold) and no longer cached.
    val scored = graft.core.CacheScope.persist(
      TextOps
        .qualityScored(spark, dir)
        .select(col("doc_id"), (-col("stop_ratio")).as("nv"))
        .join(dups.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"), col("nv"), coalesce(col("is_dup"), lit(false)).as("pos")))
    val ranked = strictlyLess(scored, Nil, Seq("nv", "doc_id"), "r", cacheInput = false)
    val tot = scored.agg(
      count(lit(1)).as("nn"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("dd"))
    val dec = ranked
      .crossJoin(broadcast(tot))
      .select(expr("(10 * r) div nn").as("decile"), col("pos"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(when(col("pos"), 1L).otherwise(0L)).as("d"))
    val packed = dec
      .groupBy()
      .agg(sort_array(collect_list(struct(col("decile"), col("n_docs"), col("d")))).as("arr"))
    dec
      .crossJoin(broadcast(packed))
      .crossJoin(broadcast(tot))
      .selectExpr("decile", "n_docs", "d", "nn", "dd",
        "aggregate(filter(arr, e -> e.decile <= decile), 0L, (a, e) -> a + e.d) AS cum_d",
        "aggregate(filter(arr, e -> e.decile <= decile), 0L, (a, e) -> a + e.n_docs) AS cum_n")
      .selectExpr(
        "decile", "n_docs", "d AS n_dup",
        "CASE WHEN dd > 0 THEN round(CAST(cum_d AS DOUBLE) / CAST(dd AS DOUBLE), 6) END" +
          " AS cum_capture",
        """CASE WHEN dd > 0 THEN
             round((CAST(cum_d AS DOUBLE) / CAST(dd AS DOUBLE))
               / (CAST(cum_n AS DOUBLE) / CAST(nn AS DOUBLE)), 6) END AS lift""")
      .orderBy(col("decile"))
  }

  /** Oracle: q220's dup-truth/score CTEs, ROW_NUMBER−1 descending ranks,
    * the identical integer decile rule and window cumulative gain.
    */
  lazy val liftDecilesSql: String =
    s"""WITH ${TextOps.DuckShingleCte},
       |${TextOps.DuckJaccardPairsCte},
       |q249d AS (SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold}
       |    UNION ALL SELECT doc_b FROM pairs WHERE jaccard >= ${TextOps.JaccardThreshold})),
       |q249s AS (SELECT q.doc_id, -q.stop_ratio AS nv, (d.doc_id IS NOT NULL) AS pos
       |          FROM (${TextOps.qualityScoreSql.replace("ORDER BY doc_id", "")}) q
       |          LEFT JOIN q249d d USING (doc_id)),
       |q249r AS (SELECT pos, ROW_NUMBER() OVER (ORDER BY nv, doc_id) - 1 AS r FROM q249s),
       |q249t AS (SELECT count(*)::BIGINT AS nn,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS dd FROM q249s),
       |q249g AS (SELECT (10 * r) // nn AS decile, count(*)::BIGINT AS n_docs,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM q249r, q249t GROUP BY 1),
       |q249c AS (SELECT decile, n_docs, d,
       |    CAST(sum(d) OVER (ORDER BY decile) AS BIGINT) AS cum_d,
       |    CAST(sum(n_docs) OVER (ORDER BY decile) AS BIGINT) AS cum_n FROM q249g)
       |SELECT c.decile, c.n_docs, c.d AS n_dup,
       |  CASE WHEN t.dd > 0 THEN round(CAST(c.cum_d AS DOUBLE) / CAST(t.dd AS DOUBLE), 6)
       |  END AS cum_capture,
       |  CASE WHEN t.dd > 0 THEN
       |    round((CAST(c.cum_d AS DOUBLE) / CAST(t.dd AS DOUBLE))
       |      / (CAST(c.cum_n AS DOUBLE) / CAST(t.nn AS DOUBLE)), 6) END AS lift
       |FROM q249c c, q249t t ORDER BY c.decile""".stripMargin
}
