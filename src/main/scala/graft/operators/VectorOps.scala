package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Expressions.{dot_product, hyperplane_bucket, l2_norm}

/** §2.C similarity-search operators over the `embeddings` table
  * (array<float> column).
  *
  * Scale posture: the brute-force path broadcasts a SMALL query set against
  * the corpus (linear scan, no shuffle of the corpus); the LSH paths bucket
  * the corpus with random hyperplanes so the join shuffles on bucket ids and
  * candidate volume stays near-linear. Dot products and norms are custom
  * codegen'd expressions (`DotProduct`/`L2Norm`) with the same left-fold
  * IEEE order as the `zip_with`/`aggregate` folds they replace — Spark's
  * higher-order lambdas evaluate interpreted, these stay in whole-stage
  * codegen, and the DuckDB oracles keep matching bit-for-bit.
  */
object VectorOps {

  // --- corpus-sized LSH hyperplane counts -------------------------------------
  //
  // A FIXED plane count is a fixed bucket universe: on growing data the
  // per-bucket occupancy — and the within-bucket pair expansion — grows
  // quadratically until the bucket cap clamps it (the r12 density gate
  // measured exactly that: ×10.1 per-doc pair density at 10× docs). The
  // standard LSH prescription is planes ∝ log n, which keeps EXPECTED
  // occupancy at a constant target so bucket count scales with the corpus
  // and candidate work stays linear (pairs ≈ tables · n · occupancy/2).
  // The count is derived from ONE cheap metadata count of the raw
  // `embeddings` table, memoized per (session, dir), and the DuckDB
  // oracles re-derive the SAME value from the same count in pure integer
  // arithmetic (below) — no float log2 whose ulp could make the engines
  // disagree on a power-of-two boundary.

  /** Target expected bucket occupancy. Larger = fewer planes = higher
    * recall but more candidate pairs per doc (pairs/doc ≈ tables·occ/2);
    * q251's recall probe measures what the setting costs on live data.
    */
  val LshTargetOccupancy = 32L

  /** Floor for the near-dup tables (the test-scale setting rounds 1–12
    * pinned; 500-vector corpora derive exactly this, so tiny-SF results
    * are unchanged by the sizing).
    */
  val NearDupMinPlanes = 5

  /** Floor for the single-table ANN index (its recall dial is multi-probe
    * volume, not table count, so it tolerates one more plane).
    */
  val AnnMinPlanes = 6

  /** `max(minPlanes, ceil(log2(ceil(n / occupancy))))` in pure integer
    * arithmetic: the smallest p with `2^p ≥ ceil(n/occ)`, clamped to 31
    * (bucket ids stay positive ints).
    */
  private[graft] def lshPlanesFor(n: Long, minPlanes: Int): Int = {
    val m = (n + LshTargetOccupancy - 1) / LshTargetOccupancy
    var p = 0
    while (p < 31 && (1L << p) < m) p += 1
    math.max(minPlanes, p)
  }

  /** Raw `embeddings` row count for `dir` — parquet footer metadata only
    * (no column scan), memoized per (session, dir) via the SharedStages
    * model memo so a session pays it once.
    */
  private[graft] def corpusN(spark: SparkSession, dir: String): Long =
    SharedStages
      .model(spark, dir, "embCount")(java.lang.Long.valueOf(Tables.embeddings(spark, dir).count()))
      .longValue()

  /** The derived plane count for the multi-table near-dup family
    * (q30/q65/q212/q213/q227/q228).
    */
  def nearDupPlanesFor(spark: SparkSession, dir: String): Int =
    lshPlanesFor(corpusN(spark, dir), NearDupMinPlanes)

  // ---- r14: the recall dial, TURNED ---------------------------------------
  // r13 made the plane count corpus-derived (linear candidate cost) but held
  // the table count at 6 — and hyperplane-LSH recall at a fixed table count
  // decays exponentially in the plane count: the builder's own q251 probe
  // measured recall@0.45 collapsing 0.50 → 0.43 → 0.072 as planes grew
  // 5 → 6 → 10. The standard amplification bound says what the dial must
  // do: with per-table candidate probability c₁(p) for a pair AT the action
  // threshold, L(p) = ceil(ln(1−R) / ln(1−c₁(p))) tables hold recall ≥ R at
  // every scale. Two dials turn together:
  //   - hamming-1 probing (q29's ANN idiom, now on the PAIR side): each
  //     vector also lands — flagged non-home — in the `planes` buckets one
  //     bit away, and a candidate pair is any in-bucket pair with ≥ 1 home
  //     member, i.e. hamming(bucket_a, bucket_b) ≤ 1 in some table. This
  //     raises c₁(p) from s^p to s^p + p·s^(p−1)·(1−s) — ~4× at p = 10 —
  //     where s = 1 − θ/π is the per-plane agreement probability at the
  //     action threshold (cos θ = SemDedupThreshold).
  //   - the table count grows with the derived plane count per the bound.
  // The honest price (documented, SURVEY §5): holding recall costs
  // L(p)·(p+1) ∝ n^ρ·log n candidate volume with ρ = ln(1/s)/ln 2 ≈ 0.62 —
  // the data-independent LSH frontier; no table/probe schedule beats it.
  // What stays LINEAR is the SURFACED pair table (the data's true dup
  // structure); the BenchSf1 gate measures both: surfaced per-doc density
  // (≤ 2× across SFs) and q251 recall@0.45 (≥ [[NearDupRecallFloor]]) at
  // sf1. Past [[MaxNearDupTables]] the derivation CAPS and q251/the gate
  // surface the measured shortfall loudly instead of thinning silently —
  // the 100 TB remedies are a higher action threshold (s grows, L falls)
  // or a raised occupancy target, both corpus decisions, not engine ones.

  /** Recall target the table count is derived for, at the q65/q212 action
    * threshold ([[SemDedupThreshold]]); the BenchSf1 gate floor sits below
    * it ([[NearDupRecallFloor]]) to absorb probe-sample noise.
    */
  val NearDupRecallTarget = 0.9

  /** The recall floor the sf1 lane FAILS under (q251's measured recall at
    * the 0.45 action threshold).
    */
  val NearDupRecallFloor = 0.8

  /** Table-count ceiling: keeps the hash-index family below
    * [[JlTable]] = 97's decorrelation offset and bounds a mis-sized run;
    * the amplification bound first exceeds it at p = 14 (n ≈ 262k at the
    * 32-occupancy design point), where derived recall degrades MEASURED
    * (q251) rather than silently.
    */
  val MaxNearDupTables = 96

  /** `L(p) = ceil(ln(1−R) / ln(1−c₁(p)))` for R = [[NearDupRecallTarget]],
    * `c₁(p) = s^p + p·s^(p−1)·(1−s)`, `s = 1 − arccos(0.45)/π ≈ 0.6486`
    * (hamming-1 probing) — precomputed so the DuckDB oracles re-derive the
    * IDENTICAL integer from the same literal table ([[tablesCaseSql]]),
    * with no float whose ulp could split the engines on a ceil boundary.
    * `NearDupTableCountsSpec` re-derives every entry from the closed form.
    */
  private[graft] val NearDupTableCounts: Map[Int, Int] =
    Map(5 -> 5, 6 -> 7, 7 -> 9, 8 -> 13, 9 -> 19, 10 -> 27, 11 -> 38, 12 -> 55, 13 -> 79)

  /** The derived table count for the near-dup family at `planes` planes. */
  def nearDupTablesFor(planes: Int): Int =
    NearDupTableCounts.getOrElse(planes, MaxNearDupTables)

  /** DuckDB CASE re-deriving [[nearDupTablesFor]] from a `planes` column —
    * the same literal lookup, integer-exact on both engines.
    */
  private def tablesCaseSql(planesCol: String): String =
    NearDupTableCounts.toSeq.sorted
      .map { case (p, l) => s"WHEN $planesCol = $p THEN $l" }
      .mkString("CASE ", " ", s" ELSE $MaxNearDupTables END")

  /** The derived plane count for the ANN index family (q29/q85/q89). */
  def annPlanesFor(spark: SparkSession, dir: String): Int =
    lshPlanesFor(corpusN(spark, dir), AnnMinPlanes)

  /** DuckDB CTE pair `(<pfx>cnt, <pfx>np)` deriving the identical plane
    * count: same raw count, same ceil-div, same smallest-power-of-two
    * scan, same floor — integer-exact on both engines. `<pfx>np` has one
    * row, column `planes`.
    */
  private def planesCtes(pfx: String, minPlanes: Int): Seq[(String, String)] = Seq(
    s"${pfx}cnt" -> "(SELECT count(*)::BIGINT AS n FROM embeddings)",
    s"${pfx}np" ->
      (s"(SELECT GREATEST($minPlanes, COALESCE(min(p), 31))::INTEGER AS planes " +
        s"FROM range(0, 32) r(p), ${pfx}cnt " +
        s"WHERE (1::BIGINT << p) >= (n + ${LshTargetOccupancy - 1}) // $LshTargetOccupancy)")
  )

  /** embeddings with the float vector upcast to double + precomputed norm.
    * Zero-norm vectors are dropped: they carry no direction, and their
    * cosine is NaN — which Spark sorts ABOVE all real values, so one zero
    * vector would otherwise claim rank 1 of every query's top-k.
    */
  private[graft] def emb(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v")
      )
      .withColumn("nrm", l2_norm(col("v")))
      .filter(col("nrm") > 0)

  // Codegen'd left-fold dot (identical IEEE order to the zip_with/aggregate
  // fold it replaces — Spark's higher-order lambdas run interpreted, this
  // stays in whole-stage codegen; the DuckDB oracles still match bitwise).
  private val dot: Column = dot_product(col("qv"), col("cv"))

  // --- C9 q28: brute-force cosine top-k (oracled; ids+rank only) -----------
  val QueryCount = 8
  val TopK       = 5

  def cosineTopK(spark: SparkSession, dir: String): DataFrame =
    // session-shared: the exact top-k is the ground truth of the whole
    // retrieval-eval family (q28 itself + q85/q89/q152/q222) — the
    // brute-force corpus scan otherwise re-ran per consumer per run. The
    // stage is the k-bounded (QueryCount × TopK) result table.
    SharedStages.exactTopK(spark, dir).orderBy(col("q_id"), col("rk"))

  /** The raw exact-top-k scan [[SharedStages.exactTopK]] materializes. */
  private[graft] def cosineTopKPlan(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .select(col("q_id"), col("n_id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= TopK)
  }

  /** The explicit cosine in the SPARK evaluation shape —
    * `dot / (sqrt(‖a‖²) * sqrt(‖b‖²))` with left-fold dot products — NOT
    * `list_cosine_similarity`, whose internal factoring can differ by an
    * ulp and flip a rank boundary between engines.
    */
  private[graft] def duckCosine(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  val cosineTopKSql: String =
    s"""SELECT q_id, n_id, rk FROM (
       | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |    ORDER BY ${duckCosine("q.vd", "c.vd")} DESC, c.vec_id) AS rk
       | FROM (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings
       |        WHERE vec_id < $QueryCount
       |          AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0) q,
       |      (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings
       |        WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0) c
       | WHERE q.vec_id <> c.vec_id)
       |WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  // --- q176: retrieval MRR against label ground truth ------------------------

  val MrrK = 20L

  /** Mean reciprocal rank of embedding retrieval against the label ground
    * truth — the first-relevant-hit metric a RAG/search stack reports
    * beside recall: per query vector, the rank of the first SAME-LABEL
    * neighbor under exact cosine order (ties to the smaller id — q28's
    * rule), capped at [[MrrK]]; the `q_id = -1` summary row carries
    * MRR@[[MrrK]] over the query set. q85/q89 measure whether an index
    * returns the true top-k; q152 whether truncated dimensions rank the
    * same; q164 whether two legs agree; q176 asks the user-facing
    * question — "how far down is the first RIGHT answer?" — the number
    * that moves when labels are noisy even while index recall is perfect.
    *
    * Scale shape: q28's broadcast idiom — the fixed query set broadcasts
    * against the corpus, ranks are per-query windows over the bounded
    * candidate stream, and the summary folds ≤ [[QueryCount]] rows.
    * Determinism: reciprocal ranks quantize to integer micro-units before
    * the order-free sum (the q163 rule); misses contribute exactly 0.
    */
  def retrievalMrr(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"),
        col("label"))
      .withColumn("nrm", l2_norm(col("v")))
      .filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("label").as("ql"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"),
      col("label").as("cl"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val firstRel = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .select(col("q_id"), col("ql"), col("cl"), row_number().over(w).as("rk"))
      .filter(col("cl") === col("ql"))
      .groupBy(col("q_id"))
      .agg(min(col("rk")).as("r"))
    val perQ = q
      .select(col("q_id"), col("ql").as("label"))
      .join(broadcast(firstRel), Seq("q_id"), "left")
      .select(
        col("q_id"),
        col("label"),
        when(col("r") <= MrrK, col("r").cast("long")).as("first_rel_rank"),
        when(col("r") <= MrrK, expr("CAST(round(1000000.0 / r, 0) AS BIGINT)"))
          .otherwise(0L).as("rrq"))
    val summary = perQ
      .groupBy()
      .agg(count(lit(1)).as("nq"), sum(col("rrq")).as("srr"))
      .select(
        lit(-1L).as("q_id"),
        lit(-1).as("label"),
        lit(null).cast("long").as("first_rel_rank"),
        round(col("srr").cast("double") / lit(1000000.0) / col("nq").cast("double"), 6)
          .as("rr"))
    perQ
      .select(col("q_id"), col("label"), col("first_rel_rank"),
        (col("rrq").cast("double") / lit(1000000.0)).as("rr"))
      .unionByName(summary)
      .orderBy(col("q_id"))
  }

  /** Oracle: q28's engine-exact cosine rank spelling with labels carried,
    * identical micro-unit quantization and summary fold.
    */
  lazy val retrievalMrrSql: String =
    s"""WITH q176e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS vd, label FROM embeddings
       |  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
       |q176k AS (
       |  SELECT q.vec_id AS q_id, q.label AS ql, c.label AS cl,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${duckCosine("q.vd", "c.vd")} DESC, c.vec_id) AS rk
       |  FROM (SELECT * FROM q176e WHERE vec_id < $QueryCount) q, q176e c
       |  WHERE q.vec_id <> c.vec_id),
       |q176r AS (SELECT q_id, min(rk) AS r FROM q176k WHERE cl = ql GROUP BY 1),
       |q176p AS (
       |  SELECT qq.vec_id AS q_id, qq.label AS label,
       |    CASE WHEN r.r <= $MrrK THEN r.r::BIGINT END AS first_rel_rank,
       |    CASE WHEN r.r <= $MrrK THEN CAST(round(1000000.0 / r.r, 0) AS BIGINT)
       |         ELSE 0 END AS rrq
       |  FROM (SELECT vec_id, label FROM q176e WHERE vec_id < $QueryCount) qq
       |  LEFT JOIN q176r r ON r.q_id = qq.vec_id)
       |SELECT q_id, label, first_rel_rank, CAST(rrq AS DOUBLE) / 1000000.0 AS rr FROM q176p
       |UNION ALL
       |SELECT -1::BIGINT, -1::INTEGER, NULL::BIGINT,
       |  round(CAST(sum(rrq) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE), 6)
       |FROM q176p
       |ORDER BY q_id""".stripMargin

  // --- q115: hard-negative mining (contrastive training pairs) --------------
  val HardK = 5

  /** Hard-negative mining for contrastive/embedding training: per query
    * vector, the [[HardK]] highest-cosine neighbors with a DIFFERENT label
    * — the negatives nearest the decision boundary, which carry the most
    * gradient signal (random negatives are trivially separable) — plus the
    * margin against the best same-label positive (`pos_sim − neg_sim`),
    * the per-query difficulty readout: a NEGATIVE margin means a
    * wrong-label vector outranks every right-label one, i.e. a labeling
    * or embedding-quality defect worth auditing before training.
    *
    * Scale shape: q28's broadcast idiom — the fixed [[QueryCount]] query
    * set broadcasts against a linear corpus scan (no corpus shuffle); the
    * positive bar is a per-query float `max` with map-side combine
    * (max is order-free exact), and the negative rank window group-limits
    * to [[HardK]] per query (WindowGroupLimit — map-side top-k, the q28
    * plan). At 100 TB the exact scan swaps for a q29/q32 candidate pool;
    * ranking, margin, and the output contract are unchanged.
    * Determinism: q28's bit-exact left-fold cosine, (sim desc, n_id)
    * ranking, 6-dp rounded outputs.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"),
        col("label"))
      .withColumn("nrm", l2_norm(col("v")))
      .filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("label").as("ql"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"),
      col("label").as("nl"))
    val sims = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
    val pos = sims
      .filter(col("nl") === col("ql"))
      .groupBy(col("q_id"))
      .agg(max(col("sim")).as("pos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    sims
      .filter(col("nl") =!= col("ql"))
      .select(col("q_id"), col("n_id"), col("sim"), row_number().over(w).as("rk"))
      .filter(col("rk") <= HardK)
      .join(pos, Seq("q_id"), "left")
      .select(
        col("q_id"),
        col("rk"),
        col("n_id"),
        round(col("sim"), 6).as("neg_sim"),
        round(col("pos_sim") - col("sim"), 6).as("margin"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** q115 oracle: q28's engine-exact cosine, the same other-label rank and
    * same-label max bar, identical 6-dp rounding shapes.
    */
  lazy val hardNegativesSql: String =
    s"""WITH q115e AS (SELECT vec_id, embedding::DOUBLE[] AS vd, label FROM embeddings
       |  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
       |q115s AS (SELECT q.vec_id AS q_id, q.label AS ql, c.vec_id AS n_id, c.label AS nl,
       |    ${duckCosine("q.vd", "c.vd")} AS sim
       |  FROM (SELECT * FROM q115e WHERE vec_id < $QueryCount) q, q115e c
       |  WHERE q.vec_id <> c.vec_id),
       |q115p AS (SELECT q_id, max(sim) AS pos_sim FROM q115s WHERE nl = ql GROUP BY q_id),
       |q115n AS (SELECT q_id, n_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
       |  FROM q115s WHERE nl <> ql)
       |SELECT n.q_id, n.rk::INTEGER AS rk, n.n_id, round(n.sim, 6) AS neg_sim,
       |  round(p.pos_sim - n.sim, 6) AS margin
       |FROM q115n n LEFT JOIN q115p p USING (q_id)
       |WHERE n.rk <= $HardK ORDER BY n.q_id, n.rk""".stripMargin

  /** Ranked cosine neighbors of ONE query vector — the vector leg of the
    * hybrid RRF retrieval (q55). Single-row broadcast against the linear
    * corpus scan (the q28 shape), top-k via TakeOrdered, then ranks over
    * the already-k-bounded result via [[BoundedRank]] (a ≤k-row global
    * aggregate — never the corpus, and no partitionless window warning).
    */
  private[graft] def cosineRanksForQuery(
      spark: SparkSession,
      dir: String,
      queryId: Long,
      k: Int
  ): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"), col("nrm").as("qn"))
    val c = e
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
    val top = c
      .crossJoin(broadcast(q))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .orderBy(col("sim").desc, col("n_id"))
      .limit(k)
    BoundedRank.byValueDesc(top, col("sim"), col("n_id"), "doc_id", "rv")
  }

  // --- q83: MMR-diversified retrieval --------------------------------------

  val MmrPool   = 10
  val MmrSelect = 4

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998) of
    * each query's exact cosine top-[[MmrPool]]: greedily pick
    * [[MmrSelect]] results maximizing `0.7·rel − 0.3·max_sim_to_selected`
    * — the retrieval step that keeps a RAG context window or a few-shot
    * pool from filling up with near-duplicates of the same best hit.
    *
    * The greedy loop is NOT a driver loop: per query the candidate pool
    * and its pairwise similarities are bounded (≤ pool, ≤ pool²), so both
    * collapse into one row and the whole selection runs as a single SQL
    * `aggregate` fold over `sequence(1, M)` — each step appends the
    * argmax (score, then lowest id) of the still-unselected candidates.
    * At 100 TB the expensive part is the pool construction, which is
    * exactly q28's broadcast-query linear scan; the fold is O(M·k²·k)
    * driver-free arithmetic per query row.
    *
    * Float determinism: rel and pair sims are the same left-fold dot /
    * norm-product shape q28 pins bit-exact across engines; the MMR score
    * is two multiplies by the same decimal literals and one subtraction,
    * folded over identical doubles — so the argmax (with the `(sc, −id)`
    * lexicographic tie rule) is engine-identical, and the output score
    * rounds to 6 as elsewhere.
    */
  def mmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rel").desc, col("n_id"))
    val cands = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("rel", dot / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= MmrPool)
      .select(col("q_id"), col("n_id"), col("rk"), col("rel"), col("cv"), col("cn"))
      .persist() // read twice: the pool itself + both sides of the pair join
    val a = cands.select(col("q_id"), col("n_id").as("pa"), col("cv").as("av"), col("cn").as("an"))
    val b = cands.select(col("q_id"), col("n_id").as("pb"), col("cv").as("bv"), col("cn").as("bn"))
    val pairs = a.join(b, "q_id")
      .filter(col("pa") =!= col("pb"))
      .withColumn("psim", dot_product(col("av"), col("bv")) / (col("an") * col("bn")))
      .select(col("q_id"), col("pa"), col("pb"), col("psim"))
    val gc = cands.groupBy(col("q_id"))
      .agg(expr("sort_array(collect_list(struct(rk, n_id, rel)))").as("rem"))
    val gp = pairs.groupBy(col("q_id"))
      .agg(collect_list(struct(col("pa"), col("pb"), col("psim"))).as("prs"))
    val fold =
      s"""aggregate(
         |  sequence(1, $MmrSelect),
         |  cast(array() AS array<struct<n_id:bigint, sc:double>>),
         |  (st, i) -> concat(st, transform(
         |    array(array_max(transform(
         |      filter(rem, r -> NOT exists(st, s -> s.n_id = r.n_id)),
         |      r -> struct(
         |        0.7D * r.rel - 0.3D * coalesce(
         |          array_max(transform(st,
         |            s -> filter(prs, p -> p.pa = r.n_id AND p.pb = s.n_id)[0].psim)),
         |          0D) AS sc,
         |        -r.n_id AS neg,
         |        r.n_id AS n_id)))),
         |    b -> struct(b.n_id AS n_id, b.sc AS sc))))""".stripMargin
    gc.join(gp, "q_id")
      .withColumn("sel", expr(fold))
      .select(col("q_id"), posexplode(col("sel")).as(Seq("pos", "s")))
      .select(
        col("q_id"),
        col("s.n_id").as("n_id"),
        (col("pos") + 1).cast("int").as("mmr_rank"),
        round(col("s.sc"), 6).as("mmr_score"))
      .orderBy(col("q_id"), col("mmr_rank"))
  }

  /** Oracle: the same pool (q28's ROW_NUMBER shape), the same pair sims,
    * and the greedy fold as a [[MmrSelect]]-step recursive CTE — each step
    * appends `list_reverse_sort(...)[1]`, the identical (sc, −id) argmax.
    */
  lazy val mmrDiversifySql: String =
    s"""WITH RECURSIVE q83e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings
       |  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
       |q83c AS MATERIALIZED (
       |  SELECT q_id, n_id, rk, rel FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      ${duckCosine("q.vd", "c.vd")} AS rel,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${duckCosine("q.vd", "c.vd")} DESC, c.vec_id) AS rk
       |    FROM q83e q JOIN q83e c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < $QueryCount)
       |  WHERE rk <= $MmrPool),
       |q83p AS MATERIALIZED (
       |  SELECT a.q_id, a.n_id AS pa, b.n_id AS pb,
       |    ${duckCosine("ea.vd", "eb.vd")} AS psim
       |  FROM q83c a JOIN q83c b ON a.q_id = b.q_id AND a.n_id <> b.n_id
       |  JOIN q83e ea ON ea.vec_id = a.n_id
       |  JOIN q83e eb ON eb.vec_id = b.n_id),
       |q83g AS MATERIALIZED (
       |  SELECT c.q_id,
       |    (SELECT list({'rk': rk, 'n_id': n_id, 'rel': rel} ORDER BY rk)
       |     FROM q83c x WHERE x.q_id = c.q_id) AS rem,
       |    (SELECT list({'pa': pa, 'pb': pb, 'psim': psim})
       |     FROM q83p y WHERE y.q_id = c.q_id) AS prs
       |  FROM (SELECT DISTINCT q_id FROM q83c) c),
       |q83s(q_id, step, sel) AS (
       |  SELECT q_id, 0, []::STRUCT(n_id BIGINT, sc DOUBLE)[] FROM q83g
       |  UNION ALL
       |  SELECT s.q_id, s.step + 1,
       |    list_concat(s.sel, list_transform(
       |      [list_reverse_sort(list_transform(
       |        list_filter(g.rem, r -> len(list_filter(s.sel, z -> z.n_id = r.n_id)) = 0),
       |        r -> {'sc': 0.7 * r.rel - 0.3 * coalesce(
       |                list_aggregate(list_transform(s.sel,
       |                  z -> list_filter(g.prs, p -> p.pa = r.n_id AND p.pb = z.n_id)[1].psim),
       |                  'max'), 0.0),
       |              'neg': -r.n_id, 'n_id': r.n_id}))[1]],
       |      b -> {'n_id': b.n_id, 'sc': b.sc}))
       |  FROM q83s s JOIN q83g g ON s.q_id = g.q_id
       |  WHERE s.step < $MmrSelect)
       |SELECT q_id, u.n_id AS n_id, u.rk::INTEGER AS mmr_rank, round(u.sc, 6) AS mmr_score
       |FROM (SELECT q_id,
       |        unnest(list_transform(sel, (x, i) -> {'n_id': x.n_id, 'rk': i, 'sc': x.sc})) AS u
       |      FROM q83s WHERE step = $MmrSelect)
       |ORDER BY q_id, mmr_rank""".stripMargin

  // --- C10 q29: hyperplane-LSH bucketed ANN top-k (rows-only) --------------
  // Corpus-sized plane count ([[annPlanesFor]]: planes ∝ log n, expected
  // occupancy ≈ [[LshTargetOccupancy]]) → bucket count grows WITH the
  // corpus, so per-query candidate volume stays ≈ (planes+1) × occupancy
  // instead of growing linearly at a fixed bucket universe — the join
  // below shuffles on bucket only. Multi-probe (default on): a query also
  // probes every bucket at hamming distance 1 — a near neighbor that
  // falls just on the other side of ONE hyperplane is still found. This is
  // the standard recall/cost dial that lets plane count grow with the
  // corpus without recall collapsing; probe volume stays (planes+1) ×
  // QueryCount, bounded by construction.
  val AnnTopK = 3

  def annLsh(spark: SparkSession, dir: String, multiProbe: Boolean = true): DataFrame =
    // default (multi-probe) path is session-shared — q29/q85/q89 all read
    // the same k-bounded probe result; the no-probe variant is a spec-only
    // ablation and stays inline
    (if (multiProbe) SharedStages.annLshTopK(spark, dir)
     else annLshPlan(spark, dir, multiProbe = false))
      .orderBy(col("q_id"), col("rk"))

  /** The raw LSH probe pass [[SharedStages.annLshTopK]] materializes. */
  private[graft] def annLshPlan(
      spark: SparkSession,
      dir: String,
      multiProbe: Boolean = true): DataFrame = {
    val planes = annPlanesFor(spark, dir)
    val e = emb(spark, dir).withColumn("bucket", hyperplane_bucket(col("v"), 0, planes))
    val q0 = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val q =
      if (!multiProbe) q0
      else
        q0.select(
          col("q_id"),
          col("qv"),
          col("qn"),
          explode(
            expr(
              s"""array_union(array(bucket),
                 |  transform(sequence(0, ${planes - 1}),
                 |            p -> cast(bucket ^ shiftleft(1, p) AS int)))""".stripMargin)
          ).as("bucket")
        )
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .select(col("q_id"), col("n_id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= AnnTopK)
  }

  /** DuckDB oracle reproducing [[annLsh]] (multi-probe) bit-for-bit. The
    * Rademacher plane matrix is re-derived from the same
    * `XXH64.hashLong((table·64+p)·64+d, 42)` bit (via
    * [[graft.functions.DuckHash]]); dot products, norms, and cosines are
    * left-fold double arithmetic in the exact evaluation order of the Spark
    * side's `aggregate(...)` folds, so buckets, probe sets, similarity
    * values, and the (sim DESC, n_id) ranking are all engine-identical —
    * no rounding slack needed anywhere.
    */
  lazy val annLshSql: String = {
    import graft.functions.DuckHash._
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](planesCtes("q29", AnnMinPlanes): _*)
    ctes += ("q29pd" ->
      ("(SELECT p, d, ((0 * 64 + p) * 64 + d)::HUGEINT AS idx " +
        "FROM range(0, 32) r(p), range(0, 64) s(d), q29np WHERE p < planes)"))
    val ch = new SqlChain("q29h", "q29pd", Seq("p", "d", "idx"))
    hashLongLevels(ch, "idx", "42", "hw")
    ctes ++= ch.ctes
    ctes += ("q29sgn" ->
      s"(SELECT p, list(CASE WHEN hw % 2 = 1 THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv FROM ${ch.last} GROUP BY p)")
    ctes += ("q29ev" ->
      """(SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding::DOUBLE[], x -> x * x)),
        |         (a, x) -> a + x)) AS nrm
        |  FROM embeddings)""".stripMargin)
    ctes += ("q29ef" -> "(SELECT * FROM q29ev WHERE nrm > 0)")
    ctes += ("q29dots" ->
      """(SELECT vec_id, p,
        |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> v[i] * sv[i])),
        |      (a, x) -> a + x) AS dot
        |  FROM q29ef, q29sgn)""".stripMargin)
    ctes += ("q29bkt" ->
      "(SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END)::INTEGER AS bucket FROM q29dots GROUP BY vec_id)")
    ctes += ("q29c" ->
      "(SELECT f.vec_id AS n_id, f.v AS cv, f.nrm AS cn, b.bucket FROM q29ef f JOIN q29bkt b USING (vec_id))")
    ctes += ("q29q" ->
      s"""(SELECT DISTINCT q_id, qv, qn, unnest(probes) AS bucket FROM (
         |    SELECT f.vec_id AS q_id, f.v AS qv, f.nrm AS qn,
         |      list_prepend(b.bucket, list_transform(range(0, np.planes),
         |        p -> xor(b.bucket::BIGINT, (1 << p)::BIGINT)::INTEGER)) AS probes
         |    FROM q29ef f JOIN q29bkt b USING (vec_id), q29np np WHERE f.vec_id < $QueryCount))""".stripMargin)
    ctes += ("q29rk" ->
      """(SELECT q_id, n_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
        |      list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> qv[i] * cv[i])),
        |        (a, x) -> a + x) / (qn * cn) DESC,
        |      n_id) AS rk
        |  FROM q29c JOIN q29q USING (bucket) WHERE q_id <> n_id)""".stripMargin)
    assemble(
      ctes.toSeq,
      s"SELECT q_id, n_id, rk::INTEGER AS rk FROM q29rk WHERE rk <= $AnnTopK ORDER BY q_id, rk")
  }

  // --- q85: ANN recall report ----------------------------------------------

  /** ANN quality monitoring: per query, how much of the EXACT cosine
    * top-[[AnnTopK]] the multi-probe LSH index (q29) actually returned —
    * recall@k, the one number that tells you whether the index's
    * plane/probe budget still matches the corpus as it grows. Composes two
    * already-oracled pipelines; the comparison itself is a k-bounded
    * per-query join + rollup, so the report costs one exact scan (q28's
    * broadcast-query shape) + one index probe (q29's bucket join) no
    * matter the corpus size.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = cosineTopK(spark, dir)
      .filter(col("rk") <= AnnTopK)
      .select(col("q_id"), col("n_id"))
    val approx = annLsh(spark, dir)
      .select(col("q_id"), col("n_id"), lit(true).as("hit"))
    exact
      .join(approx, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / lit(AnnTopK.toDouble))
      .orderBy(col("q_id"))
  }

  /** Oracle: both engine-exact statements embedded verbatim, same rollup,
    * same fixed-k division.
    */
  lazy val annRecallSql: String =
    s"""WITH q85x AS MATERIALIZED (
       |  SELECT q_id, n_id FROM ($cosineTopKSql) WHERE rk <= $AnnTopK),
       |q85a AS MATERIALIZED (SELECT q_id, n_id FROM ($annLshSql))
       |SELECT x.q_id, count(*)::BIGINT AS n_exact,
       |  CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / ${AnnTopK.toDouble} AS recall
       |FROM q85x x LEFT JOIN q85a a ON a.q_id = x.q_id AND a.n_id = x.n_id
       |GROUP BY x.q_id ORDER BY x.q_id""".stripMargin

  // --- q152: embedding-dimension truncation audit ----------------------------

  /** Truncation prefix lengths audited (the full 64 included as the
    * self-check row — its recall is 1 by construction).
    */
  val TruncDims: Seq[Int] = Seq(8, 16, 32, 64)

  /** Matryoshka-style dimension-truncation audit: per (prefix length d,
    * query), recall@[[TopK]] of the top-k under TRUNCATED-prefix cosine
    * against the full-dimension exact top-k — the table that decides how
    * many leading dimensions a 100 TB ANN index must actually store
    * (embedding models trained with matryoshka losses keep most ranking
    * signal in a short prefix; storing 64 dims when 16 rank identically
    * is a 4× index-size and bandwidth tax). q85/q89 audit INDEX recall at
    * full dimension; q152 audits the DIMENSION budget itself.
    *
    * Scale shape: q28's broadcast idiom — the fixed query set broadcasts
    * against ONE linear corpus scan; all |TruncDims| sliced cosines are
    * computed map-side per candidate row (codegen'd dot folds) and
    * exploded to the (dim, q) grain, where a WindowGroupLimit top-k
    * bounds everything downstream to |dims|×|queries|×k rows. Zero-norm
    * truncated prefixes rank last via a shared −2 sentinel (cosine is
    * bounded by ±1), never NaN.
    */
  def truncationAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    // prefix self-norms are per-VECTOR, not per-pair: hoist them to both
    // join sides once (the pair projection would otherwise recompute the
    // candidate norms |queries| times each)
    def withNorms(df: DataFrame, vc: String): DataFrame =
      TruncDims.foldLeft(df)((d0, d) =>
        d0.withColumn(s"n$d", dot_product(slice(col(vc), 1, d), slice(col(vc), 1, d))))
    val q = withNorms(
      e.filter(col("vec_id") < QueryCount)
        .select(col("vec_id").as("q_id"), col("v").as("qv")),
      "qv")
      .select(col("q_id") +: col("qv") +: TruncDims.map(d => col(s"n$d").as(s"qn$d")): _*)
    val c = withNorms(e.select(col("vec_id").as("n_id"), col("v").as("cv")), "cv")
      .select(col("n_id") +: col("cv") +: TruncDims.map(d => col(s"n$d").as(s"cn$d")): _*)
    val sims = array(TruncDims.map { d =>
      val qs  = slice(col("qv"), 1, d)
      val cs  = slice(col("cv"), 1, d)
      val ok  = col(s"qn$d") > lit(0.0) && col(s"cn$d") > lit(0.0)
      val cos = dot_product(qs, cs) / (sqrt(col(s"qn$d")) * sqrt(col(s"cn$d")))
      struct(
        lit(d.toLong).as("dim"),
        when(ok, cos).otherwise(lit(-2.0)).as("sim"))
    }: _*)
    val w = Window.partitionBy(col("dim"), col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val ranked = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), explode(sims).as("s"))
      .select(col("q_id"), col("n_id"), col("s.dim").as("dim"), col("s.sim").as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
    val exact = cosineTopK(spark, dir)
      .filter(col("rk") <= TopK)
      .select(col("q_id"), col("n_id"), lit(true).as("in_exact"))
    ranked
      .join(exact, Seq("q_id", "n_id"), "left")
      .groupBy(col("dim"), col("q_id"))
      .agg(sum(when(col("in_exact"), 1L).otherwise(0L)).as("n_hit"))
      .withColumn("recall", round(col("n_hit").cast("double") / lit(TopK.toDouble), 6))
      .orderBy(col("dim"), col("q_id"))
  }

  /** q152 oracle: identical prefix slices, the explicit q28 cosine shape
    * per slice, the same −2 sentinel, rank rule, and fixed-k division.
    */
  lazy val truncationAuditSql: String = {
    val dimsList = TruncDims.mkString("[", ", ", "]")
    def sdot(a: String, b: String) = s"list_dot_product($a[1:d.dim], $b[1:d.dim])"
    s"""WITH q152e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings
       |  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
       |q152x AS MATERIALIZED (
       |  SELECT q_id, n_id FROM ($cosineTopKSql) WHERE rk <= $TopK),
       |q152s AS (
       |  SELECT d.dim, q.vec_id AS q_id, c.vec_id AS n_id,
       |    CASE WHEN ${sdot("q.vd", "q.vd")} > 0.0 AND ${sdot("c.vd", "c.vd")} > 0.0
       |      THEN ${sdot("q.vd", "c.vd")} /
       |        (sqrt(${sdot("q.vd", "q.vd")}) * sqrt(${sdot("c.vd", "c.vd")}))
       |      ELSE -2.0 END AS sim
       |  FROM q152e q, q152e c, (SELECT unnest($dimsList) AS dim) d
       |  WHERE q.vec_id < $QueryCount AND q.vec_id <> c.vec_id),
       |q152r AS (
       |  SELECT *, row_number() OVER (PARTITION BY dim, q_id ORDER BY sim DESC, n_id) AS rk
       |  FROM q152s),
       |q152t AS (SELECT dim, q_id, n_id FROM q152r WHERE rk <= $TopK)
       |SELECT t.dim, t.q_id,
       |  CAST(sum(CASE WHEN x.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  round(CAST(sum(CASE WHEN x.n_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / ${TopK.toDouble}, 6) AS recall
       |FROM q152t t LEFT JOIN q152x x ON x.q_id = t.q_id AND x.n_id = t.n_id
       |GROUP BY t.dim, t.q_id ORDER BY t.dim, t.q_id""".stripMargin
  }

  // --- q222: int8-quantization retrieval-fidelity audit -----------------------

  /** Storage-quantization fidelity audit — q152's question asked of the
    * BIT budget instead of the dimension budget: per query, recall@k of
    * the top-k under int8-quantized cosine against the full-float exact
    * top-k, plus the mean |Δcosine| over those k rows. Per-vector scaling
    * cancels in cosine, so q36's symmetric `round(x·127/amax)` codes rank
    * DIRECTLY — integer-valued dots, no dequantization — and the audit
    * prices exactly what a 4×-smaller int8 index costs in ranking
    * fidelity before a 100 TB store commits to it (q36 audits the CODES'
    * moments; q152 the dimension budget; q85/q89 index recall at full
    * precision — this closes the compression axis).
    *
    * Scale shape: q28's broadcast idiom — the fixed query set broadcasts
    * against ONE linear corpus scan; both cosines are map-side codegen'd
    * dot folds per candidate row; the `row_number ≤ k` filter plans as
    * the bounded heap (BoundedRankRewrite), so everything downstream is
    * |queries|×k rows. Determinism: quantized values are integer-valued
    * doubles (exact dots), sqrt/divide are IEEE-exact, and the Δ terms
    * micro-quantize before the order-free sum (the q72/q163 rule).
    */
  def quantRetrievalAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir) // nrm > 0 ⇒ amax > 0 ⇒ the max element codes to ±127
      .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("v8", expr("transform(v, x -> CAST(round(x * 127 / amax, 0) AS DOUBLE))"))
      .withColumn("nf", dot_product(col("v"), col("v")))
      .withColumn("n8", dot_product(col("v8"), col("v8")))
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("v8").as("q8"),
        col("nf").as("qnf"), col("n8").as("qn8"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("v8").as("c8"),
      col("nf").as("cnf"), col("n8").as("cn8"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim8").desc, col("n_id"))
    val ranked = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(
        col("q_id"), col("n_id"),
        (dot_product(col("qv"), col("cv")) / (sqrt(col("qnf")) * sqrt(col("cnf")))).as("simf"),
        (dot_product(col("q8"), col("c8")) / (sqrt(col("qn8")) * sqrt(col("cn8")))).as("sim8"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
    val exact = cosineTopK(spark, dir)
      .filter(col("rk") <= TopK)
      .select(col("q_id"), col("n_id"), lit(true).as("in_exact"))
    ranked
      .join(exact, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(
        sum(when(col("in_exact"), 1L).otherwise(0L)).as("n_hit"),
        // denominator = rows this query actually ranked (== TopK whenever
        // the corpus has ≥ TopK+1 vectors; honest at tiny scale otherwise)
        count(lit(1)).as("n_rk"),
        sum(expr("CAST(round(abs(sim8 - simf) * 1000000, 0) AS BIGINT)")).as("dq"))
      .select(
        col("q_id"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_rk").cast("double"), 6).as("recall"),
        round(col("dq").cast("double") / (col("n_rk").cast("double") * lit(1000000.0)), 6)
          .as("mean_abs_dev"))
      .orderBy(col("q_id"))
  }

  /** q222 oracle: q36's quantization spelling, the explicit q28 cosine
    * shape on both legs, the same rank/tie rule, and the identical
    * micro-quantized Δ fold.
    */
  lazy val quantRetrievalAuditSql: String = {
    def ldp(a: String, b: String) = s"list_dot_product($a, $b)"
    s"""WITH q222e AS (
       |  SELECT vec_id, vd, list_transform(vd, x -> round(x * 127 / amax, 0)::DOUBLE) AS v8
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS vd,
       |          list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
       |        FROM embeddings
       |        WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)),
       |q222x AS MATERIALIZED (
       |  SELECT q_id, n_id FROM ($cosineTopKSql) WHERE rk <= $TopK),
       |q222s AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${ldp("q.vd", "c.vd")} / (sqrt(${ldp("q.vd", "q.vd")}) * sqrt(${ldp("c.vd", "c.vd")})) AS simf,
       |    ${ldp("q.v8", "c.v8")} / (sqrt(${ldp("q.v8", "q.v8")}) * sqrt(${ldp("c.v8", "c.v8")})) AS sim8
       |  FROM q222e q, q222e c
       |  WHERE q.vec_id < $QueryCount AND q.vec_id <> c.vec_id),
       |q222r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim8 DESC, n_id) AS rk
       |  FROM q222s),
       |q222t AS (SELECT q_id, n_id, simf, sim8 FROM q222r WHERE rk <= $TopK)
       |SELECT t.q_id,
       |  CAST(sum(CASE WHEN x.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  round(CAST(sum(CASE WHEN x.n_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*)::DOUBLE, 6) AS recall,
       |  round(CAST(sum(CAST(round(abs(t.sim8 - t.simf) * 1000000, 0) AS BIGINT)) AS DOUBLE)
       |    / (count(*)::DOUBLE * 1000000.0), 6) AS mean_abs_dev
       |FROM q222t t LEFT JOIN q222x x ON x.q_id = t.q_id AND x.n_id = t.n_id
       |GROUP BY t.q_id ORDER BY t.q_id""".stripMargin
  }

  // --- q89: comparative index recall report ---------------------------------

  /** The index bake-off table: per query, recall@k of ALL THREE ANN
    * structures (hyperplane-LSH q29, IVF q32, PQ q46) against the exact
    * cosine top-k — one row per query, one column per index, so "which
    * index family still fits this corpus" is a single table read. The
    * exact top-k is computed ONCE and persisted; each index contributes a
    * k-bounded left join + rollup.
    */
  def indexRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = cosineTopK(spark, dir)
      .filter(col("rk") <= AnnTopK)
      .select(col("q_id"), col("n_id"))
      .persist()
    def leg(df: DataFrame, out: String): DataFrame =
      exact
        .join(df.select(col("q_id"), col("n_id"), lit(true).as("hit")), Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg((sum(when(col("hit"), 1L).otherwise(0L)).cast("double") / lit(AnnTopK.toDouble)).as(out))
    leg(annLsh(spark, dir), "recall_lsh")
      .join(leg(annIvf(spark, dir), "recall_ivf"), "q_id")
      .join(leg(annPq(spark, dir), "recall_pq"), "q_id")
      .orderBy(col("q_id"))
  }

  /** Oracle: the three engine-exact index statements + the exact top-k,
    * each as a rollup CTE, joined on the query id.
    */
  lazy val indexRecallSql: String = {
    def rollup(name: String, src: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT x.q_id,
         |    CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |      / ${AnnTopK.toDouble} AS r
         |  FROM q89x x LEFT JOIN (SELECT q_id, n_id FROM ($src)) a
         |    ON a.q_id = x.q_id AND a.n_id = x.n_id
         |  GROUP BY x.q_id)""".stripMargin
    s"""WITH q89x AS MATERIALIZED (
       |  SELECT q_id, n_id FROM ($cosineTopKSql) WHERE rk <= $AnnTopK),
       |${rollup("q89l", annLshSql)},
       |${rollup("q89i", annIvfSql)},
       |${rollup("q89p", annPqSql)}
       |SELECT l.q_id, l.r AS recall_lsh, i.r AS recall_ivf, p.r AS recall_pq
       |FROM q89l l JOIN q89i i ON i.q_id = l.q_id JOIN q89p p ON p.q_id = l.q_id
       |ORDER BY l.q_id""".stripMargin
  }

  // --- C10b q32: IVF-style bucketed ANN ------------------------------------
  // Coarse quantizer: spherical k-means centroids trained on a bounded,
  // deterministic sample (driver-side Lloyd's — the sample is capped, so
  // this stays O(sampleCap × k × iters) regardless of corpus size; at
  // 100 TB the cap simply becomes a real random sample). Every vector is
  // assigned MAP-SIDE to its nearest centroid via the codegen'd
  // `nearest_centroids` expression — zero shuffle for assignment — and a
  // query probes its NProbe closest cells only, so the search join touches
  // ~NProbe/NCells of the corpus, shuffling on cell id alone.
  val IvfCells     = 16
  val IvfProbes    = 4
  val IvfSampleCap = 512
  val IvfIters     = 10

  /** The bounded deterministic training sample every ANN trainer shares:
    * every 7th vec_id, capped — ONE collect feeds the IVF coarse quantizer
    * and all [[PqSubspaces]] PQ codebooks (the trainers used to each
    * re-collect it: 9 driver jobs where one suffices). orderBy+limit plans
    * as TakeOrderedAndProject — deterministic, no full sort.
    */
  private[operators] def collectSample(
      e: DataFrame,
      sampleCap: Int = IvfSampleCap
  ): Array[Array[Double]] =
    e.filter(col("vec_id") % 7 === 0)
      .orderBy(col("vec_id"))
      .limit(sampleCap)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Spherical k-means on the systematic sample — deterministic across
    * runs/executors. Returns L2-normalized centroids so
    * `nearest_centroids`' dot-product order equals cosine order.
    * The only driver-side work is over ≤ sampleCap vectors.
    */
  private[operators] def trainCentroids(
      rawSample: Array[Array[Double]],
      k: Int,
      iters: Int = IvfIters
  ): Array[Array[Double]] = {
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val sample = rawSample.map(normalize)
    require(sample.length >= k, s"need >= $k sample vectors, got ${sample.length}")
    var cents = sample.take(k).map(_.clone())
    (0 until iters).foreach { _ =>
      val sums   = Array.fill(k)(new Array[Double](cents(0).length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best  = 0
        var bestV = Double.NegativeInfinity
        var c     = 0
        while (c < k) {
          var s = 0.0
          var d = 0
          val w = cents(c)
          while (d < math.min(v.length, w.length)) { s += v(d) * w(d); d += 1 }
          if (s > bestV) { best = c; bestV = s }
          c += 1
        }
        var d = 0
        while (d < v.length) { sums(best)(d) += v(d); d += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else normalize(sums(c))
      }
    }
    cents
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    // session-shared k-bounded probe result — q32 + q89 (the bake-off)
    SharedStages.annIvfTopK(spark, dir).orderBy(col("q_id"), col("rk"))

  /** The raw IVF probe pass [[SharedStages.annIvfTopK]] materializes. */
  private[graft] def annIvfPlan(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Expressions.nearest_centroids
    val e     = emb(spark, dir)
    val cents = trainCentroids(collectSample(e), IvfCells)
    // map-side cell assignment: one codegen'd argmax per row, no shuffle
    val assigned = e
      .withColumn("cell", nearest_centroids(col("v"), cents, 1).getItem(0))
      .select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"), col("cell"))
    // queries probe their NProbe nearest cells — also map-side (explode of a
    // per-row top-NProbe array); the probe set is QueryCount × NProbe rows,
    // bounded by construction, so the broadcast hint is safe
    val probes = e
      .filter(col("vec_id") < QueryCount)
      .select(
        col("vec_id").as("q_id"),
        col("v").as("qv"),
        col("nrm").as("qn"),
        explode(nearest_centroids(col("v"), cents, IvfProbes)).as("cell")
      )
    // search only within probed cells
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .select(col("q_id"), col("n_id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= AnnTopK)
  }

  // --- exact SQL emulation of the driver-side k-means trainers -------------
  // Left-fold dot of two 1-based DuckDB lists over `dims` dimensions — the
  // IEEE evaluation order of DotProduct / NearestCentroids / the trainers'
  // while-loops (s = 0.0; s += a(d)*b(d) ascending d).
  private def dotFoldSql(a: String, b: String, dims: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${dims + 1}), j -> ($a)[j] * ($b)[j])), (acc, x) -> acc + x)"

  // Left-fold sum of squares (the `v.map(x => x*x).sum` / L2Norm order).
  private def sqFoldSql(v: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform($v, x -> x * x)), (acc, y) -> acc + y)"

  /** DuckDB oracle reproducing [[annIvf]] bit-for-bit — including the
    * driver-side [[trainCentroids]] spherical k-means, which is
    * deterministic by construction (systematic `vec_id % 7` sample ordered
    * by vec_id, fixed [[IvfIters]] Lloyd iterations, first-wins strict-`>`
    * argmax, per-cluster sums accumulated in sample order, empty clusters
    * keep their old centroid). Each iteration unrolls to four CTEs:
    * assignment dots → first-wins argmax (`list_position(ds, list_max(ds))`
    * = the scan's first strict maximum) → per-cluster ordered vector fold →
    * centroid rebuild via sparse-list lookup. Cell assignment, probe
    * selection (greedy top-NProbe ≡ sort by dot DESC, index ASC), and the
    * cosine rank search then mirror [[annLshSql]]'s arithmetic. Every float
    * op is a left fold in the Scala evaluation order, so centroids, cells,
    * probe sets, similarities, and ranks are engine-identical.
    */
  /** The Lloyd-training + full-corpus assignment CTE chain shared by q32
    * and q114: normalized embeddings → systematic sample → [[IvfIters]]
    * unrolled k-means rounds → `q32asg` (n_id, cv, cn, 1-based cell).
    * Final centroid list lives in CTE `q32c<IvfIters>`.
    */
  private def ivfAssignCtes(D: Int): Seq[(String, String)] = {
    import scala.collection.mutable.ArrayBuffer
    val ctes = ArrayBuffer.empty[(String, String)]
    ctes += ("q32ev" ->
      s"(SELECT vec_id, embedding::DOUBLE[] AS v, sqrt(${sqFoldSql("embedding::DOUBLE[]")}) AS nrm FROM embeddings)")
    ctes += ("q32ef" -> "(SELECT * FROM q32ev WHERE nrm > 0)")
    // systematic sample with ordinal; normalize reuses nrm (same fold)
    ctes += ("q32samp" ->
      s"""(SELECT row_number() OVER (ORDER BY vec_id) AS i, list_transform(v, x -> x / nrm) AS sv
         |  FROM (SELECT vec_id, v, nrm FROM q32ef WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT $IvfSampleCap))""".stripMargin)
    ctes += ("q32c0" -> s"(SELECT list_slice(list(sv ORDER BY i), 1, $IvfCells) AS cents FROM q32samp)")
    (1 to IvfIters).foreach { t =>
      ctes += (s"q32a$t" ->
        s"(SELECT i, sv, list_transform(c.cents, w -> ${dotFoldSql("sv", "w", D)}) AS ds FROM q32samp s, q32c${t - 1} c)")
      ctes += (s"q32b$t" ->
        s"(SELECT i, sv, list_position(ds, list_max(ds)) AS best FROM q32a$t)")
      ctes += (s"q32s$t" ->
        s"""(SELECT best, list_reduce(list_prepend(list_transform(range(1, ${D + 1}), z -> 0.0::DOUBLE),
           |    list(sv ORDER BY i)), (acc, x) -> list_transform(range(1, ${D + 1}), j -> acc[j] + x[j])) AS sm
           |  FROM q32b$t GROUP BY best)""".stripMargin)
      ctes += (s"q32n$t" ->
        s"""(SELECT list(best ORDER BY best) AS bs, list(nc ORDER BY best) AS ncs FROM
           |  (SELECT best, CASE WHEN nn = 0 THEN sm ELSE list_transform(sm, x -> x / nn) END AS nc FROM
           |    (SELECT best, sm, sqrt(${sqFoldSql("sm")}) AS nn FROM q32s$t)))""".stripMargin)
      ctes += (s"q32c$t" ->
        s"""(SELECT list_transform(range(1, ${IvfCells + 1}), k ->
           |    CASE WHEN coalesce(list_position(bs, k), 0) = 0 THEN cents[k] ELSE ncs[list_position(bs, k)] END) AS cents
           |  FROM q32c${t - 1}, q32n$t)""".stripMargin)
    }
    val cf = s"q32c$IvfIters"
    ctes += ("q32asg" ->
      s"""(SELECT vec_id AS n_id, v AS cv, nrm AS cn, list_position(ds, list_max(ds)) AS cell FROM
         |  (SELECT vec_id, v, nrm, list_transform(cents, w -> ${dotFoldSql("v", "w", D)}) AS ds FROM q32ef, $cf))""".stripMargin)
    ctes.toSeq
  }

  lazy val annIvfSql: String = {
    import graft.functions.DuckHash.assemble
    import scala.collection.mutable.ArrayBuffer
    val D    = 64
    val ctes = ArrayBuffer(ivfAssignCtes(D): _*)
    val cf   = s"q32c$IvfIters"
    ctes += ("q32qd" ->
      s"""(SELECT vec_id AS q_id, v AS qv, qn, ds FROM
         |  (SELECT vec_id, v, nrm AS qn, list_transform(cents, w -> ${dotFoldSql("v", "w", D)}) AS ds
         |   FROM q32ef, $cf WHERE vec_id < $QueryCount))""".stripMargin)
    ctes += ("q32pr" ->
      s"""(SELECT q_id, qv, qn, cell FROM
         |  (SELECT q_id, qv, qn, k AS cell,
         |     ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ds[k] DESC, k) AS pr
         |   FROM q32qd, range(1, ${IvfCells + 1}) r(k))
         |  WHERE pr <= $IvfProbes)""".stripMargin)
    ctes += ("q32rk" ->
      s"""(SELECT q_id, n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ${dotFoldSql("qv", "cv", D)} / (qn * cn) DESC, n_id) AS rk
         |  FROM q32asg JOIN q32pr USING (cell) WHERE q_id <> n_id)""".stripMargin)
    assemble(
      ctes.toSeq,
      s"SELECT q_id, n_id, rk::INTEGER AS rk FROM q32rk WHERE rk <= $AnnTopK ORDER BY q_id, rk")
  }

  // --- q114: topic-cluster composition report -------------------------------

  /** Topic-clustering composition report over the IVF coarse quantizer
    * (q32's exact spherical-k-means trainer): every embedding is map-side
    * assigned to its nearest of the [[IvfCells]] L2-normalized centroids
    * (codegen'd argmax, zero shuffle), then ONE keyed aggregate emits the
    * corpus composition — member count, mean and minimum cosine-to-centroid
    * (cohesion / worst fit), and the exemplar member (closest to the
    * centroid, vec_id tiebreak). This is the unsupervised "what IS in this
    * corpus, and how tight is each mode" readout a training-mix audit
    * runs before weighting sources — and because the centroids are the
    * SAME quantizer q32 probes, the cohesion numbers double as IVF
    * index-health telemetry (a low-cohesion cell is a cell whose probes
    * recall poorly).
    *
    * Scale shape: trainer cost is bounded by the ≤[[IvfSampleCap]]-row
    * systematic sample (the ANN-trainer rule), assignment is one codegen'd
    * projection, the only shuffle is the ≤[[IvfCells]]-group aggregate
    * with map-side combine, and the 16-row centroid join broadcasts.
    * Determinism: per-member cosine quantizes to integer micro-units FIRST
    * (q72's rule — integer sums are order-free), the mean is one
    * fixed-shape division of exact integers, and the exemplar argmax is
    * `min_by(vec_id, −ci · 2⁶³ + vec_id)` (the packed-key argmin — the
    * same first-by-(cos desc, vec_id) on both engines, and hash-
    * aggregable where a struct min was not).
    */
  def topicClusters(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Expressions.nearest_centroids
    import spark.implicits._
    val e      = emb(spark, dir)
    val cents  = trainCentroids(collectSample(e), IvfCells)
    val centDf = cents.toSeq.zipWithIndex.map { case (w, i) => (i, w.toSeq) }.toDF("cell", "w")
    e.withColumn("cell", nearest_centroids(col("v"), cents, 1).getItem(0))
      .join(broadcast(centDf), Seq("cell"))
      .withColumn(
        "ci",
        round(dot_product(col("v"), col("w")) / col("nrm") * lit(1e6), 0).cast("long"))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("ci")).as("sci"),
        min(col("ci")).as("mci"),
        // r14.2: argmin by the PACKED key −ci · 2⁶³ + vec_id ≡ first-by-
        // (cos desc, vec_id) — |ci| ≤ 10⁶ and 0 ≤ vec_id < 2⁶³, so the
        // packing is lexicographic and min_by's (decimal, long) buffer
        // keeps the aggregate on HashAggregate (a struct min's buffer
        // forced SortAggregate)
        min_by(col("vec_id"), expr(
          "CAST(-ci AS DECIMAL(7,0)) * CAST(9223372036854775808 AS DECIMAL(19,0)) + vec_id"))
          .as("exemplar_id"))
      .select(
        (col("cell") + 1).as("cluster"),
        col("n_members"),
        round(col("sci").cast("double") / lit(1e6) / col("n_members").cast("double"), 6)
          .as("cohesion"),
        round(col("mci").cast("double") / lit(1e6), 6).as("min_cos"),
        col("exemplar_id"))
      .orderBy(col("cluster"))
  }

  /** q114 oracle: the shared trainer/assignment chain, the identical
    * `(dot / nrm) * 1e6` quantization, integer rollups, and a windowed
    * first-by-(ci desc, n_id) exemplar.
    */
  lazy val topicClustersSql: String = {
    import graft.functions.DuckHash.assemble
    import scala.collection.mutable.ArrayBuffer
    val D    = 64
    val ctes = ArrayBuffer(ivfAssignCtes(D): _*)
    val cf   = s"q32c$IvfIters"
    ctes += ("q114ci" ->
      s"""(SELECT cell, n_id,
         |    CAST(round(${dotFoldSql("cv", "cents[cell]", D)} / cn * 1000000.0, 0) AS BIGINT) AS ci
         |  FROM q32asg, $cf)""".stripMargin)
    ctes += ("q114g" ->
      "(SELECT cell, count(*) AS n, CAST(sum(ci) AS BIGINT) AS sci, min(ci) AS mci FROM q114ci GROUP BY cell)")
    ctes += ("q114e" ->
      """(SELECT cell, n_id FROM (
        |  SELECT cell, n_id, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY ci DESC, n_id) AS rn
        |  FROM q114ci) WHERE rn = 1)""".stripMargin)
    assemble(
      ctes.toSeq,
      s"""SELECT g.cell::INTEGER AS cluster, g.n::BIGINT AS n_members,
         |  round(g.sci::DOUBLE / 1000000.0 / g.n::DOUBLE, 6) AS cohesion,
         |  round(g.mci::DOUBLE / 1000000.0, 6) AS min_cos,
         |  e.n_id AS exemplar_id
         |FROM q114g g JOIN q114e e USING (cell) ORDER BY cluster""".stripMargin)
  }

  // --- C24 q46: product-quantization ANN (ADC search) ----------------------
  val PqSubspaces = 8
  val PqSubDim    = 8
  val PqCentroids = 16

  /** Plain-L2 Lloyd's on one subspace's slice of the shared systematic
    * sample (PQ codebooks are L2, unlike the spherical IVF coarse
    * quantizer). Driver-side cost is O(sampleCap · k · iters), corpus-free.
    */
  private[operators] def trainPqCodebook(
      sample: Array[Array[Double]],
      k: Int = PqCentroids,
      iters: Int = IvfIters
  ): Array[Array[Double]] = {
    require(sample.length >= k, s"need >= $k sample vectors, got ${sample.length}")
    var cents = sample.take(k).map(_.clone())
    (0 until iters).foreach { _ =>
      val sums   = Array.fill(k)(new Array[Double](PqSubDim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best  = 0
        var bestV = Double.MaxValue
        var c     = 0
        while (c < k) {
          var d2 = 0.0
          var d  = 0
          while (d < PqSubDim) { val t = v(d) - cents(c)(d); d2 += t * t; d += 1 }
          if (d2 < bestV) { best = c; bestV = d2 }
          c += 1
        }
        var d = 0
        while (d < PqSubDim) { sums(best)(d) += v(d); d += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** PQ encode + asymmetric-distance (ADC) top-k search: each vector is
    * stored as [[PqSubspaces]] one-byte codes (its nearest L2 codebook
    * entry per subspace — a 64× storage reduction at 64 dims); a query
    * scores a candidate as Σ_m LUT[m][code_m], where LUT[m][j] =
    * q_m · c_{m,j} is the query's dot with each codebook entry.
    *
    * Scale shape: codebooks are driver-trained on a bounded sample; corpus
    * ENCODING is map-side — L2 argmin per subspace reuses the codegen'd
    * dot-argmax [[graft.functions.Expressions.NearestCentroids]] via the
    * augmented-vector identity argmin‖x−c‖² = argmax(x·c − ‖c‖²/2), i.e.
    * x′ = [x, 1], c′ = [c, −‖c‖²/2] — zero shuffle. The LUTs ride with the
    * bounded query set (QueryCount × m × k doubles); search is one
    * broadcast join + window top-k. In production the codes table is the
    * ~1-byte-per-dim ANN index you keep hot; rows-only here (iterative
    * k-means has no SQL-expressible oracle) with a brute-force-agreement
    * spec, like q32.
    */
  def annPq(spark: SparkSession, dir: String): DataFrame =
    // session-shared k-bounded probe result — q46 + q89 (the bake-off)
    SharedStages.annPqTopK(spark, dir).orderBy(col("q_id"), col("rk"))

  /** The raw PQ/ADC probe pass [[SharedStages.annPqTopK]] materializes. */
  private[graft] def annPqPlan(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Expressions.nearest_centroids
    val e      = emb(spark, dir)
    val sample = collectSample(e)
    val cbs: Array[Array[Array[Double]]] =
      (0 until PqSubspaces)
        .map(m => trainPqCodebook(sample.map(_.slice(m * PqSubDim, (m + 1) * PqSubDim))))
        .toArray
    val codeCols = (0 until PqSubspaces).map { m =>
      val aug = cbs(m).map(c => c :+ (-c.map(x => x * x).sum / 2))
      nearest_centroids(
        expr(s"concat(slice(v, ${m * PqSubDim + 1}, $PqSubDim), array(1.0D))"),
        aug,
        1
      ).getItem(0).as(s"c$m")
    }
    val codes = e
      .select(col("vec_id").as("n_id") +: codeCols: _*)
      .select(col("n_id"), array((0 until PqSubspaces).map(m => col(s"c$m")): _*).as("codes"))
    // bounded query set: LUT[m][j] = q_m · c_{m,j}
    val qRows = e.filter(col("vec_id") < QueryCount).select(col("vec_id"), col("v")).collect()
    val luts = qRows.map { r =>
      val q = r.getSeq[Double](1).toArray
      val lut = (0 until PqSubspaces).map { m =>
        cbs(m).map { c =>
          var s = 0.0
          var d = 0
          while (d < PqSubDim) { s += q(m * PqSubDim + d) * c(d); d += 1 }
          s
        }.toSeq
      }
      (r.getLong(0), lut)
    }.toSeq
    import spark.implicits._
    val qdf = luts.toDF("q_id", "lut")
    val w   = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    codes
      .join(broadcast(qdf), col("q_id") =!= col("n_id"))
      .withColumn(
        "sim",
        expr("aggregate(zip_with(codes, lut, (c, row) -> row[c]), 0D, (acc, x) -> acc + x)"))
      .select(col("q_id"), col("n_id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= AnnTopK)
  }

  /** DuckDB oracle reproducing [[annPq]] bit-for-bit — the [[annIvfSql]]
    * approach applied to the PQ pipeline: all [[PqSubspaces]] L2 codebooks
    * train in ONE unrolled Lloyd chain keyed by subspace `m` (first-wins
    * strict-`<` argmin, per-cluster ordered sums, mean = sum/count with the
    * count's exact int→double widening, empty clusters keep old entries).
    * Encoding re-derives Spark's augmented-vector trick arithmetic
    * verbatim: score_j = fold₈(x·c_j) + 1.0·(−‖c_j‖²/2) — the exact
    * 9-dim NearestCentroids fold, NOT a mathematical L2 argmin, so tie and
    * rounding behavior is engine-identical. ADC scores fold LUT lookups in
    * subspace order like the Spark `aggregate(zip_with(...))`.
    */
  lazy val annPqSql: String = {
    import graft.functions.DuckHash.assemble
    import scala.collection.mutable.ArrayBuffer
    val M    = PqSubspaces
    val S    = PqSubDim
    val K    = PqCentroids
    def l2Fold(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${S + 1}), j -> (($a)[j] - ($b)[j]) * (($a)[j] - ($b)[j]))), (acc, x) -> acc + x)"
    def dotS(a: String, b: String): String = dotFoldSql(a, b, S)
    val ctes = ArrayBuffer.empty[(String, String)]
    ctes += ("q46ev" ->
      s"(SELECT vec_id, embedding::DOUBLE[] AS v, sqrt(${sqFoldSql("embedding::DOUBLE[]")}) AS nrm FROM embeddings)")
    ctes += ("q46ef" -> "(SELECT vec_id, v FROM q46ev WHERE nrm > 0)")
    ctes += ("q46sampr" ->
      s"""(SELECT row_number() OVER (ORDER BY vec_id) AS i, v
         |  FROM (SELECT vec_id, v FROM q46ef WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT $IvfSampleCap))""".stripMargin)
    ctes += ("q46sampm" ->
      s"(SELECT m, i, list_slice(v, m * $S + 1, (m + 1) * $S) AS sv FROM q46sampr, range(0, $M) r(m))")
    ctes += ("q46c0" -> s"(SELECT m, list_slice(list(sv ORDER BY i), 1, $K) AS cents FROM q46sampm GROUP BY m)")
    (1 to IvfIters).foreach { t =>
      ctes += (s"q46a$t" ->
        s"(SELECT s.m, i, sv, list_transform(c.cents, w -> ${l2Fold("sv", "w")}) AS ds FROM q46sampm s JOIN q46c${t - 1} c USING (m))")
      ctes += (s"q46b$t" ->
        s"(SELECT m, i, sv, list_position(ds, list_min(ds)) AS best FROM q46a$t)")
      ctes += (s"q46s$t" ->
        s"""(SELECT m, best, count(*) AS cnt,
           |    list_reduce(list_prepend(list_transform(range(1, ${S + 1}), z -> 0.0::DOUBLE),
           |      list(sv ORDER BY i)), (acc, x) -> list_transform(range(1, ${S + 1}), j -> acc[j] + x[j])) AS sm
           |  FROM q46b$t GROUP BY m, best)""".stripMargin)
      ctes += (s"q46n$t" ->
        s"""(SELECT m, list(best ORDER BY best) AS bs, list(nc ORDER BY best) AS ncs FROM
           |  (SELECT m, best, list_transform(sm, x -> x / cnt) AS nc FROM q46s$t) GROUP BY m)""".stripMargin)
      ctes += (s"q46c$t" ->
        s"""(SELECT c.m, list_transform(range(1, ${K + 1}), k ->
           |    CASE WHEN coalesce(list_position(bs, k), 0) = 0 THEN cents[k] ELSE ncs[list_position(bs, k)] END) AS cents
           |  FROM q46c${t - 1} c JOIN q46n$t USING (m))""".stripMargin)
    }
    val cf = s"q46c$IvfIters"
    // encode: Spark's augmented 9-dim fold — fold8(x·c) + 1.0·(−‖c‖²/2),
    // first-wins strict-> argmax over the 16 entries
    ctes += ("q46enc" ->
      s"""(SELECT vec_id AS n_id, list(code ORDER BY m) AS codes FROM
         |  (SELECT vec_id, m, list_position(scs, list_max(scs)) AS code FROM
         |    (SELECT e.vec_id, c.m,
         |       list_transform(c.cents, w ->
         |         ${dotS(s"list_slice(e.v, c.m * $S + 1, (c.m + 1) * $S)", "w")} + 1.0 * (-(${sqFoldSql("w")}) / 2.0)) AS scs
         |     FROM q46ef e, $cf c))
         |  GROUP BY vec_id)""".stripMargin)
    // per-query LUTs: lut[m][j] = fold8(q_m · c_{m,j})
    ctes += ("q46lut" ->
      s"""(SELECT q_id, list(lm ORDER BY m) AS lut FROM
         |  (SELECT e.vec_id AS q_id, c.m,
         |     list_transform(c.cents, w -> ${dotS(s"list_slice(e.v, c.m * $S + 1, (c.m + 1) * $S)", "w")}) AS lm
         |   FROM q46ef e, $cf c WHERE e.vec_id < $QueryCount)
         |  GROUP BY q_id)""".stripMargin)
    ctes += ("q46rk" ->
      s"""(SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
         |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${M + 1}), m -> lut[m][codes[m]])),
         |      (acc, x) -> acc + x) DESC, n_id) AS rk
         |  FROM q46enc, q46lut WHERE q_id <> n_id)""".stripMargin)
    assemble(
      ctes.toSeq,
      s"SELECT q_id, n_id, rk::INTEGER AS rk FROM q46rk WHERE rk <= $AnnTopK ORDER BY q_id, rk")
  }

  // --- C14 q36: symmetric int8 embedding quantization ----------------------
  /** q_i = round(127 · x_i / max|x|) — the standard max-abs int8 storage /
    * compute reduction for embedding corpora. Entirely map-side (zero
    * shuffle until the output sort). The query emits exact INTEGER summaries
    * of each quantized vector (min/max/sum/sum-of-squares) rather than the
    * int8 array itself: the integers pin every quantized element's value
    * class while staying engine-exact for the DuckDB oracle (both engines
    * round half away from zero, and the one float expression `x·127/amax`
    * is evaluated in the same IEEE order). Zero vectors (amax = 0) carry no
    * information and are dropped, mirroring [[emb]]'s zero-norm rule.
    */
  def quantize(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      // one codegen'd pass (Int8QuantSummary) — replaced five interpreted
      // higher-order folds per row; the NaN / all-zero gate lives inside
      // the expression (NULL → filtered), same rule as before
      .select(col("vec_id"), graft.functions.Expressions.int8_quant_summary(col("v")).as("s"))
      .filter(col("s").isNotNull)
      .select(
        col("vec_id"),
        col("s.q_min").as("q_min"),
        col("s.q_max").as("q_max"),
        col("s.q_sum").as("q_sum"),
        col("s.q_sumsq").as("q_sumsq"))
      .orderBy(col("vec_id"))

  // BIGINT seeds: list_reduce keeps the seed's type as the accumulator, so
  // an INTEGER seed would overflow at high dimensionality where Spark's 0L
  // accumulator widens — the engines must agree on the arithmetic domain.
  val quantizeSql: String =
    """SELECT vec_id,
      | list_min(q) AS q_min, list_max(q) AS q_max,
      | list_reduce(list_prepend(0::BIGINT, q), (a, x) -> a + x) AS q_sum,
      | list_reduce(list_prepend(0::BIGINT, list_transform(q, x -> x::BIGINT * x)), (a, x) -> a + x) AS q_sumsq
      |FROM (
      | SELECT vec_id, list_transform(v, x -> CAST(round(x * 127 / amax) AS INTEGER)) AS q
      | FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax
      |       FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))
      | WHERE amax > 0 AND NOT isnan(amax) AND NOT isinf(amax))
      |ORDER BY vec_id""".stripMargin

  // --- C11 q30: embedding-cosine near-dup pairs via multi-table LSH --------
  // L(p) = [[nearDupTablesFor]] independent hyperplane tables at the
  // CORPUS-SIZED plane count ([[nearDupPlanesFor]]) with hamming-1
  // probing: P(candidate | cos θ) = 1−(1−c₁(p))^L(p) with
  // c₁(p) = s^p + p·s^(p−1)·(1−s), s = 1−θ/π — held ≥
  // [[NearDupRecallTarget]] at the 0.45 action threshold BY DERIVATION
  // (the r13 fixed-L=6 setting measured recall 0.50 → 0.43 → 0.072 as the
  // derived planes grew 5 → 6 → 10; q251 measures the held value every
  // round, the BenchSf1 sf1 lane gates it). Candidate cost is
  // L(p)·(p+1)·occupancy per doc — the n^ρ (ρ ≈ 0.62) data-independent
  // LSH frontier, the honest price of scale-invariant recall; the
  // SURFACED pair table stays the corpus's true (linear) dup structure.
  // Exact cosine filter inside the expansion. Over-cap buckets are
  // deterministically SAMPLED to [[TextOps.MaxBucket]] members
  // (content-stable xxhash64 order, the q45 rule) instead of dropped, so
  // a pathological cluster degrades recall smoothly rather than silently
  // vanishing from the pair pool.
  val NearDupThreshold = 0.35

  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    SharedStages.nearDupPairs(spark, dir)
      .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("a_id"), col("b_id"))

  /** The multi-table LSH near-dup pair pipeline with UNROUNDED sims —
    * shared by q30 (which rounds for output) and q65's semantic dedup
    * (which thresholds the raw sim like the 0.35 gate does). `planes` is
    * the corpus-sized hyperplane count ([[nearDupPlanesFor]] for dir-based
    * callers — who should reach it through [[SharedStages.nearDupPairs]];
    * explicit for spec frames). The table count derives from `planes`
    * ([[nearDupTablesFor]]).
    */
  private[graft] def nearDupPairsRaw(spark: SparkSession, e: DataFrame, planes: Int): DataFrame = {
    graft.GraftExtensions.register(spark) // graft_dot inside the cosine attach
    val tables = nearDupTablesFor(planes)
    // r15 (guide §8: decide with small rows, move big rows once): the
    // bucket agg and the pair expansion carry ONLY (h, id, home) — the
    // r14 spelling shipped the full (v, nrm) payload through the member
    // structs, so every vector's doubles crossed the bucket exchange
    // L(p)·(p+1) times (≈ 300 copies at p = 10) and the per-expansion
    // cosine ran on every DUPLICATE candidate leg before the distinct.
    // Now the candidate pairs dedup FIRST on bare ids, and the exact
    // cosine attaches once per DISTINCT pair through two vector joins —
    // the payload moves once (broadcast at bench scale; an id-keyed join
    // of narrow rows at cluster scale). The candidate SET, the per-pair
    // sim (graft_dot is a fixed-order fold, bitwise symmetric in its
    // arguments), and the surfaced rows are identical — this matches the
    // DuckDB oracle's own dedup-before-cosine shape.
    //
    // Each vector lands in its HOME bucket plus the `planes` hamming-1
    // probe buckets per table (flagged); a candidate pair is any
    // in-bucket pair with ≥ 1 home member — hamming(bucket_a, bucket_b)
    // ≤ 1 in some table, q29's multi-probe idiom on the pair side. The
    // member heap leads with `h = xxhash64(vec_id)`: collect_topk keeps
    // the MaxBucket LARGEST (h, id, home) structs over the COMBINED
    // (home + probe) membership, so a bucket at or under the cap keeps
    // its full member set (values unchanged) and an over-cap bucket
    // keeps a content-stable uniform SAMPLE of exactly MaxBucket members
    // — (h, id) is unique per bucket member, so the sample is the same
    // one the payload-carrying spelling kept. Two metadata shuffles
    // total: the bucket agg and the pair distinct.
    val emitted = e
      .select(
        xxhash64(col("vec_id")).as("h"),
        col("vec_id").as("id"),
        posexplode(array((0 until tables).map(t => hyperplane_bucket(col("v"), t, planes)): _*))
          .as(Seq("tbl", "hb"))
      )
      .select(
        col("h"), col("id"), col("tbl"),
        explode(
          expr(
            s"""concat(
               |  array(named_struct('bucket', hb, 'home', true)),
               |  transform(sequence(0, ${planes - 1}),
               |            p -> named_struct('bucket', cast(hb ^ shiftleft(1, p) AS int),
               |                              'home', false)))""".stripMargin)).as("be"))
      .select(
        struct(col("h"), col("id"), col("be.home").as("home")).as("m"),
        col("tbl"),
        col("be.bucket").as("bucket"))
    val cands = emitted
      .groupBy(col("tbl"), col("bucket"))
      .agg(
        count(lit(1)).as("nb"),
        graft.functions.Expressions.collect_topk(col("m"), TextOps.MaxBucket).as("ms"))
      // singleton and probe-only buckets contribute no pairs — prune early
      .filter(col("nb") >= 2 && expr("exists(ms, x -> x.home)"))
      .select(col("ms"))
      .select(
        explode(
          expr(
            """flatten(transform(filter(ms, a -> a.home), a ->
              |  transform(filter(ms, b -> b.id > a.id OR (NOT b.home AND b.id < a.id)), b ->
              |    struct(least(a.id, b.id) AS a_id, greatest(a.id, b.id) AS b_id))))""".stripMargin)
        ).as("p")
      )
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .distinct()
    cands
      .join(e.select(col("vec_id").as("a_id"), col("v").as("av"), col("nrm").as("an")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("v").as("bv"), col("nrm").as("bn")), "b_id")
      .select(
        col("a_id"),
        col("b_id"),
        (dot_product(col("av"), col("bv")) / (col("an") * col("bn"))).as("sim"))
      .filter(col("sim") >= NearDupThreshold)
  }

  /** EXACT count of (a, b) cosine evaluations the pair expansion performs
    * at `dir`'s derived geometry — the family's COST, as opposed to its
    * surfaced OUTPUT (which is the data's own dup structure and therefore
    * not a cost signal: on a corpus with quadratic near-threshold
    * background — any low-dimensional one — honest recall makes the
    * output quadratic too). The BenchSf1 scale gate compares this,
    * normalized by the amplification model `L(p)·(p+1/2)·occupancy`,
    * across SFs: growth past 2× the model's own predicted growth means
    * the geometry drifted off the derivation, independent of what the
    * data contains. Counting pass only: members carry (hash, id, home) —
    * no vectors shuffle — and the per-bucket closed form
    * `nh·(nb−1) − C(nh,2)` over the SAME capped heap counts exactly the
    * pairs [[nearDupPairsRaw]] expands.
    */
  def candidateVolume(spark: SparkSession, dir: String): Long = {
    val planes = nearDupPlanesFor(spark, dir)
    val tables = nearDupTablesFor(planes)
    emb(spark, dir)
      .select(
        xxhash64(col("vec_id")).as("h"),
        col("vec_id").as("id"),
        posexplode(array((0 until tables).map(t => hyperplane_bucket(col("v"), t, planes)): _*))
          .as(Seq("tbl", "hb")))
      .select(
        col("h"), col("id"), col("tbl"),
        explode(
          expr(
            s"""concat(
               |  array(named_struct('bucket', hb, 'home', true)),
               |  transform(sequence(0, ${planes - 1}),
               |            p -> named_struct('bucket', cast(hb ^ shiftleft(1, p) AS int),
               |                              'home', false)))""".stripMargin)).as("be"))
      .select(
        struct(col("h"), col("id"), col("be.home").as("home")).as("m"),
        col("tbl"),
        col("be.bucket").as("bucket"))
      .groupBy(col("tbl"), col("bucket"))
      .agg(graft.functions.Expressions.collect_topk(col("m"), TextOps.MaxBucket).as("ms"))
      .select(
        size(col("ms")).cast("long").as("nb"),
        expr("size(filter(ms, x -> x.home))").cast("long").as("nh"))
      .agg(
        // nh·(nh−1) is always even, so the integer `div` is exact —
        // Spark's `/` is DOUBLE division and would break the long sum
        coalesce(
          sum(expr("nh * (nb - 1) - (nh * (nh - 1)) div 2")),
          lit(0L)).as("vol"))
      .head().getLong(0)
  }

  /** The amplification model's predicted per-doc candidate volume at the
    * derived geometry for a corpus of `n` vectors — the normalizer for
    * the [[candidateVolume]] scale gate.
    */
  def candidateModelPerDoc(n: Long, planes: Int): Double =
    nearDupTablesFor(planes).toDouble * (planes + 0.5) * (n.toDouble / (1L << planes))

  /** DuckDB oracle reproducing [[embedNearDup]] bit-for-bit — the
    * [[annLshSql]] plane emulation generalized to the count-derived
    * `q30nt` table count at the count-derived plane number (`q30np`):
    * same `XXH64.hashLong((t·64+p)·64+d, 42)` Rademacher signs, same
    * left-fold dots/norms, the same home + hamming-1 probe emission per
    * table, the same xxhash64-ordered top-MaxBucket member sample over
    * the COMBINED (table, bucket) membership, pairs joined within
    * (table, bucket) under the ≥-1-home rule and deduped BEFORE the one
    * cosine per distinct pair (the Spark side computes per-leg and
    * dedupes after — identical output because the cosine is a pure
    * function of the pair).
    */
  lazy val embedNearDupSql: String = {
    import graft.functions.DuckHash.assemble
    assemble(
      nearDupCtes,
      s"""SELECT a_id, b_id, round(sim, 4) AS sim FROM q30sim
         |WHERE sim >= $NearDupThreshold
         |ORDER BY a_id, b_id""".stripMargin)
  }

  /** Shared CTE chain ending at `q30sim` (a_id, b_id, raw sim) + the
    * filtered corpus `q30ef` — consumed by the q30 and q65 oracles.
    */
  private lazy val nearDupCtes: Seq[(String, String)] = {
    import graft.functions.DuckHash._
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](planesCtes("q30", NearDupMinPlanes): _*)
    ctes += ("q30nt" ->
      s"(SELECT planes, (${tablesCaseSql("planes")})::INTEGER AS tables FROM q30np)")
    ctes += ("q30pd" ->
      (s"(SELECT t, p, d, ((t * 64 + p) * 64 + d)::HUGEINT AS idx " +
        s"FROM range(0, $MaxNearDupTables) r(t), range(0, 32) q(p), range(0, 64) s(d), q30nt " +
        "WHERE p < planes AND t < tables)"))
    val ch = new SqlChain("q30h", "q30pd", Seq("t", "p", "d", "idx"))
    hashLongLevels(ch, "idx", "42", "hw")
    ctes ++= ch.ctes
    ctes += ("q30sgn" ->
      s"(SELECT t, p, list(CASE WHEN hw % 2 = 1 THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv FROM ${ch.last} GROUP BY t, p)")
    ctes += ("q30ev" ->
      """(SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding::DOUBLE[], x -> x * x)),
        |         (a, x) -> a + x)) AS nrm
        |  FROM embeddings)""".stripMargin)
    ctes += ("q30ef" -> "(SELECT * FROM q30ev WHERE nrm > 0)")
    ctes += ("q30dots" ->
      """(SELECT vec_id, t, p,
        |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> v[i] * sv[i])),
        |      (a, x) -> a + x) AS dot
        |  FROM q30ef, q30sgn)""".stripMargin)
    ctes += ("q30bkt" ->
      "(SELECT vec_id, t, sum(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END)::INTEGER AS bucket FROM q30dots GROUP BY vec_id, t)")
    // the member-sampling hash: Spark's SIGNED xxhash64(vec_id)
    // re-derived once per corpus vector (q30vh is also q251's probe key)
    ctes += ("q30min" -> "(SELECT vec_id, vec_id::HUGEINT AS l FROM q30ef)")
    val mh = new SqlChain("q30mh", "q30min", Seq("vec_id", "l"))
    hashLongLevels(mh, toUnsigned("l"), "42", "vh")
    ctes ++= mh.ctes
    ctes += ("q30vh" -> s"(SELECT vec_id, ${toSigned("vh")} AS h FROM ${mh.last})")
    // home + hamming-1 probe emissions per table — the r14 multi-probe
    // dial: a candidate pair is any in-bucket pair with >= 1 home member
    ctes += ("q30em" ->
      """(SELECT vec_id, t, bucket, TRUE AS home FROM q30bkt
        | UNION ALL
        | SELECT b.vec_id, b.t,
        |   xor(b.bucket::BIGINT, (1::BIGINT << pp.p))::INTEGER AS bucket, FALSE AS home
        | FROM q30bkt b, (SELECT p FROM range(0, 32) r(p), q30np WHERE p < planes) pp)""".stripMargin)
    // kept member set per (t, bucket): ALL members at or under the cap,
    // else the MaxBucket members LARGEST by (signed hash, vec_id) — the
    // exact keep-set of the Spark side's (h, id, …) collect_topk heap
    // over the COMBINED (home + probe) membership
    ctes += ("q30mem" ->
      s"""(SELECT t, bucket, vec_id, home FROM (
         |    SELECT e.t, e.bucket, e.vec_id, e.home,
         |      ROW_NUMBER() OVER (PARTITION BY e.t, e.bucket
         |        ORDER BY h.h DESC, e.vec_id DESC) AS rn
         |    FROM q30em e JOIN q30vh h USING (vec_id))
         |  WHERE rn <= ${TextOps.MaxBucket})""".stripMargin)
    ctes += ("q30pairs" ->
      """(SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM q30mem a
        |  JOIN q30mem b ON b.t = a.t AND b.bucket = a.bucket
        |    AND a.vec_id < b.vec_id AND (a.home OR b.home))""".stripMargin)
    ctes += ("q30sim" ->
      """(SELECT a_id, b_id,
        |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> av[i] * bv[i])),
        |      (a, x) -> a + x) / (an * bn) AS sim
        |  FROM q30pairs
        |  JOIN (SELECT vec_id, v AS av, nrm AS an FROM q30ef) fa ON fa.vec_id = a_id
        |  JOIN (SELECT vec_id, v AS bv, nrm AS bn FROM q30ef) fb ON fb.vec_id = b_id)""".stripMargin)
    ctes.toSeq
  }

  // --- q65: semantic dedup over embeddings (SemDeDup-style) ----------------
  val SemDedupThreshold = 0.45

  /** Greedy semantic dedup (the SemDeDup recipe, Abbas et al. 2023): a
    * vector DROPS when the LSH pipeline surfaces a partner with LOWER id at
    * cosine ≥ [[SemDedupThreshold]]; every corpus vector gets a
    * keep/drop verdict plus its keeper (itself when kept, the smallest
    * such partner when dropped). Candidate generation is q30's multi-table
    * bucket machinery verbatim — recall is the table-count dial, and NO new
    * scan shapes appear: one bucket agg, one pair distinct, then a
    * left join of the (tiny) victim set back onto the corpus, which AQE
    * broadcasts. The threshold gates the RAW cosine, like q30's 0.35 gate.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    semDedupFrom(emb(spark, dir), SharedStages.nearDupPairs(spark, dir))

  private[graft] def semDedupOf(spark: SparkSession, e: DataFrame, planes: Int): DataFrame =
    semDedupFrom(e, nearDupPairsRaw(spark, e, planes))

  private def semDedupFrom(e: DataFrame, pairs: DataFrame): DataFrame = {
    val victims = pairs
      .filter(col("sim") >= SemDedupThreshold)
      .groupBy(col("b_id").as("vec_id"))
      .agg(min(col("a_id")).as("keeper"))
    e.select(col("vec_id"))
      .join(victims, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        when(col("keeper").isNull, "keep").otherwise("drop").as("action"),
        coalesce(col("keeper"), col("vec_id")).as("keeper"))
      .orderBy(col("vec_id"))
  }

  /** Oracle: the q30 chain + the same victim aggregation and verdict join. */
  lazy val semDedupSql: String = {
    import graft.functions.DuckHash.assemble
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](nearDupCtes: _*)
    ctes += ("q65v" ->
      s"(SELECT b_id AS vec_id, min(a_id) AS keeper FROM q30sim WHERE sim >= $SemDedupThreshold GROUP BY b_id)")
    assemble(
      ctes.toSeq,
      """SELECT e.vec_id,
        |  CASE WHEN v.keeper IS NULL THEN 'keep' ELSE 'drop' END AS action,
        |  coalesce(v.keeper, e.vec_id) AS keeper
        |FROM q30ef e LEFT JOIN q65v v ON v.vec_id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin)
  }

  // --- q251: embedding-LSH recall probe ---------------------------------------

  /** Probe-sample size: content-stable (smallest xxhash64(vec_id)), so the
    * probe set is a uniform corpus sample that is reproducible on any
    * cluster size or re-run, and the probe truth scan stays
    * |probes| × n — bounded, never corpus².
    */
  val EmbedRecallProbes = 64

  /** The severity grid recall is reported at — from the candidate gate
    * itself (0.35) up through the SemDeDup/leak threshold (0.45) to
    * near-verbatim similarity.
    */
  val EmbedRecallThresholds: Seq[Double] = Seq(0.35, 0.45, 0.6, 0.8)

  /** The embedding-side recall probe (q84's role for the q30 family): per
    * similarity threshold, how many EXACT cosine pairs touching a
    * deterministic probe sample exist, how many of them the multi-table
    * LSH candidate pipeline actually surfaced, and the recall — plus the
    * corpus-derived plane AND table counts, so the amplification bound
    * [[nearDupTablesFor]] derives the dial from is MEASURED on live data
    * every time the corpus grows, not asserted. This is the monitor the
    * BenchSf1 sf1 lane GATES at [[NearDupRecallFloor]] — the r13 lesson
    * was that cost gates alone green-light recall collapse — and the
    * table that tells a 100 TB campaign the derivation has hit
    * [[MaxNearDupTables]] and the action threshold must rise.
    *
    * Scale shape: the probe truth is q28's broadcast idiom — the fixed
    * probe set (TakeOrdered by content hash) broadcasts against ONE
    * linear corpus scan; the candidate side is the shared q30 pipeline;
    * the comparison is a pair-keyed left join on the (probe-bounded)
    * truth set and a ≤|thresholds|-row rollup. Determinism: probe pick
    * is (signed xxhash64, id)-ordered; cosines are the shared codegen'd
    * fold; recall is one integer divide + 6-dp round, NULL when a
    * threshold has no truth pairs.
    */
  def embedRecallProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planes = nearDupPlanesFor(spark, dir)
    val e      = emb(spark, dir)
    val probes = e
      .select(
        col("vec_id").as("p_id"), col("v").as("pv"), col("nrm").as("pn"),
        xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h"), col("p_id"))
      .limit(EmbedRecallProbes)
      .drop("h")
    // exact truth: every ≥-gate cosine pair with at least one probe
    // endpoint (a probe-probe pair arrives once from each side with the
    // bitwise-same sim — products commute termwise — so distinct collapses)
    val truth = e
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(probes), col("p_id") =!= col("c_id"))
      .select(
        least(col("p_id"), col("c_id")).as("a_id"),
        greatest(col("p_id"), col("c_id")).as("b_id"),
        (dot_product(col("pv"), col("cv")) / (col("pn") * col("cn"))).as("sim"))
      .filter(col("sim") >= NearDupThreshold)
      .distinct()
    val cands = SharedStages.nearDupPairs(spark, dir)
      .select(col("a_id"), col("b_id"), lit(true).as("caught"))
    val perPair = truth
      .join(cands, Seq("a_id", "b_id"), "left")
      .select(col("sim"), coalesce(col("caught"), lit(false)).as("caught"))
    val agg = perPair
      .select(
        col("sim"), col("caught"),
        explode(array(EmbedRecallThresholds.map(lit(_)): _*)).as("threshold"))
      .filter(col("sim") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(
        count(lit(1)).as("n_true"),
        sum(when(col("caught"), 1L).otherwise(0L)).as("n_caught"))
    EmbedRecallThresholds
      .toDF("threshold")
      .join(agg, Seq("threshold"), "left")
      .select(
        col("threshold"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_caught"), lit(0L)).as("n_caught"),
        when(col("n_true") > 0,
          round(col("n_caught").cast("double") / col("n_true").cast("double"), 6))
          .as("recall"),
        lit(planes).as("planes"),
        lit(nearDupTablesFor(planes)).as("tables"))
      .orderBy(col("threshold"))
  }

  /** q251 oracle: the shared q30 chain (planes, buckets, sampled members,
    * candidate sims) plus the probe pick off the SAME signed-hash CTE,
    * the identical fold cosine on the truth leg, and the same
    * left-join/rollup — threshold literals cast to DOUBLE so schemas
    * agree.
    */
  lazy val embedRecallProbeSql: String = {
    import graft.functions.DuckHash.assemble
    val thList = EmbedRecallThresholds.map(t => s"$t::DOUBLE").mkString("[", ", ", "]")
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](nearDupCtes: _*)
    ctes += ("q251pb" ->
      s"""(SELECT f.vec_id, f.v, f.nrm FROM q30ef f JOIN q30vh h USING (vec_id)
         |  ORDER BY h.h, f.vec_id LIMIT $EmbedRecallProbes)""".stripMargin)
    ctes += ("q251tr" ->
      s"""(SELECT DISTINCT least(s.p_id, s.c_id) AS a_id,
         |    greatest(s.p_id, s.c_id) AS b_id, s.sim
         |  FROM (SELECT p.vec_id AS p_id, c.vec_id AS c_id,
         |          list_reduce(list_prepend(0.0::DOUBLE,
         |              list_transform(range(1, 65), i -> p.v[i] * c.v[i])),
         |            (a, x) -> a + x) / (p.nrm * c.nrm) AS sim
         |        FROM q251pb p JOIN q30ef c ON p.vec_id <> c.vec_id) s
         |  WHERE s.sim >= $NearDupThreshold)""".stripMargin)
    ctes += ("q251cd" ->
      s"(SELECT a_id, b_id FROM q30sim WHERE sim >= $NearDupThreshold)")
    ctes += ("q251pp" ->
      """(SELECT t.sim, (c.a_id IS NOT NULL) AS caught
        |  FROM q251tr t LEFT JOIN q251cd c USING (a_id, b_id))""".stripMargin)
    ctes += ("q251th" -> s"(SELECT unnest($thList) AS threshold)")
    ctes += ("q251ag" ->
      """(SELECT threshold, count(*)::BIGINT AS n_true,
        |    CAST(sum(CASE WHEN caught THEN 1 ELSE 0 END) AS BIGINT) AS n_caught
        |  FROM q251pp, q251th WHERE sim >= threshold GROUP BY threshold)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT th.threshold,
        |  coalesce(a.n_true, 0)::BIGINT AS n_true,
        |  coalesce(a.n_caught, 0)::BIGINT AS n_caught,
        |  CASE WHEN coalesce(a.n_true, 0) > 0
        |    THEN round(a.n_caught::DOUBLE / a.n_true::DOUBLE, 6) END AS recall,
        |  np.planes, nt.tables
        |FROM q251th th LEFT JOIN q251ag a USING (threshold), q30np np, q30nt nt
        |ORDER BY th.threshold""".stripMargin)
  }

  // --- q252: LSH bucket-occupancy audit ----------------------------------------

  /** The occupancy audit for the multi-table LSH index — q251 measures
    * what the geometry RECALLS; this measures what the geometry COSTS and
    * when the over-cap sampler actually engages: per table, live bucket
    * count, member total, the largest bucket, mean occupancy against the
    * [[LshTargetOccupancy]] design point, how many buckets run past
    * [[TextOps.MaxBucket]], and the member mass the sampler would exclude
    * from pair generation (`overflow_members`). At 100 TB this is the
    * table that says "occupancy drifted off the design point — the corpus
    * count the planes were derived from is stale" or "one cluster holds
    * 4% of the corpus: sampling is costing real recall there" BEFORE
    * either shows up as a bad dedup. The derived plane count rides in the
    * output row, like q251.
    *
    * Scale shape: one map-side bucket projection + hamming-1 emission
    * (the q30 kernel — the audit counts the COMBINED home + probe
    * membership the pair expansion actually runs over, with the home
    * count alongside so occupancy drift is attributable to geometry vs
    * probe volume), one (table, bucket)-keyed count — map-side
    * combinable, never holding members — then a ≤[[nearDupTablesFor]]-row
    * rollup. Pure integer counts; one divide + 6-dp round for the mean.
    */
  def lshOccupancy(spark: SparkSession, dir: String): DataFrame = {
    val planes = nearDupPlanesFor(spark, dir)
    val tables = nearDupTablesFor(planes)
    emb(spark, dir)
      .select(
        posexplode(array((0 until tables).map(t => hyperplane_bucket(col("v"), t, planes)): _*))
          .as(Seq("tbl", "hb")))
      .select(
        col("tbl"),
        explode(
          expr(
            s"""concat(
               |  array(named_struct('bucket', hb, 'home', true)),
               |  transform(sequence(0, ${planes - 1}),
               |            p -> named_struct('bucket', cast(hb ^ shiftleft(1, p) AS int),
               |                              'home', false)))""".stripMargin)).as("be"))
      .groupBy(col("tbl"), col("be.bucket").as("bucket"))
      .agg(
        count(lit(1)).as("nb"),
        sum(when(col("be.home"), 1L).otherwise(0L)).as("nh"))
      .groupBy(col("tbl"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("nb")).as("n_members"),
        sum(col("nh")).as("n_home_members"),
        max(col("nb")).as("max_bucket"),
        sum(when(col("nb") > TextOps.MaxBucket, 1L).otherwise(0L)).as("n_overcap"),
        sum(when(col("nb") > TextOps.MaxBucket, col("nb") - TextOps.MaxBucket).otherwise(0L))
          .as("overflow_members"))
      .select(
        col("tbl"),
        lit(planes).as("planes"),
        col("n_buckets"),
        col("n_members"),
        col("n_home_members"),
        col("max_bucket"),
        round(col("n_members").cast("double") / col("n_buckets").cast("double"), 6)
          .as("mean_occupancy"),
        col("n_overcap"),
        col("overflow_members"))
      .orderBy(col("tbl"))
  }

  /** q252 oracle: the shared q30 emission CTEs (same planes/tables
    * derivation, same Rademacher family, same home + probe emission), the
    * identical two keyed aggregates and the one rounded divide.
    */
  lazy val lshOccupancySql: String = {
    import graft.functions.DuckHash.assemble
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](nearDupCtes: _*)
    ctes += ("q252b" ->
      ("(SELECT t, bucket, count(*)::BIGINT AS nb, " +
        "CAST(sum(CASE WHEN home THEN 1 ELSE 0 END) AS BIGINT) AS nh " +
        "FROM q30em GROUP BY t, bucket)"))
    assemble(
      ctes.toSeq,
      s"""SELECT t::INTEGER AS tbl, np.planes,
         |  count(*)::BIGINT AS n_buckets,
         |  CAST(sum(nb) AS BIGINT) AS n_members,
         |  CAST(sum(nh) AS BIGINT) AS n_home_members,
         |  CAST(max(nb) AS BIGINT) AS max_bucket,
         |  round(CAST(sum(nb) AS DOUBLE) / count(*)::DOUBLE, 6) AS mean_occupancy,
         |  CAST(sum(CASE WHEN nb > ${TextOps.MaxBucket} THEN 1 ELSE 0 END) AS BIGINT) AS n_overcap,
         |  CAST(sum(CASE WHEN nb > ${TextOps.MaxBucket} THEN nb - ${TextOps.MaxBucket} ELSE 0 END) AS BIGINT)
         |    AS overflow_members
         |FROM q252b, q30np np
         |GROUP BY t, np.planes
         |ORDER BY tbl""".stripMargin)
  }

  // --- q253: semantic dup clusters (q47's analog on the embed side) --------

  /** Connected components over the SemDeDup-threshold pair graph: q65
    * gives per-vector keep/drop verdicts against a pairwise keeper; this
    * turns the same recall-held edge set (raw sim ≥
    * [[SemDedupThreshold]], the shared [[SharedStages.nearDupPairs]]
    * stage) into CLUSTER labels (component min id) + sizes — the table a
    * curation pass needs to keep the BEST member per semantic group
    * (q56's role) or to weight by multiplicity (q215's role) instead of
    * blindly keeping the smallest id. Same large-star/small-star
    * contraction as the text side (q47) — O(log n) rounds, each one hash
    * shuffle + distinct, state bounded by the edge set; vectors in no
    * pair are absent (q47's rule: singleton rows carry no information the
    * corpus table doesn't already have).
    */
  def embedClusters(spark: SparkSession, dir: String): DataFrame = {
    val edges = SharedStages.nearDupPairs(spark, dir)
      .filter(col("sim") >= SemDedupThreshold)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val (labels, _) = CurationOps.starContract(edges)
    val wCl = Window.partitionBy(col("cluster_id"))
    labels
      .select(col("node").as("vec_id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(wCl))
      .orderBy(col("vec_id"))
  }

  /** Oracle: the shared q30 chain's edge set at the q65 threshold,
    * transitive closure via a recursive CTE (q47's oracle pattern),
    * cluster = min reachable id.
    */
  lazy val embedClustersSql: String = {
    import graft.functions.DuckHash.assemble
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](nearDupCtes: _*)
    ctes += ("q253e" ->
      s"(SELECT a_id AS src, b_id AS dst FROM q30sim WHERE sim >= $SemDedupThreshold)")
    ctes += ("q253g" ->
      "(SELECT src, dst FROM q253e UNION ALL SELECT dst, src FROM q253e)")
    ctes += ("q253r" ->
      """(SELECT src AS node, dst AS r FROM q253g
        |  UNION
        |  SELECT w.node, e2.dst FROM q253r w JOIN q253g e2 ON w.r = e2.src)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT node AS vec_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM (SELECT node, least(node, min(r)) AS cluster_id FROM q253r GROUP BY node)
        |ORDER BY vec_id""".stripMargin,
      notMaterialized = Set("q253r")
    ).replaceFirst("WITH ", "WITH RECURSIVE ")
  }

  // --- q254: LSH recall/cost planner ----------------------------------------

  /** Projection decades the planner prices alongside the measured corpus. */
  private[graft] val PlannerDecades: Seq[Long] =
    (3 to 12).map(d => math.pow(10, d.toDouble).toLong)

  /** The campaign-planning table for the r14 recall derivation (q163's
    * role for the embed side): for the MEASURED corpus count and each
    * projection decade up to 10^12 vectors — the derived plane count,
    * the derived (possibly capped) table count, whether the
    * amplification bound has SATURATED the [[MaxNearDupTables]] cap, the
    * per-table candidate probability `c₁(p)` at the
    * [[SemDedupThreshold]] action threshold, the predicted recall
    * `1−(1−c₁)^L`, the UNCLAMPED amplification bound
    * `ln(1−R)/ln(1−c₁)` (what L would need to be), and the model's
    * candidate volume per doc — the one table that shows where the
    * current geometry stops holding [[NearDupRecallTarget]] and what the
    * remedy costs, BEFORE a 100 TB campaign finds out from a thinned
    * dedup. Integer derivations (planes, tables, the cap flag) are
    * mirrored exactly in the oracle's SQL off its own `count(*)`; float
    * columns are 6-dp rounded libm arithmetic (the q134/q207 rule).
    *
    * Scale shape: an 11-row driver-literal table off the memoized
    * metadata count — the planner is a model, not a scan.
    */
  def recallPlanner(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nCorpus = corpusN(spark, dir)
    val maxKey  = NearDupTableCounts.keys.max
    val rows = (("corpus", nCorpus) +: PlannerDecades.map(d => (s"1e${math.log10(d.toDouble).round}", d)))
      .map { case (scale, n) =>
        val p = lshPlanesFor(n, NearDupMinPlanes)
        (scale, n, p, nearDupTablesFor(p), p > maxKey)
      }
    rows
      .toDF("scale", "n", "planes", "tables", "at_cap")
      .withColumn("s", expr(s"1.0 - acos($SemDedupThreshold) / pi()"))
      .withColumn("c1",
        expr("pow(s, planes) + planes * pow(s, planes - 1) * (1.0 - s)"))
      .select(
        col("scale"), col("n"), col("planes"), col("tables"), col("at_cap"),
        round(col("c1"), 6).as("c1"),
        round(expr("1.0 - pow(1.0 - c1, tables)"), 6).as("pred_recall"),
        round(expr(s"ln(1.0 - $NearDupRecallTarget) / ln(1.0 - c1)"), 6).as("l_bound"),
        round(
          expr("tables * (planes + 0.5) * (cast(n AS double) / cast(shiftleft(1L, planes) AS double))"),
          6).as("cand_per_doc"))
      .orderBy(col("n"), col("scale"))
  }

  /** Oracle: the same integer derivations re-run in SQL from DuckDB's own
    * `count(*)` (the planesCtes trick applied per row) + the identical
    * 6-dp float formulas.
    */
  lazy val recallPlannerSql: String = {
    val decades = PlannerDecades
      .map(d => s"SELECT '1e${math.round(math.log10(d.toDouble))}' AS scale, ${d}::BIGINT AS n")
      .mkString(" UNION ALL ")
    val maxKey = NearDupTableCounts.keys.max
    s"""WITH q254n AS (
       |  SELECT 'corpus' AS scale, count(*)::BIGINT AS n FROM embeddings
       |  UNION ALL $decades),
       |q254p AS (
       |  SELECT scale, n,
       |    GREATEST($NearDupMinPlanes,
       |      COALESCE(MIN(CASE WHEN (1::BIGINT << p) >= (n + ${LshTargetOccupancy - 1}) // $LshTargetOccupancy
       |                        THEN p END), 31))::INTEGER AS planes
       |  FROM q254n CROSS JOIN range(0, 32) r(p) GROUP BY scale, n),
       |q254t AS (
       |  SELECT scale, n, planes, (${tablesCaseSql("planes")})::INTEGER AS tables,
       |    planes > $maxKey AS at_cap,
       |    1.0 - acos($SemDedupThreshold) / pi() AS s
       |  FROM q254p),
       |q254c AS (
       |  SELECT *, pow(s, planes) + planes * pow(s, planes - 1) * (1.0 - s) AS c1 FROM q254t)
       |SELECT scale, n, planes, tables, at_cap,
       |  round(c1, 6) AS c1,
       |  round(1.0 - pow(1.0 - c1, tables), 6) AS pred_recall,
       |  round(ln(1.0 - $NearDupRecallTarget) / ln(1.0 - c1), 6) AS l_bound,
       |  round(tables * (planes + 0.5) * (n::DOUBLE / (1::BIGINT << planes)::DOUBLE), 6) AS cand_per_doc
       |FROM q254c
       |ORDER BY n, scale""".stripMargin
  }

  // --- q75: Johnson–Lindenstrauss random projection --------------------------
  val JlDims  = 16
  val JlTable = 97 // hash-index offset decorrelating from the LSH tables

  /** Dimensionality reduction by JL random projection: every embedding maps
    * to [[JlDims]] dims via hash-derived ±1 Rademacher weights (Achlioptas
    * 2003), `y_j = Σ_d v_d·w_jd / √k` — THE pre-step that makes downstream
    * similarity passes (q28/q30/q65) cheaper at 100 TB: pairwise distances
    * survive within (1±ε) at k = O(ln n / ε²), and a 4× narrower vector is
    * a 4× cheaper shuffle and a 4× denser cache. Purely map-side via the
    * codegen'd [[graft.functions.Expressions.RademacherProject]] — zero
    * shuffles besides the output sort; the weight matrix is hash-derived
    * (never materialized, no broadcast, reproducible on any executor AND in
    * the oracle).
    *
    * Output is long-form (vec_id, j, y) — scalar columns keep the oracle
    * compare exact; y is bit-exact (index-ordered fold, √16 = 4 exact).
    */
  def randomProjection(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .select(
        col("vec_id"),
        posexplode(graft.functions.Expressions.rademacher_project(col("v"), JlTable, JlDims))
          .as(Seq("j", "y")))
      .orderBy(col("vec_id"), col("j"))

  /** Oracle: the q29 plane-emulation pattern — the same
    * `XXH64.hashLong((table·64+j)·64+d, 42)` sign matrix re-derived in
    * DuckDB, identical index-ordered folds. Exact, no tolerance.
    */
  lazy val randomProjectionSql: String = {
    import graft.functions.DuckHash._
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](
      "q75pd" ->
        s"""(SELECT j, d, (($JlTable * 64 + j) * 64 + d)::HUGEINT AS idx
           |  FROM range(0, $JlDims) r(j), range(0, 64) s(d))""".stripMargin
    )
    val ch = new SqlChain("q75h", "q75pd", Seq("j", "d", "idx"))
    hashLongLevels(ch, "idx", "42", "hw")
    ctes ++= ch.ctes
    ctes += ("q75sgn" ->
      s"(SELECT j, list(CASE WHEN hw % 2 = 1 THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv FROM ${ch.last} GROUP BY j)")
    ctes += ("q75v" -> "(SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)")
    assemble(
      ctes.toSeq,
      s"""SELECT vec_id, j::INTEGER AS j,
         |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> v[i] * sv[i])),
         |    (a, x) -> a + x) / sqrt(${JlDims}.0) AS y
         |FROM q75v, q75sgn ORDER BY vec_id, j""".stripMargin)
  }

  // --- q72: per-label centroids + pairwise cosine matrix --------------------

  /** Per-class embedding centroids and the inter-class cosine-similarity
    * matrix — the first diagnostic of a labeled (or clustered) embedding
    * space: classes whose centroids sit at cosine ≈ 1 are candidates for
    * merging, classes far from all others flag mislabeled or contaminated
    * shards. The same pass prices an IVF layout (q32): near-parallel
    * centroids mean probe counts must rise.
    *
    * Scale shape: the corpus is touched ONCE by a posexplode over the
    * vector elements; the keyed shuffle carries |labels|×dim aggregation
    * keys with map-side combine, never rows. Everything downstream (array
    * reassembly, norms, the |labels|² pair join) operates on a table the
    * size of the LABEL SET, broadcast by AQE.
    *
    * Cross-engine exactness without order-pinning: float sums depend on
    * aggregation order, so the element sums are quantized FIRST —
    * `round(v·10⁶)` to BIGINT, summed exactly in any order — and the
    * centroid element is one double division of exact integers. Norms and
    * dots then fold in element-index order (the q28 convention), making the
    * whole matrix deterministic with no tolerance.
    */
  def centroidSim(spark: SparkSession, dir: String): DataFrame = {
    val Q = 1000000L
    val sums = Tables
      .embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "ve")))
      .select(col("label"), col("pos"),
        expr(s"CAST(round(CAST(ve AS DOUBLE) * $Q, 0) AS BIGINT)").as("q"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
    val cents = sums
      .withColumn("c", col("s").cast("double") / (col("n") * lit(Q)).cast("double"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cent"))
      .withColumn("nrm", sqrt(expr("aggregate(cent, 0D, (a, x) -> a + x * x)")))
    cents.as("a")
      .join(cents.as("b"), col("a.label") < col("b.label"))
      .select(
        col("a.label").as("label_a"),
        col("b.label").as("label_b"),
        round(
          expr("aggregate(zip_with(a.cent, b.cent, (x, y) -> x * y), 0D, (a2, x) -> a2 + x)") /
            (col("a.nrm") * col("b.nrm")),
          6).as("cos_sim"))
      .orderBy(col("label_a"), col("label_b"))
  }

  // --- q117: per-label embedding dispersion (pairwise without pairs) --------

  /** Per-label embedding dispersion — the mean squared pairwise distance
    * within each label, WITHOUT a pairwise join: for vectors x, y drawn
    * uniformly from a class, `E‖x−y‖² = 2·(E‖x‖² − ‖E[x]‖²)`, so class
    * spread comes from the same one-pass sums the centroid needs. High
    * dispersion = a diffuse or mixed class (split candidate, or a label
    * whose embedding model is failing); concentration (`‖centroid‖² /
    * E‖x‖²`) near 1 = a collapsed/degenerate class. This is the
    * embedding-space twin of q76's report card, and the diagnostic to
    * read BEFORE trusting q65's semantic dedup or q114's cohesion at
    * scale — an n² pair join over a 100 TB corpus is not an option, this
    * identity is.
    *
    * Scale shape: ONE posexplode pass; the keyed shuffle carries
    * |labels|×dim keys with map-side combine (q72's plan). Exactness:
    * element values AND element squares quantize to integers FIRST (sums
    * order-free), centroid elements and both mean norms are single
    * divisions of exact integers, and the ‖centroid‖² fold runs in
    * element-index order (q28's convention). At petabyte row counts the
    * integer square-sums outgrow BIGINT — production swaps them to
    * DECIMAL(38,0) sums, same arithmetic.
    */
  def labelDispersion(spark: SparkSession, dir: String): DataFrame = {
    val Q  = 1000000L
    val Q2 = 100000000L
    val sums = Tables
      .embeddings(spark, dir)
      .filter(col("label").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "ve")))
      .select(col("label"), col("pos"),
        expr(s"CAST(round(CAST(ve AS DOUBLE) * $Q, 0) AS BIGINT)").as("q"),
        expr(s"CAST(round(CAST(ve AS DOUBLE) * CAST(ve AS DOUBLE) * $Q2, 0) AS BIGINT)").as("q2"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), sum(col("q2")).as("s2"), count(lit(1)).as("n"))
    sums
      .withColumn("c", col("s").cast("double") / (col("n") * lit(Q)).cast("double"))
      .groupBy(col("label"))
      .agg(
        expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cent"),
        sum(col("s2")).as("ss2"),
        max(col("n")).as("n_vecs"))
      .withColumn("msn", col("ss2").cast("double") / (col("n_vecs") * lit(Q2)).cast("double"))
      .withColumn("csn", expr("aggregate(cent, 0D, (a, x) -> a + x * x)"))
      .select(
        col("label"),
        col("n_vecs"),
        round(col("msn"), 6).as("mean_sq_norm"),
        round(col("csn"), 6).as("centroid_sq_norm"),
        round(lit(2.0) * (col("msn") - col("csn")), 6).as("dispersion"),
        round(col("csn") / col("msn"), 6).as("concentration"))
      .orderBy(col("label"))
  }

  /** q117 oracle: q72's quantized element sums extended with quantized
    * element squares; identical division shapes and index-ordered folds.
    */
  val labelDispersionSql: String =
    """WITH q117e AS MATERIALIZED (
      |  SELECT label, unnest(range(1, len(embedding) + 1)) AS pos,
      |         unnest(embedding) AS ve
      |  FROM embeddings WHERE label IS NOT NULL),
      |q117s AS MATERIALIZED (
      |  SELECT label, pos,
      |    CAST(sum(CAST(round(ve::DOUBLE * 1000000, 0) AS BIGINT)) AS BIGINT) AS s,
      |    CAST(sum(CAST(round(ve::DOUBLE * ve::DOUBLE * 100000000, 0) AS BIGINT)) AS BIGINT) AS s2,
      |    count(*) AS n
      |  FROM q117e GROUP BY label, pos),
      |q117c AS (
      |  SELECT label, list(s::DOUBLE / (n * 1000000)::DOUBLE ORDER BY pos) AS cent,
      |    CAST(sum(s2) AS BIGINT) AS ss2, CAST(max(n) AS BIGINT) AS n_vecs
      |  FROM q117s GROUP BY label),
      |q117f AS (
      |  SELECT label, n_vecs,
      |    ss2::DOUBLE / (n_vecs * 100000000)::DOUBLE AS msn,
      |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(cent, x -> x * x)),
      |      (a, b) -> a + b) AS csn
      |  FROM q117c)
      |SELECT label, n_vecs, round(msn, 6) AS mean_sq_norm,
      |  round(csn, 6) AS centroid_sq_norm,
      |  round(2.0 * (msn - csn), 6) AS dispersion,
      |  round(csn / msn, 6) AS concentration
      |FROM q117f ORDER BY label""".stripMargin

  /** Oracle: identical quantized integer sums (order-free), one-division
    * centroid elements, and index-ordered norm/dot folds — exact.
    */
  // --- q130: per-label embedding outlier screen -------------------------------

  val OutlierTopK = 50

  /** Per-label embedding outliers: each vector's squared distance to its
    * OWN label's centroid, z-scored against that label's distance
    * distribution, top-[[OutlierTopK]] — the mislabel/contamination screen
    * run before trusting labels for training or eval: a vector far from
    * its own class in embedding space is a wrong label, a polysemous
    * cluster, or poisoned data, and this surfaces exactly which rows to
    * audit. Complements q117 (which scores LABELS by dispersion; this
    * scores ROWS within a label).
    *
    * Scale shape & exactness: centroids are q72's quantized-element sums
    * (|labels|×dim keys, map-side combine, order-free integer sums);
    * distances fold per-vector in element-index order against the
    * broadcast centroid table; the per-label moment statistics quantize
    * d² to integers FIRST (×10⁶, the q72 trick) so mean/variance come
    * from exact integer sums in any aggregation order (squares summed as
    * DECIMAL — no silent long overflow at scale); the final z is one
    * fixed subtract/divide/sqrt shape. Zero-variance labels (all rows
    * equidistant) have no outliers by definition and drop out.
    */
  def labelOutliers(spark: SparkSession, dir: String): DataFrame = {
    val Q = 1000000L
    val e = graft.core.CacheScope.persist(
      Tables
        .embeddings(spark, dir)
        .select(
          col("vec_id"),
          col("label").cast("long").as("label"),
          expr("transform(embedding, x -> cast(x AS double))").as("v")))
    val cents = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "ve")))
      .select(col("label"), col("pos"),
        expr(s"CAST(round(ve * $Q, 0) AS BIGINT)").as("q"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", col("s").cast("double") / (col("n") * lit(Q)).cast("double"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cent"))
    val d2 = graft.core.CacheScope.persist(
      e.join(broadcast(cents), "label")
        .select(col("vec_id"), col("label"),
          expr(s"""CAST(round(aggregate(zip_with(v, cent, (x, y) -> (x - y) * (x - y)),
                   0D, (a, x) -> a + x) * $Q, 0) AS BIGINT)""").as("d2q")))
    val stats = d2
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("d2q")).as("sq"),
        sum(col("d2q").cast("decimal(38,0)") * col("d2q").cast("decimal(38,0)")).as("sq2"))
      .select(
        col("label"),
        (col("sq").cast("double") / col("n").cast("double")).as("mean_q"),
        (col("sq2").cast("double") / col("n").cast("double")).as("m2_q"))
      .withColumn("var_q", col("m2_q") - col("mean_q") * col("mean_q"))
      .filter(col("var_q") > 0)
    d2
      .join(broadcast(stats), "label")
      .select(
        col("vec_id"),
        col("label"),
        round(col("d2q").cast("double") / lit(Q.toDouble), 6).as("dist_sq"),
        round((col("d2q").cast("double") - col("mean_q")) / sqrt(col("var_q")), 6).as("z"))
      .orderBy(col("z").desc, col("vec_id"))
      .limit(OutlierTopK)
  }

  /** q130 oracle: q72's centroid CTEs verbatim + the same index-ordered
    * distance fold, ×10⁶ quantization, integer moments, and z shape.
    */
  val labelOutliersSql: String =
    s"""WITH q130e AS MATERIALIZED (
       |  SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS v
       |  FROM embeddings),
       |q130x AS (
       |  SELECT label, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS ve
       |  FROM q130e),
       |q130s AS (
       |  SELECT label, pos,
       |    CAST(sum(CAST(round(ve * 1000000, 0) AS BIGINT)) AS BIGINT) AS s,
       |    count(*) AS n
       |  FROM q130x GROUP BY label, pos),
       |q130c AS MATERIALIZED (
       |  SELECT label, list(s::DOUBLE / (n * 1000000)::DOUBLE ORDER BY pos) AS cent
       |  FROM q130s GROUP BY label),
       |q130d AS MATERIALIZED (
       |  SELECT e.vec_id, e.label,
       |    CAST(round(list_reduce(list_prepend(0.0::DOUBLE,
       |        list_transform(range(1, len(e.v) + 1),
       |          i -> (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i]))),
       |      (a, x) -> a + x) * 1000000, 0) AS BIGINT) AS d2q
       |  FROM q130e e JOIN q130c c USING (label)),
       |q130m AS (
       |  SELECT label,
       |    sum(d2q)::DOUBLE / count(*)::DOUBLE AS mean_q,
       |    sum(d2q::HUGEINT * d2q)::DOUBLE / count(*)::DOUBLE AS m2_q
       |  FROM q130d GROUP BY label),
       |q130v AS (
       |  SELECT label, mean_q, m2_q - mean_q * mean_q AS var_q FROM q130m)
       |SELECT d.vec_id, d.label,
       |  round(d.d2q::DOUBLE / 1000000.0, 6) AS dist_sq,
       |  round((d.d2q::DOUBLE - v.mean_q) / sqrt(v.var_q), 6) AS z
       |FROM q130d d JOIN q130v v USING (label)
       |WHERE v.var_q > 0
       |ORDER BY z DESC, d.vec_id LIMIT $OutlierTopK""".stripMargin

  // --- q162: embedding drift between corpus halves ---------------------------

  /** Embedding drift audit: split the corpus deterministically in half
    * (even/odd vec_id — the stand-in for "yesterday's snapshot vs
    * today's"), and per label compare the two halves' centroid DIRECTIONS
    * (cosine of the quantized element-sum vectors — counts cancel, so no
    * division enters the comparison) plus each half's membership share.
    * A label whose half-centroids decorrelate is a label whose MEANING
    * moved — embedding-model version skew, annotation drift, or a
    * distribution shift that q71/q137 (text/stats drift) cannot see
    * because it lives in the embedding geometry. Run before trusting
    * q65's semantic dedup or q114's topics across snapshot boundaries.
    *
    * Scale shape: ONE posexplode pass to the |labels|×2×dim integer-sum
    * grain (map-side combine); everything downstream is tiny-table
    * folds; the 2-row half totals broadcast. Exactness: q72's
    * quantize-first integer sums, index-ordered folds, fixed
    * divide-round shapes.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val Q = 1000000L
    val sums = Tables
      .embeddings(spark, dir)
      .select(col("label"), (pmod(col("vec_id"), lit(2L)) === 0L).as("is_a"),
        posexplode(col("embedding")).as(Seq("pos", "ve")))
      .select(col("label"), col("is_a"), col("pos"),
        expr(s"CAST(round(CAST(ve AS DOUBLE) * $Q, 0) AS BIGINT)").as("q"))
      .groupBy(col("label"), col("is_a"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("c"))
    val vecs = sums
      .groupBy(col("label"), col("is_a"))
      .agg(
        expr("transform(array_sort(collect_list(struct(pos, s))), x -> CAST(x.s AS DOUBLE))")
          .as("sv"),
        max(col("c")).as("n"))
      .withColumn("nrm", sqrt(expr("aggregate(sv, 0D, (a, x) -> a + x * x)")))
    val halves = vecs
      .groupBy(col("is_a"))
      .agg(sum(col("n")).as("n_half"))
    val a = vecs.filter(col("is_a")).select(
      col("label"), col("sv").as("sva"), col("n").as("n_a"), col("nrm").as("nrma"))
    val b = vecs.filter(!col("is_a")).select(
      col("label"), col("sv").as("svb"), col("n").as("n_b"), col("nrm").as("nrmb"))
    a.join(b, "label")
      .crossJoin(broadcast(
        halves.agg(
          max(when(col("is_a"), col("n_half"))).as("tot_a"),
          max(when(!col("is_a"), col("n_half"))).as("tot_b"))))
      .select(
        col("label"),
        col("n_a"),
        col("n_b"),
        when(col("nrma") > 0.0 && col("nrmb") > 0.0,
          round(
            expr("aggregate(zip_with(sva, svb, (x, y) -> x * y), 0D, (a2, x) -> a2 + x)") /
              (col("nrma") * col("nrmb")),
            6)).as("centroid_cos"),
        round(col("n_a").cast("double") / col("tot_a").cast("double"), 6).as("share_a"),
        round(col("n_b").cast("double") / col("tot_b").cast("double"), 6).as("share_b"),
        round(
          col("n_b").cast("double") / col("tot_b").cast("double") -
            col("n_a").cast("double") / col("tot_a").cast("double"),
          6).as("share_shift"))
      .orderBy(col("label"))
  }

  /** q162 oracle: identical quantized sums, pos-ordered folds, and
    * divide-round shapes over the same even/odd split.
    */
  val embeddingDriftSql: String =
    """WITH q162e AS (
      |  SELECT label, (vec_id % 2 = 0) AS is_a,
      |    unnest(range(1, len(embedding) + 1)) AS pos, unnest(embedding) AS ve
      |  FROM embeddings),
      |q162s AS MATERIALIZED (
      |  SELECT label, is_a, pos,
      |    CAST(sum(CAST(round(ve::DOUBLE * 1000000, 0) AS BIGINT)) AS BIGINT) AS s,
      |    count(*)::BIGINT AS c
      |  FROM q162e GROUP BY 1, 2, 3),
      |q162v AS MATERIALIZED (
      |  SELECT label, is_a, list(s::DOUBLE ORDER BY pos) AS sv, max(c) AS n
      |  FROM q162s GROUP BY 1, 2),
      |q162n AS (
      |  SELECT label, is_a, sv, n,
      |    sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(sv, x -> x * x)),
      |      (a, b) -> a + b)) AS nrm
      |  FROM q162v),
      |q162t AS (
      |  SELECT CAST(max(CASE WHEN is_a THEN t END) AS BIGINT) AS tot_a,
      |    CAST(max(CASE WHEN NOT is_a THEN t END) AS BIGINT) AS tot_b
      |  FROM (SELECT is_a, sum(n) AS t FROM q162v GROUP BY is_a))
      |SELECT a.label, a.n AS n_a, b.n AS n_b,
      |  CASE WHEN a.nrm > 0.0 AND b.nrm > 0.0 THEN
      |    round(list_reduce(list_prepend(0.0::DOUBLE,
      |        list_transform(range(1, len(a.sv) + 1), i -> a.sv[i] * b.sv[i])),
      |      (x, y) -> x + y) / (a.nrm * b.nrm), 6) END AS centroid_cos,
      |  round(a.n::DOUBLE / t.tot_a::DOUBLE, 6) AS share_a,
      |  round(b.n::DOUBLE / t.tot_b::DOUBLE, 6) AS share_b,
      |  round(b.n::DOUBLE / t.tot_b::DOUBLE - a.n::DOUBLE / t.tot_a::DOUBLE, 6) AS share_shift
      |FROM q162n a JOIN q162n b ON a.label = b.label AND a.is_a AND NOT b.is_a
      |CROSS JOIN q162t t
      |ORDER BY a.label""".stripMargin

  val centroidSimSql: String =
    """WITH q72e AS MATERIALIZED (
      |  SELECT label, unnest(range(1, len(embedding) + 1)) AS pos,
      |         unnest(embedding) AS ve
      |  FROM embeddings),
      |q72s AS MATERIALIZED (
      |  SELECT label, pos,
      |    CAST(sum(CAST(round(ve::DOUBLE * 1000000, 0) AS BIGINT)) AS BIGINT) AS s,
      |    count(*) AS n
      |  FROM q72e GROUP BY label, pos),
      |q72c AS MATERIALIZED (
      |  SELECT label, list(s::DOUBLE / (n * 1000000)::DOUBLE ORDER BY pos) AS cent
      |  FROM q72s GROUP BY label),
      |q72n AS MATERIALIZED (
      |  SELECT label, cent,
      |    sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(cent, x -> x * x)),
      |         (a, b) -> a + b)) AS nrm
      |  FROM q72c)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  round(list_reduce(list_prepend(0.0::DOUBLE,
      |          list_transform(range(1, len(a.cent) + 1), i -> a.cent[i] * b.cent[i])),
      |        (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS cos_sim
      |FROM q72n a JOIN q72n b ON a.label < b.label
      |ORDER BY label_a, label_b""".stripMargin

  // --- q168: embedding-store integrity audit ----------------------------------

  /** The vector-side counterpart of q105's referential audit — the gate
    * run before ANY of the similarity/ANN/dedup machinery is trusted,
    * because every one of those ops silently mis-ranks on the defects it
    * counts: ragged dimensions (fold lengths disagree), non-finite
    * elements (NaN cosine sorts above every real score), zero-norm
    * vectors (cosine division by zero — the reason [[emb]] drops them;
    * this audit REPORTS how many are dropped), duplicate vec_ids (joins
    * fan out), and doc↔vec coverage holes in both directions (q115/q65
    * silently skip unembedded docs; orphan vectors waste index space).
    * One row per check: violations + population, q105's exact shape.
    *
    * Scale shape: checks 1-3 are map-side predicates folded into 1-row
    * aggregates on one scan each; dup detection is a keyed aggregate;
    * coverage is two LEFT ANTI joins on the id (the shuffle the
    * production join pays anyway — AQE broadcasts the small side). The
    * canonical dimension is the min-vec_id row's length (deterministic,
    * one bounded lookup). Everything is an integer count.
    */
  def embeddingAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val d = Tables.documents(spark, dir)
    val nVec = e.count()
    val nDoc = d.count()
    val dim = e.orderBy(col("vec_id")).select(size(col("embedding"))).limit(1)
      .head().getInt(0)

    def report(name: String, viol: DataFrame, total: Long): DataFrame =
      viol.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check"), col("n_violations"), lit(total).as("n_checked"))

    Seq(
      report("1_dim_mismatch", e.filter(size(col("embedding")) =!= dim), nVec),
      report("2_nonfinite",
        e.filter(expr(
          "exists(embedding, x -> isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE))")),
        nVec),
      report("3_zero_norm",
        e.filter(expr(
          "aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) = 0D")),
        nVec),
      report("4_dup_vec_id",
        e.groupBy(col("vec_id")).agg(count(lit(1)).as("n")).filter(col("n") > 1), nVec),
      report("5_doc_without_vec",
        d.select(col("doc_id"))
          .join(e.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti"), nDoc),
      report("6_vec_without_doc",
        e.select(col("vec_id"))
          .join(d.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_anti"), nVec)
    ).reduce(_.unionByName(_)).orderBy(col("check"))
  }

  /** q168 oracle: the same six constraint counts as scalar subqueries —
    * identical min-vec_id canonical dim, NaN/Inf predicates, and
    * sum-of-squares zero-norm test.
    */
  val embeddingAuditSql: String =
    """SELECT * FROM (
      |  SELECT '1_dim_mismatch' AS "check",
      |    (SELECT count(*) FROM embeddings WHERE len(embedding) <>
      |      (SELECT len(embedding) FROM embeddings
      |       WHERE vec_id = (SELECT min(vec_id) FROM embeddings)))::BIGINT AS n_violations,
      |    (SELECT count(*) FROM embeddings)::BIGINT AS n_checked
      |  UNION ALL SELECT '2_nonfinite',
      |    (SELECT count(*) FROM embeddings WHERE len(list_filter(embedding,
      |      x -> isnan(x::DOUBLE) OR isinf(x::DOUBLE))) > 0)::BIGINT,
      |    (SELECT count(*) FROM embeddings)::BIGINT
      |  UNION ALL SELECT '3_zero_norm',
      |    (SELECT count(*) FROM embeddings WHERE list_reduce(
      |      list_prepend(0.0::DOUBLE, list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
      |      (a, b) -> a + b) = 0.0)::BIGINT,
      |    (SELECT count(*) FROM embeddings)::BIGINT
      |  UNION ALL SELECT '4_dup_vec_id',
      |    (SELECT count(*) FROM
      |      (SELECT vec_id FROM embeddings GROUP BY vec_id HAVING count(*) > 1))::BIGINT,
      |    (SELECT count(*) FROM embeddings)::BIGINT
      |  UNION ALL SELECT '5_doc_without_vec',
      |    (SELECT count(*) FROM documents d WHERE NOT EXISTS
      |      (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id))::BIGINT,
      |    (SELECT count(*) FROM documents)::BIGINT
      |  UNION ALL SELECT '6_vec_without_doc',
      |    (SELECT count(*) FROM embeddings e WHERE NOT EXISTS
      |      (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))::BIGINT,
      |    (SELECT count(*) FROM embeddings)::BIGINT
      |) ORDER BY "check"""".stripMargin

  // --- q194: embedding covariance spectrum audit -----------------------------
  val SpecQ         = 10000L
  val SpecSampleMod = 4L
  val SpecRounds    = 6

  /** q194 degenerate summary: empty sample (n = 0) or zero-trace
    * covariance (all sampled vectors identical) — one explicit row with
    * the sample count and NULL spectrum columns, instead of a driver
    * exception / NaN propagation. The oracle emits the same row from a
    * `n = 0 OR tr = 0` UNION branch.
    */
  private def spectrumDegenerate(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    Seq((n, Option.empty[Double], Option.empty[Double], Option.empty[Double],
      Option.empty[Double], Option.empty[Long], Option.empty[Double]))
      .toDF("n_sample", "trace_var", "lambda1_var", "pc1_share", "erank",
        "top_dim", "top_loading")
  }

  /** Embedding-collapse audit: the covariance spectrum summary a training
    * team reads before trusting cosine geometry at all — q168 audits
    * normalization and q162 drift, but neither sees RANK COLLAPSE (all
    * vectors crowding a low-dimensional cone), which silently breaks
    * q28/q65/q83's cosine contrast and every downstream ANN recall number.
    * One row: sampled count, total variance, top-eigenvalue share
    * (pc1_share → 1 means one direction carries the mass), participation-
    * ratio effective rank `trace²/‖C‖²_F` (= (Σλ)²/Σλ² without an
    * eigendecomposition), and the dominant dimension of PC1.
    *
    * Scale shape: a deterministic `xxhash64(vec_id) % 4 = 0` audit sample
    * (the q45 rule — content-stable on any cluster), ONE pass whose in-row
    * upper-triangle outer product explodes to the d(d+1)/2+d+1 = 2145-cell
    * grain and map-side-combines to exact integer sums (quantize-first,
    * q72/q162 rule: elements → `round(e·10⁴)`, so S_ij/s_i/n are exact and
    * order-free). Everything after runs on the COLLECTED 64×64 integer
    * matrix (≤2145 values — the bounded-model collect the ANN trainers
    * use): [[SpecRounds]] power-iteration rounds in index-ordered IEEE
    * double arithmetic. sqrt/·/+ are correctly-rounded IEEE ops, so the
    * driver loop and the oracle's unrolled list-fold rounds produce
    * BIT-IDENTICAL iterates — no transcendentals anywhere.
    */
  def embedSpectrum(spark: SparkSession, dir: String): DataFrame = {
    val d = 64
    // one explode: upper-triangle products + sentinel cells (i,-1)=q_i
    // (linear sums) and (-1,-1)=1 (count), one aggregate for all three
    val cells = Tables
      .embeddings(spark, dir)
      .filter(pmod(xxhash64(col("vec_id")), lit(SpecSampleMod)) === 0L)
      .select(
        expr(s"transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * $SpecQ, 0) AS BIGINT))")
          .as("q"))
      .select(explode(expr(
        s"""concat(
           |  flatten(transform(sequence(0, ${d - 1}), i ->
           |    transform(sequence(i, ${d - 1}), j ->
           |      named_struct('i', i, 'j', j, 'p', element_at(q, i + 1) * element_at(q, j + 1))))),
           |  transform(sequence(0, ${d - 1}), i -> named_struct('i', i, 'j', -1, 'p', element_at(q, i + 1))),
           |  array(named_struct('i', -1, 'j', -1, 'p', CAST(1 AS BIGINT))))""".stripMargin))
        .as("x"))
      .groupBy(col("x.i").as("i"), col("x.j").as("j"))
      .agg(sum(col("x.p")).as("s"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .toMap
    // degenerate sample: nothing passed the audit gate — explicit summary
    // row instead of a driver NoSuchElementException (oracle mirrors)
    if (cells.isEmpty) return spectrumDegenerate(spark, 0L)
    val n  = cells((-1, -1))
    val sv = Array.tabulate(d)(i => cells((i, -1)))
    val c  = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      // LOUD envelope guard (the centMomentValue rule): the oracle's
      // BIGINT products RAISE past 2^63, while plain Long arithmetic here
      // would wrap silently into a wrong spectrum. Match the oracle's
      // failure surface exactly: raise when any intermediate (n·S_ij,
      // s_i·s_j) or the centered cell leaves the Long domain — reached
      // around n ≈ 3·10⁵ sampled vectors at |q| ≤ 10⁴; shrink the sample
      // gate (SpecSampleMod) before that, never widen the arithmetic.
      val np = BigInt(n) * cells((a, b))
      val ss = BigInt(sv(i)) * sv(j)
      val cc = np - ss
      if (!np.isValidLong || !ss.isValidLong || !cc.isValidLong)
        throw new IllegalStateException(
          s"q194: covariance cell ($i,$j) exceeds the exact Long envelope " +
            s"(n=$n, n*S=$np, s_i*s_j=$ss) — raise SpecSampleMod before the " +
            "spectrum silently wraps (the DuckDB oracle errors here)")
      cc.toLong.toDouble
    }
    // all-identical sample: zero covariance, power iteration would
    // propagate NaN through every column — explicit summary row instead
    var tr0 = 0.0
    for (i <- 0 until d) tr0 += c(i)(i)
    if (tr0 == 0.0) return spectrumDegenerate(spark, n)
    // power iteration, index-ordered folds (the oracle mirrors these exactly)
    var v = Array.fill(d)(0.125)
    var w = new Array[Double](d)
    for (_ <- 1 to SpecRounds) {
      w = Array.tabulate(d) { i =>
        var a = 0.0; var j = 0
        while (j < d) { a += c(i)(j) * v(j); j += 1 }; a
      }
      var s2 = 0.0; var i = 0
      while (i < d) { s2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(s2)
      v = w.map(_ / nrm)
    }
    w = Array.tabulate(d) { i =>
      var a = 0.0; var j = 0
      while (j < d) { a += c(i)(j) * v(j); j += 1 }; a
    }
    var num = 0.0; var den = 0.0; var tr = 0.0; var f2 = 0.0
    for (i <- 0 until d) { num += v(i) * w(i); den += v(i) * v(i); tr += c(i)(i) }
    for (i <- 0 until d; j <- 0 until d) f2 += c(i)(j) * c(i)(j)
    val lambda1 = num / den
    // left-assoc like the oracle's n*n*Q*Q (all factors exactly
    // representable, but keep the op order identical anyway)
    val scale = n.toDouble * n.toDouble * SpecQ.toDouble * SpecQ.toDouble
    val topDim  = (0 until d).maxBy(i => (math.abs(v(i)), -i.toDouble))
    import spark.implicits._
    Seq((n, tr / scale, lambda1 / scale, lambda1 / tr, tr * tr / f2,
      topDim.toLong, v(topDim)))
      .toDF("n_sample", "trace_var", "lambda1_var", "pc1_share", "erank", "top_dim", "top_loading")
      .select(
        col("n_sample"),
        round(col("trace_var"), 6).as("trace_var"),
        round(col("lambda1_var"), 6).as("lambda1_var"),
        round(col("pc1_share"), 6).as("pc1_share"),
        round(col("erank"), 6).as("erank"),
        col("top_dim"),
        round(col("top_loading"), 6).as("top_loading"))
  }

  /** Oracle: same sample gate (XXH64-long emulation), same quantized
    * integer cell sums, then [[SpecRounds]] unrolled power-iteration CTE
    * rounds whose `list_reduce` folds replay the driver's index-ordered
    * IEEE arithmetic bit-for-bit (products, left-fold sums, one sqrt and
    * one divide per round — no transcendentals, so no rounding wobble).
    */
  lazy val embedSpectrumSql: String = {
    import graft.functions.DuckHash._
    val d = 64
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](
      "q194in" -> "(SELECT vec_id, embedding, vec_id::HUGEINT AS l FROM embeddings)"
    )
    val ch = new SqlChain("q194h", "q194in", Seq("vec_id", "embedding", "l"))
    hashLongLevels(ch, s"${toUnsigned("l")}", "42", "h")
    ctes ++= ch.ctes
    ctes += ("q194q" ->
      s"""(SELECT list_transform(embedding, e ->
         |      CAST(round(e::DOUBLE * $SpecQ, 0) AS BIGINT)) AS q
         |  FROM ${ch.last}
         |  WHERE ((${toSigned("h")} % $SpecSampleMod) + $SpecSampleMod) % $SpecSampleMod = 0)""".stripMargin)
    ctes += ("q194n" -> "(SELECT count(*)::BIGINT AS n FROM q194q)")
    ctes += ("q194s" ->
      s"""(SELECT i.range::INT AS i, CAST(sum(q[i.range + 1]) AS BIGINT) AS s
         |  FROM q194q, range(0, $d) i GROUP BY 1)""".stripMargin)
    ctes += ("q194p" ->
      s"""(SELECT i.range::INT AS i, j.range::INT AS j,
         |    CAST(sum(q[i.range + 1] * q[j.range + 1]) AS BIGINT) AS p
         |  FROM q194q, range(0, $d) i, range(0, $d) j
         |  WHERE i.range <= j.range GROUP BY 1, 2)""".stripMargin)
    ctes += ("q194m" ->
      """(SELECT ij.i, ij.j,
        |    CAST(n.n * p.p - si.s * sj.s AS DOUBLE) AS c
        |  FROM (SELECT a.i, b.j, least(a.i, b.j) AS lo, greatest(a.i, b.j) AS hi
        |        FROM (SELECT DISTINCT i FROM q194s) a(i), (SELECT DISTINCT i FROM q194s) b(j)) ij
        |  JOIN q194p p ON p.i = ij.lo AND p.j = ij.hi
        |  JOIN q194s si ON si.i = ij.i
        |  JOIN q194s sj ON sj.i = ij.j
        |  CROSS JOIN q194n n)""".stripMargin)
    ctes += ("q194v0" -> s"(SELECT i.range::INT AS i, 0.125::DOUBLE AS v FROM range(0, $d) i)")
    var prev = "q194v0"
    for (r <- 1 to SpecRounds) {
      ctes += (s"q194w$r" ->
        s"""(SELECT m.i,
           |    list_reduce(list_prepend(0.0::DOUBLE, list(m.c * v.v ORDER BY m.j)), (a, b) -> a + b) AS w
           |  FROM q194m m JOIN $prev v ON v.i = m.j GROUP BY m.i)""".stripMargin)
      ctes += (s"q194nr$r" ->
        s"""(SELECT sqrt(list_reduce(list_prepend(0.0::DOUBLE, list(w * w ORDER BY i)), (a, b) -> a + b)) AS nrm
           |  FROM q194w$r)""".stripMargin)
      ctes += (s"q194v$r" -> s"(SELECT i, w / nrm AS v FROM q194w$r CROSS JOIN q194nr$r)")
      prev = s"q194v$r"
    }
    ctes += ("q194wf" ->
      s"""(SELECT m.i,
         |    list_reduce(list_prepend(0.0::DOUBLE, list(m.c * v.v ORDER BY m.j)), (a, b) -> a + b) AS w
         |  FROM q194m m JOIN $prev v ON v.i = m.j GROUP BY m.i)""".stripMargin)
    ctes += ("q194ray" ->
      s"""(SELECT
         |    list_reduce(list_prepend(0.0::DOUBLE, list(v.v * w.w ORDER BY v.i)), (a, b) -> a + b) AS num,
         |    list_reduce(list_prepend(0.0::DOUBLE, list(v.v * v.v ORDER BY v.i)), (a, b) -> a + b) AS den
         |  FROM $prev v JOIN q194wf w ON w.i = v.i)""".stripMargin)
    ctes += ("q194tf" ->
      """(SELECT
        |    list_reduce(list_prepend(0.0::DOUBLE, list(CASE WHEN i = j THEN c ELSE 0.0 END ORDER BY i, j)), (a, b) -> a + b) AS tr,
        |    list_reduce(list_prepend(0.0::DOUBLE, list(c * c ORDER BY i, j)), (a, b) -> a + b) AS f2
        |  FROM q194m)""".stripMargin)
    ctes += ("q194top" ->
      s"""(SELECT i::BIGINT AS top_dim, v AS top_loading
         |  FROM $prev ORDER BY abs(v) DESC, i LIMIT 1)""".stripMargin)
    assemble(
      ctes.toSeq,
      s"""SELECT n.n AS n_sample,
         |  round(t.tr / (n.n::DOUBLE * n.n::DOUBLE * ${SpecQ}.0 * ${SpecQ}.0), 6) AS trace_var,
         |  round((r.num / r.den) / (n.n::DOUBLE * n.n::DOUBLE * ${SpecQ}.0 * ${SpecQ}.0), 6) AS lambda1_var,
         |  round((r.num / r.den) / t.tr, 6) AS pc1_share,
         |  round(t.tr * t.tr / t.f2, 6) AS erank,
         |  tp.top_dim,
         |  round(tp.top_loading, 6) AS top_loading
         |FROM q194n n CROSS JOIN q194ray r CROSS JOIN q194tf t CROSS JOIN q194top tp
         |WHERE n.n > 0 AND t.tr IS NOT NULL AND t.tr <> 0
         |UNION ALL
         |SELECT n.n, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE,
         |  NULL::BIGINT, NULL::DOUBLE
         |FROM q194n n CROSS JOIN q194tf t
         |WHERE n.n = 0 OR t.tr IS NULL OR t.tr = 0""".stripMargin)
  }

  // --- q197: cluster-quality silhouette audit --------------------------------

  /** Simplified (centroid) silhouette audit of the IVF/topic quantizer —
    * the "are these clusters REAL?" number q114's cohesion table cannot
    * give: cohesion says members sit near their centroid, silhouette says
    * they sit nearer their OWN centroid than the next-best one. Per
    * member, with cosine distance d = 1 − cos and c₁/c₂ the two nearest
    * centroids: s = (cos₁ − cos₂)/(1 − cos₂) ∈ [−1, 1]; per cluster the
    * mean/min silhouette and the count of NEGATIVE members (vectors that
    * sit closer to a neighbouring cell — misassigned mass that q32's
    * probes must chase across cells, and the first thing to reconcile
    * before trusting q114's composition or q65's semantic dedup radius).
    *
    * Scale shape: the shared bounded trainer (≤512-vector systematic
    * sample), then ONE codegen'd top-2 assignment projection
    * (`nearest_centroids(v, cents, 2)` — same argmax kernel, zero
    * shuffle), two broadcast 16-row centroid joins, and ONE ≤|cells|
    * -group aggregate. Exactness: cosines quantize to micro-ints first
    * (q114's rule); the member silhouette re-quantizes the exact-integer
    * ratio with FLOOR, not round — an integer ratio times 10⁶ can land
    * EXACTLY on a rounding half-point (not measure-zero like a dot
    * product), and floor has no tie rule to diverge on.
    */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Expressions.nearest_centroids
    import spark.implicits._
    val e      = emb(spark, dir)
    val cents  = trainCentroids(collectSample(e), IvfCells)
    val centDf = cents.toSeq.zipWithIndex.map { case (w, i) => (i, w.toSeq) }.toDF("cell", "w")
    e.withColumn("nc", nearest_centroids(col("v"), cents, 2))
      .withColumn("c1", col("nc").getItem(0))
      .withColumn("c2", col("nc").getItem(1))
      .join(broadcast(centDf.select(col("cell").as("c1"), col("w").as("w1"))), Seq("c1"))
      .join(broadcast(centDf.select(col("cell").as("c2"), col("w").as("w2"))), Seq("c2"))
      .withColumn("ci1",
        round(dot_product(col("v"), col("w1")) / col("nrm") * lit(1e6), 0).cast("long"))
      .withColumn("ci2",
        round(dot_product(col("v"), col("w2")) / col("nrm") * lit(1e6), 0).cast("long"))
      .withColumn("sq",
        when(col("ci2") === 1000000L, 0L).otherwise(
          floor(
            (col("ci1") - col("ci2")).cast("double") /
              (lit(1000000L) - col("ci2")).cast("double") * lit(1000000.0)).cast("long")))
      .groupBy(col("c1"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("sq")).as("ssq"),
        min(col("sq")).as("msq"),
        sum(when(col("sq") < 0L, 1L).otherwise(0L)).as("n_negative"))
      .select(
        (col("c1") + 1).as("cluster"),
        col("n_members"),
        round(col("ssq").cast("double") / (col("n_members").cast("double") * lit(1000000.0)), 6)
          .as("mean_sil"),
        round(col("msq").cast("double") / lit(1000000.0), 6).as("min_sil"),
        col("n_negative"))
      .orderBy(col("cluster"))
  }

  /** q197 oracle: the shared trainer chain, a rank-1/rank-2 window over
    * the per-cell dot list with the kernel's exact tiebreak (dot DESC,
    * cell ASC — `list_position(ds, list_max(ds))` picks the same first
    * index), identical micro-int quantization and floor re-quantization.
    */
  lazy val silhouetteSql: String = {
    import graft.functions.DuckHash.assemble
    import scala.collection.mutable.ArrayBuffer
    val D    = 64
    val ctes = ArrayBuffer(ivfAssignCtes(D): _*)
    val cf   = s"q32c$IvfIters"
    ctes += ("q197ds" ->
      s"""(SELECT vec_id AS n_id, nrm AS cn,
         |    list_transform(cents, w -> ${dotFoldSql("v", "w", D)}) AS ds
         |  FROM q32ef, $cf)""".stripMargin)
    ctes += ("q197r" ->
      s"""(SELECT n_id, cn, r.range::INT AS cell, ds[r.range] AS dot,
         |    ROW_NUMBER() OVER (PARTITION BY n_id ORDER BY ds[r.range] DESC, r.range) AS rn
         |  FROM q197ds, range(1, ${IvfCells + 1}) r)""".stripMargin)
    ctes += ("q197m" ->
      """(SELECT a.n_id, a.cell AS c1,
        |    CAST(round(a.dot / a.cn * 1000000.0, 0) AS BIGINT) AS ci1,
        |    CAST(round(b.dot / b.cn * 1000000.0, 0) AS BIGINT) AS ci2
        |  FROM (SELECT * FROM q197r WHERE rn = 1) a
        |  JOIN (SELECT * FROM q197r WHERE rn = 2) b USING (n_id))""".stripMargin)
    ctes += ("q197s" ->
      """(SELECT n_id, c1,
        |    CASE WHEN ci2 = 1000000 THEN 0
        |         ELSE CAST(floor(CAST(ci1 - ci2 AS DOUBLE)
        |           / CAST(1000000 - ci2 AS DOUBLE) * 1000000.0) AS BIGINT) END AS sq
        |  FROM q197m)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT c1::INTEGER AS cluster, count(*)::BIGINT AS n_members,
        |  round(CAST(sum(sq) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean_sil,
        |  round(min(sq)::DOUBLE / 1000000.0, 6) AS min_sil,
        |  CAST(sum(CASE WHEN sq < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
        |FROM q197s GROUP BY c1
        |ORDER BY cluster""".stripMargin)
  }

  // --- q206: cluster-label purity / NMI audit --------------------------------

  /** External validation of the shared IVF quantizer against the `label`
    * column — the complement of q197's silhouette (internal geometry) and
    * q114's cohesion: purity and normalized mutual information say whether
    * the UNSUPERVISED cells recover the SUPERVISED classes, which is the
    * go/no-go check before using cell ids as topic strata for q45-style
    * sampling or q53 mixing. Per cluster: member count, majority label,
    * purity (majority share), label entropy; plus the corpus-level NMI
    * `I(C;L) / sqrt(H(C)·H(L))` repeated per row (1-row broadcast, the
    * repo's stats-column idiom).
    *
    * Scale shape: the shared bounded trainer, ONE codegen'd assignment
    * projection (zero shuffle), ONE (cell,label) count aggregate — output
    * bounded by |cells|·|labels|, so every later leg is broadcast-sized
    * algebra on a persisted bounded table.
    *
    * Exactness: counts are integers; each `c·ln c` is one product of an
    * integer-exact double with a 1-ulp `ln`, folded in bounded
    * index-ordered legs (the q58 rule); purity is an integer ratio and
    * re-quantizes with FLOOR, not round (the q197 half-point rule); NMI
    * divides the raw (unrounded) entropies and rounds once.
    */
  def clusterPurity(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Expressions.nearest_centroids
    val e = Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", l2_norm(col("v")))
      .filter(col("nrm") > 0)
    val cents = trainCentroids(collectSample(e), IvfCells)
    val counts = graft.core.CacheScope.persist(
      e.filter(col("label").isNotNull)
        .withColumn("cell", nearest_centroids(col("v"), cents, 1).getItem(0) + 1)
        .groupBy(col("cell"), col("label"))
        .agg(count(lit(1)).as("c")))
    val fold = "aggregate(array_sort(ts), cast(0 AS double), (a, x) -> a + x.t)"
    val percell = counts
      .select(
        col("cell"), col("c"), col("label"),
        struct(
          col("label"),
          (col("c").cast("double") * log(col("c").cast("double"))).as("t")).as("tc"))
      .groupBy(col("cell"))
      .agg(
        sum(col("c")).as("n_members"),
        min(struct((-col("c")).as("nc"), col("label").as("l"))).as("mj"),
        collect_list(col("tc")).as("ts"))
    val nl  = counts.groupBy(col("label")).agg(sum(col("c")).as("n_l"))
    val tot = counts.agg(sum(col("c")).as("n"))
    val mi = counts
      .join(broadcast(percell.select(col("cell"), col("n_members").as("n_c"))), Seq("cell"))
      .join(broadcast(nl), Seq("label"))
      .crossJoin(broadcast(tot))
      .select(
        struct(
          col("cell"), col("label"),
          ((col("c").cast("double") / col("n").cast("double")) *
            log(
              (col("c").cast("double") * col("n").cast("double")) /
                (col("n_c").cast("double") * col("n_l").cast("double")))).as("t")).as("tc"))
      .agg(collect_list(col("tc")).as("ts"))
      .select(expr(fold).as("mi"))
    val hc = percell
      .select(
        struct(
          col("cell"),
          (col("n_members").cast("double") * log(col("n_members").cast("double"))).as("t"))
          .as("tc"))
      .agg(collect_list(col("tc")).as("ts"))
      .select(expr(fold).as("snc"))
    val hl = nl
      .select(
        struct(
          col("label"),
          (col("n_l").cast("double") * log(col("n_l").cast("double"))).as("t")).as("tc"))
      .agg(collect_list(col("tc")).as("ts"))
      .select(expr(fold).as("snl"))
    val nmiRow = mi
      .crossJoin(hc)
      .crossJoin(hl)
      .crossJoin(tot)
      .withColumn("hcr", log(col("n").cast("double")) - col("snc") / col("n").cast("double"))
      .withColumn("hlr", log(col("n").cast("double")) - col("snl") / col("n").cast("double"))
      .select(
        when(col("hcr") * col("hlr") <= 0, lit(0.0))
          .otherwise(round(col("mi") / sqrt(col("hcr") * col("hlr")), 6))
          .as("nmi"))
    percell
      .select(
        col("cell").cast("int").as("cluster"),
        col("n_members"),
        col("mj.l").as("majority_label"),
        round(
          floor(
            (-col("mj.nc")).cast("double") * lit(1000000.0) /
              col("n_members").cast("double")).cast("long").cast("double") / lit(1000000.0),
          6).as("purity"),
        round(
          log(col("n_members").cast("double")) -
            expr(fold) / col("n_members").cast("double"),
          6).as("label_entropy"))
      .crossJoin(broadcast(nmiRow))
      .orderBy(col("cluster"))
  }

  /** q206 oracle: the shared trainer/assignment chain, identical bounded
    * index-ordered `c·ln c` folds, the FLOOR purity re-quantization, and
    * raw-entropy NMI — every float term a function of integer counts.
    */
  lazy val clusterPuritySql: String = {
    import graft.functions.DuckHash.assemble
    import scala.collection.mutable.ArrayBuffer
    val D    = 64
    val ctes = ArrayBuffer(ivfAssignCtes(D): _*)
    ctes += ("q206l" ->
      """(SELECT a.cell, e.label, count(*)::BIGINT AS c
        |  FROM q32asg a JOIN embeddings e ON e.vec_id = a.n_id
        |  WHERE e.label IS NOT NULL GROUP BY 1, 2)""".stripMargin)
    ctes += ("q206pc" ->
      """(SELECT cell, CAST(sum(c) AS BIGINT) AS n_members,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list(c::DOUBLE * ln(c::DOUBLE) ORDER BY label)), (a, b) -> a + b) AS snl
        |  FROM q206l GROUP BY cell)""".stripMargin)
    ctes += ("q206mj" ->
      """(SELECT cell, label AS majority_label, c FROM (
        |    SELECT cell, label, c,
        |      ROW_NUMBER() OVER (PARTITION BY cell ORDER BY c DESC, label) AS rn
        |    FROM q206l) WHERE rn = 1)""".stripMargin)
    ctes += ("q206nl" -> "(SELECT label, CAST(sum(c) AS BIGINT) AS n_l FROM q206l GROUP BY 1)")
    ctes += ("q206n" -> "(SELECT CAST(sum(c) AS BIGINT) AS n FROM q206l)")
    ctes += ("q206mi" ->
      """(SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |    list((l.c::DOUBLE / n.n::DOUBLE)
        |      * ln((l.c::DOUBLE * n.n::DOUBLE) / (pc.n_members::DOUBLE * nl.n_l::DOUBLE))
        |      ORDER BY l.cell, l.label)), (a, b) -> a + b) AS mi
        |  FROM q206l l JOIN q206pc pc USING (cell) JOIN q206nl nl USING (label), q206n n)""".stripMargin)
    ctes += ("q206hc" ->
      """(SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |    list(n_members::DOUBLE * ln(n_members::DOUBLE) ORDER BY cell)), (a, b) -> a + b) AS snc
        |  FROM q206pc)""".stripMargin)
    ctes += ("q206hl" ->
      """(SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |    list(n_l::DOUBLE * ln(n_l::DOUBLE) ORDER BY label)), (a, b) -> a + b) AS snl
        |  FROM q206nl)""".stripMargin)
    ctes += ("q206z" ->
      """(SELECT CASE WHEN hcr * hlr <= 0 THEN 0.0
        |         ELSE round(mi / sqrt(hcr * hlr), 6) END AS nmi FROM (
        |    SELECT mi.mi,
        |      ln(n.n::DOUBLE) - hc.snc / n.n::DOUBLE AS hcr,
        |      ln(n.n::DOUBLE) - hl.snl / n.n::DOUBLE AS hlr
        |    FROM q206mi mi, q206hc hc, q206hl hl, q206n n))""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT pc.cell::INTEGER AS cluster, pc.n_members, mj.majority_label,
        |  round(floor(mj.c::DOUBLE * 1000000.0 / pc.n_members::DOUBLE) / 1000000.0, 6) AS purity,
        |  round(ln(pc.n_members::DOUBLE) - pc.snl / pc.n_members::DOUBLE, 6) AS label_entropy,
        |  z.nmi
        |FROM q206pc pc JOIN q206mj mj USING (cell), q206z z
        |ORDER BY cluster""".stripMargin)
  }

  // --- q212: semantic (embedding-space) decontamination ----------------------

  /** An eval vector whose best train-side cosine reaches this is a
    * semantic leak — the SemDeDup-grade "same content, different words"
    * threshold, deliberately above the 0.35 candidate gate so the verdict
    * is a strict subset of the surfaced evidence.
    */
  val SemLeakThreshold = 0.45

  /** Semantic decontamination of the eval splits — the embedding-space
    * complement of q39/q87/q205's n-gram evidence: a paraphrased benchmark
    * answer shares no 8-gram with its source, but its embedding still
    * lands next to the training copy, and gram-based decontamination
    * silently passes it. For every val/test vector with at least one
    * train-split candidate at cosine ≥ the q30 gate: the candidate count,
    * its BEST train neighbor (max cosine, ties to the smallest train id),
    * and the leak verdict at [[SemLeakThreshold]] — the row an eval-set
    * curator acts on ("replace these items before trusting the score").
    *
    * Scale shape: candidates are q30's multi-table LSH pipeline verbatim
    * (bucket agg + capped in-bucket expansion — never corpus², recall is
    * the table-count dial); split assignment is q40's map-side
    * `pmod(xxhash64)` on both endpoints of the (dup-rate-bounded) pair
    * list; best-neighbor is a keyed max + a keyed equi-join back on
    * (eval_id, sim) — no windows, no collects. Determinism: the cosine is
    * the shared codegen'd fold (bit-equal to the oracle), max/min are
    * order-free, and the only round is the output's 4-dp display.
    */
  def semanticDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TrainingOps.{splitBucketCol, splitNameCol}
    // persist the pair list BEFORE the two-branch orientation union — both
    // branches (and the best/pick consumers) otherwise re-execute the
    // whole LSH bucket pipeline per read (the sf1 lane measured exp 1.11
    // from exactly that; pairs are dup-rate-bounded, cheap to pin)
    val pairs = SharedStages.nearDupPairs(spark, dir)
    val withSplits = pairs
      .withColumn("sa", splitNameCol(splitBucketCol(col("a_id"))))
      .withColumn("sb", splitNameCol(splitBucketCol(col("b_id"))))
    // orient: exactly-one-endpoint-in-train pairs, eval side forward
    val oriented = withSplits
      .filter(col("sa") === "train" && col("sb") =!= "train")
      .select(col("b_id").as("eval_id"), col("sb").as("split"),
        col("a_id").as("train_id"), col("sim"))
      .unionAll(withSplits
        .filter(col("sb") === "train" && col("sa") =!= "train")
        .select(col("a_id").as("eval_id"), col("sa").as("split"),
          col("b_id").as("train_id"), col("sim")))
    val best = oriented
      .groupBy(col("eval_id"), col("split"))
      .agg(count(lit(1)).as("n_train_cands"), max(col("sim")).as("ms"))
    val pick = oriented
      .join(best.select(col("eval_id"), col("ms")), Seq("eval_id"))
      .filter(col("sim") === col("ms"))
      .groupBy(col("eval_id"))
      .agg(min(col("train_id")).as("best_train"))
    best
      .join(pick, Seq("eval_id"))
      .select(
        col("eval_id").as("vec_id"), col("split"), col("n_train_cands"),
        col("best_train"), round(col("ms"), 4).as("best_sim"),
        (col("ms") >= SemLeakThreshold).as("is_leak"))
      .orderBy(col("vec_id"))
  }

  /** Oracle: the shared q30 CTE chain (bit-exact LSH candidates + fold
    * cosines), q40's emulated-xxhash64 split on vec_id, and the identical
    * orient → keyed-max → equi-join-back shapes.
    */
  lazy val semanticDecontaminateSql: String = {
    import graft.functions.DuckHash._
    import graft.operators.TrainingOps.{SplitTrainPct, SplitValPct}
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](nearDupCtes: _*)
    ctes += ("q212in" -> "(SELECT vec_id, vec_id::HUGEINT AS l FROM embeddings)")
    val ch = new SqlChain("q212h", "q212in", Seq("vec_id", "l"))
    hashLongLevels(ch, toUnsigned("l"), "42", "h")
    ctes ++= ch.ctes
    ctes += ("q212sp" ->
      s"""(SELECT vec_id,
         |   CASE WHEN bucket < $SplitTrainPct THEN 'train'
         |        WHEN bucket < $SplitValPct THEN 'val' ELSE 'test' END AS split
         | FROM (SELECT vec_id, (((${toSigned("h")} % 100) + 100) % 100)::INTEGER AS bucket
         |       FROM ${ch.last}))""".stripMargin)
    ctes += ("q212pr" ->
      s"(SELECT a_id, b_id, sim FROM q30sim WHERE sim >= $NearDupThreshold)")
    ctes += ("q212or" ->
      """(SELECT p.b_id AS eval_id, sb.split, p.a_id AS train_id, p.sim
        |  FROM q212pr p JOIN q212sp sa ON sa.vec_id = p.a_id
        |                JOIN q212sp sb ON sb.vec_id = p.b_id
        |  WHERE sa.split = 'train' AND sb.split <> 'train'
        | UNION ALL
        | SELECT p.a_id, sa.split, p.b_id, p.sim
        |  FROM q212pr p JOIN q212sp sa ON sa.vec_id = p.a_id
        |                JOIN q212sp sb ON sb.vec_id = p.b_id
        |  WHERE sb.split = 'train' AND sa.split <> 'train')""".stripMargin)
    ctes += ("q212b" ->
      """(SELECT eval_id, split, CAST(count(*) AS BIGINT) AS n_train_cands, max(sim) AS ms
        |  FROM q212or GROUP BY eval_id, split)""".stripMargin)
    ctes += ("q212p" ->
      """(SELECT o.eval_id, min(o.train_id) AS best_train
        |  FROM q212or o JOIN q212b b ON o.eval_id = b.eval_id AND o.sim = b.ms
        |  GROUP BY o.eval_id)""".stripMargin)
    assemble(
      ctes.toSeq,
      s"""SELECT b.eval_id AS vec_id, b.split, b.n_train_cands, p.best_train,
         |  round(b.ms, 4) AS best_sim, b.ms >= $SemLeakThreshold AS is_leak
         |FROM q212b b JOIN q212p p USING (eval_id)
         |ORDER BY vec_id""".stripMargin)
  }

  // --- q213: k-NN label-agreement mislabel screen -----------------------------

  val KnnK   = 10
  val KnnMin = 3

  /** Label-noise screen via candidate-k-NN agreement (the confident-
    * learning signal, Northcutt et al. 2021, on LSH candidates): for every
    * vector with at least [[KnnMin]] cosine candidates, the fraction of
    * its top-[[KnnK]] neighbors sharing its label — per label: vectors
    * audited, suspects (agreement < 0.3), and mean agreement. q130 flags
    * rows FAR from their own centroid (geometry-only); this flags rows
    * whose NEIGHBORHOOD voted for a different label — the mislabel pattern
    * centroid distance misses when a row sits squarely inside another
    * class's cluster. The audit before labels feed q45 strata or q66/q173
    * training.
    *
    * Scale shape: neighbors come from the shared q30 LSH candidate pool
    * (never corpus² — candidate-kNN is the honest asymptote, same argument
    * as q115's hard negatives); top-k per focal is a `row_number ≤ k`
    * filter the BoundedRankRewrite rule plans as a ≤k bounded heap; labels
    * attach via two keyed joins; the rollup is ≤|labels| rows of integer
    * sums (agreement micro-quantized — order-free, the q72/q163 rule).
    */
  def knnLabelAgreement(spark: SparkSession, dir: String): DataFrame = {
    // persisted before the two-branch orientation union — q212's rule
    val pairs = SharedStages.nearDupPairs(spark, dir)
    val oriented = pairs
      .select(col("a_id").as("focal"), col("b_id").as("nb"), col("sim"))
      .unionAll(pairs.select(col("b_id").as("focal"), col("a_id").as("nb"), col("sim")))
    val w = Window.partitionBy(col("focal")).orderBy(col("sim").desc, col("nb"))
    val topk = oriented
      .select(col("focal"), col("nb"), row_number().over(w).as("rk"))
      .filter(col("rk") <= KnnK)
    val labels = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val perFocal = topk
      .join(labels.select(col("vec_id").as("focal"), col("label").as("fl")), "focal")
      .join(labels.select(col("vec_id").as("nb"), col("label").as("nl")), "nb")
      .groupBy(col("focal"), col("fl"))
      .agg(
        count(lit(1)).as("n_nb"),
        sum(when(col("fl") === col("nl"), 1L).otherwise(0L)).as("n_agree"))
      .filter(col("n_nb") >= KnnMin)
    perFocal
      .groupBy(col("fl").as("label"))
      .agg(
        count(lit(1)).as("n_audited"),
        sum(when(col("n_agree") * 10 < col("n_nb") * 3, 1L).otherwise(0L)).as("n_suspect"),
        sum(expr("CAST(round(1000000.0 * n_agree / n_nb, 0) AS BIGINT)")).as("sq"))
      .select(
        col("label"), col("n_audited"), col("n_suspect"),
        round(col("sq").cast("double") / (col("n_audited") * lit(1000000L)).cast("double"), 6)
          .as("mean_agree"))
      .orderBy(col("label"))
  }

  /** Oracle: shared q30 candidate CTEs, ROW_NUMBER top-k with the same
    * (sim DESC, nb) tie rule, and the identical micro-quantized rollup.
    */
  lazy val knnLabelAgreementSql: String = {
    import graft.functions.DuckHash.assemble
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](nearDupCtes: _*)
    ctes += ("q213pr" ->
      s"(SELECT a_id, b_id, sim FROM q30sim WHERE sim >= $NearDupThreshold)")
    ctes += ("q213or" ->
      """(SELECT a_id AS focal, b_id AS nb, sim FROM q213pr
        | UNION ALL
        | SELECT b_id, a_id, sim FROM q213pr)""".stripMargin)
    ctes += ("q213tk" ->
      s"""(SELECT focal, nb FROM (
         |   SELECT focal, nb,
         |     ROW_NUMBER() OVER (PARTITION BY focal ORDER BY sim DESC, nb) AS rk
         |   FROM q213or) WHERE rk <= $KnnK)""".stripMargin)
    ctes += ("q213pf" ->
      s"""(SELECT t.focal, fe.label AS fl, CAST(count(*) AS BIGINT) AS n_nb,
         |   CAST(sum(CASE WHEN fe.label = ne.label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
         | FROM q213tk t
         | JOIN embeddings fe ON fe.vec_id = t.focal
         | JOIN embeddings ne ON ne.vec_id = t.nb
         | GROUP BY t.focal, fe.label
         | HAVING count(*) >= $KnnMin)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT fl AS label, CAST(count(*) AS BIGINT) AS n_audited,
        |  CAST(sum(CASE WHEN n_agree * 10 < n_nb * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
        |  round(CAST(sum(CAST(round(1000000.0 * n_agree / n_nb, 0) AS BIGINT)) AS DOUBLE)
        |    / (count(*) * 1000000)::DOUBLE, 6) AS mean_agree
        |FROM q213pf GROUP BY fl
        |ORDER BY label""".stripMargin)
  }

  // --- shared candidate-kNN graph (q213's top-k stage, factored) --------------

  /** The candidate-kNN edge list (focal → nb, top-[[KnnK]] by cosine over
    * the shared q30 LSH candidate pool) — q213's graph, factored so the
    * hubness and rater-agreement audits rank the SAME neighborhoods.
    */
  private def knnTopK(spark: SparkSession, dir: String): DataFrame = {
    // persisted before the two-branch orientation union — q212's rule
    val pairs = SharedStages.nearDupPairs(spark, dir)
    val oriented = pairs
      .select(col("a_id").as("focal"), col("b_id").as("nb"), col("sim"))
      .unionAll(pairs.select(col("b_id").as("focal"), col("a_id").as("nb"), col("sim")))
    val w = Window.partitionBy(col("focal")).orderBy(col("sim").desc, col("nb"))
    oriented
      .select(col("focal"), col("nb"), row_number().over(w).as("rk"))
      .filter(col("rk") <= KnnK)
      .select(col("focal"), col("nb"))
  }

  /** DuckDB mirror of [[knnTopK]]: the shared q30 candidate CTEs plus
    * `pfx`-prefixed pair/orient/top-k stages ending in `<pfx>tk(focal, nb)`.
    */
  private def knnTopKCtes(pfx: String): Seq[(String, String)] =
    nearDupCtes ++ Seq(
      s"${pfx}pr" ->
        s"(SELECT a_id, b_id, sim FROM q30sim WHERE sim >= $NearDupThreshold)",
      s"${pfx}or" ->
        s"""(SELECT a_id AS focal, b_id AS nb, sim FROM ${pfx}pr
           | UNION ALL
           | SELECT b_id, a_id, sim FROM ${pfx}pr)""".stripMargin,
      s"${pfx}tk" ->
        s"""(SELECT focal, nb FROM (
           |   SELECT focal, nb,
           |     ROW_NUMBER() OVER (PARTITION BY focal ORDER BY sim DESC, nb) AS rk
           |   FROM ${pfx}or) WHERE rk <= $KnnK)""".stripMargin)

  // --- q223: nDCG@K retrieval-quality eval ------------------------------------

  /** Rank cutoff for the nDCG audit — q176's first-hit horizon. */
  val NdcgK = 20

  /** Discounted-gain weights 10⁶/log₂(i+1) for ranks 1..[[NdcgK]],
    * micro-quantized ONCE here in the JVM and inlined as integer literals
    * into BOTH legs — the only transcendental (log₂) never evaluates
    * inside either engine, so rank weights are bit-identical by
    * construction.
    */
  private[graft] val NdcgGains: Seq[Long] =
    (1 to NdcgK).map(i => math.round(1000000.0 / (math.log(i + 1.0) / math.log(2.0))))

  /** Cumulative gains — `NdcgGainCums(j-1)` is the ideal DCG of j
    * relevant documents, `j ≤` [[NdcgK]].
    */
  private[graft] val NdcgGainCums: Seq[Long] =
    NdcgGains.scanLeft(0L)(_ + _).tail

  /** nDCG@[[NdcgK]] of exact cosine retrieval against label ground truth:
    * per query vector, the position-discounted gain of its same-label
    * neighbors normalized by the best achievable ordering
    * (`IDCG = Σ_{i≤min(K,n_rel)} g(i)`), plus a `q_id = -1` mean-nDCG
    * summary row. q176's MRR scores only the FIRST right answer; nDCG
    * prices the whole page — a retriever that puts one good hit at rank 1
    * and garbage below it ties q176 but loses here, which is the metric
    * gap that matters when top-k context windows consume ALL k results.
    *
    * Scale shape: q28's broadcast idiom — the fixed query set broadcasts
    * against one linear corpus scan; ranks are per-query windows over the
    * bounded candidate stream; the summary folds ≤ [[QueryCount]] rows.
    * Determinism: integer gain literals (above), integer DCG/IDCG sums,
    * one divide-round per query and a micro-quantized order-free mean
    * (the q176 rule).
    */
  def ndcgEval(spark: SparkSession, dir: String): DataFrame = {
    val gArr = NdcgGains.mkString("array(", "L, ", "L)")
    val cArr = NdcgGainCums.mkString("array(", "L, ", "L)")
    val e = Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"),
        col("label"))
      .withColumn("nrm", l2_norm(col("v")))
      .filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("label").as("ql"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"),
      col("label").as("cl"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val perQ = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", dot / (col("qn") * col("cn")))
      .select(col("q_id"), col("ql"), col("cl"), row_number().over(w).as("rk"))
      .groupBy(col("q_id"), col("ql"))
      .agg(
        sum(when(col("cl") === col("ql"), 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("cl") === col("ql") && col("rk") <= NdcgK,
          expr(s"element_at($gArr, rk)")).otherwise(0L)).as("dcg_u"))
      .withColumn("idcg_u",
        when(col("n_rel") > 0,
          expr(s"element_at($cArr, CAST(least(n_rel, ${NdcgK}L) AS INT))"))
          .otherwise(0L))
      .withColumn("mq",
        when(col("idcg_u") > 0,
          expr("CAST(round(1000000.0 * dcg_u / idcg_u, 0) AS BIGINT)")).otherwise(0L))
    val persisted = graft.core.CacheScope.persist(perQ)
    val summary = persisted
      .groupBy()
      .agg(count(lit(1)).as("nq"), sum(col("mq")).as("smq"))
      .select(
        lit(-1L).as("q_id"),
        lit(-1).as("label"),
        lit(null).cast("long").as("n_rel"),
        round(col("smq").cast("double") / lit(1000000.0) / col("nq").cast("double"), 6)
          .as("ndcg"))
    persisted
      .select(
        col("q_id"), col("ql").as("label"), col("n_rel"),
        when(col("idcg_u") > 0,
          round(col("dcg_u").cast("double") / col("idcg_u").cast("double"), 6))
          .otherwise(0.0).as("ndcg"))
      .unionByName(summary)
      .orderBy(col("q_id"))
  }

  /** Oracle: q28's engine-exact cosine rank spelling, the SAME inlined
    * integer gain literals, and the identical divide-round / micro-mean
    * shapes.
    */
  lazy val ndcgEvalSql: String = {
    val gArr = NdcgGains.mkString("[", ", ", "]::BIGINT[]")
    val cArr = NdcgGainCums.mkString("[", ", ", "]::BIGINT[]")
    s"""WITH q223e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS vd, label FROM embeddings
       |  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
       |q223k AS (
       |  SELECT q.vec_id AS q_id, q.label AS ql, c.label AS cl,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${duckCosine("q.vd", "c.vd")} DESC, c.vec_id) AS rk
       |  FROM (SELECT * FROM q223e WHERE vec_id < $QueryCount) q, q223e c
       |  WHERE q.vec_id <> c.vec_id),
       |q223g AS (
       |  SELECT q_id, ql,
       |    CAST(sum(CASE WHEN cl = ql THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
       |    CAST(sum(CASE WHEN cl = ql AND rk <= $NdcgK
       |      THEN list_extract($gArr, rk) ELSE 0 END) AS BIGINT) AS dcg_u
       |  FROM q223k GROUP BY 1, 2),
       |q223p AS (
       |  SELECT q_id, ql, n_rel, dcg_u,
       |    CASE WHEN n_rel > 0
       |      THEN list_extract($cArr, CAST(least(n_rel, $NdcgK) AS INT))
       |      ELSE 0 END AS idcg_u
       |  FROM q223g),
       |q223m AS (
       |  SELECT q_id, ql, n_rel, dcg_u, idcg_u,
       |    CASE WHEN idcg_u > 0
       |      THEN CAST(round(1000000.0 * dcg_u / idcg_u, 0) AS BIGINT)
       |      ELSE 0 END AS mq
       |  FROM q223p)
       |SELECT q_id, ql AS label, n_rel,
       |  CASE WHEN idcg_u > 0
       |    THEN round(CAST(dcg_u AS DOUBLE) / CAST(idcg_u AS DOUBLE), 6)
       |    ELSE 0.0 END AS ndcg
       |FROM q223m
       |UNION ALL
       |SELECT -1::BIGINT, -1::INTEGER, NULL::BIGINT,
       |  round(CAST(sum(mq) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE), 6)
       |FROM q223m
       |ORDER BY q_id""".stripMargin
  }

  // --- q227: kNN-graph hubness audit ------------------------------------------

  /** Hubness audit of the candidate-kNN graph (Radovanović et al. 2010):
    * the in-degree ("k-occurrence") distribution of [[knnTopK]] —
    * how often each vector appears in OTHER vectors' top-[[KnnK]] lists —
    * summarized as mean, max, anti-hub count (in-degree 0), and the
    * standardized skewness `S_{N_k} = m₃/m₂^{3/2}`, THE standard hubness
    * statistic. High positive skew means a few "hub" vectors dominate
    * every neighbor list — retrieval (q176/q223), kNN label screens
    * (q213), and semantic dedup (q30/q65) all silently degrade in that
    * regime, and the fix (norm-centering the embeddings) is cheap once
    * the audit says it's needed. q194's spectrum flags anisotropy of the
    * SPACE; this flags the neighbor-GRAPH pathology that anisotropy
    * causes.
    *
    * Scale shape: the edge list is the shared candidate top-k stage
    * (never corpus²); in-degree is ONE keyed count; the moment fold is a
    * 1-row aggregate with `Σd³` in DECIMAL(38,0) (hub degrees can reach
    * the corpus count, so the cube overflows a long past ~2·10⁶ on one
    * hub). Anti-hubs come from the corpus count minus hit count — no
    * anti-join materialized. Determinism: integer sums until the
    * (identically-shaped) IEEE moment arithmetic; `m₂^{3/2}` is spelled
    * `m2 * sqrt(m2)` in BOTH legs (sqrt and * are correctly rounded —
    * `pow(x, 1.5)` is not).
    */
  def knnHubness(spark: SparkSession, dir: String): DataFrame = {
    val indeg = knnTopK(spark, dir)
      .groupBy(col("nb"))
      .agg(count(lit(1)).as("d"))
    val sums = indeg
      .groupBy()
      .agg(
        coalesce(sum(col("d")), lit(0L)).as("s1"),
        coalesce(sum(col("d") * col("d")), lit(0L)).as("s2"),
        sum(expr("CAST(d AS DECIMAL(38,0)) * d * d")).as("s3"),
        coalesce(max(col("d")), lit(0L)).as("max_indeg"),
        count(lit(1)).as("n_hit"))
    val universe = emb(spark, dir).agg(count(lit(1)).as("n_nodes"))
    sums
      .crossJoin(broadcast(universe))
      .selectExpr(
        "n_nodes", "s1 AS n_edges", "max_indeg",
        "n_nodes - n_hit AS n_antihubs",
        "CAST(s1 AS DOUBLE) / CAST(n_nodes AS DOUBLE) AS mu",
        "CAST(s2 AS DOUBLE) / CAST(n_nodes AS DOUBLE) AS r2",
        "CAST(s3 AS DOUBLE) / CAST(n_nodes AS DOUBLE) AS r3")
      .selectExpr(
        "n_nodes", "n_edges", "max_indeg", "n_antihubs", "mu",
        "r2 - mu * mu AS m2",
        "r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3")
      .selectExpr(
        "n_nodes", "n_edges", "max_indeg", "n_antihubs",
        "round(mu, 6) AS mean_indeg",
        "CASE WHEN m2 > 0 THEN round(m3 / (m2 * sqrt(m2)), 6) END AS skewness")
  }

  /** Oracle: shared q30 candidate CTEs, identical in-degree fold (`Σd³`
    * in HUGEINT), and the textually identical moment/skewness arithmetic.
    */
  lazy val knnHubnessSql: String = {
    import graft.functions.DuckHash.assemble
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](
      knnTopKCtes("q227"): _*)
    ctes += ("q227d" ->
      "(SELECT nb, count(*)::BIGINT AS d FROM q227tk GROUP BY 1)")
    ctes += ("q227s" ->
      """(SELECT CAST(coalesce(sum(d), 0) AS BIGINT) AS s1,
        |   CAST(coalesce(sum(d * d), 0) AS BIGINT) AS s2,
        |   sum(d::HUGEINT * d * d) AS s3,
        |   CAST(coalesce(max(d), 0) AS BIGINT) AS max_indeg,
        |   count(*)::BIGINT AS n_hit
        | FROM q227d)""".stripMargin)
    ctes += ("q227n" ->
      """(SELECT count(*)::BIGINT AS n_nodes FROM embeddings
        | WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)""".stripMargin)
    ctes += ("q227r" ->
      """(SELECT n_nodes, s1 AS n_edges, max_indeg, n_nodes - n_hit AS n_antihubs,
        |   CAST(s1 AS DOUBLE) / CAST(n_nodes AS DOUBLE) AS mu,
        |   CAST(s2 AS DOUBLE) / CAST(n_nodes AS DOUBLE) AS r2,
        |   CAST(s3 AS DOUBLE) / CAST(n_nodes AS DOUBLE) AS r3
        | FROM q227s, q227n)""".stripMargin)
    ctes += ("q227m" ->
      """(SELECT n_nodes, n_edges, max_indeg, n_antihubs, mu,
        |   r2 - mu * mu AS m2,
        |   r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3
        | FROM q227r)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT n_nodes, n_edges, max_indeg, n_antihubs,
        |  round(mu, 6) AS mean_indeg,
        |  CASE WHEN m2 > 0 THEN round(m3 / (m2 * sqrt(m2)), 6) END AS skewness
        |FROM q227m""".stripMargin)
  }

  // --- q228: Fleiss-kappa rater agreement of kNN label votes ------------------

  /** Fleiss' κ (1971; varying-panel generalization) treating each
    * vector's candidate-kNN neighbors as independent raters voting a
    * category (their label): over items with at least 2 raters, the
    * per-item agreement `P_i = Σ_j n_ij(n_ij−1) / (n_i(n_i−1))`, the
    * chance agreement `P_e = Σ_j p_j²` from pooled category marginals
    * (`p_j = C_j / Σ n_i`), and `κ = (P̄ − P_e)/(1 − P_e)` — agreement
    * CORRECTED for the label skew that makes q213's raw agreement
    * fraction look healthy on an imbalanced corpus (a 90%-one-class
    * corpus gets 0.81 raw agreement by chance alone; κ reports ~0
    * there). One number for "do embedding neighborhoods and labels tell
    * the same story", comparable across corpora with different class
    * balance. The varying-n form (not the fixed-panel original) because
    * candidate panels are whatever the LSH pool yields — demanding a
    * full [[KnnK]] panel throws away most items at low density.
    *
    * Scale shape: votes are ONE keyed count over the shared candidate
    * top-k edges (≤ |labels| rows per focal); per-item P_i is exact
    * rational with denominator ≤ K(K−1), micro-quantized before the
    * order-free mean (the q176 rule); `Σ C_j²` rides DECIMAL(38,0)
    * (category marginals scale with the corpus, so the square overflows
    * a long past ~3·10⁹ votes). Integer sums until the
    * identically-shaped IEEE κ arithmetic; round once per output leg.
    */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val votes = graft.core.CacheScope.persist(
      knnTopK(spark, dir)
        .join(labels.select(col("vec_id").as("nb"), col("label").as("nl")), "nb")
        .groupBy(col("focal"), col("nl"))
        .agg(count(lit(1)).as("nij")))
    val items = graft.core.CacheScope.persist(
      votes
        .groupBy(col("focal"))
        .agg(sum(col("nij")).as("n_nb"),
          sum(col("nij") * (col("nij") - 1L)).as("a2i"))
        .filter(col("n_nb") >= 2L)
        .select(
          col("focal"), col("n_nb"),
          expr("CAST(round(1000000.0 * a2i / (n_nb * (n_nb - 1)), 0) AS BIGINT)")
            .as("pim")))
    val itemAgg = items
      .groupBy()
      .agg(
        count(lit(1)).as("n_items"),
        coalesce(sum(col("n_nb")), lit(0L)).as("t"),
        coalesce(sum(col("pim")), lit(0L)).as("spm"))
    val catAgg = votes
      .join(items.select(col("focal")), "focal")
      .groupBy(col("nl"))
      .agg(sum(col("nij")).as("cj"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_categories"),
        sum(expr("CAST(cj AS DECIMAL(38,0)) * cj")).as("sc2"))
    itemAgg
      .crossJoin(broadcast(catAgg))
      .selectExpr(
        "n_items", "t AS n_votes", "n_categories",
        "CASE WHEN n_items > 0 THEN CAST(spm AS DOUBLE) / 1000000.0" +
          " / CAST(n_items AS DOUBLE) END AS pbar",
        "CASE WHEN t > 0 THEN CAST(sc2 AS DOUBLE)" +
          " / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) END AS pe")
      .selectExpr(
        "n_items", "n_votes", "n_categories",
        "round(pbar, 6) AS p_bar",
        "round(pe, 6) AS p_e",
        "CASE WHEN 1.0 - pe <> 0 THEN round((pbar - pe) / (1.0 - pe), 6) END AS kappa")
  }

  /** Oracle: shared candidate CTEs, identical ≥2-rater filter, the same
    * micro-quantized per-item agreement, integer vote folds (`Σ C_j²` in
    * HUGEINT), and textually identical κ arithmetic.
    */
  lazy val fleissKappaSql: String = {
    import graft.functions.DuckHash.assemble
    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)](
      knnTopKCtes("q228"): _*)
    ctes += ("q228v" ->
      """(SELECT t.focal, ne.label AS nl, count(*)::BIGINT AS nij
        | FROM q228tk t JOIN embeddings ne ON ne.vec_id = t.nb
        | GROUP BY 1, 2)""".stripMargin)
    ctes += ("q228i" ->
      """(SELECT focal, n_nb,
        |   CAST(round(1000000.0 * a2i / (n_nb * (n_nb - 1)), 0) AS BIGINT) AS pim
        | FROM (SELECT focal, CAST(sum(nij) AS BIGINT) AS n_nb,
        |         CAST(sum(nij * (nij - 1)) AS BIGINT) AS a2i
        |       FROM q228v GROUP BY focal)
        | WHERE n_nb >= 2)""".stripMargin)
    ctes += ("q228a" ->
      """(SELECT count(*)::BIGINT AS n_items,
        |   CAST(coalesce(sum(n_nb), 0) AS BIGINT) AS t,
        |   CAST(coalesce(sum(pim), 0) AS BIGINT) AS spm FROM q228i)""".stripMargin)
    ctes += ("q228c" ->
      """(SELECT v.nl, CAST(sum(v.nij) AS BIGINT) AS cj
        | FROM q228v v JOIN q228i i USING (focal) GROUP BY 1)""".stripMargin)
    ctes += ("q228e" ->
      """(SELECT count(*)::BIGINT AS n_categories, sum(cj::HUGEINT * cj) AS sc2
        | FROM q228c)""".stripMargin)
    ctes += ("q228p" ->
      """(SELECT n_items, t AS n_votes, n_categories,
        |   CASE WHEN n_items > 0 THEN CAST(spm AS DOUBLE) / 1000000.0
        |     / CAST(n_items AS DOUBLE) END AS pbar,
        |   CASE WHEN t > 0 THEN CAST(sc2 AS DOUBLE)
        |     / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) END AS pe
        | FROM q228a, q228e)""".stripMargin)
    assemble(
      ctes.toSeq,
      """SELECT n_items, n_votes, n_categories,
        |  round(pbar, 6) AS p_bar,
        |  round(pe, 6) AS p_e,
        |  CASE WHEN 1.0 - pe <> 0 THEN round((pbar - pe) / (1.0 - pe), 6) END AS kappa
        |FROM q228p""".stripMargin)
  }
}
