package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Session-shared materialized stages for the dedup / dup-graph family.
  *
  * q25/q27/q33/q47/q52/q56/q78/q84/q87/q96/q97/q104 all derive from the
  * same three intermediates — the shingle table, the MinHash-LSH candidate
  * edge list, and the verified (exact-Jaccard ≥ 0.9) pair list — and the
  * cluster queries additionally share the star-contraction labels. Spark
  * does not reuse unshuffled common subplans across separate queries, so
  * without sharing each query re-runs the whole LSH+verify pipeline
  * (the r4 bench measured q56 at 5.4 s re-deriving what q47 had just
  * computed). Each stage is built ONCE per (session, dir), eagerly
  * `localCheckpoint`'d (truncated lineage, MEMORY_AND_DISK blocks), and
  * pinned in [[CacheScope]] so per-query [[CacheScope.drain]] leaves it
  * alive; [[release]] frees everything when the family is done.
  *
  * Scale posture: every pinned stage is at most corpus-LINEAR (shingle
  * arrays) and the graph stages are bounded by the corpus dup rate —
  * these are exactly the working sets a 100 TB dedup campaign would keep
  * on cluster storage for its duration, with an explicit release at the
  * end. Nothing here changes values: stages are the same expression
  * trees the queries inlined before, so driver hashes are unchanged.
  */
object SharedStages {

  /** session → (dir, stage) → pinned checkpointed DataFrame. Weak keys:
    * a session that is stopped and dropped by its owner evicts its whole
    * memo slice at the next GC, so dead sessions never pin handles.
    */
  private val memo =
    new mutable.WeakHashMap[SparkSession, mutable.Map[(String, String), DataFrame]]()

  /** session → pinned RDD ids of ITS stages. Sessions share a
    * SparkContext, so releasing one session must free exactly its own
    * pinned blocks, not every pinned block in the context.
    */
  private val pins = new mutable.WeakHashMap[SparkSession, mutable.Set[Int]]()

  /** (dir, stage) → build count, a spec hook proving single-build sharing
    * (scoped by dir: two dirs legitimately build the same stage once each).
    */
  private val builds = mutable.Map[(String, String), Int]().withDefaultValue(0)

  private def stage(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame
  ): DataFrame = synchronized {
    memo
      .getOrElseUpdate(spark, mutable.Map.empty)
      .getOrElseUpdate(
        (dir, name), {
          builds((dir, name)) += 1
          val cp = CacheScope.pinCheckpoint(build)
          CacheScope
            .pinnedIdOf(cp)
            .foreach(pins.getOrElseUpdate(spark, mutable.Set.empty).add)
          cp
        })
  }

  /** doc_id + distinct 3-token shingle arrays — the root working set of
    * the whole fuzzy-dedup family (feeds signatures, candidate
    * generation, and both exact-verify join sides).
    */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "shingles")(TextOps.shingledPlan(spark, dir))

  /** q25's MinHash-LSH candidate pairs (doc_a < doc_b), unordered — the
    * recall-oriented edge set consumed by q78's components, q97's
    * PageRank, q104's triangles, and q96's edit-distance verify.
    */
  def minhashEdges(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "minhashEdges")(
      TextOps.minhashLshFrom(shingles(spark, dir)))

  /** Exact-Jaccard-verified near-dup pairs at the 0.9 cut
    * (doc_a, doc_b, jaccard rounded to 4dp) — q27's pairs, consumed by
    * q33/q100's victim sets, q47/q56's components, q52's verdicts and
    * q87's leakage matrix.
    */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "jaccardPairs")(
      TextOps.verifyJaccard(
        minhashEdges(spark, dir),
        shingles(spark, dir),
        TextOps.JaccardThreshold))

  /** q95's EXACT prefix-filtered similarity pairs at the 0.5 floor
    * (doc_a, doc_b, sizes, intersection, 6-dp jaccard) — the lossless
    * counterpart of [[jaccardPairs]], consumed by q95 itself and q132's
    * threshold cost curve (which re-cuts the same pair table at 10
    * thresholds). Bounded by the corpus dup rate at the floor.
    */
  def exactPairs(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "exactPairs")(
      TextOps.prefixJoinPlan(spark, dir, TextOps.PrefixJoinThreshold))

  /** The embedding near-dup pair table (a_id, b_id, raw sim ≥ 0.35) from
    * the multi-table hamming-1 LSH pipeline at the corpus-derived plane
    * AND table counts — the candidate stage the whole embed family
    * (q30/q65/q212/q213/q227/q228/q251) consumes. r14: the recall-held
    * table count makes this the family's dominant cost, so it is built
    * once per (session, dir) like [[minhashEdges]]; the pinned frame is
    * the SURFACED pair table (corpus dup-rate-bounded), never the
    * candidate volume.
    */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "nearDupPairs")(
      VectorOps.nearDupPairsRaw(
        spark,
        VectorOps.emb(spark, dir),
        VectorOps.nearDupPlanesFor(spark, dir)))

  /** q22's per-doc quality-signal projection (token/stop/punct counts,
    * stop ratio, avg token length), UNSORTED — one row per doc
    * (corpus-linear), read by q22 itself and the calibration/eval family
    * (q127/q216/q220/q224/q233/q249), each of which otherwise re-ran the
    * tokenize + triple-regex scan per query per run.
    */
  def qualityScores(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "qualityScores")(TextOps.qualityScorePlan(spark, dir))

  /** The corpus-side (n, gram)-keyed DF-cap aggregate at every
    * [[TrainingOps.SweepNs]] grain — kept grams only (df ≤ the cap, with
    * the complete ≤cap doc_id list each kept gram has BY DEFINITION):
    * the decontamination family's dominant corpus scan, shared by q39
    * (the 8-gram slice), q205 (all grains) and the E50/E64 broadcast
    * stores — r13's q205 kernel fix halved the scan, this stops the
    * suite running it four times. Corpus-token-linear, the SharedStages
    * size contract.
    */
  def dfCapGrams(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "dfCapGrams")(TrainingOps.dfCapGramsPlan(spark, dir))

  /** Exact cosine top-k ground truth (q28's brute-force scan) — read by
    * q28 and the whole retrieval-eval family (q85/q89/q152/q222). Bounded:
    * QueryCount × TopK rows.
    */
  def exactTopK(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "exactTopK")(VectorOps.cosineTopKPlan(spark, dir))

  /** Hyperplane-LSH multi-probe top-k (q29's result) — read by q29/q85/q89.
    * Bounded: QueryCount × AnnTopK rows.
    */
  def annLshTopK(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "annLshTopK")(VectorOps.annLshPlan(spark, dir))

  /** IVF probe top-k (q32's result) — read by q32/q89. Bounded. */
  def annIvfTopK(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "annIvfTopK")(VectorOps.annIvfPlan(spark, dir))

  /** PQ/ADC probe top-k (q46's result) — read by q46/q89. Bounded. */
  def annPqTopK(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "annPqTopK")(VectorOps.annPqPlan(spark, dir))

  /** Per-doc NB classification scores (q66's apply pass) — read by q66's
    * report and q173's confusion-matrix rollup; corpus-linear.
    */
  def nbScores(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "nbScores")(CurationOps.nbScoredPlan(spark, dir))

  /** Star-contraction component labels (node, lbl) over the VERIFIED
    * pair graph — q47/q56's cluster assignment.
    */
  def dupLabels(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "dupLabels") {
      val edges = jaccardPairs(spark, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      CurationOps.starContract(edges)._1
    }

  /** Star-contraction component labels over the CANDIDATE edge graph —
    * q78's recall-oriented cluster assignment.
    */
  def fuzzyLabels(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "fuzzyLabels") {
      val edges = minhashEdges(spark, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      CurationOps.starContract(edges)._1
    }

  /** How many times `name` was built for `dir` since JVM start — specs
    * assert this stays at 1 across the queries that share the stage.
    */
  def buildCount(dir: String, name: String): Int = synchronized(builds((dir, name)))

  /** Total builds of `name` across all dirs. */
  def buildCount(name: String): Int =
    synchronized(builds.collect { case ((_, n), c) if n == name => c }.sum)

  /** Drop THIS session's memoized stages and free its pinned blocks.
    * After this, the next stage call re-derives from the source tables —
    * required between layout-invariance probe runs, and the
    * end-of-campaign hook for a production session. Other sessions'
    * memo slices are untouched.
    */
  /** session → (dir, name) → driver-side trained model object (q66/q173's
    * NB weight tables and the like). Same weak-key lifecycle as [[memo]];
    * model objects pin no cluster resources, so [[release]] just drops
    * the references. Counted in [[builds]] like any stage, so the
    * single-build spec hook covers train-once sharing too.
    */
  private val objMemo =
    new mutable.WeakHashMap[SparkSession, mutable.Map[(String, String), AnyRef]]()

  /** Build-once memo for driver-side model objects (bounded collects —
    * the ANN-trainer rule): the first caller trains, everyone else in the
    * same (session, dir) reuses the object.
    */
  def model[T <: AnyRef](spark: SparkSession, dir: String, name: String)(build: => T): T =
    synchronized {
      objMemo
        .getOrElseUpdate(spark, mutable.Map.empty)
        .getOrElseUpdate((dir, name), { builds((dir, name)) += 1; build })
        .asInstanceOf[T]
    }

  def release(spark: SparkSession): Unit = synchronized {
    memo.remove(spark)
    objMemo.remove(spark)
    pins.remove(spark).foreach(ids => CacheScope.unpin(spark, ids))
  }

  /** The canonical build order of every session-shared stage and model,
    * for runners that want to MATERIALIZE the shared working set up front
    * and attribute its cost explicitly (graft.Bench / tools.BenchSf1):
    * without this, each stage's one-time build lands on whichever query
    * happens to touch it first, making per-query timings order-dependent.
    * Later entries reuse earlier ones (minhashEdges builds FROM shingles),
    * so timing each call in sequence yields honest incremental costs.
    * Building a stage that a session never uses only wastes its build —
    * results are unaffected (stages are the exact expression trees the
    * queries would inline).
    */
  def prewarm(spark: SparkSession, dir: String): Seq[(String, () => Unit)] = Seq(
    "shingles"     -> (() => { shingles(spark, dir); () }),
    "qualityScores" -> (() => { qualityScores(spark, dir); () }),
    "minhashEdges" -> (() => { minhashEdges(spark, dir); () }),
    "jaccardPairs" -> (() => { jaccardPairs(spark, dir); () }),
    "exactPairs"   -> (() => { exactPairs(spark, dir); () }),
    "nearDupPairs" -> (() => { nearDupPairs(spark, dir); () }),
    "exactTopK"    -> (() => { exactTopK(spark, dir); () }),
    "annLshTopK"   -> (() => { annLshTopK(spark, dir); () }),
    "annIvfTopK"   -> (() => { annIvfTopK(spark, dir); () }),
    "annPqTopK"    -> (() => { annPqTopK(spark, dir); () }),
    "dfCapGrams"   -> (() => { dfCapGrams(spark, dir); () }),
    "dupLabels"    -> (() => { dupLabels(spark, dir); () }),
    "fuzzyLabels"  -> (() => { fuzzyLabels(spark, dir); () }),
    "nbModel"      -> (() => { CurationOps.nbModelFor(spark, dir); () }),
    "nbScores"     -> (() => { nbScores(spark, dir); () }),
    "lmModel"      -> (() => { CurationOps.lmModelFor(spark, dir); () }),
    "bpeMerges"    -> (() => { TokenizerOps.merges(spark, dir); () })
  )
}
