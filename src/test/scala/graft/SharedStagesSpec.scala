package graft

import graft.operators.SharedStages

/** Lifecycle of the session-shared checkpointed stages: memoization is
  * scoped per (session, dir), release frees exactly the released
  * session's stages — two sessions over one SparkContext must not
  * cross-contaminate (VERDICT r5 #7).
  */
class SharedStagesSpec extends SparkSpec {

  test("per-session memo: release evicts one session's stages, leaves the other's blocks live") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    SharedStages.release(s1)
    SharedStages.release(s2)
    SharedStages.release(spark)

    val preexisting = spark.sparkContext.getPersistentRDDs.keySet
    val before      = SharedStages.buildCount(Sf0001, "shingles")
    val n1          = SharedStages.shingles(s1, Sf0001).count()
    assert(SharedStages.buildCount(Sf0001, "shingles") == before + 1)
    // same session + dir → memo hit, no rebuild
    SharedStages.shingles(s1, Sf0001)
    assert(SharedStages.buildCount(Sf0001, "shingles") == before + 1)
    // a different session builds its own stage (memo is session-scoped)
    val df2 = SharedStages.shingles(s2, Sf0001)
    assert(SharedStages.buildCount(Sf0001, "shingles") == before + 2)

    SharedStages.release(s1)
    // s2's stage survives s1's release — still memoized AND its pinned
    // checkpoint blocks are still readable (a localCheckpoint whose
    // blocks were swept would fail here: the lineage is truncated)
    assert(SharedStages.shingles(s2, Sf0001).count() == n1)
    assert(df2.count() == n1)
    assert(SharedStages.buildCount(Sf0001, "shingles") == before + 2)
    // the released session re-derives from scratch
    SharedStages.shingles(s1, Sf0001)
    assert(SharedStages.buildCount(Sf0001, "shingles") == before + 3)

    SharedStages.release(s1)
    SharedStages.release(s2)
    // no pinned blocks left behind by the released sessions (other suites
    // share this JVM, so only assert about RDDs created by this test)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- preexisting
    assert(leaked.isEmpty, s"released sessions left persistent RDDs behind: $leaked")
  }

  test("the NB model trains once per (session, dir): q66 and q173 share it; release evicts") {
    val s1 = spark.newSession()
    SharedStages.release(s1)
    val before = SharedStages.buildCount(Sf0001, "nbModel")
    graft.operators.CurationOps.nbClassify(s1, Sf0001).collect()
    assert(SharedStages.buildCount(Sf0001, "nbModel") == before + 1, "first caller trains")
    graft.operators.CurationOps.classifierEval(s1, Sf0001).collect()
    assert(SharedStages.buildCount(Sf0001, "nbModel") == before + 1,
      "q173 reuses q66's model in the same session")
    SharedStages.release(s1)
    graft.operators.CurationOps.nbClassify(s1, Sf0001).collect()
    assert(SharedStages.buildCount(Sf0001, "nbModel") == before + 2, "release evicts the model")
    SharedStages.release(s1)
  }

  test("BPE merges train once per (session, dir): q90/q91/q129 share one word-count scan") {
    val s1 = spark.newSession()
    SharedStages.release(s1)
    val before = SharedStages.buildCount(Sf0001, "bpeMerges")
    graft.operators.TokenizerOps.bpeTrain(s1, Sf0001).collect()
    assert(SharedStages.buildCount(Sf0001, "bpeMerges") == before + 1, "first caller trains")
    graft.operators.TokenizerOps.bpeEncode(s1, Sf0001).collect()
    graft.operators.TokenizerOps.fertilityByLang(s1, Sf0001).collect()
    assert(SharedStages.buildCount(Sf0001, "bpeMerges") == before + 1,
      "q91 and q129 reuse q90's merge table in the same session")
    SharedStages.release(s1)
  }

  test("prewarm builds every canonical stage exactly once; reruns are free") {
    val s1 = spark.newSession()
    SharedStages.release(s1)
    val names  = SharedStages.prewarm(s1, Sf0001).map(_._1)
    val before = names.map(n => n -> SharedStages.buildCount(Sf0001, n)).toMap
    SharedStages.prewarm(s1, Sf0001).foreach { case (_, build) => build() }
    names.foreach(n =>
      assert(SharedStages.buildCount(Sf0001, n) == before(n) + 1, s"stage $n"))
    // second sweep hits the memo — no stage builds again
    SharedStages.prewarm(s1, Sf0001).foreach { case (_, build) => build() }
    names.foreach(n =>
      assert(SharedStages.buildCount(Sf0001, n) == before(n) + 1, s"stage $n rebuilt"))
    SharedStages.release(s1)
  }

  test("drain frees per-query stages WITH their cache entries; pinned stages survive") {
    import graft.core.CacheScope
    val s = spark.newSession()
    SharedStages.release(s)
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet

    // a per-query persisted stage and a pinned shared stage
    val perQuery = CacheScope.persist(
      graft.core.Tables.documents(s, Sf0001).select(org.apache.spark.sql.functions.col("doc_id")))
    perQuery.count()
    val pinned = SharedStages.shingles(s, Sf0001)
    val nPinned = pinned.count()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- preexisting).nonEmpty)

    CacheScope.drain(s)
    // the pinned checkpoint still answers (its blocks were NOT swept)
    assert(pinned.count() == nPinned)
    // the per-query plan no longer matches a cached entry: a dangling
    // CacheManager entry (unpersisted blocks, entry left behind) would
    // report useCachedData with an InMemoryRelation that never re-caches
    val again = graft.core.Tables.documents(s, Sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"))
    assert(!again.queryExecution.withCachedData.toString.contains("InMemoryRelation"),
      "drain left a dangling CacheManager entry behind")
    SharedStages.release(s)
  }
}
