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
}
