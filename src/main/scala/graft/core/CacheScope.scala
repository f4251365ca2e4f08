package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Session-wide cache lifecycle for operator-internal `persist()` /
  * `localCheckpoint()` stages.
  *
  * The library's operators legitimately cache intermediate stages (a
  * shingle table read by three joins, a checkpointed edge list iterated
  * O(log n) times) — but a long-lived session running many queries must
  * not accumulate those blocks: on a real cluster orphaned storage
  * evicts live working sets, and evicting a `localCheckpoint`'d RDD
  * forces recompute of a deliberately truncated lineage (which can fail
  * outright). Every operator therefore registers its cached handles here
  * instead of calling Spark directly, and the query RUNNER (Bench,
  * Verify, a production driver loop) calls [[drain]] once per query
  * after materialization: all per-query stages are freed, while stages
  * explicitly pinned as session-shared ([[pinCheckpoint]], used by
  * [[graft.operators.SharedStages]]) survive until [[releasePinned]].
  *
  * Everything here is bookkeeping on RDD ids and Dataset handles —
  * no data moves; `unpersist(blocking = false)` just drops block
  * references and lets executors free them asynchronously.
  */
object CacheScope {

  /** Per-query persisted Datasets (freed on [[drain]]). Unpersisting the
    * Dataset handle (not its RDD) removes the CacheManager entry too, so
    * a later identical plan re-caches instead of hitting a dangling one.
    */
  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** RDD ids of per-query `localCheckpoint` stages (freed on [[drain]]). */
  private val trackedCpIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()

  /** RDD ids of session-shared pinned stages (survive [[drain]]). */
  private val pinnedIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()

  /** Persist a per-query stage at MEMORY_AND_DISK (spill, don't OOM). */
  def persist[T](ds: Dataset[T]): Dataset[T] =
    persist(ds, StorageLevel.MEMORY_AND_DISK)

  def persist[T](ds: Dataset[T], level: StorageLevel): Dataset[T] = {
    ds.persist(level)
    tracked.add(ds)
    ds
  }

  /** The RDD a checkpointed Dataset scans — `localCheckpoint` returns a
    * plan that is exactly one [[LogicalRDD]] leaf over the persisted RDD,
    * so the id is read off the plan (race-free, unlike diffing
    * `getPersistentRDDs` around the call).
    */
  private def cpRddId(cp: Dataset[_]): Option[Int] =
    cp.queryExecution.logical match {
      case lr: LogicalRDD => Some(lr.rdd.id)
      case _              => None
    }

  /** Eager `localCheckpoint` tracked for end-of-query cleanup. */
  def checkpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cpRddId(cp).foreach(id => trackedCpIds.add(id))
    cp
  }

  /** Eager `localCheckpoint` pinned as a session-shared stage: [[drain]]
    * leaves it alone; only [[releasePinned]]/[[unpin]] frees it. Callers
    * own the bound (shared stages must be corpus-linear at most, and
    * released when the query family is done).
    */
  def pinCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cpRddId(cp).foreach(id => pinnedIds.add(id))
    cp
  }

  /** The pinned RDD id behind a [[pinCheckpoint]] result — callers that
    * scope pins per session (SharedStages) record it for a later
    * targeted [[unpin]].
    */
  private[graft] def pinnedIdOf(cp: Dataset[_]): Option[Int] = cpRddId(cp)

  /** Unpin and free SPECIFIC pinned stages — the targeted counterpart of
    * [[releasePinned]] for multi-session processes: sessions share one
    * SparkContext, so a blanket sweep from one session would free
    * another session's still-live pinned blocks.
    */
  private[graft] def unpin(spark: SparkSession, ids: Iterable[Int]): Unit = synchronized {
    ids.foreach { id =>
      pinnedIds.remove(Integer.valueOf(id))
      spark.sparkContext.getPersistentRDDs
        .get(id)
        .foreach(_.unpersist(blocking = false))
    }
  }

  /** Free one tracked checkpoint stage NOW — for iterative algorithms
    * (star contraction) where round N+1 is checkpointed and round N's
    * blocks would otherwise sit dead until end of query.
    */
  def free(cp: Dataset[_]): Unit =
    cpRddId(cp).foreach { id =>
      trackedCpIds.remove(Integer.valueOf(id))
      cp.sparkSession.sparkContext.getPersistentRDDs
        .get(id)
        .foreach(_.unpersist(blocking = false))
    }

  /** End-of-query cleanup: free every per-query stage registered since
    * the last drain, then sweep any remaining unpinned persistent RDDs
    * (belt and braces — catches blocks persisted outside this API).
    * Pinned shared stages survive (`localCheckpoint` persists the RDD
    * directly, never through the CacheManager, so `clearCache` can't
    * touch them).
    *
    * CONTRACT: drain assumes the runner executes ONE query at a time —
    * the sweep would free another in-flight query's stages. That is the
    * driver/Bench/Verify loop shape; a concurrent-query server must
    * scope caching per query itself.
    */
  def drain(spark: SparkSession): Unit = synchronized {
    tracked.asScala.foreach { ds =>
      try ds.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    tracked.clear()
    trackedCpIds.clear()
    // Drop remaining cached-PLAN entries together with their blocks:
    // unpersisting the RDD alone leaves a dangling CacheManager entry
    // that later identical plans match but never re-cache.
    try spark.catalog.clearCache()
    catch { case _: Throwable => () }
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinnedIds.contains(Integer.valueOf(id))) rdd.unpersist(blocking = false)
    }
  }

  /** Free the pinned session-shared stages too (end of session, or when
    * a spec/layout change must force full re-derivation). Callers that
    * memoize pinned DataFrames ([[graft.operators.SharedStages]]) must
    * drop their references as well — use their own release entry point.
    */
  def releasePinned(spark: SparkSession): Unit = synchronized {
    pinnedIds.asScala.toSeq.foreach { id =>
      spark.sparkContext.getPersistentRDDs
        .get(id.intValue())
        .foreach(_.unpersist(blocking = false))
    }
    pinnedIds.clear()
  }
}
