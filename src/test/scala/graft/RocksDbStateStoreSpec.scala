package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

/** §2.E under the RocksDB state store provider.
  *
  * The default HDFS-backed state store keeps every key in executor heap —
  * fine for specs, not for the 100 TB posture: E24-class rolling-active
  * state is O(|users| × window days), E37's SCD2 state is O(open
  * intervals), E21's fill state O(open (user, hour) slots). RocksDB keeps
  * the working set off-heap with spill-to-disk and incremental
  * checkpointing, which is the provider a production deployment of these
  * operators would configure. This lane proves the library's stateful
  * operators are provider-agnostic by re-running one representative of
  * each state-store CLIENT SHAPE the suite uses, checkpoint-restart
  * included, under `RocksDBStateStoreProvider`:
  *
  *   - streaming aggregation state (E1/E13's windowed heap aggregate)
  *   - dropDuplicates state (E3/E8's event-id dedup, with restart)
  *   - flatMapGroupsWithState custom state (E21's gap-fill, with restart —
  *     the same harness as StreamingSpec's E21 restart spec)
  *   - stream-stream join state (E7's interval join)
  *
  * Every test also asserts the RocksDB provider actually served the query
  * (rocksdb* custom metrics in the state operator progress) so a conf
  * typo cannot silently re-run the default store. The provider is pinned
  * per-query at first start from the session conf, so setting/unsetting
  * around each test leaves the rest of the suite on the default store.
  */
class RocksDbStateStoreSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, Provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  /** Must be called while `q` is still running (lastProgress survives stop,
    * but collecting before stop keeps the ordering obvious).
    */
  private def assertServedByRocksDb(q: StreamingQuery): Unit = {
    val metrics = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet.asScala)
    assert(metrics.exists(_.toLowerCase.startsWith("rocksdb")),
      s"query did not run on the RocksDB provider (state metrics: $metrics)")
  }

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed heap aggregation (E13 shape) matches the default-store result") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[Ev]
      val q = EventStreams
        .windowTopK(in.toDF(), k = 3)
        .writeStream.format("memory").queryName("rocks_topk").outputMode("append").start()
      in.addData(
        Ev(1, 1, ts(5), "click", 10.0),
        Ev(2, 1, ts(10), "click", 50.0),
        Ev(3, 2, ts(20), "click", 30.0),
        Ev(4, 2, ts(25), "click", 20.0),
        Ev(5, 3, ts(40), "click", 40.0))
      q.processAllAvailable()
      in.addData(Ev(9, 9, Timestamp.valueOf("2024-01-01 14:00:00"), "click", 1.0))
      q.processAllAvailable()
      assertServedByRocksDb(q)
      val rows = spark.table("rocks_topk").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"), r.getAs[Int]("rk")))
        .sortBy(_._3)
      q.stop()
      assert(rows.toSeq == Seq((2L, 50.0, 1), (5L, 40.0, 2), (3L, 30.0, 3)),
        s"got ${rows.toSeq}")
    }
  }

  test("dedup state (E8 shape) survives a checkpointed restart on RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks_dedup").toString
      val in = MemoryStream[Ev]
      val out = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
      def start() = EventStreams
        .dedup(in.toDF())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => out.add(r.getAs[Long]("event_id")))
        }
        .outputMode("append").option("checkpointLocation", ckpt).start()

      val q1 = start()
      in.addData(Ev(1, 1, ts(0), "click", 0), Ev(2, 1, ts(5), "click", 0))
      q1.processAllAvailable()
      assertServedByRocksDb(q1)
      assert(out.size == 2)
      q1.stop()

      // the replayed event 1 must be dropped by the RECOVERED RocksDB
      // store (snapshot + changelog restore), not in-memory session state
      out.clear()
      val q2 = start()
      in.addData(Ev(1, 1, ts(1), "click", 0), Ev(3, 1, ts(10), "click", 0))
      q2.processAllAvailable()
      assertServedByRocksDb(q2)
      q2.stop()
      val ids = out.toArray.map(_.asInstanceOf[Long]).toSet
      assert(ids == Set(3L), s"recovered RocksDB dedup state should drop the replay, got $ids")
    }
  }

  test("flatMapGroupsWithState fill state (E21 shape) survives a restart on RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      def t(s: String) = Timestamp.valueOf(s)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks_fill").toString
      val in   = MemoryStream[Ev]
      val out  = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Long, String, Long, Double, Boolean)]())
      def start() = EventStreams.gapFillStream(in.toDF().as[Ev])
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[EventStreams.FillOut], _: Long) =>
            batch.collect().foreach(f =>
              out.add((f.user_id, f.hour, f.n_events, f.value_ff, f.is_gap)))
        }
        .outputMode("update").option("checkpointLocation", ckpt).start()

      val q1 = start()
      in.addData(
        Ev(1L, 1L, t("2024-01-01 00:10:00"), "view", 1.0),
        Ev(2L, 1L, t("2024-01-01 00:50:00"), "view", 2.0))
      q1.processAllAvailable()
      assertServedByRocksDb(q1)
      q1.stop()
      assert(out.isEmpty, "open hour must not emit before a later event or timeout")

      val q2 = start()
      in.addData(Ev(3L, 1L, t("2024-01-01 03:05:00"), "view", 3.0))
      q2.processAllAvailable()
      in.addData(Ev(900L, 999L, t("2024-01-01 06:00:00"), "view", 0.0))
      q2.processAllAvailable()
      in.addData(Ev(901L, 999L, t("2024-01-01 10:00:00"), "view", 0.0))
      q2.processAllAvailable()
      assertServedByRocksDb(q2)
      q2.stop()

      val got = out.toArray.map(_.asInstanceOf[(Long, String, Long, Double, Boolean)])
        .filter(_._1 != 999L).sortBy(p => (p._1, p._2)).toSeq
      // identical to StreamingSpec's uninterrupted E21 run on this fixture
      assert(got == Seq(
        (1L, "2024-01-01 00", 2L, 2.0, false),
        (1L, "2024-01-01 01", 0L, 2.0, true),
        (1L, "2024-01-01 02", 0L, 2.0, true),
        (1L, "2024-01-01 03", 1L, 3.0, false)),
        s"recovered RocksDB fill state diverged: $got")
    }
  }

  test("stream-stream interval join state (E7 shape) runs on RocksDB") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[Ev]
      val q = EventStreams
        .clickPurchaseJoin(in.toDF(), windowMinutes = 60)
        .writeStream.format("memory").queryName("rocks_ssjoin").outputMode("append").start()
      in.addData(
        Ev(1, 1, ts(0), "purchase", 5.0),
        Ev(2, 1, ts(30), "click", 0),
        Ev(3, 2, ts(30), "click", 0),
        Ev(4, 1, Timestamp.valueOf("2024-01-01 12:00:00"), "click", 0))
      q.processAllAvailable()
      in.addData(Ev(9, 9, Timestamp.valueOf("2024-01-01 14:00:00"), "view", 0))
      q.processAllAvailable()
      assertServedByRocksDb(q)
      val rows = spark.table("rocks_ssjoin").collect()
        .map(r => (r.getAs[Long]("c_id"), r.getAs[Long]("p_id")))
      q.stop()
      assert(rows.toSet == Set((2L, 1L)))
    }
  }
}
