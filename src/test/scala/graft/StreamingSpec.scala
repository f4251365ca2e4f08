package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

/** §2.E streaming specs over MemoryStream sources — multi-batch feeds
  * exercise cross-trigger state (sessions spanning batches, duplicate
  * arrivals in later batches).
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("E1: windowed aggregation over a stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams
      .windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("win_agg").outputMode("complete").start()
    in.addData(
      Ev(1, 1, ts(5), "click", 1.0),
      Ev(2, 1, ts(10), "click", 2.0),
      Ev(3, 2, Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0)
    )
    q.processAllAvailable()
    val rows = spark.table("win_agg").collect()
    q.stop()
    assert(rows.length == 2) // two 1-hour windows
    val clicks = rows.find(_.getAs[String]("event_type") == "click").get
    assert(clicks.getAs[Long]("n") == 2)
    assert(clicks.getAs[Double]("total_value") == 3.0)
  }

  test("E13: windowed streaming top-k keeps the k largest per closed window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams
      .windowTopK(in.toDF(), k = 3)
      .writeStream.format("memory").queryName("win_topk").outputMode("append").start()
    // 5 events in the 10:00 window with distinct values
    in.addData(
      Ev(1, 1, ts(5), "click", 10.0),
      Ev(2, 1, ts(10), "click", 50.0),
      Ev(3, 2, ts(20), "click", 30.0),
      Ev(4, 2, ts(25), "click", 20.0),
      Ev(5, 3, ts(40), "click", 40.0)
    )
    q.processAllAvailable()
    // advance the watermark far past the 10:00 window so it closes
    in.addData(Ev(9, 9, Timestamp.valueOf("2024-01-01 14:00:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("win_topk").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"), r.getAs[Int]("rk")))
      .sortBy(_._3)
    q.stop()
    assert(rows.toSeq == Seq((2L, 50.0, 1), (5L, 40.0, 2), (3L, 30.0, 3)),
      s"got ${rows.toSeq}")
  }

  test("E13: heap state survives a checkpointed restart (recovery equals uninterrupted run)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_topk").toString
    val in   = MemoryStream[Ev]
    val out  = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Double, Int)]())
    def start() = EventStreams
      .windowTopK(in.toDF(), k = 3)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          out.add((r.getAs[Long]("event_id"), r.getAs[Double]("value"), r.getAs[Int]("rk"))))
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // batch 1: partial window content — the ≤k heap is now in the state
    // store, window still open (nothing emitted yet)
    val q1 = start()
    in.addData(
      Ev(1, 1, ts(5), "click", 10.0),
      Ev(2, 1, ts(10), "click", 50.0),
      Ev(3, 2, ts(20), "click", 30.0),
      Ev(4, 2, ts(25), "click", 20.0))
    q1.processAllAvailable()
    q1.stop()
    assert(out.isEmpty, "window must not emit before the watermark closes it")

    // restart from the checkpoint: the RECOVERED heap must absorb an event
    // that displaces a pre-restart entry (40 > 20), then close on watermark
    val q2 = start()
    in.addData(Ev(5, 3, ts(40), "click", 40.0))
    q2.processAllAvailable()
    in.addData(Ev(9, 9, Timestamp.valueOf("2024-01-01 14:00:00"), "click", 1.0))
    q2.processAllAvailable()
    q2.stop()

    val got = out.toArray.map(_.asInstanceOf[(Long, Double, Int)]).toSeq.sortBy(_._3)
    // identical to the uninterrupted E13 run over the same five events
    assert(got == Seq((2L, 50.0, 1), (5L, 40.0, 2), (3L, 30.0, 3)),
      s"recovered heap state diverged from the uninterrupted run: $got")
  }

  test("E15: windowed histogram sketch bins a closed window and yields q69-style quantiles") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val (mn, mx, bins) = (0.0, 100.0, 10)
    val in = MemoryStream[Ev]
    val q = EventStreams
      .windowHistogram(in.toDF(), mn, mx, bins)
      .writeStream.format("memory").queryName("win_hist").outputMode("append").start()
    // 10:00 window: values 5, 15, 15, 95, 200 (value 200 clamps to the top bin)
    in.addData(
      Ev(1, 1, ts(5), "click", 5.0),
      Ev(2, 1, ts(10), "click", 15.0),
      Ev(3, 2, ts(20), "click", 15.0),
      Ev(4, 2, ts(25), "click", 95.0),
      Ev(5, 3, ts(40), "click", 200.0))
    q.processAllAvailable()
    in.addData(Ev(9, 9, Timestamp.valueOf("2024-01-01 14:00:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("win_hist").collect()
      .filter(_.getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 10:00:00"))
      .map(r => r.getAs[Int]("bin") -> r.getAs[Long]("c")).sorted
    q.stop()
    assert(rows.toSeq == Seq(0 -> 1L, 1 -> 2L, 9 -> 2L), s"got ${rows.toSeq}")
    // median via the q69 interpolation: r = 0.5·5 = 2.5 falls in bin 1
    // (cum 1 → 3): 10 + 10·(2.5 − 1)/2 = 17.5
    val med = EventStreams.histogramQuantile(rows.toSeq, 0.5, mn, mx, bins)
    assert(med.contains(17.5), s"got $med")
    assert(EventStreams.histogramQuantile(Nil, 0.5, mn, mx, bins).isEmpty)
  }

  test("E2: sessionization state carries across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams
      .sessionize(in.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess").outputMode("update").start()
    // batch 1: two events 10 min apart → one session
    in.addData(Ev(1, 7, ts(0), "click", 0), Ev(2, 7, ts(10), "click", 0))
    q.processAllAvailable()
    // batch 2: one event 5 min later (same session), one 2h later (new session)
    in.addData(Ev(3, 7, ts(15), "click", 0))
    q.processAllAvailable()
    in.addData(Ev(4, 7, Timestamp.valueOf("2024-01-01 13:00:00"), "click", 0))
    q.processAllAvailable()
    val rows = spark.table("sess").collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"), r.getAs[Int]("n_events")))
    q.stop()
    // final state per session: session 1 has 3 events, session 2 has 1
    val finalBySession = rows.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).max }
    assert(finalBySession == Map(1L -> 3, 2L -> 1))
  }

  test("E23: streaming transitions across batches equal batch q103's hop counts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // two users, events split across three micro-batches, second batch
    // delivered out of order within the batch (the sort rule must fix it)
    val evs = Seq(
      Ev(1, 7, ts(0), "a", 0), Ev(2, 7, ts(10), "b", 0),
      Ev(3, 8, ts(5), "a", 0),
      Ev(5, 7, ts(30), "a", 0), Ev(4, 7, ts(20), "c", 0), // out of order in-batch
      Ev(6, 8, ts(25), "b", 0),
      Ev(7, 8, ts(40), "b", 0))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .transitionStream(in.toDS())
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    in.addData(evs(0), evs(1), evs(2)); q.processAllAvailable()
    in.addData(evs(3), evs(4), evs(5)); q.processAllAvailable()
    in.addData(evs(6)); q.processAllAvailable()
    val got = spark.table("trans").collect()
      .map(r => (r.getAs[String]("cur"), r.getAs[String]("nxt")))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    q.stop()
    // batch truth: q103 on the same events written as a table
    val dir = java.nio.file.Files.createTempDirectory("e23spec").toString
    evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val want = graft.operators.TimeJoins.markovTransitions(spark, dir).collect()
      .map(r => ((r.getAs[String]("cur"), r.getAs[String]("nxt")), r.getAs[Long]("n"))).toMap
    assert(got == want, s"stream $got vs batch $want")
  }

  test("E51: streaming contribution cap kept-set equals batch q209's rank rule") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // user 7 sends 5 events (cap 3 -> last two clipped), user 8 sends 2;
    // second batch arrives out of order in-batch (the sort rule fixes it)
    val evs = Seq(
      Ev(1, 7, ts(0), "a", 1.0), Ev(2, 7, ts(10), "b", 2.0),
      Ev(3, 8, ts(5), "a", 3.0),
      Ev(5, 7, ts(30), "a", 4.0), Ev(4, 7, ts(20), "c", 5.0), // out of order in-batch
      Ev(6, 7, ts(40), "b", 6.0),
      Ev(7, 8, ts(45), "b", 7.0))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .contributionCapStream(in.toDS(), cap = 3)
      .writeStream.format("memory").queryName("capped").outputMode("append").start()
    in.addData(evs(0), evs(1), evs(2)); q.processAllAvailable()
    in.addData(evs(3), evs(4)); q.processAllAvailable()
    in.addData(evs(5), evs(6)); q.processAllAvailable()
    val got = spark.table("capped").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Boolean]("kept"))).toMap
    q.stop()
    // every event emitted exactly once, kept = its user-rank <= cap
    assert(got.keySet == evs.map(_.event_id).toSet)
    val want = evs.groupBy(_.user_id).flatMap { case (_, g) =>
      g.sortBy(e => (e.ts.getTime, e.event_id)).zipWithIndex
        .map { case (e, i) => e.event_id -> (i < 3) }
    }
    assert(got == want, s"stream $got vs rank rule $want")
    // and the batch q209 audit over the same rows agrees on the kept counts
    val dir = java.nio.file.Files.createTempDirectory("e51spec").toString
    evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val audit = graft.operators.TrainingOps.dpContribution(spark, dir)
      .filter(col("event_type") === "_ALL").collect().head
    // with cap 32 > 5 events/user nothing clips in batch; the stream's cap-3
    // kept count is the rank-rule prefix of the same ordering
    assert(audit.getAs[Long]("n_raw") == evs.size.toLong)
    assert(got.values.count(identity) == 5) // 3 kept for user 7 + 2 for user 8
  }

  test("E26: streaming OHLC closed windows equal batch q107 column for column") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    val base = Seq(
      Ev(1, 1, hts(1, 0), "a", 10.25), Ev(3, 1, hts(1, 45), "a", 4.00),
      Ev(2, 1, hts(1, 30), "a", 0.50), // in-batch disorder: close must be ev 3
      Ev(4, 1, hts(1, 10), "b", 3.00),
      Ev(5, 1, hts(2, 5), "a", 1.00), Ev(6, 1, hts(2, 50), "b", 6.50))
    val sentinel = Ev(100, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "a", 0.0)
    val in = MemoryStream[Ev]
    val q = EventStreams
      .ohlcStream(in.toDF())
      .writeStream.format("memory").queryName("ohlc_s").outputMode("append").start()
    in.addData(base(0), base(1), base(2), base(3)); q.processAllAvailable()
    in.addData(base(4), base(5)); q.processAllAvailable()
    in.addData(sentinel); q.processAllAvailable() // watermark passes all real windows
    in.addData(); q.processAllAvailable()
    val got = spark.table("ohlc_s").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))
      .filter(!_._2.startsWith("2024-06")).toSet
    q.stop()
    val dir = java.nio.file.Files.createTempDirectory("e26spec").toString
    base.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val want = graft.operators.TimeJoins.ohlcResample(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))
      .toSet
    assert(got == want, s"stream $got vs batch $want")
  }

  test("E27: streaming anomaly gate applies the batch q120 bars through the shared function") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:00:00")
    // type a: steady rhythm then a planted 100x surge; type b: steady
    val base = (1 to 8).map(h => Ev(h, 1, hts(h), "a", 10.0 + h * 0.25)) ++
      Seq(Ev(9, 1, hts(9), "a", 1000.0)) ++
      (1 to 5).map(h => Ev(20 + h, 1, hts(h), "b", 5.0))
    val dir = java.nio.file.Files.createTempDirectory("e27spec").toString
    base.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val bars = graft.operators.TimeJoins.anomalyBars(spark, dir)
    assert(bars.keySet == Set("a", "b"))

    // the stream also sees a type the snapshot never calibrated
    val feed = base ++ Seq(Ev(90, 1, hts(3), "zz", 1.0)) ++ Seq(
      Ev(100, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "a", 0.0),
      Ev(101, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "b", 0.0),
      Ev(102, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "zz", 0.0))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .anomalyGateStream(in.toDS(), bars)
      .writeStream.format("memory").queryName("anom_s").outputMode("append").start()
    in.addData(feed: _*); q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    val rows = spark.table("anom_s").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4), r.getBoolean(5), r.getBoolean(6)))
      .filter(!_._2.startsWith("2024-06")).toSeq
    q.stop()
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, hour, dev, known, flag) =>
      if (known) {
        val (m, md) = bars(tpe)
        assert(flag == graft.operators.TimeJoins.anomalyFlag(dev, m, md),
          s"$tpe $hour: stream flag diverged from the shared threshold function")
      } else {
        assert(tpe == "zz" && !flag, "uncalibrated types must never flag")
      }
    }
    assert(rows.exists(_._5), "the planted 100x surge must flag")
    assert(rows.exists(r => r._1 == "zz" && !r._4), "the uncalibrated type must surface as unknown")
  }

  test("E25: streaming EWMA rows equal batch q113 bit-for-bit on closed buckets") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    // two types, gap hours, same-hour accumulation, in-batch disorder
    val base = Seq(
      Ev(1, 1, hts(1, 0), "a", 10.25), Ev(2, 1, hts(1, 30), "a", 0.50),
      Ev(3, 1, hts(1, 10), "b", 3.00),
      Ev(5, 1, hts(2, 20), "a", 7.75), Ev(4, 1, hts(2, 5), "a", 1.00), // out of order
      Ev(6, 1, hts(4, 0), "a", 2.25), // gap hour 3: no bucket (q113 lags observed)
      Ev(7, 1, hts(3, 0), "b", 6.50),
      Ev(8, 1, hts(5, 0), "a", 9.00), Ev(9, 1, hts(5, 30), "b", 1.75))
    // far-future sentinels close each type's final real bucket; their own
    // (sentinel-hour) buckets never emit and are excluded from the compare
    val sentinels = Seq(
      Ev(100, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "a", 0.0),
      Ev(101, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "b", 0.0))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .ewmaStream(in.toDS())
      .writeStream.format("memory").queryName("ewma_s").outputMode("append").start()
    in.addData(base(0), base(1), base(2)); q.processAllAvailable()
    in.addData(base(3), base(4), base(5)); q.processAllAvailable()
    in.addData(base(6), base(7), base(8)); q.processAllAvailable()
    in.addData(sentinels: _*); q.processAllAvailable()
    val got = spark.table("ewma_s").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .filter(!_._2.startsWith("2024-06")).toSet
    q.stop()
    val dir = java.nio.file.Files.createTempDirectory("e25spec").toString
    base.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val want = graft.operators.TimeJoins.ewmaTrend(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got == want, s"stream $got vs batch $want")
  }

  test("E24: streaming rolling actives equal batch q112's DAU/WAU counts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def dts(day: Int, hr: Int) = Timestamp.valueOf(f"2024-01-$day%02d $hr%02d:00:00")
    val evs = Seq(
      Ev(1, 7, dts(1, 1), "a", 0), Ev(2, 8, dts(1, 2), "a", 0),
      Ev(3, 7, dts(2, 3), "a", 0), Ev(4, 7, dts(2, 9), "a", 0), // same-day dup
      Ev(5, 9, dts(5, 1), "a", 0),
      Ev(6, 7, dts(9, 1), "a", 0), // > 7 days after u7's first span: new reach run
      Ev(7, 8, dts(10, 1), "a", 0))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .rollingActivesStream(in.toDS())
      .writeStream.format("memory").queryName("ractives").outputMode("append").start()
    in.addData(evs(0), evs(1)); q.processAllAvailable()
    in.addData(evs(2), evs(3), evs(4)); q.processAllAvailable()
    in.addData(evs(5), evs(6)); q.processAllAvailable()
    val rows = spark.table("ractives").collect()
      .map(r => (r.getAs[String]("day"), r.getAs[String]("kind"), r.getAs[Long]("user_id")))
      .toSeq
    q.stop()
    assert(rows.distinct.length == rows.length,
      "each (user, day, kind) must emit exactly once across batches")
    val gotActive = rows.filter(_._2 == "active").groupBy(_._1).map { case (d, v) => d -> v.size.toLong }
    val gotReach  = rows.filter(_._2 == "reach").groupBy(_._1).map { case (d, v) => d -> v.size.toLong }
    // batch truth: q112 on the same events written as a table
    val dir = java.nio.file.Files.createTempDirectory("e24spec").toString
    evs.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.operators.TimeJoins.rollingActives(spark, dir).collect().foreach { r =>
      val (day, nA, n7) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(gotActive.getOrElse(day, 0L) == nA, s"DAU mismatch on $day")
      assert(gotReach.getOrElse(day, 0L) == n7, s"WAU7 mismatch on $day")
    }
  }

  test("E4: file-source stream over the events parquet (readStream path)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file source wants a directory; stage the single parquet file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    // ts arrives as long nanos (old testdata) or TIMESTAMP_NTZ (new) —
    // normalize exactly as Tables.events does for the batch side.
    val schema = spark.read.parquet(dir.toString).schema
    val raw = spark.readStream
      .schema(schema)
      .parquet(dir.toString)
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    val q = EventStreams
      .windowedCounts(stream)
      .writeStream.format("memory").queryName("file_win").outputMode("complete").start()
    q.processAllAvailable()
    val total = spark.table("file_win").agg(sum(col("n"))).collect().head.getLong(0)
    q.stop()
    assert(total == 1000L) // all sf0.001 events counted exactly once
  }

  test("E5: streaming sink via foreachBatch into JDBC (Derby)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in  = MemoryStream[Ev]
    val url = "jdbc:derby:memory:streamSink;create=true"
    val q = in
      .toDF()
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sinks.Sinks.writeJdbc(batch, url, "events_stream", mode = "append")
      }
      .start()
    in.addData(Ev(1, 1, ts(0), "click", 1.0), Ev(2, 1, ts(1), "view", 2.0))
    q.processAllAvailable()
    in.addData(Ev(3, 2, ts(2), "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.jdbc(url, "\"events_stream\"", new java.util.Properties())
    assert(back.count() == 3)
  }

  test("E45: JDBC upsert cube maintains MERGE totals across batches and a restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val url  = "jdbc:derby:memory:cubeUpsert;create=true"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_cube").toString
    // the upsert target with its natural key — created once, like a real
    // warehouse table the stream maintains incrementally
    locally {
      val c = java.sql.DriverManager.getConnection(url)
      try c.createStatement().execute(
        """CREATE TABLE "cube_upsert" (
          |  "hour" VARCHAR(13) NOT NULL, "event_type" VARCHAR(64) NOT NULL,
          |  "n_events" BIGINT, "volume" DECIMAL(28,2),
          |  PRIMARY KEY ("hour", "event_type"))""".stripMargin)
      finally c.close()
    }
    val in = MemoryStream[Ev]
    def start() = EventStreams
      .cubeStream(in.toDF())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sinks.Sinks.upsertJdbc(batch, url, "cube_upsert",
          Seq("hour", "event_type"), Seq("n_events", "volume"))
      }
      .start()

    def cubeNow(): Map[(String, String), (Long, BigDecimal)] =
      spark.read.jdbc(url, "\"cube_upsert\"", new java.util.Properties())
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), BigDecimal(r.getDecimal(3)))))
        .toMap

    val q1 = start()
    in.addData(Ev(1, 1, ts(0), "click", 1.5), Ev(2, 1, ts(10), "click", 2.0),
      Ev(3, 2, ts(20), "view", 4.0))
    q1.processAllAvailable()
    assert(cubeNow()(("2024-01-01 10", "click")) == ((2L, BigDecimal("3.50"))))
    // second batch touches the SAME cell: the upsert must UPDATE to the
    // new absolute total, not insert a second row or double-add
    in.addData(Ev(4, 3, ts(40), "click", 0.5))
    q1.processAllAvailable()
    q1.stop()
    assert(cubeNow()(("2024-01-01 10", "click")) == ((3L, BigDecimal("4.00"))))
    assert(cubeNow().size == 2)

    // restart from the checkpoint: recovered state must keep merging into
    // the same cells, and the final table equals a batch recompute over
    // every event fed (the q154 contract, end to end)
    val q2 = start()
    in.addData(Ev(5, 1, ts(50), "click", 1.0),
      Ev(6, 2, Timestamp.valueOf("2024-01-01 11:05:00"), "view", 7.0))
    q2.processAllAvailable()
    q2.stop()
    val expected = Map(
      ("2024-01-01 10", "click") -> ((4L, BigDecimal("5.00"))),
      ("2024-01-01 10", "view")  -> ((1L, BigDecimal("4.00"))),
      ("2024-01-01 11", "view")  -> ((1L, BigDecimal("7.00"))))
    assert(cubeNow() == expected, s"cube diverged: ${cubeNow()}")
  }

  test("E6: streaming minhash emits near-dup candidates when windows close") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val in = MemoryStream[Doc]
    val q = DocStreams
      .minhashCandidates(in.toDF(), windowDur = "10 minutes", watermarkDur = "5 minutes")
      .writeStream.format("memory").queryName("mh_cand").outputMode("append").start()
    val dupText   = "spark shuffles on band hashes only never an n squared cross join at scale"
    val otherText = "an entirely different document about healthkit workouts and gpx route parsing"
    in.addData(
      Doc(1, dupText, ts(1)),
      Doc(2, dupText, ts(2)), // exact dup of 1 → all 8 bands collide
      Doc(3, otherText, ts(3))
    )
    q.processAllAvailable()
    // advance the watermark past the first window so append emits it
    in.addData(Doc(9, otherText, Timestamp.valueOf("2024-01-01 11:00:00")))
    q.processAllAvailable()
    val pairs = spark.table("mh_cand").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    q.stop()
    assert(pairs == Set((1L, 2L))) // the planted dup, and nothing with doc 3
  }

  test("E9: streaming ingest gate filters, scrubs, and splits in one pass") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val in = MemoryStream[Doc]
    val q = DocStreams
      .ingestGate(in.toDF())
      .writeStream.format("memory").queryName("ingest_gate").outputMode("append").start()
    in.addData(
      Doc(1, "contact bob@example.com about spark shuffles and scans at corpus scale", ts(1)),
      Doc(2, "too short", ts(2)), // < MinTokens → gated out
      Doc(3, "the a an and of to in is the a an and of", ts(3)) // stopword soup → gated out
    )
    q.processAllAvailable()
    val rows = spark.table("ingest_gate").collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_pii"), r.getAs[String]("scrub_md5"),
          r.getAs[String]("split")))
    q.stop()
    assert(rows.map(_._1).toSeq == Seq(1L))
    val (_, nPii, md5Got, split) = rows.head
    assert(nPii == 1L) // the email
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(md5Got ==
      md5hex("contact <EMAIL> about spark shuffles and scans at corpus scale"))
    // split must equal the batch q40 rule for doc_id 1
    val batchSplit = graft.operators.TrainingOps.splitHash(spark, Sf0001)
      .filter($"doc_id" === 1L).select("split").collect().head.getString(0)
    assert(split == batchSplit)
  }

  test("E11: streaming model-apply gate reproduces batch DSIR scores") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    import graft.operators.CurationOps
    val batch = CurationOps.dsirWeights(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_score")).toMap
    val model = CurationOps.dsirModel(spark, Sf0001)
    assert(model.nonEmpty && model.size <= CurationOps.DsirBuckets)
    val sample = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").orderBy($"doc_id").limit(20).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    val in = MemoryStream[Doc]
    val q = DocStreams
      .dsirScoreGate(in.toDF(), model)
      .writeStream.format("memory").queryName("dsir_gate").outputMode("append").start()
    in.addData(sample.toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("dsir_gate").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("dsir_score"), r.getAs[Boolean]("keep")))
    q.stop()
    assert(rows.length == 20)
    rows.foreach { case (id, s, keep) =>
      // batch folds by ascending feature and rounds to 6; the gate folds in
      // document order — equal up to float re-association
      assert(math.abs(s - batch(id)) < 1e-6, s"doc $id: stream $s vs batch ${batch(id)}")
      assert(keep == (s >= 0.0))
    }
  }

  test("E14: streaming LM gate scores EQUAL the batch q68 column (shared expression)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    import graft.operators.CurationOps
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val batch = CurationOps.lmScoreOf(corpus).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val (cb, cu) = CurationOps.lmModelOf(corpus)
    assert(cb.nonEmpty && cb.size <= CurationOps.LmBuckets)
    assert(cu.nonEmpty && cu.size <= CurationOps.LmBuckets)
    val sample = corpus
      .select("doc_id", "text").orderBy($"doc_id").limit(20).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    val in = MemoryStream[Doc]
    val q = DocStreams
      .lmGate(in.toDF(), cb, cu, maxXent = 8.0)
      .writeStream.format("memory").queryName("lm_gate").outputMode("append").start()
    in.addData(sample.toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("lm_gate").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getAs[Boolean]("keep")))
    q.stop()
    assert(rows.length == 20)
    rows.foreach { case (id, x, keep) =>
      // identical expression + identical model → exact equality, not 1e-6
      assert(x == batch(id), s"doc $id: stream $x vs batch ${batch(id)}")
      assert(keep == x.exists(_ <= 8.0))
    }
  }

  test("E19: streaming BPE gate stats EQUAL the batch q91 columns (shared expression)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    import graft.operators.TokenizerOps
    val batch = TokenizerOps.bpeEncode(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val merges = TokenizerOps.trainMerges(TokenizerOps.trainDict(spark, Sf0001))
    assert(merges.nonEmpty && merges.size <= TokenizerOps.BpeMerges)
    val sample = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").orderBy($"doc_id").limit(20).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    val in = MemoryStream[Doc]
    val q = DocStreams
      .bpeGate(in.toDF(), merges.map(_._2).toArray, merges.map(_._3).toArray, minRatio = 1.5)
      .writeStream.format("memory").queryName("bpe_gate").outputMode("append").start()
    in.addData(sample.toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("bpe_gate").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_raw_syms"), r.getAs[Long]("n_bpe_toks"),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))),
        r.getAs[Boolean]("keep")))
    q.stop()
    assert(rows.length == 20)
    rows.foreach { case (id, got, keep) =>
      // identical expression + identical merge table → exact equality
      assert(got == batch(id), s"doc $id: stream $got vs batch ${batch(id)}")
      assert(keep == got._4.exists(_ >= 1.5))
    }
  }

  test("E21: streaming gap-fill emits q94's rows — closed hours, gap rows, timeout finals") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val in = MemoryStream[Ev]
    val q = EventStreams.gapFillStream(in.toDF().as[Ev])
      .writeStream.format("memory").queryName("gap_fill").outputMode("update").start()
    // user 1 spans hours 00→03 with gaps at 01/02; user 2 has two events at
    // the SAME microsecond (event_id 11 wins). Users share one time
    // neighborhood — the watermark is GLOBAL, so a user whose events lag
    // another's by more than the watermark would see them dropped as late
    // (the operator's documented contract).
    in.addData(
      Ev(1L, 1L, t("2024-01-01 00:10:00"), "view", 1.0),
      Ev(2L, 1L, t("2024-01-01 00:50:00"), "view", 2.0),
      Ev(10L, 2L, t("2024-01-01 00:30:00.000001"), "view", 7.0),
      Ev(11L, 2L, t("2024-01-01 00:30:00.000001"), "view", 9.0))
    q.processAllAvailable()
    in.addData(Ev(3L, 1L, t("2024-01-01 03:05:00"), "view", 3.0))
    q.processAllAvailable()
    // advance the watermark past every open hour's timeout, in two steps so
    // event-time timeouts fire and the final open hours emit
    in.addData(Ev(900L, 999L, t("2024-01-01 06:00:00"), "view", 0.0))
    q.processAllAvailable()
    in.addData(Ev(901L, 999L, t("2024-01-01 10:00:00"), "view", 0.0))
    q.processAllAvailable()
    val got = spark.table("gap_fill").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("hour"),
        r.getAs[Long]("n_events"), r.getAs[Double]("value_ff"), r.getAs[Boolean]("is_gap")))
      .filter(_._1 != 999L).sortBy(p => (p._1, p._2)).toSeq
    q.stop()
    // identical to batch q94 on the same fixture
    val expected = Seq(
      (1L, "2024-01-01 00", 2L, 2.0, false),
      (1L, "2024-01-01 01", 0L, 2.0, true),
      (1L, "2024-01-01 02", 0L, 2.0, true),
      (1L, "2024-01-01 03", 1L, 3.0, false),
      (2L, "2024-01-01 00", 2L, 9.0, false)
    )
    assert(got == expected, s"got $got")
  }

  test("E21: fill state survives a checkpointed restart (recovery equals uninterrupted run)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_fill").toString
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

    // batch 1: hour 00 partially filled — the open-hour state (count 2,
    // best value 2.0) is now in the state store, nothing emitted yet
    val q1 = start()
    in.addData(
      Ev(1L, 1L, t("2024-01-01 00:10:00"), "view", 1.0),
      Ev(2L, 1L, t("2024-01-01 00:50:00"), "view", 2.0))
    q1.processAllAvailable()
    q1.stop()
    assert(out.isEmpty, "open hour must not emit before a later event or timeout")

    // restart from the checkpoint: the RECOVERED open hour must close with
    // its pre-restart count and forward-fill the pre-restart value through
    // the gap rows — then timeouts emit the final hour
    val q2 = start()
    in.addData(Ev(3L, 1L, t("2024-01-01 03:05:00"), "view", 3.0))
    q2.processAllAvailable()
    in.addData(Ev(900L, 999L, t("2024-01-01 06:00:00"), "view", 0.0))
    q2.processAllAvailable()
    in.addData(Ev(901L, 999L, t("2024-01-01 10:00:00"), "view", 0.0))
    q2.processAllAvailable()
    q2.stop()

    val got = out.toArray.map(_.asInstanceOf[(Long, String, Long, Double, Boolean)])
      .filter(_._1 != 999L).sortBy(p => (p._1, p._2)).toSeq
    // identical to the uninterrupted E21 run over the same events
    assert(got == Seq(
      (1L, "2024-01-01 00", 2L, 2.0, false),
      (1L, "2024-01-01 01", 0L, 2.0, true),
      (1L, "2024-01-01 02", 0L, 2.0, true),
      (1L, "2024-01-01 03", 1L, 3.0, false)),
      s"recovered fill state diverged: $got")
  }

  test("E20: streaming normalize gate shares q93's expression and trips on binary junk") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val batch = graft.operators.TextOps.normalizeText(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    val sample = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").orderBy($"doc_id").limit(15).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    // one junk doc: >5% control bytes must fail the gate
    val junk = Doc(99999L, "ab\u0001\u0002\u0003cd", ts(1))
    val in = MemoryStream[Doc]
    val q = DocStreams.normalizeGate(in.toDF())
      .writeStream.format("memory").queryName("norm_gate").outputMode("append").start()
    in.addData((sample :+ junk).toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("norm_gate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ctrl"), r.getAs[Boolean]("changed_nfc"),
          r.getAs[String]("clean"), r.getAs[Boolean]("keep")))).toMap
    q.stop()
    assert(rows.size == 16)
    sample.foreach { d =>
      val (nc, ch, lenClean) = batch(d.doc_id)
      val (snc, sch, sclean, skeep) = rows(d.doc_id)
      // identical expression → exact equality with the batch q93 columns
      assert(snc == nc && sch == ch && sclean.getBytes("UTF-8").length == lenClean)
      assert(skeep, s"clean corpus doc ${d.doc_id} must pass")
    }
    val (jnc, _, jclean, jkeep) = rows(99999L)
    assert(jnc == 3L && jclean == "ab cd" && !jkeep, "binary junk must fail the gate")
  }

  test("E17: streamed chunks EQUAL the batch q80 chunks (shared expression)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    import graft.operators.CurationOps
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val batch = CurationOps.docChunks(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3))).toMap
    val sample = corpus
      .select("doc_id", "text").orderBy($"doc_id").limit(25).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    val in = MemoryStream[Doc]
    val st = DocStreams.streamChunker(in.toDF())
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("chunker").outputMode("append").start()
    in.addData(sample.toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("chunker").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("n_tok"), r.getAs[String]("chunk_hash")))
    q.stop()
    val streamedDocs = sample.map(_.doc_id).toSet
    // every batch chunk of the streamed docs arrived, bit-identical, and
    // nothing else did
    assert(rows.map(r => (r._1, r._2)).toSet ==
      batch.keySet.filter(k => streamedDocs(k._1)))
    rows.foreach { case (id, idx, n, h) =>
      assert(batch((id, idx)) == ((n, h)), s"chunk ($id, $idx) diverged from batch")
    }
  }

  test("E46: streamed CDC chunks EQUAL the batch q189 chunk grain (shared compiled kernel)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val sample = corpus
      .select("doc_id", "text").orderBy($"doc_id").limit(25).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    // batch truth: the SAME kernel over the same docs — (doc_id, h, clen)
    // multiset (CDC can legitimately repeat a chunk within one doc)
    val batch = corpus
      .filter($"doc_id".isin(sample.map(_.doc_id).toSeq: _*))
      .select(col("doc_id"),
        explode(graft.functions.Expressions.cdc_chunks(col("text"))).as("chunk"))
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("h"),
        length(col("chunk")).cast("long").as("clen"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val in = MemoryStream[Doc]
    val st = DocStreams.cdcChunkStream(in.toDF())
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("cdc_chunker").outputMode("append").start()
    in.addData(sample.toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("cdc_chunker").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("h"), r.getAs[Long]("clen")))
      .sorted.toSeq
    q.stop()
    assert(rows == batch, s"streamed CDC chunk grain diverged (${rows.size} vs ${batch.size})")
    // chunks tile each doc exactly: per-doc clen sums equal text lengths
    val lens = corpus.filter($"doc_id".isin(sample.map(_.doc_id).toSeq: _*))
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (id, cs) =>
      assert(cs.map(_._3).sum == lens(id), s"doc $id chunks do not tile its text")
    }
  }

  test("E22: streaming budget gate applies the snapshot's marginal cut, stream ≡ batch scores") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val thr = DocStreams.budgetThreshold(spark, Sf0001)
    // batch truth: q106's own per-doc scores on the same corpus
    val batchScores = graft.operators.TrainingOps.tokenBudgetSelect(spark, Sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val sample = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").orderBy($"doc_id").limit(30).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    val in = MemoryStream[Doc]
    val st = DocStreams.budgetGate(in.toDF(), thr)
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("bgate").outputMode("append").start()
    in.addData(sample.toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("bgate").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Boolean]("keep")))
    q.stop()
    assert(rows.length == 30)
    rows.foreach { case (id, score, keep) =>
      assert(score == batchScores(id), s"doc $id: stream score $score vs batch ${batchScores(id)}")
      assert(keep == (score >= thr))
    }
    assert(rows.exists(_._3) && rows.exists(!_._3))
  }

  test("E18: streaming quantile gate matches the pure-function CDF on every doc") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    import graft.operators.StatsOps
    val (hist, mn, mx, n) = StatsOps.scoreCdfModel(spark, Sf0001)
    assert(n > 0 && hist.nonEmpty && hist.size <= StatsOps.CdfBins)
    val sample = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").orderBy($"doc_id").limit(30).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    val in = MemoryStream[Doc]
    val st = DocStreams.quantileGate(in.toDF(), hist, mn, mx, n, minPct = 0.5)
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("qgate").outputMode("append").start()
    in.addData(sample.toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("qgate").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Double]("pct"), r.getAs[Boolean]("keep")))
    q.stop()
    assert(rows.length == 30)
    rows.foreach { case (id, score, pct, keep) =>
      // same binning ops, same one-division CDF → exact equality
      val want = StatsOps.cdfPct(hist, mn, mx, n, score)
      assert(pct == want, s"doc $id: stream pct $pct vs cdfPct $want")
      assert(keep == (pct >= 0.5))
    }
    // the gate separates: some kept, some dropped at the median cut
    assert(rows.exists(_._4) && rows.exists(!_._4))
  }

  test("E16: a closed window's drift equals the batch q71 statistic on the same corpus") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.SrcDoc
    import graft.operators.StatsOps
    val B      = StatsOps.DriftBuckets
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val batch = StatsOps.sourceDrift(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // the reference snapshot distribution (what q71 compares each source to)
    val ref = corpus
      .selectExpr(s"explode(transform(split(trim(text), '\\\\s+'), t -> pmod(xxhash64(t), $B))) AS f")
      .groupBy("f").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refN = ref.values.sum
    // replay the WHOLE corpus into one event-time window
    val replay = corpus.select("doc_id", "text", "source").collect()
      .map(r => SrcDoc(r.getLong(0), r.getString(1), r.getString(2), ts(1)))
    val in = MemoryStream[SrcDoc]
    val q = DocStreams.driftMonitor(in.toDF())
      .writeStream.format("memory").queryName("drift_mon").outputMode("append").start()
    in.addData(replay.toSeq: _*)
    q.processAllAvailable()
    // advance the watermark past the window so it closes and emits
    in.addData(SrcDoc(99999L, "late", "srcX", Timestamp.valueOf("2024-01-01 14:00:00")))
    q.processAllAvailable()
    val hists = spark.table("drift_mon").collect()
      .filter(_.getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 10:00:00"))
      .groupBy(_.getAs[String]("source"))
    q.stop()
    assert(hists.keySet == batch.keySet)
    hists.foreach { case (src, rows) =>
      assert(rows.length <= B, "state per (window, source) must stay bucket-bounded")
      val h       = rows.map(r => r.getAs[Long]("f") -> r.getAs[Long]("c")).toSeq
      val (n, kl) = StatsOps.driftKl(h, ref, refN, B)
      assert(n == batch(src)._1, s"$src token count")
      val r6 = BigDecimal(kl).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // a window whose content IS the batch source scores identically
      assert(r6 == batch(src)._2, s"$src: stream $r6 vs batch ${batch(src)._2}")
    }
  }

  test("E16: bucket-count state survives a checkpointed restart (recovery = uninterrupted)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.SrcDoc
    val docs = (0 until 10).map { i =>
      val text = (0 to i % 4).map(j => s"tok${(i + j) % 5}").mkString(" ")
      SrcDoc(i.toLong, text, if (i % 2 == 0) "sA" else "sB", ts(1 + i))
    }
    val late = SrcDoc(999L, "late", "sX", Timestamp.valueOf("2024-01-01 14:00:00"))

    def runRows(feed: Seq[Seq[SrcDoc]], ckpt: Option[String]): Set[(Timestamp, String, Long, Long)] = {
      val in  = MemoryStream[SrcDoc]
      val out = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Timestamp, String, Long, Long)]())
      def start() = {
        val w = DocStreams.driftMonitor(in.toDF())
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.collect().foreach(r => out.add((r.getAs[Timestamp]("window_start"),
              r.getAs[String]("source"), r.getAs[Long]("f"), r.getAs[Long]("c"))))
          }
          .outputMode("append")
        ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
      }
      var q = start()
      feed.init.foreach { batch =>
        in.addData(batch: _*)
        q.processAllAvailable()
        if (ckpt.isDefined) { q.stop(); q = start() } // restart between batches
      }
      in.addData(feed.last: _*)
      q.processAllAvailable()
      q.stop()
      out.toArray.map(_.asInstanceOf[(Timestamp, String, Long, Long)]).toSet
    }

    val uninterrupted = runRows(Seq(docs :+ late), None)
    assert(uninterrupted.nonEmpty)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_drift").toString
    val recovered = runRows(Seq(docs.take(5), docs.drop(5) :+ late), Some(ckpt))
    // the recovered (window, source, bucket) counts merge pre- and
    // post-restart contributions into the same closed-window histogram
    assert(recovered == uninterrupted,
      s"recovered drift state diverged: ${recovered.diff(uninterrupted)} / ${uninterrupted.diff(recovered)}")
  }

  test("E12: streaming bloom gate matches the batch gate's bloom verdicts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    import graft.operators.TrainingOps
    val docsDf = graft.core.Tables.documents(spark, Sf0001).select("doc_id", "text")
    val words  = TrainingOps.bloomFilterWords(docsDf.filter($"doc_id" % 2 === 0))
    assert(words.nonEmpty && words.size <= TrainingOps.BloomBits / 64)
    val batch = TrainingOps.bloomGate(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getInt(1) == 1)).toMap
    val sample = docsDf.filter($"doc_id" % 2 =!= 0)
      .orderBy($"doc_id").limit(20).collect()
      .map(r => Doc(r.getLong(0), r.getString(1), ts(1)))
    val in = MemoryStream[Doc]
    val q = DocStreams
      .bloomGate(in.toDF(), words)
      .writeStream.format("memory").queryName("bloom_gate").outputMode("append").start()
    in.addData(sample.toSeq: _*)
    q.processAllAvailable()
    val rows = spark.table("bloom_gate").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("maybe_dup"))
    q.stop()
    assert(rows.length == 20)
    rows.foreach { case (id, maybeDup) =>
      assert(maybeDup == batch(id), s"doc $id: stream $maybeDup vs batch ${batch(id)}")
    }
  }

  test("E10: stream-static snapshot dedup drops known and repeated content") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val snapshot = graft.core.Tables.documents(spark, Sf0001).select("doc_id", "text")
    val knownText = snapshot.orderBy($"doc_id").select("text").head.getString(0)
    val in = MemoryStream[Doc]
    val q = DocStreams
      .snapshotDedup(in.toDF(), snapshot)
      .writeStream.format("memory").queryName("snap_dedup").outputMode("append").start()
    in.addData(
      Doc(1001, knownText, ts(1)),                     // already in the snapshot → dropped
      Doc(1002, "a genuinely novel incoming document", ts(2)) // kept
    )
    q.processAllAvailable()
    in.addData(
      Doc(1003, "a genuinely novel incoming document", ts(3)), // in-stream dup → state drops it
      Doc(1004, "another novel one", ts(4))            // second batch still joins the snapshot
    )
    q.processAllAvailable()
    val ids = spark.table("snap_dedup").select("doc_id").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.toSeq == Seq(1002L, 1004L))
  }

  test("E3: streaming dedup drops duplicate event_ids across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams
      .dedup(in.toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    in.addData(Ev(1, 1, ts(0), "click", 1.0), Ev(2, 1, ts(1), "view", 1.0))
    q.processAllAvailable()
    in.addData(Ev(1, 1, ts(0), "click", 1.0), Ev(3, 1, ts(2), "view", 1.0)) // id 1 is a dup
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("E8: dedup state survives a checkpointed restart (exactly-once recovery)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[Ev]
    val out = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    // foreachBatch (unlike the memory sink) supports checkpoint recovery
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
    assert(out.size == 2)
    q1.stop()

    // restart from the same checkpoint: anything emitted now comes AFTER
    // recovery — a replay of event 1 must be suppressed by the RECOVERED
    // state store, not by in-memory session state.
    out.clear()
    val q2 = start()
    in.addData(Ev(1, 1, ts(1), "click", 0), Ev(3, 1, ts(10), "click", 0))
    q2.processAllAvailable()
    q2.stop()
    val ids = out.toArray.map(_.asInstanceOf[Long]).toSet
    assert(ids == Set(3L), s"recovered dedup state should drop the replayed event 1, got $ids")
  }

  test("E7: stream-stream interval join bounds state with watermarks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams
      .clickPurchaseJoin(in.toDF(), windowMinutes = 60)
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    in.addData(
      Ev(1, 1, ts(0), "purchase", 5.0),  // joins clicks at 10:00-11:00
      Ev(2, 1, ts(30), "click", 0),      // <- joins purchase 1
      Ev(3, 2, ts(30), "click", 0),      // no purchase for user 2
      Ev(4, 1, Timestamp.valueOf("2024-01-01 12:00:00"), "click", 0) // outside window
    )
    q.processAllAvailable()
    // advance both watermarks so joined rows are emitted in append mode
    in.addData(Ev(9, 9, Timestamp.valueOf("2024-01-01 14:00:00"), "view", 0))
    q.processAllAvailable()
    val rows = spark.table("ssjoin").collect()
      .map(r => (r.getAs[Long]("c_id"), r.getAs[Long]("p_id")))
    q.stop()
    assert(rows.toSet == Set((2L, 1L)))
  }

  test("E28: streaming A/B telemetry totals reconcile with batch q126's arms") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    // 6 users × 3 hours across two types; hash-arms are whatever
    // xxhash64 says — the spec never assumes the split, only reconciles
    val base = for {
      u <- 1L to 6L; h <- 1 to 3
    } yield Ev(u * 10 + h, u, hts(h, (u * 7 % 60).toInt),
      if (h == 2) "beta" else "alpha", u * 1.25 + h)
    val sentinel = Ev(999, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "alpha", 0.0)
    val in = MemoryStream[Ev]
    val q = EventStreams
      .abMonitorStream(in.toDF())
      .writeStream.format("memory").queryName("ab_s").outputMode("append").start()
    val (first, second) = base.splitAt(base.length / 2)
    in.addData(first: _*); q.processAllAvailable()
    in.addData(second: _*); q.processAllAvailable()
    in.addData(sentinel); q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    val got = spark.table("ab_s").collect().filter(!_.getString(1).startsWith("2024-06"))
    q.stop()
    def dec(r: org.apache.spark.sql.Row, i: Int): BigDecimal =
      Option(r.getDecimal(i)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    val streamTot = got.groupBy(_.getString(0)).view.mapValues { rs =>
      (rs.map(_.getLong(2)).sum, rs.map(_.getLong(3)).sum,
        rs.map(dec(_, 4)).sum, rs.map(dec(_, 5)).sum)
    }.toMap
    val dir = java.nio.file.Files.createTempDirectory("e28spec").toString
    base.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.StatsOps.abUplift(spark, dir).collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(streamTot.keySet == batch.map(_.getString(0)).toSet)
    batch.foreach { r =>
      val t               = r.getString(0)
      val (nc, nt, svc, svt) = streamTot(t)
      assert(nc == r.getLong(1) && nt == r.getLong(2), s"counts drift for $t: $r")
      assert(r6(svc.toDouble / nc) == r.getDouble(3), s"mean_c drift for $t")
      assert(r6(svt.toDouble / nt) == r.getDouble(4), s"mean_t drift for $t")
    }
  }

  test("E29: streaming winsorized sums reconcile with batch q141's means; unknown types pass raw") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    // type a: steady 2dp values + one fat-finger outlier (>=150 events so
    // the ceil(0.99*N) order statistic sits BELOW the outlier); type b: steady
    val base = (1 to 150).map(i => Ev(i, 1, hts(1 + i % 3, i % 60), "a", 10.0 + (i % 7) * 0.25)) ++
      Seq(Ev(999L * 2, 1, hts(2, 30), "a", 5000.0)) ++
      (1 to 20).map(i => Ev(3000 + i, 2, hts(1 + i % 2, (i * 3) % 60), "b", 4.5))
    val dir = java.nio.file.Files.createTempDirectory("e29spec").toString
    base.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val caps  = graft.operators.TimeJoins.winsorizeCaps(spark, dir) - "b" // b left uncalibrated
    val batch = graft.operators.TimeJoins.winsorizeReport(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val in = MemoryStream[Ev]
    val q = EventStreams
      .winsorizeStream(in.toDF(), caps)
      .writeStream.format("memory").queryName("wz_s").outputMode("append").start()
    in.addData(base: _*); q.processAllAvailable()
    in.addData(Ev(999, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "a", 0.0))
    q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    val got = spark.table("wz_s").collect().filter(!_.getString(1).startsWith("2024-06"))
    q.stop()
    def dec(r: org.apache.spark.sql.Row, i: Int): BigDecimal = BigDecimal(r.getDecimal(i))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // calibrated type: stream winsorized mean == batch q141 column
    val aRows = got.filter(_.getString(0) == "a")
    assert(aRows.forall(_.getBoolean(2)), "a must be known_type")
    val aN  = aRows.map(_.getLong(3)).sum
    val aSw = aRows.map(dec(_, 5)).sum
    assert(aN == batch("a").getLong(1))
    assert(r6(aSw.toDouble / aN) == batch("a").getDouble(7), "winsorized mean drift for a")
    // the outlier was actually clamped: winsorized sum < raw sum
    assert(aSw < aRows.map(dec(_, 4)).sum, "clamp must bite on the planted outlier")
    // uncalibrated type: flagged, raw == winsorized
    val bRows = got.filter(_.getString(0) == "b")
    assert(bRows.nonEmpty && bRows.forall(!_.getBoolean(2)), "b must be unknown_type")
    assert(bRows.forall(r => dec(r, 4) == dec(r, 5)), "unknown types must pass unclamped")
  }

  test("E30: streaming Benford windows reconcile with batch q144; a planted surge flags") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    // hour 1: Benford-ish organic mix (values spanning magnitudes);
    // hour 2: a planted constant-digit surge (every value starts with 5)
    val organic = (1 to 120).map { i =>
      val mag = Seq(1.0, 10.0, 100.0)(i % 3)
      Ev(i, 1, hts(1, i % 60), "click", (1.0 + (i % 89) * 0.1) * mag)
    }
    val surge = (1 to 120).map(i => Ev(1000 + i, 2, hts(2, i % 60), "click", 55.0 + (i % 9)))
    val base  = organic ++ surge
    val in = MemoryStream[Ev]
    val q = EventStreams
      .benfordStream(in.toDF(), minN = 100L)
      .writeStream.format("memory").queryName("bf_s").outputMode("append").start()
    in.addData(base: _*); q.processAllAvailable()
    in.addData(Ev(9999, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "click", 1.0))
    q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    val got = spark.table("bf_s").collect().filter(!_.getString(0).startsWith("2024-06"))
    q.stop()
    assert(got.length == 2, s"expected two closed windows: ${got.toSeq}")
    val surgeRow = got.find(_.getString(0).endsWith("02")).get
    assert(surgeRow.getBoolean(12), s"surge window must flag: $surgeRow")
    // batch reconciliation: summed window digit counts == q144 counts
    val dir = java.nio.file.Files.createTempDirectory("e30spec").toString
    base.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.TimeJoins.benfordAudit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 9).foreach { d =>
      val streamed = got.map(_.getLong(1 + d)).sum
      assert(streamed == batch.getOrElse(d.toLong, 0L), s"digit $d drift: $streamed")
    }
  }

  test("E31: streaming CUSUM alarms on a planted shift via the shared recurrence") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:00:00")
    // type a: three in-control hours at volume 10, then a shift to 16 —
    // with (μ=10, slack=1, h=8) S⁺ walks 0,0,0,5,10(alarm→reset),5
    val vols = Seq(10.0, 10.0, 10.0, 16.0, 16.0, 16.0)
    val a    = vols.zipWithIndex.map { case (v, i) => Ev(i + 1, 1, hts(i + 1), "a", v) }
    val b    = Seq(Ev(100, 2, hts(1), "b", 3.0))
    val bars = Map("a" -> ((10.0, 1.0, 8.0)))
    val in   = MemoryStream[Ev]
    val q = EventStreams
      .cusumGateStream(in.toDS(), bars)
      .writeStream.format("memory").queryName("cusum_s").outputMode("append").start()
    in.addData(a ++ b: _*); q.processAllAvailable()
    in.addData(
      Ev(9998, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "a", 1.0),
      Ev(9999, 2, Timestamp.valueOf("2024-06-01 00:00:00"), "b", 1.0))
    q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    val got = spark.table("cusum_s").collect().filter(!_.getString(1).startsWith("2024-06"))
    q.stop()
    val aRows = got.filter(_.getString(0) == "a").sortBy(_.getString(1))
    assert(aRows.length == 6, s"expected 6 closed buckets: ${got.toSeq}")
    // reference fold through the SAME pure recurrence
    var (sp, sm) = (0.0, 0.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    vols.zip(aRows).foreach { case (x, r) =>
      val (np, nm) = graft.operators.TimeJoins.cusumStep(sp, sm, x, 10.0, 1.0)
      val alarm    = np > 8.0 || nm > 8.0
      assert(r.getDouble(2) == x, s"volume: $r")
      assert(r.getDouble(3) == r6(np) && r.getDouble(4) == r6(nm), s"S drift: $r vs ($np,$nm)")
      assert(r.getBoolean(5), s"a must be known_type: $r")
      assert(r.getBoolean(6) == alarm, s"alarm: $r")
      if (alarm) { sp = 0.0; sm = 0.0 } else { sp = np; sm = nm }
    }
    assert(aRows.map(_.getBoolean(6)).toSeq == Seq(false, false, false, false, true, false))
    // uncalibrated type: never alarms, S ≡ 0
    val bRows = got.filter(_.getString(0) == "b")
    assert(bRows.nonEmpty && bRows.forall(r =>
      !r.getBoolean(5) && !r.getBoolean(6) && r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
    // snapshot calibration produces one finite bar per observed type
    val cal = graft.operators.TimeJoins.cusumBars(spark, Sf0001)
    assert(cal.nonEmpty && cal.values.forall { case (mu, k, h) =>
      !mu.isNaN && k >= 0.0 && h >= 0.0 })
  }

  test("E32: range-drift windows reconcile with a batch census; a hot bucket flags") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val bounds = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0)
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    // hour 1: balanced across all 8 buckets; hour 2: everything in one
    val balanced = (0 until 80).map(i =>
      Ev(i + 1, 1, hts(1, i % 60), "click", 5.0 + 10.0 * (i % 8)))
    val hot  = (0 until 80).map(i => Ev(500 + i, 1, hts(2, i % 60), "click", 35.0))
    val base = balanced ++ hot
    val in   = MemoryStream[Ev]
    val q = EventStreams
      .rangeDriftStream(in.toDF(), bounds)
      .writeStream.format("memory").queryName("rd_s").outputMode("append").start()
    in.addData(base: _*); q.processAllAvailable()
    in.addData(Ev(9999, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "click", 1.0))
    q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    val got = spark.table("rd_s").collect().filter(!_.getString(0).startsWith("2024-06"))
    q.stop()
    assert(got.length == 2, s"expected two closed windows: ${got.toSeq}")
    val h1 = got.find(_.getString(0).endsWith("01")).get
    val h2 = got.find(_.getString(0).endsWith("02")).get
    assert(!h1.getBoolean(11), s"balanced hour must not flag: $h1")
    assert(h2.getBoolean(11) && h2.getDouble(10) == 1.0, s"hot hour must flag: $h2")
    // batch reconciliation: summed bucket occupancies == a driver census
    // through the same boundary rule (count of cuts strictly below)
    val census = base.groupBy(e => bounds.count(e.value > _)).view.mapValues(_.size.toLong)
    (0 until 8).foreach { bkt =>
      val streamed = got.map(_.getLong(2 + bkt)).sum
      assert(streamed == census.getOrElse(bkt, 0L), s"bucket $bkt drift: $streamed")
    }
    assert(got.map(_.getLong(1)).sum == base.length.toLong)
  }

  test("E33: streaming attribution credits purchases exactly once and reconciles with q151") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: click→view→purchase→purchase (one session), then a lone
    // purchase in a fresh session; user 2: direct purchase, then
    // error→purchase in the same session
    val all = Seq(
      Ev(1, 1, t("2024-01-01 10:00:00"), "click", 1.0),
      Ev(2, 1, t("2024-01-01 10:10:00"), "view", 2.0),
      Ev(3, 1, t("2024-01-01 10:20:00"), "purchase", 30.0),
      Ev(4, 1, t("2024-01-01 10:30:00"), "purchase", 10.005), // cents-rounds to 10.01
      Ev(5, 1, t("2024-01-01 12:00:00"), "purchase", 5.0),
      Ev(6, 2, t("2024-01-01 09:00:00"), "purchase", 7.77),
      Ev(7, 2, t("2024-01-01 09:10:00"), "error", 0.0),
      Ev(8, 2, t("2024-01-01 09:15:00"), "purchase", 2.23))
    val (b1, b2) = all.partition(_.ts.getTime <= t("2024-01-01 10:10:00").getTime)
    val in       = MemoryStream[Ev]
    val q = EventStreams
      .attributionStream(in.toDS())
      .writeStream.format("memory").queryName("attr_s").outputMode("append").start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(
      Ev(9998, 1, t("2024-06-01 00:00:00"), "click", 1.0),
      Ev(9999, 2, t("2024-06-01 00:00:00"), "click", 1.0))
    q.processAllAvailable()
    val got = spark.table("attr_s").collect()
    q.stop()
    val byEid = got.map(r => r.getLong(1) -> r).toMap
    assert(got.length == 5, s"one credit per purchase, exactly once: ${got.toSeq}")
    def ck(eid: Long, first: String, last: String, v: Double): Unit = {
      val r = byEid(eid)
      assert(r.getString(2) == first && r.getString(3) == last && r.getDouble(4) == v,
        s"credit for $eid: $r")
    }
    ck(3, "click", "view", 30.0)
    ck(4, "click", "view", 10.01) // purchases never update channels
    ck(5, "direct", "direct", 5.0)
    ck(6, "direct", "direct", 7.77)
    ck(8, "error", "error", 2.23)
    // batch reconciliation: per-channel first/last totals equal q151
    val dir = java.nio.file.Files.createTempDirectory("e33spec").toString
    all.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.TimeJoins.attribution(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    batch.foreach { case (ch, b) =>
      val f = got.filter(_.getString(2) == ch)
      val l = got.filter(_.getString(3) == ch)
      assert(f.length.toLong == b.getLong(1), s"n_first for $ch")
      assert(r2(f.map(_.getDouble(4)).sum) == b.getDouble(2), s"v_first for $ch")
      assert(l.length.toLong == b.getLong(3), s"n_last for $ch")
      assert(r2(l.map(_.getDouble(4)).sum) == b.getDouble(4), s"v_last for $ch")
    }
  }

  test("E34: window manifests xor-fold to the batch events fingerprint") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    val base = (1 to 90).map(i =>
      Ev(i, i % 7, hts(1 + i % 3, i % 60), Seq("click", "view", "purchase")(i % 3),
        1.0 + (i % 13) * 0.37))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .manifestStream(in.toDF().withColumn("props", lit("{}")))
      .writeStream.format("memory").queryName("mf_s").outputMode("append").start()
    in.addData(base.take(40): _*); q.processAllAvailable()
    in.addData(base.drop(40): _*); q.processAllAvailable()
    in.addData(Ev(9999, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "click", 1.0))
    q.processAllAvailable()
    val got = spark.table("mf_s").collect().filter(!_.getString(0).startsWith("2024-06"))
    q.stop()
    assert(got.length == 3, s"three closed hour windows: ${got.toSeq}")
    assert(got.map(_.getLong(1)).sum == base.length.toLong)
    // batch reconciliation: the xor of window fingerprints IS the batch one
    val dir = java.nio.file.Files.createTempDirectory("e34spec").toString
    base.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // documents table required by the batch manifest: reuse the real one
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$Sf0001/documents.parquet"))
    val batch = graft.operators.StatsOps.contentManifest(spark, dir).collect()
      .find(_.getString(0) == "events").get
    assert(got.map(_.getLong(2)).reduce(_ ^ _) == batch.getLong(2), "xor fold drift")
    assert(got.map(_.getLong(3)).min == batch.getLong(3), "min_h drift")
    assert(got.map(_.getLong(4)).max == batch.getLong(4), "max_h drift")
  }

  test("E38: window moment envelopes sum to the batch power-sum vector exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    val base = (1 to 90).map(i =>
      Ev(i, i % 7, hts(1 + i % 3, i % 60), Seq("click", "view", "purchase")(i % 3),
        1.0 + (i % 13) * 0.37))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .momentsStream(in.toDF())
      .writeStream.format("memory").queryName("mom_s").outputMode("append").start()
    in.addData(base.take(40): _*); q.processAllAvailable()
    in.addData(base.drop(40): _*); q.processAllAvailable()
    in.addData(Ev(9999, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "click", 1.0))
    q.processAllAvailable()
    val got = spark.table("mom_s").collect().filter(!_.getString(0).startsWith("2024-06"))
    q.stop()
    assert(got.map(r => (r.getString(0), r.getString(1))).distinct.length == got.length,
      "exactly-once emission per (window, type)")
    assert(got.map(_.getLong(2)).sum == base.length.toLong, "population conserved")
    // batch reconciliation: element-wise sums of the envelopes ARE the
    // one-pass batch power sums under the same cent quantization
    val batch = base.toDF()
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * lit(100)).cast("decimal(38,0)").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"), sum(col("v") * col("v") * col("v")).as("s3"),
        sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2), r.getDecimal(3),
        r.getDecimal(4), r.getDecimal(5))).toMap
    got.groupBy(_.getString(1)).foreach { case (ty, rows) =>
      val (n, s1, s2, s3, s4) = batch(ty)
      assert(rows.map(_.getLong(2)).sum == n, s"n $ty")
      def fold(i: Int) = rows.map(r => BigDecimal(r.getDecimal(i))).sum
      assert(fold(3) == BigDecimal(s1) && fold(4) == BigDecimal(s2) &&
        fold(5) == BigDecimal(s3) && fold(6) == BigDecimal(s4), s"power sums $ty")
    }
  }

  test("E39: per-window SRM counts dedupe exposures and match a batch recompute") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    // users 1..60 active in hour 1 (each with a DUPLICATE exposure that the
    // dedup must drop), users 1..20 again in hour 2
    val h1 = (1L to 60L).flatMap(u =>
      Seq(Ev(u * 10, u, hts(1, (u % 50).toInt), "view", 1.0),
        Ev(u * 10 + 1, u, hts(1, ((u + 7) % 50).toInt), "click", 1.0)))
    val h2 = (1L to 20L).map(u => Ev(u * 10 + 5, u, hts(2, (u % 50).toInt), "view", 1.0))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .srmStream(in.toDF())
      .writeStream.format("memory").queryName("srm_s").outputMode("append").start()
    in.addData(h1: _*); q.processAllAvailable()
    in.addData(h2: _*); q.processAllAvailable()
    in.addData(Ev(9999, 999, Timestamp.valueOf("2024-06-01 00:00:00"), "view", 1.0))
    q.processAllAvailable()
    val got = spark.table("srm_s").collect().filter(!_.getString(0).startsWith("2024-06"))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    q.stop()
    assert(got.size == 2, s"two closed hours: $got")
    // batch recompute: distinct users per hour split by the same hash arm
    def arms(users: Seq[Long]) = {
      val byArm = users.groupBy(u =>
        spark.range(1).select(pmod(xxhash64(lit(u)), lit(2L))).head.getLong(0))
      (byArm.getOrElse(0L, Nil).size.toLong, byArm.getOrElse(1L, Nil).size.toLong)
    }
    val Seq(w1, w2) = Seq((1L to 60L), (1L to 20L)).map(u => arms(u.toSeq))
    assert(got("2024-01-01 01")._1 == w1._1 && got("2024-01-01 01")._2 == w1._2,
      s"hour-1 dedup: ${got("2024-01-01 01")} vs $w1")
    assert(got("2024-01-01 02")._1 == w2._1 && got("2024-01-01 02")._2 == w2._2)
    got.values.foreach { case (nc, nt, chi, alarm) =>
      val want = (nc - nt).toDouble * (nc - nt) / (nc + nt)
      assert(math.abs(chi - want) <= 1e-6 && alarm == (want > 3.841459), s"chi: $chi vs $want")
    }
  }

  test("E40: the drop accountant sees watermark-dropped rows; a clean feed audits zero") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val in = MemoryStream[Ev]
    val q = EventStreams
      .windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("lda_s").outputMode("append").start()
    // batch 1: hour-10 events; batch 2: far future (advances the watermark
    // way past hour 10); batch 3: a straggler at hour 10 → DROPPED
    in.addData(Ev(1, 1, t("2024-01-01 10:00:00"), "view", 1.0),
      Ev(2, 2, t("2024-01-01 10:30:00"), "view", 1.0))
    q.processAllAvailable()
    in.addData(Ev(3, 1, t("2024-06-01 00:00:00"), "view", 1.0)); q.processAllAvailable()
    in.addData(Ev(4, 3, t("2024-01-01 10:45:00"), "view", 1.0)); q.processAllAvailable()
    val audit = EventStreams.lateDataAudit(q)
    q.stop()
    assert(audit.nonEmpty, "at least one stateful operator metered")
    assert(audit.map(_._2).sum == 1L, s"exactly the straggler drops: $audit")
    assert(audit.forall(_._4 >= 0))
    // clean in-order feed: zero drops
    val in2 = MemoryStream[Ev]
    val q2 = EventStreams
      .windowedCounts(in2.toDF())
      .writeStream.format("memory").queryName("lda_s2").outputMode("append").start()
    in2.addData(Ev(1, 1, t("2024-01-01 10:00:00"), "view", 1.0)); q2.processAllAvailable()
    in2.addData(Ev(2, 1, t("2024-01-01 11:00:00"), "view", 1.0)); q2.processAllAvailable()
    val clean = EventStreams.lateDataAudit(q2)
    q2.stop()
    assert(clean.map(_._2).sum == 0L, s"clean feed must not drop: $clean")
  }

  test("E41: streamed gaps fold to batch q186's exact integer moments on a full replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val evs = graft.core.Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("ts"), col("event_id")).collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .gapStream(in.toDS())
      .writeStream.format("memory").queryName("gap_s").outputMode("append").start()
    evs.grouped(400).foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    val streamed = spark.table("gap_s").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    q.stop()
    // batch recompute of the SAME gap table (q186's window + DIV rule)
    val batch = graft.core.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("pus",
        lag(col("us"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
      .filter(col("pus").isNotNull)
      .selectExpr("user_id", "(us - pus) DIV 1000000 AS g")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def moments(xs: Array[(Long, Long)]) = xs.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum, g.map(x => BigInt(x._2) * x._2).sum)
    }.toMap
    assert(streamed.length == batch.length, s"${streamed.length} vs ${batch.length} gaps")
    assert(moments(streamed) == moments(batch), "per-user gap moments diverge")
  }

  test("E42: per-window orphan counts flag only unknown users; totals conserve") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    val known = Seq(1L, 2L, 3L).toDF("user_id")
    // hour 1: users 1,2 + orphan 99; hour 2: user 3 twice + orphans 98, 99
    val evs = Seq(
      Ev(1, 1, hts(1, 5), "view", 1.0), Ev(2, 2, hts(1, 10), "view", 1.0),
      Ev(3, 99, hts(1, 20), "view", 1.0),
      Ev(4, 3, hts(2, 5), "view", 1.0), Ev(5, 3, hts(2, 6), "view", 1.0),
      Ev(6, 98, hts(2, 10), "view", 1.0), Ev(7, 99, hts(2, 11), "view", 1.0))
    val in = MemoryStream[Ev]
    val q = EventStreams
      .orphanStream(in.toDF(), known)
      .writeStream.format("memory").queryName("orph_s").outputMode("append").start()
    in.addData(evs.take(4): _*); q.processAllAvailable()
    in.addData(evs.drop(4): _*); q.processAllAvailable()
    in.addData(Ev(9999, 1, Timestamp.valueOf("2024-06-01 00:00:00"), "view", 1.0))
    q.processAllAvailable()
    val got = spark.table("orph_s").collect().filter(!_.getString(0).startsWith("2024-06"))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    q.stop()
    assert(got == Map(
      "2024-01-01 01" -> ((3L, 1L)),
      "2024-01-01 02" -> ((4L, 2L))), s"orphan windows: $got")
    assert(got.values.map(_._1).sum == evs.length.toLong, "totals conserve")
    // against the real snapshot, the testdata feed has zero orphans
    val users = graft.core.Tables.events(spark, Sf0001).select(col("user_id")).distinct()
    val evs2 = graft.core.Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .limit(500).collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
    val in2 = MemoryStream[Ev]
    val q2 = EventStreams
      .orphanStream(in2.toDF(), users)
      .writeStream.format("memory").queryName("orph_s2").outputMode("append").start()
    in2.addData(evs2: _*); q2.processAllAvailable()
    in2.addData(Ev(99999, evs2.head.user_id,
      Timestamp.valueOf("2030-01-01 00:00:00"), "view", 1.0))
    q2.processAllAvailable()
    val clean = spark.table("orph_s2").collect().filter(!_.getString(0).startsWith("2030"))
    q2.stop()
    assert(clean.map(_.getLong(2)).sum == 0L, "known-universe feed has no orphans")
  }

  test("E43: window mass-histogram cells sum to q181's batch histogram exactly") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.SrcDoc
    implicit val ctx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    // replay split across TWO event-time windows — the merge must still
    // reproduce the one-pass batch histogram
    val replay = corpus.select("doc_id", "text", "source").collect().zipWithIndex
      .map { case (r, i) =>
        SrcDoc(r.getLong(0), r.getString(1), r.getString(2),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      }
    val in = MemoryStream[SrcDoc]
    val q = DocStreams.massHistStream(in.toDF())
      .writeStream.format("memory").queryName("mh_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(SrcDoc(99999L, "late", "srcX", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val cells = spark.table("mh_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => (r.getString(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
    q.stop()
    val folded = cells.groupBy(_._1).view
      .mapValues(g => (g.map(_._2._1).sum, g.map(_._2._2).sum)).toMap
    val batch = corpus
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("m"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(folded == batch, s"${folded.size} folded cells vs ${batch.size} batch cells")
    // per-cell mass is n·v by construction — the histogram invariant q181 relies on
    folded.foreach { case ((_, v), (n, m)) => assert(m == n * v) }
  }

  test("E56: chained-window k-anonymity tripwire reconciles with batch per-window truth") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.SrcDoc
    implicit val ctx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val replay = corpus.select("doc_id", "text", "source").collect().zipWithIndex
      .map { case (r, i) =>
        SrcDoc(r.getLong(0), r.getString(1), r.getString(2),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      } :+ SrcDoc(600001L, "x" * 5000, "nicheFeed", // singleton QI class → at risk
        Timestamp.valueOf("2024-01-01 10:30:00"))
    val in = MemoryStream[SrcDoc]
    val q = DocStreams.kanonTripwire(in.toDF())
      .writeStream.format("memory").queryName("kanon_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(SrcDoc(99999L, "late", "srcX", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("kanon_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    q.stop()
    assert(rows.size == 2)
    // batch truth: same records, same windows, same QI grain and k rule
    val want = replay.groupBy(d => f"2024-01-01 ${d.ts.toLocalDateTime.getHour}%02d").view
      .mapValues { ds =>
        val classes = ds.groupBy(d => (d.source, d.text.length.toLong / 100))
          .values.map(_.size.toLong)
        (ds.size.toLong, classes.size.toLong,
          classes.count(_ < DocStreams.StreamKanonK).toLong,
          classes.filter(_ < DocStreams.StreamKanonK).sum)
      }.toMap
    assert(rows == want, s"stream $rows vs batch $want")
    // the planted niche doc is a singleton class — hour 10 must show risk
    assert(rows("2024-01-01 10")._3 >= 1L)
  }

  test("E57: chained-window t-closeness tripwire reconciles with batch per-window truth") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.LangDoc
    implicit val ctx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val langDist = DocStreams.langDistFrom(spark, Sf0001)
    val bigN = langDist.map(_._2).sum
    val replay = corpus.select("doc_id", "text", "lang", "source").collect().zipWithIndex
      .map { case (r, i) =>
        LangDoc(r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      } ++ Seq(
      // planted skewed class: 6 docs, one QI class, ALL in one language →
      // TVD vs the ~uniform corpus baseline far exceeds the 0.3 trip level
      // (also an unseen-language doc exercising the other-bucket term)
      (1 to 5).map(j => LangDoc(700000L + j, "y" * 5000, langDist.head._1, "nicheFeed",
        Timestamp.valueOf("2024-01-01 10:30:00"))),
      Seq(LangDoc(700006L, "y" * 5000, "zz-unseen", "nicheFeed",
        Timestamp.valueOf("2024-01-01 10:30:00")))).flatten
    val in = MemoryStream[LangDoc]
    val q = DocStreams.tclosenessTripwire(in.toDF(), langDist)
      .writeStream.format("memory").queryName("tclose_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(LangDoc(99999L, "late", "en", "srcX", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("tclose_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    q.stop()
    assert(rows.size == 2)
    // batch truth: same records, same windows, same QI grain, same integer
    // cross-multiplied TVD — stream must reproduce every column
    val baseline = langDist.toMap
    val want = replay.groupBy(d => f"2024-01-01 ${d.ts.toLocalDateTime.getHour}%02d").view
      .mapValues { ds =>
        val classes = ds.groupBy(d => (d.source, d.text.length.toLong / 100)).values.map { cs =>
          val nc = cs.size.toLong
          val numer = langDist.map { case (l, g) =>
            (BigInt(cs.count(_.lang == l)) * bigN - BigInt(g) * nc).abs
          }.sum + BigInt(cs.count(d => !baseline.contains(d.lang))) * bigN
          (nc, numer.toDouble / (2.0 * nc.toDouble * bigN.toDouble))
        }.toSeq
        (classes.map(_._1).sum, classes.size.toLong,
          classes.count(_._2 > DocStreams.StreamTclosenessT).toLong,
          classes.filter(_._2 > DocStreams.StreamTclosenessT).map(_._1).sum,
          BigDecimal(classes.map(_._2).max).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }.toMap
    assert(rows == want, s"stream $rows vs batch $want")
    // the planted one-language class must trip in hour 10
    assert(rows("2024-01-01 10")._3 >= 1L, s"planted skew not flagged: $rows")
  }

  test("E58: triple-chained-window l-diversity tripwire reconciles with batch per-window truth") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.LangDoc
    implicit val ctx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val replay = corpus.select("doc_id", "text", "lang", "source").collect().zipWithIndex
      .map { case (r, i) =>
        LangDoc(r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      } ++ // planted homogeneous class: 5 docs, one QI class, ONE language →
      // l = 1 (membership discloses the attribute), must flag in hour 10
      (1 to 5).map(j => LangDoc(800000L + j, "z" * 5000, "en", "nicheFeed",
        Timestamp.valueOf("2024-01-01 10:30:00")))
    val in = MemoryStream[LangDoc]
    val q = DocStreams.ldiversityTripwire(in.toDF())
      .writeStream.format("memory").queryName("ldiv_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(LangDoc(99999L, "late", "en", "srcX", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("ldiv_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    q.stop()
    assert(rows.size == 2)
    // batch truth: same records, same windows, same QI grain and l rule
    val want = replay.groupBy(d => f"2024-01-01 ${d.ts.toLocalDateTime.getHour}%02d").view
      .mapValues { ds =>
        val classes = ds.groupBy(d => (d.source, d.text.length.toLong / 100)).values
          .map(cs => (cs.map(_.lang).distinct.size.toLong, cs.size.toLong)).toSeq
        (ds.size.toLong, classes.size.toLong,
          classes.count(_._1 < DocStreams.StreamLdivL).toLong,
          classes.filter(_._1 < DocStreams.StreamLdivL).map(_._2).sum,
          classes.count(_._1 == 1L).toLong,
          classes.map(_._1).min)
      }.toMap
    assert(rows == want, s"stream $rows vs batch $want")
    // the planted one-language class is homogeneous — hour 10 must show it
    assert(rows("2024-01-01 10")._5 >= 1L, s"planted homogeneous class not flagged: $rows")
  }

  test("E59: chained-window SMD balance tripwire reconciles with batch per-window truth") {
    import spark.implicits._
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.Ev
    implicit val ctx = spark.sqlContext
    def hts(hr: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    val users = (1L to 40L)
    // arm of each user under the SAME hash the stream applies
    val arms = users.toDF("u")
      .select(col("u"), pmod(xxhash64(col("u")), lit(2L)).as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 'view' is organically spread; 'bonus' plants a 10x treatment-arm
    // concentration in hour 10 — the composition break E39's SRM cannot
    // see (counts stay balanced) but the SMD trip must
    val replay = users.flatMap { u =>
      Seq(
        Ev(u * 100, u, hts(10, (u % 50).toInt), "view", 3.0 + (u % 7)),
        Ev(u * 100 + 1, u, hts(11, ((u + 5) % 50).toInt), "view", 2.0 + (u % 5)),
        Ev(u * 100 + 2, u, hts(10, ((u + 3) % 50).toInt), "bonus",
          if (arms(u) == 1L) 40.0 + u else 4.0 + (u % 3)))
    }
    val in = MemoryStream[Ev]
    val q = EventStreams.smdStream(in.toDF())
      .writeStream.format("memory").queryName("smd_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(Ev(9999, 999, Timestamp.valueOf("2024-06-01 00:00:00"), "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("smd_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Boolean])))
      .toMap
    q.stop()
    assert(rows.size == 3, s"(hour 10 view, hour 10 bonus, hour 11 view): $rows")
    // batch truth: same records, same windows, same integer-cent pivot and
    // the operator's exact IEEE shapes
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = replay
      .groupBy(e => (f"2024-01-01 ${e.ts.toLocalDateTime.getHour}%02d", e.event_type))
      .view.mapValues { es =>
        val perUser = es.groupBy(_.user_id).view
          .mapValues(_.map(e => math.round(e.value * 100)).sum).toMap
        val (t, c) = perUser.partition { case (u, _) => arms(u) == 1L }
        val (nt, nc) = (t.size.toLong, c.size.toLong)
        val (sxt, sxc) = (t.values.sum, c.values.sum)
        val sxxt = t.values.map(v => BigInt(v) * v).sum
        val sxxc = c.values.map(v => BigInt(v) * v).sum
        val vt = if (nt >= 2)
          Some((nt.toDouble * sxxt.toDouble - sxt.toDouble * sxt.toDouble)
            / (nt.toDouble * (nt - 1).toDouble)) else None
        val vc = if (nc >= 2)
          Some((nc.toDouble * sxxc.toDouble - sxc.toDouble * sxc.toDouble)
            / (nc.toDouble * (nc - 1).toDouble)) else None
        val sd = for (a <- vt; b <- vc) yield math.sqrt((a + b) / 2.0)
        val smdRaw = sd.filter(_ > 0).map(s =>
          (sxt.toDouble / nt.toDouble - sxc.toDouble / nc.toDouble) / s)
        (nt, nc, smdRaw.map(r6), smdRaw.map(s => math.abs(s) > EventStreams.StreamSmdTrip))
      }.toMap
    assert(rows == want, s"stream $rows vs batch $want")
    // the planted treatment-arm concentration must trip in hour 10
    assert(rows(("2024-01-01 10", "bonus"))._4.contains(true),
      s"planted imbalance not tripped: $rows")
    // and the organic metric must carry a real (non-null) SMD readout
    assert(rows(("2024-01-01 10", "view"))._3.nonEmpty)
  }

  test("E55: chained-window dup-pair meter reconciles with batch per-window truth exactly") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    implicit val ctx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    // two event-time windows; window = the reconciliation grain
    val replay = corpus.select("doc_id", "text").collect().zipWithIndex
      .map { case (r, i) =>
        Doc(r.getLong(0), r.getString(1),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      } ++ Seq(
      // planted same-window duplicate groups: C(3,2)+C(2,2) = 4 known pairs
      Doc(500001L, "planted duplicate alpha", Timestamp.valueOf("2024-01-01 10:20:00")),
      Doc(500002L, "planted duplicate alpha", Timestamp.valueOf("2024-01-01 10:40:00")),
      Doc(500003L, "planted duplicate alpha", Timestamp.valueOf("2024-01-01 10:50:00")),
      Doc(500004L, "planted duplicate beta", Timestamp.valueOf("2024-01-01 11:20:00")),
      Doc(500005L, "planted duplicate beta", Timestamp.valueOf("2024-01-01 11:40:00")))
    val in = MemoryStream[Doc]
    val q = DocStreams.dupPairsStream(in.toDF())
      .writeStream.format("memory").queryName("dp_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(Doc(99999L, "late watermark pusher", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("dp_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    q.stop()
    assert(rows.size == 2, s"expected both windows closed, got ${rows.keySet}")
    // batch truth: same records grouped by the same windows, q219's math
    import graft.operators.TrainingOps.DupEstPct
    val scale = (100L / DupEstPct) * (100L / DupEstPct)
    val want = replay.groupBy(d => f"2024-01-01 ${d.ts.toLocalDateTime.getHour}%02d").view
      .mapValues { ds =>
        val byHash = ds.groupBy(d => java.security.MessageDigest.getInstance("MD5")
          .digest(d.text.getBytes("UTF-8")).toSeq)
        val flags = spark.createDataset(ds.map(_.doc_id).toSeq).toDF("doc_id")
          .select(col("doc_id"),
            when(pmod(xxhash64(col("doc_id")), lit(100)) < DupEstPct, 1L).otherwise(0L).as("s"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val ks = byHash.values.map { g =>
          (g.size.toLong, g.map(d => flags(d.doc_id)).sum)
        }
        val dp  = ks.map { case (k, _) => k * (k - 1) / 2 }.sum
        val sdp = ks.map { case (_, s) => s * (s - 1) / 2 }.sum
        (ds.size.toLong, ks.map(_._2).sum, dp, sdp, sdp * scale)
      }.toMap
    assert(rows == want, s"stream $rows vs batch $want")
    // the planted groups guarantee visible pairs: C(3,2) in hour 10 + C(2,2) in hour 11
    assert(rows.values.map(_._3).sum >= 4, "expected at least the 4 planted dup pairs")
  }

  test("E54: streaming audio monitor reconciles with the batch audio kernel exactly") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.TsMedia
    import graft.operators.Multimodal
    implicit val ctx = spark.sqlContext
    // shared WAV fixtures (WavFixtures — same bytes MultimodalAudioSpec tests):
    // quiet square (silent), loud square, near-full-scale (clipped), text
    import WavFixtures.wav16
    val quiet   = wav16(Array.tabulate(128)(i => if (i % 2 == 0) 16 else -16)) // rms 16/32768 < 0.001
    val loud    = wav16(Array.tabulate(128)(i => if (i % 2 == 0) 8192 else -8192))
    val clipped = wav16(Array.tabulate(128)(i => if (i % 2 == 0) 32760 else -32760))
    val text    = "not audio".getBytes("UTF-8")
    val t1 = Timestamp.valueOf("2024-01-01 10:15:00")
    val t2 = Timestamp.valueOf("2024-01-01 11:15:00")
    val recs = Seq(
      TsMedia(1L, quiet, "feedA", t1), TsMedia(2L, loud, "feedA", t1),
      TsMedia(3L, clipped, "feedA", t2), TsMedia(4L, text, "feedA", t2),
      TsMedia(5L, loud, "feedB", t1))
    val in = MemoryStream[TsMedia]
    val q = DocStreams.audioMonitor(in.toDS())
      .writeStream.format("memory").queryName("audio_s").outputMode("append").start()
    in.addData(recs: _*); q.processAllAvailable()
    in.addData(TsMedia(99L, text, "feedA", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("audio_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => (r.getString(1), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    q.stop()
    // fold windows per source — counts and quantized sums are additive
    val folded = rows.groupBy(_._1).view.mapValues { g =>
      (g.map(_._2._1).sum, g.map(_._2._2).sum, g.map(_._2._3).sum,
        g.map(_._2._4).sum, g.map(_._2._5).sum)
    }.toMap
    // batch truth through the SAME kernel
    val want = recs.groupBy(_.source).view.mapValues { ms =>
      val feats = ms.map(m => Multimodal.decodeAudio(m.payload).map(d => Multimodal.audioFeatures(d._3)))
      val dec = feats.flatten
      (ms.size.toLong, dec.size.toLong,
        dec.count(f => Math.round(f(1) * 1000000) < 1000L).toLong,
        dec.count(f => Math.round(f(2) * 1000000) >= 999000L).toLong,
        dec.map(f => Math.round(f(1) * 1000000)).sum)
    }.toMap
    assert(folded == want, s"stream $folded vs batch $want")
    // and the fixtures hit the intended verdicts: 1 silent + 1 clipped on feedA
    assert(folded("feedA")._3 == 1L && folded("feedA")._4 == 1L)
    assert(folded("feedA")._2 == 3L && folded("feedA")._1 == 4L) // text payload not decoded
  }

  test("E53: conformal-coverage monitor reconciles with batch counts on the same docs") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    implicit val ctx = spark.sqlContext
    // thresholds calibrated by batch q216 on the snapshot (published exactly —
    // the order statistic is a data value, so stream and batch gate on the
    // identical double)
    val thr = DocStreams.conformalThresholds(spark, Sf0001)
    assert(thr.map(_._1) == graft.operators.StatsOps.ConformalAlphas,
      s"expected one threshold per alpha, got $thr")
    // thresholds are monotone in alpha: smaller miscoverage → larger threshold
    assert(thr.map(_._2) == thr.map(_._2).sorted.reverse)
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val replay = corpus.select("doc_id", "text").collect().zipWithIndex
      .map { case (r, i) =>
        Doc(r.getLong(0), r.getString(1),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      }
    val in = MemoryStream[Doc]
    val q = DocStreams.conformalMonitor(in.toDF(), thr)
      .writeStream.format("memory").queryName("conf_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(Doc(99999L, "late watermark pusher", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("conf_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => (r.getDouble(1), (r.getLong(3), r.getLong(4))))
    q.stop()
    // two windows per alpha, integer counts ADDITIVE across windows
    assert(rows.length == 2 * thr.size)
    val folded = rows.groupBy(_._1).view
      .mapValues(g => (g.map(_._2._1).sum, g.map(_._2._2).sum)).toMap
    // batch truth: the same shared score expression against the same
    // published thresholds over the same documents
    val scores = corpus
      .select((graft.operators.TextOps.stopCountExpr /
        size(graft.operators.TextOps.toks)).as("v"))
      .collect().map(_.getDouble(0))
    thr.foreach { case (a, t) =>
      val (nDocs, nWithin) = folded(a)
      assert(nDocs == scores.length.toLong, s"alpha $a saw $nDocs docs")
      assert(nWithin == scores.count(_ <= t).toLong, s"alpha $a within-count")
    }
  }

  test("E52: window HT envelopes sum to batch q210's per-source sums exactly") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.SrcDoc
    implicit val ctx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    // replay split across TWO event-time windows — element-wise summing
    // the closed-window envelopes must reproduce batch q210's integer
    // sums exactly (the additive-envelope reconciliation contract)
    val replay = corpus.select("doc_id", "text", "source").collect().zipWithIndex
      .map { case (r, i) =>
        SrcDoc(r.getLong(0), r.getString(1), r.getString(2),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      }
    val in = MemoryStream[SrcDoc]
    val q = DocStreams.htStream(in.toDF())
      .writeStream.format("memory").queryName("ht_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(SrcDoc(99999L, "late watermark pusher", "srcX",
      Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("ht_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        BigDecimal(r.getDecimal(5)), BigDecimal(r.getDecimal(6))))
    q.stop()
    val folded = rows.groupBy(_._1).view.mapValues { g =>
      (g.map(_._2._1).sum, g.map(_._2._2).sum, g.map(_._2._3).sum,
        g.map(_._2._4).sum, g.map(_._2._5).sum)
    }.toMap
    // batch truth through the SAME kernel (q210's aggregate, pre-derivation)
    val batch = graft.operators.TrainingOps.htEstimator(spark, Sf0001)
    // re-derive the raw integer sums from the batch op's own inputs
    val base = corpus.select(col("doc_id"), col("source"),
      col("n_chars").cast("long").as("n_chars"),
      size(graft.operators.TextOps.toks).cast("long").as("n_tok"))
    val want = base
      .select((base.columns.map(col) ++ graft.operators.TrainingOps.htInclusionCols): _*)
      .groupBy(col("source"))
      .agg(graft.operators.TrainingOps.htEnvelopeAggs.head,
        graft.operators.TrainingOps.htEnvelopeAggs.tail: _*)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        BigDecimal(r.getDecimal(4)), BigDecimal(r.getDecimal(5)))).toMap
    assert(folded == want, s"${folded.size} folded sources vs ${want.size} batch")
    // and the batch q210 derivation agrees on the sampled counts
    val audit = batch.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    folded.foreach { case (src, (_, _, nSamp, _, _)) => assert(audit(src) == nSamp) }
  }

  test("E44: streamed shard routing is bit-equal to batch q170's epoch-0 assignment") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    implicit val ctx = spark.sqlContext
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), Timestamp.valueOf("2024-01-01 10:00:00")))
    val in = MemoryStream[Doc]
    val q = DocStreams.shardRouter(in.toDF())
      .writeStream.format("memory").queryName("route_s").outputMode("append").start()
    in.addData(docs.toSeq: _*); q.processAllAvailable()
    val routed = spark.table("route_s").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    q.stop()
    val batch = graft.operators.TrainingOps.epochShuffle(spark, Sf0001).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(routed.size == batch.size)
    batch.foreach { case (doc, shard) =>
      assert(routed(doc)._1 == shard, s"doc $doc routed to ${routed(doc)._1}, batch $shard")
    }
    // the carried hash defines the same in-shard order as batch pos
    val posBatch = graft.operators.TrainingOps.epochShuffle(spark, Sf0001).collect()
      .filter(_.getLong(0) == 0L).map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    posBatch.groupBy(_._1).foreach { case (shard, rows) =>
      val byPos  = rows.sortBy(_._3).map(_._2).toSeq
      val byHash = rows.map(_._2).sortBy(d => (routed(d)._2, d)).toSeq
      assert(byPos == byHash, s"in-shard order diverges for shard $shard")
    }
  }

  test("E35: closed-session paths match a batch replay and emit exactly once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: click>view>purchase>error (4th event beyond PathLen=3),
    // then a fresh session view; user 2: one lone signup session
    val all = Seq(
      Ev(1, 1, t("2024-01-01 10:00:00"), "click", 1.0),
      Ev(2, 1, t("2024-01-01 10:05:00"), "view", 1.0),
      Ev(3, 1, t("2024-01-01 10:10:00"), "purchase", 1.0),
      Ev(4, 1, t("2024-01-01 10:15:00"), "error", 1.0),
      Ev(5, 1, t("2024-01-01 12:00:00"), "view", 1.0),
      Ev(6, 2, t("2024-01-01 09:00:00"), "signup", 1.0))
    val (b1, b2) = all.partition(_.event_id <= 2)
    val in       = MemoryStream[Ev]
    val q = EventStreams
      .sessionPathStream(in.toDS())
      .writeStream.format("memory").queryName("sp_s").outputMode("append").start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(
      Ev(9998, 1, t("2024-06-01 00:00:00"), "click", 1.0),
      Ev(9999, 2, t("2024-06-01 00:00:00"), "click", 1.0))
    q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    val got = spark.table("sp_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    q.stop()
    // far-future closers each open their own session; drop those rows
    val real = got.filter { case (u, sid, _) => !(sid == 3 && u == 1) && !(sid == 2 && u == 2) }
    assert(real.toSet == Set(
      (1L, 1L, "click>view>purchase"), // 4th event truncated at PathLen
      (1L, 2L, "view"),
      (2L, 1L, "signup")), s"paths: ${got.toSeq}")
    assert(real.length == real.toSet.size, "exactly-once emission")
    // batch reconciliation: the streamed paths grouped by path equal the
    // q110 pre-top-k per-session paths on the same data
    val dir = java.nio.file.Files.createTempDirectory("e35spec").toString
    all.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.TimeJoins.sessionPaths(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamed = real.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    assert(streamed == batch, s"path counts: $streamed vs $batch")
  }

  test("E36: closed-session conversion envelopes match q133's counters on the same events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // user 1 s1: view→purchase (600 s); s2: purchase BEFORE view → no conversion
    // user 2 s1: purchase and view at the SAME µs, purchase has the smaller
    //            event_id (processed first) — q133's `us >= vu` still counts it
    // user 3 s1: click only — no view
    val all = Seq(
      Ev(1, 1, t("2024-01-01 10:00:00"), "view", 1.0),
      Ev(2, 1, t("2024-01-01 10:10:00"), "purchase", 1.0),
      Ev(3, 1, t("2024-01-01 13:00:00"), "purchase", 1.0),
      Ev(4, 1, t("2024-01-01 13:05:00"), "view", 1.0),
      Ev(5, 2, t("2024-01-01 09:00:00"), "purchase", 1.0),
      Ev(6, 2, t("2024-01-01 09:00:00"), "view", 1.0),
      Ev(7, 3, t("2024-01-01 09:30:00"), "click", 1.0))
    val (b1, b2) = all.partition(_.event_id <= 2)
    val in       = MemoryStream[Ev]
    val q = EventStreams
      .conversionStream(in.toDS())
      .writeStream.format("memory").queryName("conv_s").outputMode("append").start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(
      Ev(9997, 1, t("2024-06-01 00:00:00"), "click", 1.0),
      Ev(9998, 2, t("2024-06-01 00:00:00"), "click", 1.0),
      Ev(9999, 3, t("2024-06-01 00:00:00"), "click", 1.0))
    q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    val got = spark.table("conv_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getLong(4)))
    q.stop()
    // far-future closers each open their own (viewless) session; drop them
    val real = got.filterNot { case (_, sid, _, _, _) => sid >= 2 } ++
      got.filter { case (u, sid, _, _, _) => u == 1 && sid == 2 }
    assert(real.toSet == Set(
      (1L, 1L, true, true, 600L),
      (1L, 2L, true, false, -1L),
      (2L, 1L, true, true, 0L),
      (3L, 1L, false, false, -1L)), s"envelopes: ${got.toSeq}")
    assert(real.length == real.toSet.size, "exactly-once emission")
    // batch reconciliation: aggregating the feed reproduces q133 exactly
    val dir = java.nio.file.Files.createTempDirectory("e36spec").toString
    all.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val b = graft.operators.TimeJoins.conversionLatency(spark, dir).collect().head
    assert(b.getLong(0) == real.length.toLong, "n_sessions")
    assert(b.getLong(1) == real.count(_._3).toLong, "n_with_view")
    assert(b.getLong(2) == real.count(_._4).toLong, "n_converted")
    val lat = real.filter(_._4).map(_._5).sorted
    def ord(p: Double) = lat(math.ceil(p * lat.length).toInt - 1)
    assert(b.getLong(4) == ord(0.5) && b.getLong(5) == ord(0.9), s"order stats: $b")
  }

  test("E37: closed SCD2 intervals equal batch q169's non-current rows and emit exactly once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String)  = Timestamp.valueOf(s)
    def us(s: String) = t(s).getTime * 1000L
    // q169's planted history: u1 view,view → purchase → view; u2 lone click
    val all = Seq(
      Ev(1, 1, t("2024-01-01 10:00:00"), "view", 1.0),
      Ev(2, 1, t("2024-01-01 10:05:00"), "view", 1.0),
      Ev(3, 1, t("2024-01-01 10:10:00"), "purchase", 1.0),
      Ev(4, 1, t("2024-01-01 10:20:00"), "view", 1.0),
      Ev(5, 2, t("2024-01-01 09:00:00"), "click", 1.0))
    val (b1, b2) = all.partition(_.event_id <= 2)
    val in       = MemoryStream[Ev]
    val q = EventStreams
      .scd2Stream(in.toDS())
      .writeStream.format("memory").queryName("scd2_s").outputMode("append").start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val got = spark.table("scd2_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
    q.stop()
    assert(got.toSet == Set(
      (1L, 1L, "view", us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"), 2L, false),
      (1L, 2L, "purchase", us("2024-01-01 10:10:00"), us("2024-01-01 10:20:00"), 1L, false)),
      s"closed intervals: ${got.toSeq}")
    assert(got.length == got.toSet.size, "exactly-once emission")
    // sf0.001 replay in (ts, event_id) order across batches: the streamed
    // closed intervals ARE batch q169 minus its is_current rows
    val evs = graft.core.Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("ts"), col("event_id")).collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
    val in2 = MemoryStream[Ev]
    val q2 = EventStreams
      .scd2Stream(in2.toDS())
      .writeStream.format("memory").queryName("scd2_sf").outputMode("append").start()
    evs.grouped(400).foreach { chunk => in2.addData(chunk: _*); q2.processAllAvailable() }
    val streamed = spark.table("scd2_sf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toSet
    q2.stop()
    val batch = graft.operators.TimeJoins.scd2Compaction(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
      .filterNot(_._7).toSet
    assert(streamed == batch,
      s"stream≡batch: ${streamed.size} streamed vs ${batch.size} batch; " +
        s"diff ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
  }

  test("E47: streaming reservoir equals batch q192 at every prefix (complete mode)") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.StratDoc
    implicit val ctx = spark.sqlContext
    val rows = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "lang", "source").collect()
      .map(r => StratDoc(r.getLong(0), r.getString(1), r.getString(2),
        Timestamp.valueOf("2024-01-01 10:00:00")))
    val (b1, b2) = rows.partition(_.doc_id % 2 == 0)
    def shape(a: Array[org.apache.spark.sql.Row]) =
      a.map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    val in = MemoryStream[StratDoc]
    val q = DocStreams.reservoirStream(in.toDF())
      .writeStream.format("memory").queryName("resv_s").outputMode("complete").start()
    in.addData(b1.toSeq: _*); q.processAllAvailable()
    val half = shape(spark.table("resv_s").collect())
    // content-stable draw: the prefix reservoir IS the batch sample of the prefix
    val halfBatch = shape(graft.operators.TrainingOps.reservoirOf(b1.toSeq.toDF()).collect())
    assert(half == halfBatch, "half-corpus stream reservoir != batch reservoir of the same docs")
    in.addData(b2.toSeq: _*); q.processAllAvailable()
    val full = shape(spark.table("resv_s").collect())
    q.stop()
    val fullBatch = shape(graft.operators.TrainingOps.reservoirSample(spark, Sf0001).collect())
    assert(full == fullBatch, "full-corpus stream reservoir != batch q192")
    // and the reservoir actually evolved between the two points
    assert(half != full)
  }

  test("E48: DP release emits noisy counts exactly once, equal to the batch recompute") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(x: String) = Timestamp.valueOf(x)
    val evs = Seq(
      Ev(1, 1, t("2024-01-01 10:05:00"), "click", 1.0),
      Ev(2, 2, t("2024-01-01 10:25:00"), "click", 1.0),
      Ev(3, 1, t("2024-01-01 10:40:00"), "view", 1.0),
      Ev(4, 3, t("2024-01-01 11:10:00"), "click", 1.0),
      Ev(5, 2, t("2024-01-01 11:30:00"), "view", 1.0))
    val (b1, b2) = evs.partition(_.event_id <= 3)
    val in = MemoryStream[Ev]
    val q = EventStreams.dpReleaseStream(in.toDF(), eps = 1.0)
      .writeStream.format("memory").queryName("dp_s").outputMode("append").start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(Ev(99, 9, t("2024-06-01 00:00:00"), "click", 1.0)); q.processAllAvailable()
    in.addData(); q.processAllAvailable()
    // release schema carries NO raw count column (the DP property the
    // scaladoc claims: consumers only ever see noisy_c)
    assert(spark.table("dp_s").columns.toSeq == Seq("w_start", "event_type", "noisy_c"))
    val got = spark.table("dp_s").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    q.stop()
    val closed = got.filter(_._1.before(t("2024-06-01 00:00:00")))
    // exactly once per (window, type)
    assert(closed.map(x => (x._1, x._2)).distinct.length == closed.length)
    // equal to the batch recompute through the SAME shared noise kernel
    import graft.operators.CurationOps
    val batchRows = evs.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c_true"))
      .withColumn("u", CurationOps.hashUniform("xxhash64(event_type, cast(window.start as long))"))
      .withColumn("noise", CurationOps.lapNoise("u", 1.0))
      .select(col("window.start"), col("event_type"), col("c_true"),
        round(col("c_true") + col("noise"), 6).as("noisy_c"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(closed.toSet == batchRows.map(x => (x._1, x._2, x._4)).toSet,
      s"stream release != batch recompute")
    // noise is real (some release differs from its true count)
    val trueByCell = batchRows.map(x => ((x._1, x._2), x._3)).toMap
    assert(closed.exists(x => x._3 != trueByCell((x._1, x._2)).toDouble))
  }

  test("E49: streamed media chunks EQUAL the batch D6 chunk grain (shared byte kernel)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRecord
    val rng  = new scala.util.Random(11)
    val recs = (1L to 20L).map { id =>
      MediaRecord(id, Array.fill(1024 + rng.nextInt(2048))(rng.nextInt(256).toByte),
        "image/fake", 64, 64, s"src${id % 3}")
    }
    val batch = Multimodal.mediaChunks(spark.createDataset(recs)).collect()
      .map(c => (c.media_id, c.chunk_idx, c.h, c.clen)).sorted.toSeq
    val in = MemoryStream[MediaRecord]
    val st = graft.streaming.DocStreams.mediaChunkStream(in.toDS())
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("mm_chunker").outputMode("append").start()
    val (b1, b2) = recs.partition(_.media_id <= 10)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val rows = spark.table("mm_chunker").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3))).sorted.toSeq
    q.stop()
    assert(rows == batch, s"streamed media chunk grain diverged (${rows.size} vs ${batch.size})")
  }

  test("E50: streaming contamination gate flags exactly q39's contaminated docs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    import graft.operators.TrainingOps
    val bench = DocStreams.benchGramSet(spark, Sf0001)
    assert(bench.nonEmpty, "benchmark gram set is empty — the gate would be vacuous")
    val feed = graft.core.Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % TrainingOps.BenchEvery =!= 0)
      .select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), Timestamp.valueOf("2024-01-01 10:00:00")))
    val in = MemoryStream[Doc]
    val st = DocStreams.contaminationGate(in.toDF(), bench)
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("contam_s").outputMode("append").start()
    val (b1, b2) = feed.partition(_.doc_id % 3 == 0)
    in.addData(b1.toSeq: _*); q.processAllAvailable()
    in.addData(b2.toSeq: _*); q.processAllAvailable()
    val rows = spark.table("contam_s").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getBoolean(3)))
    q.stop()
    assert(rows.length == feed.length)
    val flagged = rows.filter(_._3).map(_._1).toSet
    // the batch evidence: q39's pair table, collapsed to its corpus docs
    val batch = TrainingOps.decontaminate(spark, Sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(flagged == batch,
      s"gate flagged ${flagged.size} docs, batch q39 pairs ${batch.size}")
    // evidence counts agree with the flag on every row
    rows.foreach { case (id, ns, c) => assert((ns > 0) == c, s"doc $id: n_shared=$ns flag=$c") }
  }

  test("E64: contamination severity sweep grades exactly q205's per-grain contaminated docs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    import graft.operators.TrainingOps
    val benchByN = DocStreams.benchGramSets(spark, Sf0001)
    assert(TrainingOps.SweepNs.forall(n => benchByN(n).nonEmpty), "empty grain store")
    val feed = graft.core.Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % TrainingOps.BenchEvery =!= 0)
      .select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), Timestamp.valueOf("2024-01-01 10:00:00")))
    val in = MemoryStream[Doc]
    val st = DocStreams.contaminationSweepGate(in.toDF(), benchByN)
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("sweep_s").outputMode("append").start()
    in.addData(feed.toSeq: _*); q.processAllAvailable()
    val rows = spark.table("sweep_s").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))
    q.stop()
    assert(rows.length == feed.length)
    // severity is exactly the longest grain with evidence
    rows.foreach { case (id, n4, n8, n13, sev) =>
      val want =
        if (n13 > 0) "verbatim" else if (n8 > 0) "strong" else if (n4 > 0) "weak" else "clean"
      assert(sev == want, s"doc $id: ($n4,$n8,$n13) -> $sev")
    }
    // per-grain flagged counts equal batch q205's n_contaminated
    val sweep = TrainingOps.contaminationSweep(spark, Sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rows.count(_._2 > 0).toLong == sweep(4), "4-gram grain")
    assert(rows.count(_._3 > 0).toLong == sweep(8), "8-gram grain")
    assert(rows.count(_._4 > 0).toLong == sweep(13), "13-gram grain")
  }

  test("E65: semantic gate flags exactly the batch pair pool's train-side candidates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Vec
    import graft.operators.{TrainingOps, VectorOps}
    val (store, planes) = DocStreams.evalLshStore(spark, Sf0001)
    assert(store.nonEmpty, "eval store empty")
    assert(planes == VectorOps.nearDupPlanesFor(spark, Sf0001))
    // the incoming stream: every TRAIN-split corpus vector
    val splits = graft.core.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"),
        TrainingOps.splitNameCol(TrainingOps.splitBucketCol(col("vec_id"))).as("split"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val feed = splits.filter(col("split") === "train")
      .select("vec_id", "v").collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Double](1),
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
    val in = MemoryStream[Vec]
    val st = DocStreams.semanticLeakGate(in.toDF(), store, planes)
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("sem_s").outputMode("append").start()
    in.addData(feed.toSeq: _*); q.processAllAvailable()
    val rows = spark.table("sem_s").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
        r.getBoolean(5)))).toMap
    q.stop()
    assert(rows.size == feed.length)
    // batch ground truth: the SAME pair pool q212 consumes, oriented to
    // the train side (bucket sampling never engages at this corpus size)
    val splitOf = splits.select("vec_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = VectorOps
      .nearDupPairsRaw(spark, VectorOps.emb(spark, Sf0001), planes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byTrain = pairs.flatMap { case (a, b, s) =>
      Seq((a, b, s), (b, a, s)).collect {
        case (t, e, sim) if splitOf(t) == "train" && splitOf(e) != "train" => t -> ((e, sim))
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    feed.foreach { vec =>
      val got = rows(vec.vec_id)
      byTrain.get(vec.vec_id) match {
        case None =>
          assert(got._1 == 0L && got._2 == -1L && got._3.isNaN && !got._4,
            s"vec ${vec.vec_id}: expected clean, got $got")
        case Some(cands) =>
          val ms   = cands.map(_._2).max
          val best = cands.filter(_._2 == ms).map(_._1).min
          assert(got._1 == cands.length.toLong, s"vec ${vec.vec_id}: cand count")
          assert(got._2 == best, s"vec ${vec.vec_id}: best eval")
          assert(got._3 == r4(ms), s"vec ${vec.vec_id}: best sim")
          assert(got._4 == (ms >= VectorOps.SemLeakThreshold), s"vec ${vec.vec_id}: verdict")
      }
    }
    // the reconciliation is non-vacuous: some vector is actually flagged
    assert(rows.values.exists(_._1 > 0), "no train-side candidates at all — dead spec")
  }

  test("E66: chained-window occupancy tripwire reconciles with batch per-window truth exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Vec
    import graft.operators.{TextOps, VectorOps}
    val planes = VectorOps.nearDupPlanesFor(spark, Sf0001)
    val base = graft.core.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    // hour 10: even ids + a planted 1100-copy flood (trips the over-cap
    // counter in every table) + a zero vector (must be dropped);
    // hour 11: odd ids
    val h10 = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    val h11 = java.sql.Timestamp.valueOf("2024-01-01 11:15:00")
    val flood = (0 until TextOps.MaxBucket + 100).map(i =>
      Vec(1000000L + i, Seq.tabulate(64)(d => (d + 1).toDouble), h10))
    val replay = base.map { case (id, v) => Vec(id, v, if (id % 2 == 0) h10 else h11) } ++
      flood :+ Vec(999999L, Seq.fill(64)(0.0), h10)
    val in = MemoryStream[Vec]
    val q = DocStreams.occupancyTripwire(in.toDF(), planes)
      .writeStream.format("memory").queryName("occ_s").outputMode("append").start()
    in.addData(replay: _*); q.processAllAvailable()
    in.addData(Vec(999998L, Seq.fill(64)(0.5), java.sql.Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("occ_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7), r.getLong(8))))
      .toMap
    q.stop()
    // batch truth: buckets from the SHARED kernel (one batch projection),
    // the home + hamming-1 probe emission, window grouping, and the
    // rollup arithmetic recomputed driver-side
    import graft.functions.Expressions.{hyperplane_bucket, l2_norm}
    val tables = VectorOps.nearDupTablesFor(planes)
    val tblCols = (0 until tables)
      .map(t => hyperplane_bucket(col("v"), t, planes).as(s"b$t"))
    val live = replay.filter(v => v.ts.toString.startsWith("2024-01-01 1")).toSeq
    val bkts = live.toDF()
      .withColumn("nrm", l2_norm(col("v"))).filter(col("nrm") > 0)
      .select(Seq(col("vec_id"), date_format(col("ts"), "yyyy-MM-dd HH").as("hour")) ++ tblCols: _*)
      .collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (for {
      r <- bkts.toSeq
      t <- 0 until tables
      (bkt, home) <- {
        val hb = r.getInt(2 + t)
        (hb, true) +: (0 until planes).map(p => (hb ^ (1 << p), false))
      }
    } yield ((r.getString(1), t), (bkt, home)))
      .groupBy(_._1)
      .map { case ((hour, t), cells) =>
        val byB = cells.map(_._2).groupBy(_._1).values
        val nbs = byB.map(_.size.toLong).toSeq
        val nh  = byB.map(_.count(_._2).toLong).sum
        (hour, t) -> ((planes, nbs.size.toLong, nbs.sum, nh, nbs.max,
          r6(nbs.sum.toDouble / nbs.size.toDouble),
          nbs.count(_ > TextOps.MaxBucket).toLong))
      }
    assert(rows == want, s"stream $rows vs batch $want")
    // the flood trips the over-cap counter in every hour-10 table row
    (0 until tables).foreach { t =>
      assert(rows(("2024-01-01 10", t))._7 >= 1L, s"table $t: flood not flagged")
    }
  }

  test("E67: streaming recall canary reconciles with batch q251 exactly on the same records") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Vec
    import graft.operators.VectorOps
    val (store, planes) = DocStreams.recallProbeStore(spark, Sf0001)
    assert(store.size <= VectorOps.EmbedRecallProbes && store.nonEmpty)
    assert(planes == VectorOps.nearDupPlanesFor(spark, Sf0001))
    // replay the WHOLE corpus into one window (+ a zero vector that must
    // pass clean and a late row to close the window)
    val h10 = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    val feed = graft.core.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .collect().map(r => Vec(r.getLong(0), r.getSeq[Double](1), h10)) :+
      Vec(999999L, Seq.fill(64)(0.0), h10)
    val in = MemoryStream[Vec]
    val q = DocStreams.recallCanary(in.toDF(), store, planes)
      .writeStream.format("memory").queryName("recall_s").outputMode("append").start()
    in.addData(feed.toSeq: _*); q.processAllAvailable()
    in.addData(Vec(999998L, Seq.fill(64)(0.5), java.sql.Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("recall_s").collect()
      .filter(_.getString(0) == "2024-01-01 10")
      .map(r => r.getDouble(1) -> ((r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
        r.getInt(5), r.getInt(6)))).toMap
    q.stop()
    // batch q251 on the same corpus: every grid threshold's n_true /
    // n_caught must agree EXACTLY (the probe-store buckets never hit the
    // batch side's over-cap sampling at this corpus size); a no-truth
    // threshold emits the same (0, 0, NULL-recall) row q251 does
    val batch = VectorOps.embedRecallProbe(spark, Sf0001).collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.keySet == batch.keySet, s"threshold grids differ: ${rows.keySet}")
    batch.foreach { case (th, (nTrue, nCaught)) =>
      val got = rows(th)
      assert(got._1 == nTrue, s"threshold $th: n_true ${got._1} vs batch $nTrue")
      assert(got._2 == nCaught, s"threshold $th: n_caught ${got._2} vs batch $nCaught")
      if (nTrue == 0L) assert(got._3.isNaN, s"threshold $th: recall must be NULL")
      else assert(got._3 == r6(nCaught.toDouble / nTrue.toDouble), s"threshold $th: recall")
      assert(got._4 == planes && got._5 == VectorOps.nearDupTablesFor(planes))
    }
    // non-vacuous: the gate threshold has live truth pairs and catches
    assert(rows.values.exists(_._2 > 0), "dead canary")
  }

  test("E63: chained-window HHI tripwire reconciles with batch per-window truth exactly") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.SrcDoc
    implicit val ctx = spark.sqlContext
    // hour 10: balanced 3 sources; hour 11: one source floods (the trip)
    val replay = (0 until 12).map(i =>
      SrcDoc(i.toLong, s"doc $i", s"s${i % 3}", Timestamp.valueOf("2024-01-01 10:15:00"))) ++
      (12 until 24).map(i =>
        SrcDoc(i.toLong, s"doc $i", if (i < 22) "flood" else s"s${i % 2}",
          Timestamp.valueOf("2024-01-01 11:15:00")))
    val in = MemoryStream[SrcDoc]
    val q = DocStreams.hhiTripwire(in.toDF())
      .writeStream.format("memory").queryName("hhi_s").outputMode("append").start()
    in.addData(replay: _*); q.processAllAvailable()
    in.addData(SrcDoc(999L, "late", "s0", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("hhi_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getString(5), r.getDouble(6))).toMap
    q.stop()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = replay.groupBy(d => f"2024-01-01 ${d.ts.toLocalDateTime.getHour}%02d")
      .map { case (hour, ds) =>
        val cs = ds.groupBy(_.source).view.mapValues(_.size.toLong).toMap
        val t = cs.values.sum
        val s2 = cs.values.map(c => c.toDouble * c).sum
        val (topSrc, topC) = cs.toSeq.map(_.swap).max.swap
        hour -> (t, cs.size.toLong, r6(s2 / (t.toDouble * t)),
          r6((t.toDouble * t) / s2), topSrc, r6(topC.toDouble / t))
      }
    assert(rows == want, s"stream $rows vs batch $want")
    // the flood window trips: HHI jumps and the flooding source dominates
    assert(rows("2024-01-01 11")._3 > rows("2024-01-01 10")._3 + 0.3)
    assert(rows("2024-01-01 11")._5 == "flood" && rows("2024-01-01 11")._6 > 0.8)
  }

  test("E62: chained-window Brier monitor reconciles with batch per-window truth exactly") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    implicit val ctx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    val replay = corpus.select("doc_id", "text").collect().zipWithIndex
      .map { case (r, i) =>
        Doc(r.getLong(0), r.getString(1),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      } ++ Seq(
      Doc(700001L, "brier copy gamma delta", Timestamp.valueOf("2024-01-01 10:20:00")),
      Doc(700002L, "brier copy gamma delta", Timestamp.valueOf("2024-01-01 10:40:00")),
      Doc(700003L, "the a an and of to in is", Timestamp.valueOf("2024-01-01 11:20:00")),
      Doc(700004L, "the a an and of to in is", Timestamp.valueOf("2024-01-01 11:40:00")))
    val in = MemoryStream[Doc]
    val q = DocStreams.brierTripwire(in.toDF())
      .writeStream.format("memory").queryName("br_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(Doc(99998L, "late watermark pusher", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("br_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    q.stop()
    assert(rows.size == 2)
    val stops = Set("the", "a", "an", "and", "of", "to", "in", "is")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def micro(x: Double) = BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = replay
      .groupBy(d => f"2024-01-01 ${d.ts.toLocalDateTime.getHour}%02d")
      .map { case (hour, ds) =>
        val copies = ds.groupBy(_.text).view.mapValues(_.size.toLong).toMap
        val per = ds.map { d =>
          val toks = d.text.trim.split("\\s+")
          val v = toks.count(stops).toDouble / toks.length
          val s = micro(v * 1000000.0)
          val y = if (copies(d.text) >= 2L) 1000000L else 0L
          (copies(d.text), (s - y) * (s - y))
        }
        val n = per.size.toLong
        val d = per.count(_._1 >= 2L).toLong
        val serr = per.map(x => BigInt(x._2)).sum
        hour -> (n, d, r6(d.toDouble / n), r6(serr.toDouble / 1.0e12 / n))
      }
    assert(rows == want, s"stream $rows vs batch $want")
  }

  test("E61: chained-window MDE monitor reconciles with batch per-window truth exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // two windows; 6 users with repeat events, one metric
    val evs = (0 until 24).map { i =>
      Ev(i.toLong, (i % 6).toLong + 1L,
        Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:${10 + i % 40}%02d:00"),
        "buy", (i % 7 + 1).toDouble)
    }
    val in = MemoryStream[Ev]
    val q = EventStreams.mdeStream(in.toDF())
      .writeStream.format("memory").queryName("mde_s").outputMode("append").start()
    in.addData(evs: _*); q.processAllAvailable()
    in.addData(Ev(999L, 1L, Timestamp.valueOf("2024-01-01 20:00:00"), "buy", 1.0))
    q.processAllAvailable()
    val rows = spark.table("mde_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    q.stop()
    assert(rows.nonEmpty)
    val arms = spark.range(1, 7).select(col("id"), pmod(xxhash64(col("id")), lit(2L)).as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val zsum = graft.operators.StatsOps.ZAlphaTwoSided + graft.operators.StatsOps.ZPower80
    val want = evs.groupBy(e => f"2024-01-01 ${e.ts.toLocalDateTime.getHour}%02d")
      .map { case (hour, es) =>
        val byUser = es.groupBy(_.user_id).view
          .mapValues(_.map(e => math.round(e.value * 100)).sum).toMap
        val n = byUser.size.toDouble
        val sy = byUser.values.sum.toDouble
        val syy = byUser.values.map(y => y.toDouble * y).sum
        val nt = byUser.keys.count(u => arms(u) == 1L).toLong
        val nc = byUser.size.toLong - nt
        val s2 = if (n > 1 && nt > 0 && nc > 0)
          Some((n * syy - sy * sy) / n / (n - 1.0)) else None
        val mde = s2.map(v => r6(zsum * math.sqrt(math.max(v, 0.0) * (1.0 / nt + 1.0 / nc)) / 100.0))
        (hour, "buy") -> (byUser.size.toLong, nt, nc, mde)
      }
    assert(rows == want, s"stream $rows vs batch $want")
  }

  test("E60: chained-window calibration bins reconcile with batch per-window truth exactly") {
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    implicit val ctx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, Sf0001)
    // two event-time windows; a planted exact-copy group in each (the
    // within-window dup truth), one stopword-saturated copy group to hit
    // the top bin, and the corpus spread across both hours
    val replay = corpus.select("doc_id", "text").collect().zipWithIndex
      .map { case (r, i) =>
        Doc(r.getLong(0), r.getString(1),
          Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"))
      } ++ Seq(
      Doc(600001L, "planted calibration copy alpha beta", Timestamp.valueOf("2024-01-01 10:20:00")),
      Doc(600002L, "planted calibration copy alpha beta", Timestamp.valueOf("2024-01-01 10:40:00")),
      Doc(600003L, "the a an and of to in is", Timestamp.valueOf("2024-01-01 11:20:00")),
      Doc(600004L, "the a an and of to in is", Timestamp.valueOf("2024-01-01 11:40:00")))
    val in = MemoryStream[Doc]
    val q = DocStreams.calibBinsTripwire(in.toDF())
      .writeStream.format("memory").queryName("cb_s").outputMode("append").start()
    in.addData(replay.toSeq: _*); q.processAllAvailable()
    in.addData(Doc(99999L, "late watermark pusher", Timestamp.valueOf("2024-01-01 20:00:00")))
    q.processAllAvailable()
    val rows = spark.table("cb_s").collect()
      .filter(_.getString(0).startsWith("2024-01-01 1"))
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    q.stop()
    assert(rows.nonEmpty)
    // batch truth: same records, same windows, same within-window copy rule,
    // same micro-quantization (q233's doc-grain arithmetic in plain Scala)
    val stops = Set("the", "a", "an", "and", "of", "to", "in", "is")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def micro(x: Double) = BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = replay
      .groupBy(d => f"2024-01-01 ${d.ts.toLocalDateTime.getHour}%02d")
      .flatMap { case (hour, ds) =>
        val copies = ds.groupBy(_.text).view.mapValues(_.size.toLong).toMap
        ds.map { d =>
          val toks = d.text.trim.split("\\s+")
          val v = toks.count(stops) .toDouble / toks.length
          val sMicro = micro(v * 1000000.0)
          val bin = math.min(math.floor(v * 10.0).toLong, 9L)
          (hour, bin, copies(d.text), sMicro)
        }.groupBy(t => (t._1, t._2)).map { case (key, docs) =>
          val n = docs.size.toLong
          val dups = docs.count(_._3 >= 2L).toLong
          val s = docs.map(_._4).sum
          key -> (n, dups,
            r6(dups.toDouble / n),
            r6(s.toDouble / 1000000.0 / n),
            r6(math.abs(dups * 1000000L - s).toDouble / 1000000.0 / n))
        }
      }.toMap
    assert(rows == want, s"stream ${rows.toSeq.sortBy(_._1)} vs batch ${want.toSeq.sortBy(_._1)}")
    // the stopword-saturated copies land in the top bin with dup_rate 1
    val top = rows(("2024-01-01 11", 9L))
    assert(top._1 >= 2L && top._2 >= 2L, s"planted top-bin copies visible: $top")
  }
}
