package graft

import java.sql.Timestamp

import graft.operators.{TimeJoins, TrainingOps}

/** Specs for the temporal-join and training-curation operators (q37-q43).
  * Each recomputes ground truth independently (driver-side brute force over
  * the small sf0.001 tables) rather than trusting the operator's own plan.
  */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tsMicros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  private lazy val events =
    graft.core.Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))

  test("q37: as-of join matches brute-force latest-prior-purchase per click") {
    val purch = events.filter(_._4 == "purchase")
    val expected = events
      .filter(_._4 == "click")
      .flatMap { case (eid, uid, ts, _) =>
        val prior = purch.filter(p => p._2 == uid && !p._3.after(ts))
        if (prior.isEmpty) None
        else {
          // greatest ts, max event_id among ties — the operator's contract
          val best = prior.maxBy(p => (tsMicros(p._3), p._1))
          Some((eid, uid, tsMicros(ts), best._1, tsMicros(best._3)))
        }
      }
      .sortBy(_._1)
      .toSeq
    val got = TimeJoins.asofJoin(spark, Sf0001).collect()
      .map(r =>
        (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
          r.getAs[Long]("p_event_id"), r.getAs[Long]("p_ts_us")))
      .toSeq
    assert(got == expected)
  }

  test("q38: bucketed range join equals the naive theta join") {
    val winUs = TimeJoins.RangeWindowMinutes * 60L * 1000000L
    val expected = events
      .filter(_._1 % TimeJoins.RangeWindowEvery == 0)
      .map { case (wid, _, ws, _) =>
        val in = events.filter(e => tsMicros(e._3) >= tsMicros(ws) && tsMicros(e._3) < tsMicros(ws) + winUs)
        (wid, in.length.toLong, in.map(_._1).min, in.map(_._1).max)
      }
      .filter(_._2 > 0)
      .sortBy(_._1)
      .toSeq
    val got = TimeJoins.rangeJoin(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q39: every reported contamination pair truly shares that many 8-grams") {
    val texts = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def rawGrams(id: Long): Set[String] = {
      val t = texts(id).trim.split("\\s+")
      if (t.length < TrainingOps.DecontamN) Set.empty
      else t.sliding(TrainingOps.DecontamN).map(_.mkString(" ")).toSet
    }
    // document frequency cap: grams in more than MaxDf docs are pruned
    val df = texts.keys.toSeq.flatMap(rawGrams(_).toSeq).groupBy(identity).map { case (g, o) => g -> o.size }
    def grams(id: Long): Set[String] =
      rawGrams(id).filter(g => df(g) <= TrainingOps.DecontamMaxDf)
    val rows = TrainingOps.decontaminate(spark, Sf0001).collect()
    rows.foreach { r =>
      val (doc, bench, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(bench % TrainingOps.BenchEvery == 0 && doc % TrainingOps.BenchEvery != 0)
      assert(grams(doc).intersect(grams(bench)).size.toLong == n, s"pair ($doc,$bench)")
    }
    // and completeness: no overlapping pair is missing
    val benchIds = texts.keys.filter(_ % TrainingOps.BenchEvery == 0)
    val missing = for {
      b <- benchIds
      d <- texts.keys if d % TrainingOps.BenchEvery != 0
      shared = grams(d).intersect(grams(b)).size if shared > 0
    } yield (d, b)
    assert(missing.toSet == rows.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("q40: hash split is content-stable with sane proportions") {
    val rows = TrainingOps.splitHash(spark, Sf0001).collect()
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 100))
    val frac = rows.count(_.getString(2) == "train").toDouble / rows.length
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac")
    // deterministic: a second evaluation assigns identically
    val again = TrainingOps.splitHash(spark, Sf0001).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q41: repetition metrics match a direct recomputation") {
    val texts = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TrainingOps.repetitionQuality(spark, Sf0001).collect()
    assert(rows.length == texts.size)
    rows.take(50).foreach { r =>
      val toks = texts(r.getLong(0)).trim.split("\\s+").toSeq
      assert(r.getInt(1) == toks.length)
      assert(r.getInt(2) == toks.distinct.length)
      val g2 = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val top2 = if (g2.isEmpty) 0 else g2.groupBy(identity).values.map(_.size).max
      assert(r.getInt(3) == top2, s"doc ${r.getLong(0)}")
    }
  }

  test("q42: KMV estimate lands within 20% of the exact distinct count") {
    val r = TrainingOps.kmvDistinct(spark, Sf0001).collect().head
    val (k, est, exact) = (r.getAs[Long]("k_used"), r.getAs[Double]("est_distinct"), r.getAs[Long]("n_distinct"))
    assert(k == TrainingOps.KmvK)
    assert(math.abs(est / exact - 1) < 0.2, s"est $est vs exact $exact")
  }

  test("q111: AMS counters recompute from raw signs, estimate brackets exact F2") {
    val rows = TrainingOps.amsF2(spark, Sf0001).collect()
    assert(rows.length == TrainingOps.AmsS)
    assert(rows.map(_.getAs[Int]("est_id")).toSeq == (0 until TrainingOps.AmsS))
    val nRows   = rows.head.getAs[Long]("n_rows")
    val f2Exact = rows.head.getAs[Long]("f2_exact")
    val f2Est   = rows.head.getAs[Double]("f2_est")
    // recompute every counter from the raw rows — the sketch must equal the
    // brute-force fold, bit for bit
    val hs = graft.core.Tables.lineitem(spark, Sf0001)
      .select(org.apache.spark.sql.functions.xxhash64($"l_orderkey").as("h"))
      .collect().map(_.getLong(0))
    assert(nRows == hs.length)
    rows.foreach { r =>
      val i = r.getAs[Int]("est_id")
      val z = hs.map(h => if ((h & (1L << i)) != 0L) -1L else 1L).sum
      assert(r.getAs[Long]("z") == z, s"estimator $i")
      assert(r.getAs[Long]("z2") == z * z)
    }
    assert(f2Est == rows.map(_.getAs[Long]("z2")).sum.toDouble / TrainingOps.AmsS)
    // E[est] = F2; with 16 estimators the estimate should land well within
    // 2/sqrt(16) = 50% relative error on this distribution
    assert(math.abs(f2Est / f2Exact - 1) < 0.5, s"est $f2Est vs exact $f2Exact")
    assert(f2Exact >= nRows) // F2 ≥ N always (Cauchy–Schwarz at f_v ≥ 1)
  }

  test("q44: count-min estimates dominate exact counts and match on top terms") {
    val rows = TrainingOps.countMinTopTerms(spark, Sf0001).collect()
    assert(rows.length == graft.operators.TextOps.TopTerms)
    rows.foreach { r =>
      val (n, est) = (r.getAs[Long]("n"), r.getAs[Long]("est"))
      assert(est >= n, s"CMS must overestimate: token ${r.getString(0)} n=$n est=$est")
    }
    // with a 4×1024 sketch over this vocabulary, top terms should rarely
    // collide — at least half must be estimated exactly
    assert(rows.count(r => r.getAs[Long]("est") == r.getAs[Long]("n")) >= rows.length / 2)
  }

  test("q45: stratified sample is deterministic, k-bounded, and hash-minimal") {
    val rows = TrainingOps.stratifiedSample(spark, Sf0001).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length <= TrainingOps.StrataSampleK))
    // chosen ids per source are exactly the k smallest by (xxhash64, id)
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select(org.apache.spark.sql.functions.col("source"), org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.col("doc_id")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val expect = ds.sortBy(d => (d._3, d._2)).take(TrainingOps.StrataSampleK).map(_._2).toSeq
      val got = rows.filter(_.getString(0) == src).sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("doc_id")).toSeq
      assert(got == expect, s"source $src")
    }
  }

  test("q43: percentiles are ordered and the median matches a direct sort") {
    val rows = TrainingOps.percentiles(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3)))
    val flag = rows.head.getString(0)
    val vals = graft.core.Tables.lineitem(spark, Sf0001)
      .filter(org.apache.spark.sql.functions.col("l_returnflag") === flag)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val pos  = 0.5 * (vals.length - 1)
    val (lo, g) = (pos.toInt, pos - pos.toInt)
    val median  = vals(lo) + g * (vals(math.min(lo + 1, vals.length - 1)) - vals(lo))
    assert(math.abs(rows.head.getDouble(2) - median) < 1e-6)
  }

  test("q43: bin refinement is exact when quartile ranks sit on bin edges and ties straddle bins") {
    // r14.2 internals: boundary ranks are located on a coarse (flag, bin)
    // histogram, then only boundary-bin rows are ranked exactly. This
    // corpus is engineered against that machinery: values at exact
    // 64-unit bin edges (the double-multiply truncation corner), a tie
    // run crossing a bin edge, and group sizes chosen so quartile ranks
    // land both ON boundary values and BETWEEN bins.
    val vals = Map(
      // n=9: pos(.25)=2 → rank 3 = 64.0 (exact bin edge), p50 = 128.0 (edge)
      "E" -> Seq(0.01, 63.99, 64.0, 64.0, 128.0, 128.01, 192.0, 256.0, 320.0),
      // n=8: every quartile interpolates BETWEEN two values, ties straddle
      "T" -> Seq(63.98, 63.99, 64.0, 64.0, 64.0, 64.01, 64.02, 192.0),
      "S" -> Seq(42.42)) // singleton group: all quartiles = the value
    val dir = java.nio.file.Files.createTempDirectory("q43edge").toString
    vals.toSeq
      .flatMap { case (f, vs) => vs.map(v => (f, v)) }
      .toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    def t7(vs: Seq[Double], p: Double): Double = {
      val s   = vs.sorted
      val pos = p * (s.length - 1)
      val lo  = math.floor(pos).toInt
      val hi  = math.ceil(pos).toInt
      if (lo == hi) s(lo) else s(lo) * (hi - pos) + s(hi) * (pos - lo)
    }
    val got = TrainingOps.percentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == vals.keySet)
    vals.foreach { case (f, vs) =>
      assert(got(f) == ((t7(vs, 0.25), t7(vs, 0.5), t7(vs, 0.75))), s"flag $f")
    }
  }

  test("q69: histogram approximation is within one bin width of the exact percentiles") {
    val exact  = TrainingOps.percentiles(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = TrainingOps.approxPercentiles(spark, Sf0001).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val flag = r.getString(0)
      val vals = graft.core.Tables.lineitem(spark, Sf0001)
        .filter(org.apache.spark.sql.functions.col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0))
      val w  = (vals.max - vals.min) / TrainingOps.ApproxBins
      val (e25, e50, e75) = exact(flag)
      // the true percentile and the estimate both lie inside the covering
      // bin (continuous-rank vs type-7 rank differ by < 1 rank, so at most
      // one extra bin) → error bounded by ~one bin width
      assert(math.abs(r.getDouble(1) - e25) <= 2 * w, s"$flag p25")
      assert(math.abs(r.getDouble(2) - e50) <= 2 * w, s"$flag p50")
      assert(math.abs(r.getDouble(3) - e75) <= 2 * w, s"$flag p75")
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("q58: entropy matches the closed form on planted docs and is bounded on the corpus") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val planted = Seq(
      (1L, "a a b"),   // H = ln 3 − (2 ln 2)/3, ttr = 2/3
      (2L, "a b c"),   // uniform: H = ln 3, ttr = 1
      (3L, "a")        // degenerate: H = 0, ttr = 1
    ).toDF("doc_id", "text")
    val got = TrainingOps.tokenEntropyOf(planted).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_types"),
          r.getAs[Double]("entropy"), r.getAs[Double]("ttr"))))
      .toMap
    assert(got(1L) == ((3L, 2L, r6(math.log(3.0) - (2.0 * math.log(2.0)) / 3.0), r6(2.0 / 3.0))))
    assert(got(2L) == ((3L, 3L, r6(math.log(3.0)), 1.0)))
    assert(got(3L) == ((1L, 1L, 0.0, 1.0)))

    // corpus-wide invariant: 0 ≤ H ≤ ln(n_types) (max-entropy bound)
    val corpus = TrainingOps.tokenEntropy(spark, Sf0001).collect()
    assert(corpus.length == 500)
    corpus.foreach { r =>
      val (types, h, ttr) =
        (r.getAs[Long]("n_types"), r.getAs[Double]("entropy"), r.getAs[Double]("ttr"))
      // 6-decimal rounding can lift H up to 5e-7 above the exact bound
      assert(h >= 0.0 && h <= math.log(types.toDouble) + 5e-7, s"doc ${r.getLong(0)}")
      assert(ttr > 0.0 && ttr <= 1.0)
    }
  }

  test("q62: bloom gate flags planted dups and never false-negatives") {
    val d = Seq(
      (0L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (4L, "eta theta iota"),
      (1L, "alpha beta gamma"), // exact copy of snapshot doc 0
      (3L, "completely fresh content nowhere else")
    ).toDF("doc_id", "text")
    val got = TrainingOps.bloomGateOf(d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got.keySet == Set(1L, 3L)) // only the batch gets verdicts
    assert(got(1L) == ((1, 1, "dup")))
    // a Bloom filter admits false positives, never false negatives
    assert(got(3L)._2 == 0)
    assert(got(3L)._3 == (if (got(3L)._1 == 1) "false_positive" else "new"))
    got.values.foreach { case (bh, eh, _) => assert(eh == 0 || bh == 1) }
    // corpus run: verdict consistency at sf0.001
    val corpus = TrainingOps.bloomGate(spark, Sf0001).collect()
    corpus.foreach { r =>
      val (bh, eh, v) = (r.getInt(1), r.getInt(2), r.getString(3))
      assert(eh == 0 || bh == 1, s"false negative for doc ${r.getLong(0)}")
      val expect = if (eh == 1) "dup" else if (bh == 1) "false_positive" else "new"
      assert(v == expect)
    }
  }

  test("q67: weighted sample is deterministic and biased toward heavy docs") {
    val a = TrainingOps.weightedSample(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val b = TrainingOps.weightedSample(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq) // content-stable: identical across runs
    assert(a.groupBy(_._1).values.forall(_.length <= TrainingOps.WeightedSampleK))
    // weighting bias: sampled docs should average longer than the corpus
    val corpusMean = graft.core.Tables.documents(spark, Sf0001)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head.getDouble(0)
    val sampleMean = a.map(_._4).sum.toDouble / a.length
    assert(sampleMean > corpusMean, s"sample $sampleMean vs corpus $corpusMean")
  }

  test("q63: HLL estimate is within sketch error; linear counting fires on tiny sets") {
    import org.apache.spark.sql.functions.{col, count, lit, xxhash64}
    // raw branch on the corpus (distinct orders >> 2.5·m): σ ≈ 6.5 % at m=256
    val row = TrainingOps.hllDistinct(spark, Sf0001).collect().head
    val (est, n) = (row.getAs[Double]("est_distinct"), row.getAs[Long]("n_distinct"))
    assert(n > 640, s"raw-branch precondition: $n distinct")
    assert(math.abs(est / n - 1) < 0.25, s"est $est vs exact $n")
    // linear-counting branch: 50 distinct keys leave most registers zero
    val tiny = (1L to 50L).toDF("k").select(xxhash64(col("k")).as("h"))
    val ex   = tiny.distinct().agg(count(lit(1)).as("n_distinct"))
    val r2   = TrainingOps.hllDistinctOf(tiny, ex).collect().head
    assert(r2.getAs[Int]("v_zero") > 0)
    assert(math.abs(r2.getAs[Double]("est_distinct") / 50.0 - 1) < 0.3,
      s"linear-counting est ${r2.getAs[Double]("est_distinct")}")
  }

  test("q103: transition counts and probabilities match a hand-traced sequence") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    // user 1: a→b→a→c ; user 2: b→a. Transitions: a→b 1, b→a 2, a→c 1.
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, t("2024-01-01 10:01:00"), 1L, "b", 1.0, "{}"),
      (3L, t("2024-01-01 10:02:00"), 1L, "a", 1.0, "{}"),
      (4L, t("2024-01-01 10:03:00"), 1L, "c", 1.0, "{}"),
      (5L, t("2024-01-01 10:00:00"), 2L, "b", 1.0, "{}"),
      (6L, t("2024-01-01 10:01:00"), 2L, "a", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("q103spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.markovTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), ("b", "a", 2L, 1.0)))
  }

  test("q102: MAD medians and outlier counts match hand-computed robust stats") {
    import org.apache.spark.sql.functions.col
    // flag A (odd count): med 3, devs [2,1,0,1,97] → mad 1, thr 4.4478 → 1 outlier
    // flag B (even count): med 2.5, devs [1.5,.5,.5,1.5] → mad 1.0 → 0 outliers
    val rows = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("A", _)) ++
      Seq(1.0, 2.0, 3.0, 4.0).map(("B", _))).zipWithIndex
      .map { case ((f, q), i) => (i.toLong, i.toLong, q, f) }
    val df = rows.toDF("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    val dir = java.nio.file.Files.createTempDirectory("q102spec").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = TrainingOps.madOutliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toSeq
    assert(got == Seq(("A", 5L, 3.0, 1.0, 1L), ("B", 4L, 2.5, 1.0, 0L)))
  }

  test("q99: grouped KMV sketches are k-bounded, mergeable, and near the exact counts") {
    val rows = TrainingOps.kmvBySource(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4), r.getDouble(5)))
    val (all, srcs) = rows.partition(_._1 == "ALL")
    assert(all.length == 1 && srcs.nonEmpty)
    rows.foreach { case (s, kUsed, est, exact, relErr) =>
      assert(kUsed == math.min(TrainingOps.KmvSrcK.toLong, exact), s"$s k_used")
      // sketch estimate within 50% of truth (k=128 → ~9% expected error)
      assert(math.abs(relErr) < 0.5, s"$s rel_err $relErr")
      assert(est > 0 && exact > 0)
    }
    // mergeability: the ALL row's exact count can't exceed the per-source sum
    // and must be at least the largest single source (set union bounds)
    val allExact = all.head._4
    assert(allExact <= srcs.map(_._4).sum && allExact >= srcs.map(_._4).max)
  }

  test("q101: cohorts anchor to first active week; retention is offset-0-relative") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    // 2024-01-01 is a Monday. user1: weeks 0,1,3 of cohort W0; user2: weeks
    // 0,1; user3 joins in W1: weeks 1,2 of cohort W1.
    val rows = Seq(
      (1L, t("2024-01-02 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, t("2024-01-09 10:00:00"), 1L, "view", 1.0, "{}"),
      (3L, t("2024-01-24 10:00:00"), 1L, "view", 1.0, "{}"),
      (4L, t("2024-01-03 10:00:00"), 2L, "view", 1.0, "{}"),
      (5L, t("2024-01-10 10:00:00"), 2L, "view", 1.0, "{}"),
      (6L, t("2024-01-08 10:00:00"), 3L, "view", 1.0, "{}"),
      (7L, t("2024-01-17 10:00:00"), 3L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("q101spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = TimeJoins.retentionCohorts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    val expected = Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 2L, 2L, 1.0),
      ("2024-01-01", 3L, 1L, 2L, 0.5),
      ("2024-01-08", 0L, 1L, 1L, 1.0),
      ("2024-01-08", 1L, 1L, 1L, 1.0)
    )
    assert(got == expected)
  }

  test("q106: budget admits quality-first until the token budget is spent, running totals exact") {
    // scores: A = 1.0 (all stop), B = 0.5 (half stop), C = 0.0 (no stop);
    // tokens A 8000, B 8000, C 100 and budget 12000 → only A fits.
    val rows = Seq(
      (1L, Seq.fill(8000)("the").mkString(" "), "en", "sA", 1L),
      (2L, Seq.fill(4000)("the xx").mkString(" "), "en", "sB", 1L),
      (3L, Seq.fill(100)("zz").mkString(" "), "en", "sC", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q106spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingOps.tokenBudgetSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == Seq((1L, 8000L, 8000L, true), (2L, 8000L, 16000L, false), (3L, 100L, 16100L, false)))
  }

  test("q107: OHLC picks the hour's first/last by (µs ts, event_id), volume is an exact sum") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val rows = Seq(
      (1L, t("2024-01-01 10:00:05"), 1L, "x", 5.0, "{}"),
      (2L, t("2024-01-01 10:30:00"), 1L, "x", 1.0, "{}"),
      (3L, t("2024-01-01 10:45:00"), 2L, "x", 3.0, "{}"),
      // same-microsecond tie: event_id must decide open (10) and close (11)
      (10L, t("2024-01-01 11:00:00.000001"), 3L, "y", 7.0, "{}"),
      (11L, t("2024-01-01 11:00:00.000001"), 3L, "y", 9.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("q107spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.ohlcResample(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7))).toSeq
    assert(got == Seq(
      ("x", "2024-01-01 10", 5.0, 5.0, 1.0, 3.0, 3L, 9.0),
      ("y", "2024-01-01 11", 7.0, 9.0, 7.0, 9.0, 2L, 16.0)))
  }

  test("q110: paths truncate at 3 steps, split at 30-min gaps, count across users") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    // user 1 session 1: a>b>c>d (4 events — path truncates to a>b>c);
    // user 1 session 2 (after a 31-min gap): a>b; user 2: a>b>c.
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, t("2024-01-01 10:01:00"), 1L, "b", 1.0, "{}"),
      (3L, t("2024-01-01 10:02:00"), 1L, "c", 1.0, "{}"),
      (4L, t("2024-01-01 10:03:00"), 1L, "d", 1.0, "{}"),
      (5L, t("2024-01-01 10:35:00"), 1L, "a", 1.0, "{}"),
      (6L, t("2024-01-01 10:36:00"), 1L, "b", 1.0, "{}"),
      (7L, t("2024-01-01 09:00:00"), 2L, "a", 1.0, "{}"),
      (8L, t("2024-01-01 09:01:00"), 2L, "b", 1.0, "{}"),
      (9L, t("2024-01-01 09:02:00"), 2L, "c", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("q110spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.sessionPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b>c", 2L), ("a>b", 1L)))
  }

  test("q112: rolling 7-day actives equal the brute-force window count on every day") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    // user 1 active days 1,2,9; user 2 active days 1,5; user 3 active day 8
    // (duplicate events within a day must not double-count)
    val rows = Seq(
      (1L, t("2024-03-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, t("2024-03-01 11:00:00"), 1L, "b", 1.0, "{}"),
      (3L, t("2024-03-02 10:00:00"), 1L, "a", 1.0, "{}"),
      (4L, t("2024-03-09 10:00:00"), 1L, "a", 1.0, "{}"),
      (5L, t("2024-03-01 09:00:00"), 2L, "a", 1.0, "{}"),
      (6L, t("2024-03-05 09:00:00"), 2L, "a", 1.0, "{}"),
      (7L, t("2024-03-08 09:00:00"), 3L, "a", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("q112spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.rollingActives(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val active = Map(1L -> Set(1, 2, 9), 2L -> Set(1, 5), 3L -> Set(8))
    val days   = active.values.flatten.toSet.toSeq.sorted
    val want = days.map { d =>
      val win = (d - 6) to d
      (f"2024-03-$d%02d",
        active.count { case (_, ds) => ds.contains(d) }.toLong,
        active.count { case (_, ds) => ds.exists(win.contains) }.toLong)
    }
    assert(got == want)
  }

  test("q113: EWMA renormalizes over present lags and matches a brute-force kernel") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    // type "a": hourly volumes 1, 2, 4 in consecutive observed buckets
    // (hour 2 skipped — lag semantics are over OBSERVED buckets);
    // type "b": single bucket (EWMA of one point is the point itself)
    val rows = Seq(
      (1L, t("2024-01-01 00:10:00"), 1L, "a", 1.0, "{}"),
      (2L, t("2024-01-01 01:10:00"), 1L, "a", 2.0, "{}"),
      (3L, t("2024-01-01 03:10:00"), 1L, "a", 4.0, "{}"),
      (4L, t("2024-01-01 00:30:00"), 2L, "b", 7.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("q113spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.ewmaTrend(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    def ew(xs: Seq[Double]): Double = { // xs newest-first
      val num = xs.zipWithIndex.map { case (x, k) => x * math.pow(0.5, k) }.sum
      val den = xs.indices.map(k => math.pow(0.5, k)).sum
      math.rint(num / den * 1e6) / 1e6
    }
    val want = Seq(
      ("a", "2024-01-01 00", 1.0, ew(Seq(1.0)), 0.0),
      ("a", "2024-01-01 01", 2.0, ew(Seq(2.0, 1.0)), math.rint((2.0 - 5.0 / 3.0) * 1e6) / 1e6),
      ("a", "2024-01-01 03", 4.0, ew(Seq(4.0, 2.0, 1.0)), math.rint((4.0 - 21.0 / 7.0) * 1e6) / 1e6),
      ("b", "2024-01-01 00", 7.0, 7.0, 0.0))
    assert(got == want)
  }

  test("q94: hourly grid covers each user's span, gaps forward-fill, µs ties break by event_id") {
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    // user 1: events in hours 00 and 03 → hours 01/02 are gaps carrying 2.0;
    // user 2: two events at the SAME microsecond — event_id 11 must win
    val rows = Seq(
      (1L, t("2024-01-01 00:10:00"), 1L, "view", 1.0, "{}"),
      (2L, t("2024-01-01 00:50:00"), 1L, "view", 2.0, "{}"),
      (3L, t("2024-01-01 03:05:00"), 1L, "view", 3.0, "{}"),
      (10L, t("2024-01-02 12:30:00.000001"), 2L, "view", 7.0, "{}"),
      (11L, t("2024-01-02 12:30:00.000001"), 2L, "view", 9.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("q94spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = TimeJoins.gapFill(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq
    val expected = Seq(
      (1L, "2024-01-01 00", 2L, 2.0, false),
      (1L, "2024-01-01 01", 0L, 2.0, true),
      (1L, "2024-01-01 02", 0L, 2.0, true),
      (1L, "2024-01-01 03", 1L, 3.0, false),
      (2L, "2024-01-02 12", 2L, 9.0, false)
    )
    assert(got == expected)
  }
}
