package graft

import org.apache.spark.sql.functions._

import graft.functions.InferType
import graft.operators.{Multimodal, StatsOps, TextOps, TimeJoins, VectorOps}
import graft.queries.Relational

/** §2.B/C/D operator specs. Ground truth established offline:
  * sf0.001 documents contain exactly 25 planted near-dup pairs at
  * jaccard ≥ 0.9 (and zero exact-dup texts at this SF).
  */
class OperatorsSpec extends SparkSpec {

  test("B5: type inference matches the reference's precedence rules") {
    val cases = Seq(
      "42"                          -> "INTEGER",
      "-7"                          -> "INTEGER",
      "2.95276"                     -> "REAL",
      "1e5"                         -> "REAL",
      "2022-12-15"                  -> "DATE",
      "2022-12-15 17:48:29 -0800"   -> "DATE",
      "mi/hr"                       -> "TEXT",
      "HKQuantityTypeIdentifierX"   -> "TEXT",
      ""                            -> "TEXT"
    )
    cases.foreach { case (v, expect) =>
      assert(InferType.inferTypeStr(v) == expect, s"for '$v'")
    }
    // widening lattice is order-free
    assert(InferType.widen("INTEGER", "REAL") == "REAL")
    assert(InferType.widen("REAL", "INTEGER") == "REAL")
    assert(InferType.widen("DATE", "INTEGER") == "TEXT")
    assert(InferType.widen("TEXT", "REAL") == "TEXT")
  }

  test("C6/C8: minhash-LSH finds planted near-dups, jaccard verifies them") {
    val pairs = TextOps.minhashLsh(spark, Sf0001).collect()
    assert(pairs.length >= 20, s"expected ~25 planted pairs, got ${pairs.length}")
    val verified = TextOps.ngramJaccard(spark, Sf0001).collect()
    assert(verified.nonEmpty)
    // every verified pair has jaccard >= 0.5 by construction
    assert(verified.forall(_.getAs[Double]("jaccard") >= 0.5))
    // candidates are canonical (a < b) and unique
    assert(pairs.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length == pairs.length)
  }

  test("C7: simhash pairs are a (near-)subset of minhash candidates") {
    val mh = TextOps.minhashLsh(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = TextOps.simhashPairs(spark, Sf0001).collect()
    assert(sh.nonEmpty)
    assert(sh.forall(_.getAs[Int]("hamming") <= 3))
    // hamming<=1 pairs should be true near-dups that minhash also found
    val strict = sh.filter(_.getAs[Int]("hamming") <= 1)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.forall(mh.contains))
  }

  test("C1: exact dedup groups identical texts") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "aaa"), (3L, "bbb")).toDF("doc_id", "text")
    df.createOrReplaceTempView("dup_docs")
    val grouped = df
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    val byKeep = grouped.collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(byKeep == Map(1L -> 2L, 3L -> 1L))
  }

  test("C9: brute-force cosine top-k is exact (matches local computation)") {
    val rows = VectorOps.cosineTopK(spark, Sf0001).collect()
    assert(rows.length == VectorOps.QueryCount * VectorOps.TopK)
    // local recomputation for query 0
    val vecs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q0 = vecs(0L)
    val expect = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q0, v)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(VectorOps.TopK).map(_._1)
    val got = rows.filter(_.getAs[Long]("q_id") == 0L).sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("n_id")).toSeq
    assert(got == expect)
  }

  test("q83: MMR equals an independent greedy and actually diversifies") {
    import spark.implicits._
    // query 0 along x; 1 and 2 are EXACT duplicates at +37°; 3 mirrors them
    // at −37° (same relevance, low mutual sim); 4 medium; 5 irrelevant.
    // Round 1 must take 1 (tie with 2 → lower id); round 2 must take 3 —
    // the duplicate 2 is penalized by sim=1.0 while 3 offers equal
    // relevance at sim 0.28.
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.8f, 0.6f, 0f, 0f), 0),
      (2L, Seq(0.8f, 0.6f, 0f, 0f), 0),
      (3L, Seq(0.8f, -0.6f, 0f, 0f), 0),
      (4L, Seq(0.5f, 0.5f, 0.707f, 0f), 0),
      (5L, Seq(0f, 0f, 0f, 1f), 0)
    )
    val dir = java.nio.file.Files.createTempDirectory("q83spec").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = VectorOps.mmrDiversify(spark, dir).collect()
      .filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Int]("mmr_rank"))
      .map(_.getAs[Long]("n_id")).toSeq
    assert(got.length == VectorOps.MmrSelect)

    // independent greedy (same left-fold arithmetic)
    val vm = vecs.map { case (id, v, _) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rel = vm.filter(_._1 != 0L).map { case (id, v) => id -> cos(vm(0L), v) }
    val sel = scala.collection.mutable.ArrayBuffer[Long]()
    (1 to VectorOps.MmrSelect).foreach { _ =>
      val best = rel.keys.filterNot(sel.contains).map { r =>
        val pen = sel.map(s => cos(vm(r), vm(s))).maxOption.getOrElse(0.0)
        (0.7 * rel(r) - 0.3 * pen, -r, r)
      }.max
      sel += best._3
    }
    assert(got == sel.toSeq, s"operator $got vs independent greedy ${sel.toSeq}")
    // the planted structure: 1 first, its exact duplicate 2 NOT second
    assert(got.head == 1L && got(1) == 3L && !got.take(2).contains(2L))
  }

  test("q84: LSH probe reports full recall on planted near-dups, monotone truth counts") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while rain falls softly on rooftops"
    // 3 planted near-dup pairs (one-word tail edits) + unrelated fillers —
    // every doc fits in the 200-doc probe, so truth is exhaustive here
    val rows = (0 until 3).flatMap { i =>
      Seq((i * 2L, s"$base group$i", "en", "s0", 80L),
        (i * 2L + 1, s"$base grp$i", "en", "s0", 80L))
    } ++ (6 until 30).map { i =>
      (i.toLong, (0 until 12).map(j => s"filler_${i}_$j").mkString(" "), "en", "s1", 80L)
    }
    val dir = java.nio.file.Files.createTempDirectory("q84spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextOps.lshQuality(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    // n_truth monotone non-increasing, n_caught ≤ n_truth and ≤ n_cand
    got.sliding(2).foreach { case Array(a, b) => assert(a._2 >= b._2) }
    got.foreach { case (_, nt, nc, ncand) => assert(nc <= nt && nc <= ncand) }
    // all six planted docs share the same 78-token base (the tail word is
    // the only edit), so they form a near-dup 6-clique: C(6,2) = 15 truth
    // pairs at jaccard ≈ 12/14, every one caught by the bands (recall 1.0)
    val at08 = got.find(_._1 == 0.8).get
    assert(at08._2 == 15L && at08._3 == 15L, s"planted clique must be caught: $at08")
  }

  test("q85: recall is 1.0 on exact-duplicate clusters, bounded on the corpus") {
    import spark.implicits._
    // two clusters of EXACT copies — same bucket by construction, so the
    // index must achieve perfect recall
    val vecs = (0 until 6).map(i => (i.toLong, Seq(1f, 0f, 0f, 0f), 0)) ++
      (6 until 12).map(i => (i.toLong, Seq(0f, 1f, 0f, 0f), 1))
    val dir = java.nio.file.Files.createTempDirectory("q85spec").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val planted = VectorOps.annRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(planted.length == VectorOps.QueryCount)
    planted.foreach { case (q, ne, nh, rec) =>
      assert(ne == VectorOps.AnnTopK && nh == ne && rec == 1.0,
        s"query $q must recall its duplicate cluster: ($ne, $nh, $rec)")
    }
    // corpus: recall well-formed per query
    val corpus = VectorOps.annRecall(spark, Sf0001).collect()
    assert(corpus.length == VectorOps.QueryCount)
    corpus.foreach { r =>
      val rec = r.getDouble(3)
      assert(rec >= 0.0 && rec <= 1.0 && r.getLong(1) == VectorOps.AnnTopK)
    }
  }

  test("q89: comparative index report agrees with the standalone LSH audit") {
    val rep = VectorOps.indexRecall(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rep.size == VectorOps.QueryCount)
    rep.values.foreach { case (l, i, p) =>
      Seq(l, i, p).foreach(x => assert(x >= 0.0 && x <= 1.0))
    }
    // the LSH column must equal q85's standalone number exactly
    val solo = VectorOps.annRecall(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    rep.foreach { case (q, (l, _, _)) => assert(l == solo(q), s"query $q: $l vs ${solo(q)}") }
  }

  test("C10: ANN-LSH neighbors are real corpus vectors in the query's bucket") {
    val rows = VectorOps.annLsh(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("n_id")))
    assert(rows.forall(_.getAs[Int]("rk") <= VectorOps.AnnTopK))
    // multi-probe (hamming-1 buckets) must dominate single-probe on rank-1
    // agreement with brute force — it searches a strict superset of buckets
    val brute = VectorOps.cosineTopK(spark, Sf0001).collect()
      .filter(_.getAs[Int]("rk") == 1).map(r => (r.getLong(0), r.getLong(1))).toSet
    def rank1Hits(collected: Array[org.apache.spark.sql.Row]): Int = collected
      .filter(_.getAs[Int]("rk") == 1).map(r => (r.getLong(0), r.getLong(1)))
      .count(brute.contains)
    val multi  = rank1Hits(rows) // `rows` is the multi-probe default, already collected
    val single = rank1Hits(VectorOps.annLsh(spark, Sf0001, multiProbe = false).collect())
    assert(multi >= single, s"multi-probe hits $multi < single-probe hits $single")
  }

  test("C10b: IVF ANN probes nearest cells and returns in-cell neighbors") {
    val rows = VectorOps.annIvf(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("n_id")))
    assert(rows.forall(_.getAs[Int]("rk") <= VectorOps.AnnTopK))
    // IVF with NProbe cells should agree with brute force on most rank-1
    // neighbors when the rank-1 neighbor's cell is probed; sanity: overlap>0
    val brute = VectorOps.cosineTopK(spark, Sf0001).collect()
      .filter(_.getAs[Int]("rk") == 1).map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = rows.filter(_.getAs[Int]("rk") == 1).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf1.intersect(brute).nonEmpty)
  }

  test("C24: PQ-ADC ANN returns valid ranked neighbors that correlate with brute force") {
    val rows = VectorOps.annPq(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("n_id")))
    assert(rows.forall(_.getAs[Int]("rk") <= VectorOps.AnnTopK))
    // ADC is an approximation of the dot product: PQ's rank-1 neighbor set
    // must overlap brute force's top-5 set (weak but non-vacuous: random
    // ranking over ~500 candidates would essentially never hit)
    val brute = VectorOps.cosineTopK(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq1 = rows.filter(_.getAs[Int]("rk") == 1).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq1.intersect(brute).nonEmpty, s"no PQ rank-1 neighbor in brute-force top-5: $pq1")
  }

  test("C11: embedding near-dup pairs exceed the cosine threshold") {
    val rows = VectorOps.embedNearDup(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("sim") >= VectorOps.NearDupThreshold))
    assert(rows.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("C14: int8 quantization is within the max-abs error bound") {
    val rows = VectorOps.quantize(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_max") <= 127
    })
    // local recomputation for the first surviving vector (not a hardcoded
    // id — a zero/NaN vec 0 would be filtered out and .get would throw):
    // q matches round-half-away-from-zero, and dequantized values are
    // within half a quantization step
    val firstId = rows.map(_.getAs[Long]("vec_id")).min
    val row0 = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .filter(col("vec_id") === firstId).collect().head
    val v = row0.getSeq[Float](row0.fieldIndex("embedding")).map(_.toDouble)
    val amax = v.map(math.abs).max
    // BigDecimal HALF_UP = half away from zero — matches Spark's round()
    // (scala math.round is floor(x+0.5), which differs on negative halves)
    val q = v.map(x =>
      BigDecimal(x * 127d / amax).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val expect = (q.min, q.max, q.sum, q.map(x => x * x).sum)
    val got = rows.find(_.getAs[Long]("vec_id") == firstId).get
    assert((got.getAs[Int]("q_min").toLong, got.getAs[Int]("q_max").toLong,
      got.getAs[Long]("q_sum"), got.getAs[Long]("q_sumsq")) == expect)
    // dequantization error bound: |x - q*amax/127| <= amax/254 (+ eps)
    assert(v.zip(q).forall { case (x, qi) =>
      math.abs(x - qi * amax / 127d) <= amax / 254d + 1e-9
    })
  }

  test("C14: int8 quantization nulls out NaN/Inf/zero vectors instead of crashing") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, -2.0, 3.0)),            // normal → summary row
      (2L, Seq(1.0, Double.NaN)),            // NaN → null
      (3L, Seq(1.0, Double.PositiveInfinity)), // +Inf amax → null (was: BigDecimal NFE crash)
      (4L, Seq(0.0, Double.NegativeInfinity)), // -Inf |x| → null
      (5L, Seq(0.0, 0.0))                    // all-zero → null
    ).toDF("vec_id", "v")
      .select(col("vec_id"), graft.functions.Expressions.int8_quant_summary(col("v")).as("s"))
    val byId = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true, 5L -> true))
  }

  test("C12: clean pipeline drops near-dup victims and low-quality docs") {
    import graft.operators.CleanPipeline
    val survivors = CleanPipeline.clean(spark, Sf0001).collect()
    assert(survivors.nonEmpty)
    val ids = survivors.map(_.getAs[Long]("doc_id")).toSet
    // every verified near-dup pair keeps at most one member
    val pairs = TextOps.ngramJaccard(spark, Sf0001)
      .filter(col("jaccard") >= CleanPipeline.JaccardCut).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      assert(!(ids.contains(p.getAs[Long]("doc_a")) && ids.contains(p.getAs[Long]("doc_b"))),
        s"both members of near-dup pair survived: $p")
    }
    // quality gates hold
    assert(survivors.forall(_.getAs[Int]("n_tokens") >= CleanPipeline.MinTokens))
    assert(survivors.forall(_.getAs[Double]("stop_ratio") <= CleanPipeline.MaxStopRatio))
  }

  test("D1-D4: multimodal decode plumbing is deterministic and partition-safe") {
    val media = Multimodal.mediaTable(spark, Sf0001)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length == Multimodal.FeatureDim))
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, everyNth = 2)
    assert(frames.count() > 0)
    assert(frames.select(max(length(col("frame")))).collect().head.getInt(0) <= 16)
    // resize: every payload lands at exactly outW*outH bytes, dims updated
    val resized = Multimodal.resize(media, 8, 8).collect()
    assert(resized.forall(r => r.payload.length == 64 && r.width == 8 && r.height == 8))
  }

  test("D5: byte-identical media pair exactly; perceptual twin pairs with small hamming") {
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRecord
    def rec(id: Long, payload: Array[Byte]) =
      MediaRecord(id, payload, "image/fake", 64, 64, "s")
    val base = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    val media = Seq(
      rec(1, base),
      rec(2, base.clone()), // byte-identical copy of 1
      // perceptual twin: every byte +1 — a global "brightness" shift on
      // the fake decode plane; different md5, IDENTICAL DCT pHash
      rec(3, base.map(b => (b + 1).toByte)),
      rec(4, (1 to base.length).map(i => ('a' + i % 26).toByte).toArray) // unrelated
    ).toDS()
    val pairs = Multimodal.mediaDedupOf(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    val byPair = pairs.map(p => (p._1, p._2) -> p).toMap
    assert(byPair((1L, 2L))._3 == 0 && byPair((1L, 2L))._4, s"exact copy: ${pairs.toSeq}")
    assert(byPair.contains((1L, 3L)) && !byPair((1L, 3L))._4 &&
      byPair((1L, 3L))._3 == 0, s"brightness twin must pair at hamming 0: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated media must not pair")
    // signatures are layout-stable (the decode runs per-partition)
    val s1 = Multimodal.mediaSignatures(media).collect().map(_.toString).sorted.toSeq
    val s2 = Multimodal.mediaSignatures(media.repartition(3)).collect()
      .map(_.toString).sorted.toSeq
    assert(s1 == s2)
    // real corpus: every pair verdict is consistent (exact ⇒ hamming 0)
    val sf = Multimodal.mediaDedup(spark, Sf0001).collect()
      .map(r => (r.getInt(2), r.getBoolean(3)))
    sf.filter(_._2).foreach { case (h, _) => assert(h == 0, "exact dup with nonzero hamming") }
  }

  test("D5: dctPHash is a real DCT — known-fixture bits, brightness identity, locality") {
    import graft.operators.Multimodal._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // smooth synthetic plane: diagonal ramp minus an L1 cone — enough
    // low-frequency structure that the 8×8 block carries real signal
    val p1 = Array.tabulate(PHashN * PHashN) { i =>
      val y = i / PHashN; val x = i % PHashN
      (90 + 3 * ((x + y) / 2) - (math.abs(x - 16) + math.abs(y - 16))).toByte
    }
    // the fixture hash is a pinned artifact (StrictMath basis → stable
    // across JVMs); a change here means the DCT arithmetic changed
    assert(dctPHash(p1) == 6287127825615380224L, s"fixture hash moved: ${dctPHash(p1)}L")
    // EXACT brightness invariance: +5 on every pixel (no clamp) leaves
    // the mean-centered plane bit-identical → identical hash
    assert(ham(dctPHash(p1), dctPHash(p1.map(b => (b + 5).toByte))) == 0)
    // locality: brightening one 8×8 block is a REAL content change the
    // low-frequency coefficients see — far beyond the dup radius
    val local = p1.clone()
    for (y <- 8 until 16; x <- 8 until 16)
      local(y * PHashN + x) = (local(y * PHashN + x) + 40).toByte
    assert(ham(dctPHash(p1), dctPHash(local)) == 28,
      s"local-block hamming moved: ${ham(dctPHash(p1), dctPHash(local))}")
    assert(ham(dctPHash(p1), dctPHash(local)) > PHashHammingMax)
  }

  test("B19: co-bucketed tables join with zero exchanges") {
    import graft.operators.Bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val rev  = Bucketing.cobucketedRevenue(spark, Sf0001)
      val plan = rev.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join itself reads bucketed scans — no shuffle on either side;
      // the only exchange allowed is the post-join groupBy/orderBy
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"join inputs must not re-shuffle:\n$plan")
      // and the result matches the plain (unbucketed) computation
      val expect = graft.core.Tables.lineitem(spark, Sf0001)
        .join(graft.core.Tables.orders(spark, Sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority")).collect()
      assert(rev.collect().map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("B18: salted aggregation is result-invariant vs plain groupBy") {
    import graft.core.Tables
    import graft.operators.Skew
    val ev = Tables.events(spark, Sf0001)
    val salted = Skew.saltedCountSum(ev, "event_type", "value", buckets = 16)
      .orderBy(col("event_type")).collect()
    val plain = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(col("event_type")).collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("SQL function registration (SparkSessionExtensions path)") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT hk_infer_type('42') AS a, hk_infer_type('2.5') AS b,
        |  hk_infer_type('2022-12-15') AS c, hk_infer_type('mi/hr') AS d,
        |  graft_fingerprint(array('a','b')) AS fp,
        |  graft_simhash64(array(1L, 3L)) AS sh""".stripMargin).collect().head
    assert(r.getString(0) == "INTEGER" && r.getString(1) == "REAL")
    assert(r.getString(2) == "DATE" && r.getString(3) == "TEXT")
    // 1 & 3 share bit 0 → majority positive; bit 1 ties at 0 → unset
    assert(r.getAs[Long]("sh") == 1L)
    assert(r.getAs[Long]("fp") != 0L)
    // round-5 additions: compiled gram/winnow/sketch functions
    val r2 = spark.sql(
      """SELECT graft_top2gram(array('a','b','a','b','a','b')) AS t2,
        |  graft_grams(array('a','b','c','d'), 2) AS gs,
        |  graft_winnow(array('a','b','c','d','e','f','g','h'), 4, 4) AS wf,
        |  graft_minhash(array(1L, 2L, 3L), 4) AS mh,
        |  graft_int8_summary(array(1.0D, -2.0D, 0.5D)) AS i8""".stripMargin).collect().head
    assert(r2.getAs[Int]("t2") == 3) // "a b" occurs 3×
    assert(r2.getSeq[Long](1).length == 3) // 3 distinct 2-grams
    assert(r2.getSeq[org.apache.spark.sql.Row](2).nonEmpty) // 8 toks → 5 hashes → 2 windows
    assert(r2.getSeq[Long](3).length == 4)
    // amax=2: q = [64, -127, 32] (31.75 rounds HALF_UP to 32)
    val i8 = r2.getStruct(4)
    assert(i8.getInt(0) == -127 && i8.getInt(1) == 64)
  }

  test("B1/B4 plans: filters push to parquet, dim joins broadcast") {
    val q1plan = Relational.q01(spark, Sf001).queryExecution.executedPlan.toString
    assert(q1plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"q01 should push the shipdate filter:\n$q1plan")
    val q4plan = Relational.q04(spark, Sf001).queryExecution.executedPlan.toString
    assert(q4plan.contains("BroadcastHashJoin"), s"q04 should broadcast dims:\n$q4plan")
  }

  test("C37 q59: PMI collocations match an independent recomputation") {
    import spark.implicits._
    // "fizz buzz" always adjacent; "alpha"/"beta" frequent but scattered —
    // association must rank fizz-buzz far above the frequent-but-independent
    // pairs, and every value must match a driver-side recomputation with the
    // identical multiply order.
    val docsSeq =
      Seq.fill(10)("fizz buzz alpha beta") ++ Seq.fill(10)("foo alpha gamma bar") ++
        Seq.fill(6)("fizz gamma gamma beta") ++ Seq.fill(6)("buzz beta foo foo")
    val corpus = docsSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val tokss = docsSeq.map(_.split(" ").toSeq)
    val uni = tokss.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = tokss
      .flatMap(t => t.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= TextOps.PmiMinCount)
    val n1 = tokss.map(_.size).sum.toDouble
    val n2 = tokss.map(t => math.max(t.size - 1, 0)).sum.toDouble
    val expected = bi.toSeq
      .map { case (g, cab) =>
        val Array(a, b) = g.split(" ")
        val pmi = math.log((cab.toDouble * n1 * n1) / (uni(a).toDouble * uni(b).toDouble * n2))
        (g, cab, uni(a), uni(b), pmi)
      }
      .sortBy { case (g, _, _, _, p) => (-p, g) }
      .take(TextOps.PmiTopK)
      .map { case (g, cab, ca, cb, p) =>
        (g, cab, ca, cb, BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = TextOps.pmiCollocationsOf(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got == expected)
    // the always-adjacent pair must outrank the frequent-but-scattered one
    val rank = got.map(_._1).zipWithIndex.toMap
    assert(rank("fizz buzz") < rank("alpha gamma"), s"association must beat frequency: $got")
  }

  test("B24 q61: heap top-k aggregate equals the window rank formulation, sort-free") {
    val viaHeap   = Relational.q61(spark, Sf0001).collect().toSeq
    val viaWindow = Relational.q08(spark, Sf0001).collect().toSeq
    assert(viaHeap == viaWindow)
    val p = Relational.q61(spark, Sf0001).queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected a heap aggregate plan:\n$p")
    assert(p.contains("partial_collect_top_k"),
      s"expected partial (map-side) top-k aggregation:\n$p")
    assert(!p.contains("Window"), s"q61 must not fall back to a window sort:\n$p")
  }

  test("q64: a shared run of W+K-1 tokens is always detected; disjoint docs are not") {
    import spark.implicits._
    val run = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val d = Seq(
      (1L, s"unique lead-in words here $run trailing bits one"),
      (2L, s"other intro tokens $run different ending text"),
      (3L, "totally unrelated material with zero overlap anywhere at all whatsoever")
    ).toDF("doc_id", "text")
    val got = TextOps.sharedRunsOf(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // winnowing guarantee: the 9-token shared run must surface >= 1 shared fp
    assert(got.contains((1L, 2L)), s"guaranteed pair missing: $got")
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L },
      s"disjoint doc flagged: $got")
  }

  test("q65: identical vectors dedup to the lowest id; orthogonal ones survive") {
    import spark.implicits._
    import graft.functions.Expressions.l2_norm
    val e = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0, 0.0)), // cos = 1 with vec 1 → drop, keeper 1
      (5L, Seq(1.0, 1e-3, 0.0, 0.0)), // cos ≈ 1 with vecs 1/2 → drop, keeper 1
      (3L, Seq(0.0, 1.0, 0.0, 0.0)) // orthogonal → keep
    ).toDF("vec_id", "v")
      .select(col("vec_id"), col("v"))
      .withColumn("nrm", l2_norm(col("v")))
      .filter(col("nrm") > 0)
    val got = VectorOps.semDedupOf(spark, e, VectorOps.NearDupMinPlanes).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("keep", 1L)))
    assert(got(2L) == (("drop", 1L)))
    assert(got(5L) == (("drop", 1L)))
    assert(got(3L) == (("keep", 3L)))
  }

  test("r13: lshPlanesFor sizes planes from the corpus in pure integer arithmetic") {
    import VectorOps.lshPlanesFor
    assert(lshPlanesFor(1L, 5) == 5)
    assert(lshPlanesFor(500L, 5) == 5) // the test corpora: ceil(500/32)=16 → p=4 → floor 5
    assert(lshPlanesFor(2000L, 5) == 6)
    assert(lshPlanesFor(20000L, 5) == 10)
    // exact power-of-two boundary — the case a float log2 could misround
    assert(lshPlanesFor(32L << 20, 5) == 20)
    assert(lshPlanesFor((32L << 20) + 1L, 5) == 21)
    assert(lshPlanesFor(1L << 40, 5) == 31) // int-bucket ceiling: clamped
    for (n <- Seq(1L, 31L, 32L, 33L, 1000L, 123457L, 1L << 30)) {
      val p = lshPlanesFor(n, 5)
      assert(p >= 5 && p <= 31)
      val m = (n + 31) / 32
      if (p > 5 && p < 31) { // occupancy-bounded and minimal (below the clamp)
        assert((1L << p) >= m, s"n=$n p=$p under-sized")
        assert((1L << (p - 1)) < m, s"n=$n p=$p over-sized")
      }
    }
  }

  test("r14: nearDupTablesFor equals the amplification bound at the action threshold") {
    // L(p) = ceil(ln(1−R) / ln(1−c₁(p))), c₁(p) = s^p + p·s^(p−1)·(1−s),
    // s = 1 − arccos(0.45)/π, R = NearDupRecallTarget — the hardcoded
    // lookup (shared verbatim with the DuckDB oracles) must BE the bound
    val s = 1.0 - math.acos(VectorOps.SemDedupThreshold) / math.Pi
    val r = VectorOps.NearDupRecallTarget
    VectorOps.NearDupTableCounts.foreach { case (p, l) =>
      val c1 = math.pow(s, p) + p * math.pow(s, p - 1) * (1 - s)
      val want = math.ceil(math.log(1 - r) / math.log(1 - c1)).toLong
      assert(l.toLong == want, s"p=$p: lookup $l vs bound $want")
      assert(l <= VectorOps.MaxNearDupTables)
      // the derived setting actually delivers the target at the threshold
      assert(1 - math.pow(1 - c1, l.toDouble) >= r - 1e-9, s"p=$p under target")
    }
    // contiguous coverage from the plane floor up to the cap boundary:
    // the first derived count past the lookup exceeds the cap, so the
    // ELSE branch (cap) is the honest continuation, measured by q251
    val ps = VectorOps.NearDupTableCounts.keySet
    assert(ps.min == VectorOps.NearDupMinPlanes)
    assert(ps == (ps.min to ps.max).toSet, "gap in the lookup")
    val pNext = ps.max + 1
    val cNext = math.pow(s, pNext) + pNext * math.pow(s, pNext - 1) * (1 - s)
    assert(math.ceil(math.log(1 - r) / math.log(1 - cNext)) > VectorOps.MaxNearDupTables)
    assert(VectorOps.nearDupTablesFor(pNext) == VectorOps.MaxNearDupTables)
    // the table-index family stays below the JL decorrelation offset
    assert(VectorOps.MaxNearDupTables < VectorOps.JlTable)
  }

  test("r14: embed clusters label every SemDeDup pair endpoint consistently") {
    val labels = VectorOps.embedClusters(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    // every >= 0.45 pair's endpoints share a cluster, and the label is a
    // member id no larger than either endpoint (component-min rule)
    val pairs = VectorOps.embedNearDup(spark, Sf0001)
      .filter(col("sim") >= VectorOps.SemDedupThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no pairs at the q65 threshold — dead spec")
    pairs.foreach { case (a, b) =>
      assert(labels.contains(a) && labels.contains(b), s"pair ($a,$b) unlabeled")
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
      assert(labels(a) <= math.min(a, b))
    }
    // labels are cluster members (the min id IS in the cluster)
    labels.values.toSet.foreach((l: Long) => assert(labels(l) == l))
  }

  test("r14: the recall planner's corpus row matches the derivation and the cap saturates honestly") {
    val rows = VectorOps.recallPlanner(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val c = rows("corpus")
    val p = VectorOps.nearDupPlanesFor(spark, Sf0001)
    assert(c.getAs[Int]("planes") == p)
    assert(c.getAs[Int]("tables") == VectorOps.nearDupTablesFor(p))
    assert(!c.getAs[Boolean]("at_cap"))
    rows.values.foreach { r =>
      val atCap = r.getAs[Boolean]("at_cap")
      val pred  = r.getAs[Double]("pred_recall")
      if (!atCap)
        // the derivation delivers the target wherever it is not capped
        assert(pred >= VectorOps.NearDupRecallTarget - 1e-6, s"$r under target uncapped")
      else {
        // capped rows tell the truth: the bound exceeds the cap and the
        // prediction falls below the target — the planner's whole point
        assert(r.getAs[Double]("l_bound") > VectorOps.MaxNearDupTables.toDouble, s"$r")
        assert(r.getAs[Int]("tables") == VectorOps.MaxNearDupTables)
      }
    }
    // the projection ladder actually reaches saturation
    assert(rows.values.exists(_.getAs[Boolean]("at_cap")))
  }

  test("r14: candidateVolume equals the driver-side closed form over the emission grain") {
    import graft.functions.Expressions.hyperplane_bucket
    val planes = VectorOps.nearDupPlanesFor(spark, Sf0001)
    val tables = VectorOps.nearDupTablesFor(planes)
    val bCols  = (0 until tables).map(t => hyperplane_bucket(col("v"), t, planes).as(s"b$t"))
    val rows   = VectorOps.emb(spark, Sf0001).select(col("vec_id") +: bCols: _*).collect()
    val cells = for {
      r <- rows.toSeq
      t <- 0 until tables
      hb = r.getInt(1 + t)
      cell <- (hb, true) +: (0 until planes).map(p => (hb ^ (1 << p), false))
    } yield ((t, cell._1), cell._2)
    val want = cells.groupBy(_._1).values.map { ms =>
      // cap never binds at this corpus size — assert so the closed form
      // (which ignores the heap) stays the honest mirror
      assert(ms.size <= TextOps.MaxBucket)
      val nb = ms.size.toLong
      val nh = ms.count(_._2).toLong
      nh * (nb - 1) - nh * (nh - 1) / 2
    }.sum
    assert(want > 0L)
    assert(VectorOps.candidateVolume(spark, Sf0001) == want)
    // and the model normalizer is finite/positive at the derived geometry
    assert(VectorOps.candidateModelPerDoc(rows.length.toLong, planes) > 0.0)
  }

  test("r13: over-cap LSH buckets SAMPLE to the cap (content-stable) instead of dropping") {
    import spark.implicits._
    import graft.functions.Expressions.l2_norm
    // cap+100 copies of one direction: a viral bucket in every table —
    // pre-r13 this bucket was DROPPED outright (zero pairs)
    val n = TextOps.MaxBucket + 100
    val e = (0 until n).map(i => (i.toLong, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("vec_id", "v")
      .withColumn("nrm", l2_norm(col("v")))
    val pairs = VectorOps.nearDupPairsRaw(spark, e, VectorOps.NearDupMinPlanes)
      .select("a_id", "b_id")
    val cap = TextOps.MaxBucket.toLong
    assert(pairs.count() == cap * (cap - 1) / 2,
      "the sampled bucket must contribute exactly C(cap, 2) pairs")
    // the keep-set is the cap LARGEST by (signed xxhash64(id), id) — the
    // q45 content-stable rule, reproducible on any partitioning
    val keptIds = pairs
      .select(explode(array(col("a_id"), col("b_id"))).as("id"))
      .distinct().collect().map(_.getLong(0)).toSet
    val wantKept = (0 until n).map(_.toLong).toDF("id")
      .select(col("id"), xxhash64(col("id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, h) => (-h, -id) }
      .take(TextOps.MaxBucket).map(_._1).toSet
    assert(keptIds == wantKept, "sample must be the hash-largest member set")
    // the keep-set is LAYOUT-INVARIANT: re-partitioning the corpus feeds
    // the bucket heaps in a different order and must not change the sample
    val relaid = VectorOps
      .nearDupPairsRaw(spark, e.repartition(13), VectorOps.NearDupMinPlanes)
      .select(explode(array(col("a_id"), col("b_id"))).as("id"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(relaid == wantKept, "over-cap sample changed under re-layout")
    // at-or-under-cap buckets keep their FULL member set (values unchanged)
    val small = (0 until 10).map(i => (i.toLong, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("vec_id", "v").withColumn("nrm", l2_norm(col("v")))
    assert(VectorOps.nearDupPairsRaw(spark, small, VectorOps.NearDupMinPlanes).count() == 45L)
  }

  test("r13: multi_gram_hashes equals the per-grain hashed_grams kernels exactly") {
    import graft.functions.Expressions.{hashed_grams, multi_gram_hashes}
    import spark.implicits._
    val ns = graft.operators.TrainingOps.SweepNs
    // the real corpus plus edge rows: short docs, empty tokens, unicode,
    // repeated grams (the distinct rule), single-token rows
    val corpus = graft.core.Tables.documents(spark, Sf0001)
      .select(split(trim(col("text")), "\\s+").as("toks"))
    val edges = Seq(
      Seq("a"), Seq("a", "b", "c", "d"), Seq.fill(20)("same"),
      Seq("ναι", "Ω", "", "x", "héllo", "a,b", "\"q\"", "tab\tin", "z"),
      // null ELEMENTS (the declared type tolerates them): both kernels
      // must share concatWs's null-skipping — r14's NPE-parity fix
      Seq("a", null, "b", "c", null, "d", "e", "f", "g", "h"),
      Seq[String](null, null, null, null, null),
      Seq.empty[String]
    ).toDF("toks")
    val frames = corpus.unionByName(edges)
    val viaMulti = frames
      .select(explode(multi_gram_hashes(col("toks"), ns)).as("x"))
      .select(col("x.n"), col("x.g"))
      .groupBy("n", "g").count()
    val viaSingle = ns.map { n =>
      frames.select(explode(hashed_grams(col("toks"), n)).as("g"))
        .select(lit(n).as("n"), col("g"))
    }.reduce(_ unionByName _).groupBy("n", "g").count()
    assert(viaMulti.exceptAll(viaSingle).isEmpty && viaSingle.exceptAll(viaMulti).isEmpty,
      "fused kernel must produce the identical (n, g) multiset")
  }

  test("C38 q60: winnowed fingerprints are the rightmost window minima") {
    import spark.implicits._
    val (kk, ww) = (TextOps.WinnowK, TextOps.WinnowW)
    val texts = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    // independent ground truth: gram strings + driver-side winnow; only the
    // hash itself is delegated to Spark's own xxhash64 (one batch call)
    val grams = texts.values.flatMap(_.sliding(kk).filter(_.size == kk).map(_.mkString(" "))).toSeq.distinct
    val hashOf = grams.toDF("g")
      .select(col("g"), xxhash64(col("g")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = texts.toSeq.flatMap { case (id, ts) =>
      val hs = ts.sliding(kk).filter(_.size == kk).map(g => hashOf(g.mkString(" "))).toArray
      if (hs.length < ww) Seq.empty
      else {
        (0 to hs.length - ww).map { w =>
          (w + 1 until w + ww).foldLeft(w)((acc, j) => if (hs(j) <= hs(acc)) j else acc)
        }.distinct.sorted.map(p => (id, p + 1, hs(p)))
      }
    }.sortBy(t => (t._1, t._2))
    val got = TextOps.winnowFingerprints(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected)
    // density sanity: winnowing keeps roughly 2/(W+1) of positions
    val positions = texts.values.map(ts => math.max(ts.size - kk + 1, 0)).sum.toDouble
    assert(got.size > positions * 0.2 && got.size < positions * 0.7, s"${got.size} of $positions")
  }

  test("q95: prefix-filtered join equals brute-force shingle-set Jaccard (lossless)") {
    import spark.implicits._
    val t = TextOps.PrefixJoinThreshold
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).trim.split("\\s+")
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty) // docs shorter than 3 tokens drop out
    val expected = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      inter = (ta & tb).size
      union = ta.size + tb.size - inter
      if union > 0 && inter.toDouble / union >= t
    } yield (a, b, ta.size.toLong, tb.size.toLong, inter.toLong,
      BigDecimal(inter.toDouble / union).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(p => (p._1, p._2)).toSeq
    val got = TextOps.prefixJoin(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq
    assert(got == expected, s"got ${got.length} pairs, brute force ${expected.length}")
    assert(got.nonEmpty, "the planted near-dups must appear at this threshold")
  }

  test("q96: candidate edit distances match an independent DP; pair set is q25's") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cands = TextOps.minhashLsh(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = TextOps.editVerify(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(p => (p._1, p._2)).toSet == cands, "pair set must be exactly q25's")
    got.foreach { case (a, b, d, s) =>
      assert(d == lev(texts(a), texts(b)).toLong, s"pair ($a,$b)")
      assert(s >= 0.0 && s <= 1.0)
      // planted near-dups are one-word tail edits → high char similarity
      assert(s > 0.8, s"pair ($a,$b) sim $s")
    }
  }

  test("q93: NFC composes, controls become spaces, runs collapse, ends trim") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (0L, "cafe\u0301 du  monde", "en", "s0", 10L), // decomposed e + combining acute + double space
      (1L, "a\u0000b\tc\u007fd", "en", "s0", 10L), // NUL, TAB, DEL
      (2L, "  leading and trailing  ", "en", "s0", 10L),
      (3L, "\u000b\u000c mixed \u001f ctrl", "en", "s0", 10L),
      (4L, "plain ascii", "en", "s0", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q93spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.operators.TextOps.normalizeText(spark, dir)
    val got = out.select(col("doc_id"), col("n_ctrl"), col("changed_nfc"), col("len_clean"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))).toSeq
    // cleaned texts (md5 column hashes these): "café du monde" (é is 2
    // UTF-8 bytes → 14), "a b c d" (7), "leading and trailing" (20),
    // "mixed ctrl" (10), "plain ascii" (11)
    val expected = Seq(
      (0L, 0L, true, 14L),
      (1L, 3L, false, 7L),
      (2L, 0L, false, 20L),
      (3L, 3L, false, 10L),
      (4L, 0L, false, 11L)
    )
    assert(got == expected)
    // the md5 is over the cleaned composed text, verifiable directly
    val md5s = out.select("clean_md5").collect().map(_.getString(0)).toSeq
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5s == Seq(
      h("café du monde"), h("a b c d"), h("leading and trailing"),
      h("mixed ctrl"), h("plain ascii")))
  }

  test("q121: association rules are count-consistent and symmetric in lift") {
    val rows = TimeJoins.cooccurrenceLift(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nAb, support, confidence, lift) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nAb > 0 && support > 0 && confidence >= support - 1e-9,
        s"inconsistent row $r")
      assert(lift > 0, s"non-positive lift in $r")
    }
    // each unordered pair appears exactly once, a < b
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("q123: seasonal cells partition each type's traffic; shares sum to 1") {
    val rows = TimeJoins.seasonalProfile(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, cells) =>
      val shareSum = cells.map(_.getDouble(4)).sum
      assert(math.abs(shareSum - 1.0) < 1e-3, s"$t shares sum to $shareSum")
      cells.foreach { c =>
        val (dow, hod) = (c.getLong(1), c.getLong(2))
        assert(dow >= 0 && dow <= 6 && hod >= 0 && hod <= 23, s"bad cell $c")
      }
    }
    // counts reconcile with the raw table
    val total = rows.map(_.getLong(3)).sum
    val raw   = graft.core.Tables.events(spark, Sf0001).count()
    assert(total == raw, s"cell counts $total != events $raw")
  }

  test("q124: bootstrap CI brackets the point estimate and is hash-deterministic") {
    val a = StatsOps.bootstrapCi(spark, Sf0001).collect()
    assert(a.length == 20)
    a.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi, s"inverted CI in $r")
      assert(mean >= lo - 1e-9 && mean <= hi + 1e-9,
        s"point estimate outside its own CI (possible but suspect at n=25+): $r")
      assert(hi - lo > 0, s"degenerate CI in $r")
    }
    // same session, same inputs → bit-identical output (pure hash weights)
    val b = StatsOps.bootstrapCi(spark, Sf0001).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("q125: RFM tiles are 1-5, quintile-balanced within one step, segment composes") {
    val rows = TimeJoins.rfmSegments(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rt, ft, mt, seg) = (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(rt >= 1 && rt <= 5 && ft >= 1 && ft <= 5 && mt >= 1 && mt <= 5, s"tile range: $r")
      assert(seg == rt * 100 + ft * 10 + mt, s"segment composition: $r")
    }
    // the ⌈p·N⌉ rule puts at most ⌈N/5⌉+ties users in any one f-tile for a
    // tie-free metric; monetary (2dp sums) is effectively tie-free here
    val mTiles = rows.groupBy(_.getLong(6)).view.mapValues(_.length)
    assert(mTiles.values.max <= rows.length / 5 + 2, s"m-tile skew: ${mTiles.toMap}")
  }

  test("q126: arms partition events; uplift equals mean difference; CI ordered") {
    val rows = StatsOps.abUplift(spark, Sf0001).collect()
    assert(rows.length == 5)
    val totalEvents = graft.core.Tables.events(spark, Sf0001).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == totalEvents)
    rows.foreach { r =>
      val (mc, mt, up, lo, hi, nReps) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
          r.getLong(8))
      assert(math.abs(up - BigDecimal(mt - mc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 2e-6, s"uplift != mean_t - mean_c: $r")
      assert(lo <= hi, s"inverted CI: $r")
      assert(nReps >= 28 && nReps <= 32, s"replicate survival: $r")
    }
  }

  test("q127: deciles cover all docs; dup counts reconcile with the verified pair set") {
    val rows = StatsOps.qualityCalibration(spark, Sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq.sorted == rows.map(_.getLong(0)).toSeq)
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == 500, s"decile coverage: $nDocs")
    val nDup = rows.map(_.getLong(2)).sum
    // expected membership = distinct endpoints of the verified pair set
    // (pairs share docs, so this is < 2 × pair count)
    val pairs = TextOps.ngramJaccard(spark, Sf0001).collect()
    val involved = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.length
    assert(nDup == involved, s"dup membership: $nDup != $involved")
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"dup_rate range: $r")
    }
  }

  test("q128: novelty partitions the gram universe; first source is all-new") {
    val rows = StatsOps.sourceNovelty(spark, Sf0001).collect()
    assert(rows.length == 20)
    // sources sort lexicographically; the first one owns everything it has
    val first = rows.minBy(_.getString(0))
    assert(first.getLong(1) == first.getLong(2), s"first source must be 100% novel: $first")
    // Σ n_new = global distinct gram count = final cumulative value
    val totalNew = rows.map(_.getLong(2)).sum
    assert(totalNew == rows.map(_.getLong(4)).max, s"cumulative reconciliation")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"n_new > n_grams: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"rate range: $r")
    }
  }

  test("q129: fertility reconciles with q91's per-doc counts; en baseline is 1.0") {
    import graft.operators.TokenizerOps
    val rows = TokenizerOps.fertilityByLang(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == Set("en", "fr", "es", "zh", "de"))
    val en = rows.find(_.getString(0) == "en").get
    assert(en.getDouble(6) == 1.0, s"en relative fertility must be 1: $en")
    // independent reconciliation against the per-doc encoder output
    val perDoc = TokenizerOps.bpeEncode(spark, Sf0001)
      .join(graft.core.Tables.documents(spark, Sf0001).select(col("doc_id"), col("lang")), "doc_id")
      .collect().groupBy(_.getAs[String]("lang"))
    rows.foreach { r =>
      val docs = perDoc(r.getString(0))
      assert(r.getLong(1) == docs.length, s"doc count for $r")
      assert(r.getLong(2) == docs.map(_.getAs[Long]("n_words")).sum, s"word sum for $r")
      assert(r.getLong(3) == docs.map(_.getAs[Long]("n_bpe_toks")).sum, s"token sum for $r")
    }
  }

  test("q130: a planted far-out vector tops its label's z ranking") {
    import spark.implicits._
    val dim = 4
    // label 0: tight cluster + one vector far away; label 1: tight cluster
    val vecs = (
      (1 to 20).map(i => (i.toLong, Array.fill(dim)(1.0f + (i % 3) * 0.01f), 0)) ++
        Seq((99L, Array.fill(dim)(25.0f), 0)) ++
        (30 to 45).map(i => (i.toLong, Array.fill(dim)(-2.0f - (i % 2) * 0.01f), 1))
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("q130spec").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = VectorOps.labelOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(0) == 99L, s"planted outlier must rank first: ${rows.head}")
    assert(rows.head.getDouble(3) > 3.0, s"planted outlier must exceed 3 sigma: ${rows.head}")
    // z must be non-increasing down the ranking
    val zs = rows.map(_.getDouble(3))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b }, "ranking must be by z desc")
  }

  test("q131: fano reconciles with a driver-side recomputation over hourly counts") {
    val rows = TimeJoins.burstiness(spark, Sf0001).collect()
    assert(rows.length == 5)
    val hourly = graft.core.Tables.events(spark, Sf0001)
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("n")).collect()
    val span = hourly.map(_.getLong(1)).max - hourly.map(_.getLong(1)).min + 1
    rows.foreach { r =>
      val ns   = hourly.filter(_.getString(0) == r.getString(0)).map(_.getLong(2))
      val mean = ns.sum.toDouble / span
      val varh = ns.map(n => n.toDouble * n).sum / span - mean * mean
      assert(r.getLong(3) == span, s"span for $r")
      assert(math.abs(r.getDouble(5) - varh / mean) < 1e-5, s"fano for $r")
      assert(r.getDouble(6) >= 1.0, s"peak ratio below mean: $r")
    }
  }

  test("q132: the curve is monotone non-increasing and its 0.9 point matches q27's victims") {
    import graft.operators.CurationOps
    val rows = CurationOps.dedupCostCurve(spark, Sf0001).collect()
    assert(rows.map(_.getDouble(0)).toSeq == CurationOps.CurveCuts)
    // tightening the threshold can only shrink pairs/victims/cost
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1) && a.getLong(2) >= b.getLong(2) &&
        a.getLong(3) >= b.getLong(3), s"curve not monotone: $a -> $b")
    }
    // the 0.9 point's victim set equals the q27 rule's distinct doc_b
    val at09 = rows.find(_.getDouble(0) == 0.9).get
    val q27victims = TextOps.ngramJaccard(spark, Sf0001).collect()
      .map(_.getLong(1)).distinct.length
    assert(at09.getLong(2) == q27victims, s"0.9 victims ${at09.getLong(2)} != q27 $q27victims")
  }

  test("q133: funnel counters nest and the order-stat quantiles bracket correctly") {
    val r = TimeJoins.conversionLatency(spark, Sf0001).collect().head
    val (nSess, nView, nConv) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nSess >= nView && nView >= nConv && nConv > 0, s"funnel nesting: $r")
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0, s"conv rate: $r")
    assert(r.getLong(4) <= r.getLong(5), s"median must not exceed p90: $r")
    assert(r.getLong(4) >= 0, s"negative latency: $r")
  }

  test("q134: moments reconcile with a driver-side recomputation per source") {
    val rows = StatsOps.lognormalFit(spark, Sf0001).collect()
    assert(rows.length == 20)
    val chars = graft.core.Tables.documents(spark, Sf0001)
      .select(col("source"), col("n_chars")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).filter(_ > 0)).toMap
    rows.foreach { r =>
      val xs = chars(r.getString(0)).map(c =>
        BigDecimal(math.log(c.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val mu = xs.sum / xs.length
      assert(math.abs(r.getDouble(2) - mu) < 1e-5, s"mu for $r vs $mu")
      val sg = math.sqrt(xs.map(x => x * x).sum / xs.length - mu * mu)
      assert(math.abs(r.getDouble(3) - sg) < 1e-4, s"sigma for $r vs $sg")
      // the reported median is an actual member of the length distribution
      assert(chars(r.getString(0)).contains(r.getLong(4)), s"median not a data value: $r")
    }
  }

  test("q135: stationary vector is a probability distribution near its own fixed point") {
    val rows = TimeJoins.stationaryMix(spark, Sf0001).collect()
    assert(rows.length == 5)
    val piSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(piSum - 1.0) < 1e-3, s"stationary mass sums to $piSum")
    val actSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(actSum - 1.0) < 1e-3, s"actual mass sums to $actSum")
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"pi range: $r")
      assert(math.abs(r.getDouble(4) - (r.getDouble(3) - r.getDouble(2))) < 2e-6,
        s"drift identity: $r")
    }
  }

  test("q136: graph invariants reconcile with the shared edge stage") {
    import graft.operators.{CurationOps, SharedStages}
    val r = CurationOps.dupGraphHealth(spark, Sf0001).collect().head
    val edges = SharedStages.minhashEdges(spark, Sf0001).collect()
      .map(e => (e.getLong(0), e.getLong(1)))
    assert(r.getLong(1) == edges.length, s"edge count: $r")
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(r.getLong(0) == nodes.length, s"node count: $r")
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.length)
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    assert(r.getLong(2) == wedges, s"wedge count: $r")
    // triangles: brute force over the collected edge set
    val eset = edges.toSet
    val tris = (for {
      (a, b) <- edges; (b2, c) <- edges if b2 == b && eset.contains((a, c))
    } yield 1).size
    assert(r.getLong(3) == tris, s"triangle count: $r")
    if (!r.isNullAt(4))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"clustering range: $r")
    if (!r.isNullAt(5))
      assert(r.getDouble(5) >= -1.0 - 1e-9 && r.getDouble(5) <= 1.0 + 1e-9,
        s"assortativity range: $r")
  }

  test("q137: KS reconciles with a driver-side two-sample recomputation") {
    val rows = StatsOps.ksDrift(spark, Sf0001).collect()
    assert(rows.length == 20)
    val lens = graft.core.Tables.documents(spark, Sf0001)
      .select(col("source"), col("n_chars")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val all  = lens.values.flatten.toSeq.sorted
    val grid = all.distinct
    rows.foreach { r =>
      val s  = lens(r.getString(0))
      val ks = grid.map { v =>
        math.abs(
          s.count(_ <= v).toDouble / s.length - all.count(_ <= v).toDouble / all.length)
      }.max
      assert(math.abs(r.getDouble(2) - ks) < 1e-5, s"ks for $r vs $ks")
      assert(r.getLong(1) == s.length, s"n_docs for $r")
    }
  }

  test("q138: calibration covers every candidate pair; estimator tracks exact Jaccard") {
    val rows = TextOps.minhashCalibration(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val nPairs = rows.map(_.getLong(2)).sum
    val edges  = TextOps.minhashLsh(spark, Sf0001).count()
    assert(nPairs == edges, s"calibration covers $nPairs of $edges candidate pairs")
    rows.foreach { r =>
      val (est, meanExact, mae) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
      assert(est >= 0.0 && est <= 1.0 && meanExact >= 0.0 && meanExact <= 1.0, s"range: $r")
      assert(mae >= math.abs(est - meanExact) - 1e-6, s"MAE below |bias|: $r")
    }
    // the candidate generator targets j>=0.9 — estimator buckets must
    // concentrate high (LSH only surfaces high-match pairs)
    assert(rows.map(_.getLong(0)).min >= 16, s"unexpected low-match candidates: ${rows.toSeq}")
  }

  test("q139: verified near-dup pairs never straddle a split boundary") {
    import graft.operators.TrainingOps
    val split = TrainingOps.groupedSplit(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(split.size == 500)
    val pairs = TextOps.ngramJaccard(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"leak: pair ($a, $b) split ${split(a)}/${split(b)}")
    }
    // the split is still roughly 80/10/10 at the group grain
    val frac = split.values.groupBy(identity).view.mapValues(_.size / 500.0).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95, s"train share drifted: $frac")
  }

  test("q140: hub degrees reconcile with the edge list; output is degree-ranked") {
    import graft.operators.{CurationOps, SharedStages}
    val rows = CurationOps.templateHubs(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.length <= CurationOps.HubTopK)
    val edges = SharedStages.minhashEdges(spark, Sf0001).collect()
      .map(e => (e.getLong(0), e.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.length)
    rows.foreach(r => assert(r.getLong(1) == deg(r.getLong(0)), s"degree for $r"))
    val ds = rows.map(_.getLong(1))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, "must rank by degree desc")
    rows.foreach(r => assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1), s"sources: $r"))
  }

  test("q141: caps are data values, clipping is bounded, winsorized mean moves toward center") {
    val rows = TimeJoins.winsorizeReport(spark, Sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, p01, p99, lo, hi) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5))
      assert(p01 <= p99, s"cap order: $r")
      // each tail clips at most ~1% + ties of the distribution
      assert(lo <= n / 100 + 5 && hi <= n / 50 + 5, s"clip counts: $r")
      // winsorization can only pull the mean into [p01, p99]
      val mw = r.getDouble(7)
      assert(mw >= p01 - 1e-6 && mw <= p99 + 1e-6, s"winsorized mean outside caps: $r")
    }
  }

  test("q142: flow matrix mass equals the verified pair count") {
    import graft.operators.{CurationOps, SharedStages}
    val rows = CurationOps.dupFlowMatrix(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    assert(total == SharedStages.jaccardPairs(spark, Sf0001).count(), s"pair mass: $total")
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), s"pair order: $r")
      assert(r.getBoolean(4) == (r.getString(0) == r.getString(1)), s"diagonal flag: $r")
      assert(r.getDouble(3) >= 0.9 - 1e-9, s"verified links must be >= threshold: $r")
    }
  }

  test("q143: novelty rates are consistent and unique grams reconcile globally") {
    val rows = StatsOps.docNovelty(spark, Sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"unique > total: $r")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"rate range: $r")
    }
    // Σ n_unique over docs = number of df=1 grams in the corpus
    val sg = graft.operators.SharedStages.shingles(spark, Sf0001)
      .select(col("doc_id"), explode(col("shingles")).as("g")).collect()
      .map(_.getString(1))
    val dfOne = sg.groupBy(identity).count(_._2.length == 1)
    assert(rows.map(_.getLong(3)).sum == dfOne, s"df=1 reconciliation")
  }

  test("q144: digit extraction is exact and shares + Benford mass both sum to 1") {
    val rows = TimeJoins.benfordAudit(spark, Sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L), s"digit domain: ${rows.toSeq}")
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3, "observed mass")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6, "Benford mass")
    // digit counts reconcile with a driver-side recomputation on cents
    val cents = graft.core.Tables.events(spark, Sf0001)
      .select((col("value").cast("decimal(18,2)") * lit(100)).cast("long")).collect()
      .map(_.getLong(0)).filter(_ > 0)
    val want = cents.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach(r => assert(r.getLong(1) == want(r.getLong(0)), s"digit count: $r"))
  }

  test("q145: retention is a fraction, kept grams never exceed raw, survivors explain kept") {
    import graft.operators.CleanPipeline
    val rows = CleanPipeline.gramSurvival(spark, Sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"kept > raw: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"retention range: $r")
    }
    // with survivors present in every source, retention must be positive
    val survivors = CleanPipeline.q33(spark, Sf0001).collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty)
    assert(rows.forall(_.getDouble(3) > 0.0), s"zero retention with survivors present")
  }

  test("q146: Gini matches the textbook sorted-rank formula per source") {
    val rows = StatsOps.tokenGini(spark, Sf0001).collect()
    assert(rows.length == 20)
    val toks = graft.core.Tables.documents(spark, Sf0001)
      .select(col("source"), size(split(trim(col("text")), "\\s+")).cast("long")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val xs = toks(r.getString(0))
      val n  = xs.length.toLong
      val st = xs.sum
      val srv = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val g = (2.0 * srv - (n + 1).toDouble * st) / (n.toDouble * st)
      assert(r.getLong(1) == n && r.getLong(2) == st, s"totals for $r")
      assert(math.abs(r.getDouble(3) - g) < 1e-6, s"gini for $r vs $g")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0, s"gini range: $r")
    }
  }

  test("q147: profile facts match the table (doc_id is a key, no nulls, domains)") {
    val rows = StatsOps.columnProfile(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val id = rows("doc_id")
    assert(id.getLong(1) == 500 && id.getLong(2) == 0 && id.getLong(3) == 500,
      s"doc_id must profile as a null-free key: $id")
    assert(rows("lang").getLong(3) == 5, s"lang domain: ${rows("lang")}")
    assert(rows("source").getLong(3) == 20, s"source domain: ${rows("source")}")
    rows.values.foreach(r => assert(r.getLong(1) == 500, s"row count drift: $r"))
  }

  test("q148: change-point matches a driver-side brute-force argmax per type") {
    val rows = TimeJoins.changePoint(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // recompute the hourly cents buckets and the |C_τ·n − τ·C_n| argmax
    val buckets = graft.core.Tables.events(spark, Sf0001)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        (col("value").cast("decimal(18,2)") * lit(100)).cast("long").as("c"))
      .groupBy(col("event_type"), col("hour")).agg(sum(col("c")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    rows.foreach { r =>
      val vs = buckets(r.getString(0)).map(BigInt(_))
      val n  = vs.length
      assert(r.getLong(1) == n.toLong, s"n_buckets: $r")
      val cn   = vs.sum
      val keys = vs.scanLeft(BigInt(0))(_ + _).drop(1).zipWithIndex
        .init // τ = n excluded
        .map { case (c, i) => ((c * n - BigInt(i + 1) * cn).abs, i + 1) }
      val (bestKey, bestTau) = keys.maxBy { case (k, t) => (k, -t) }
      assert(r.getLong(2) == bestTau.toLong, s"tau: $r want $bestTau (key $bestKey)")
      val c = vs.take(bestTau).sum
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val before = c.toDouble / (100.0 * bestTau)
      val after  = (cn - c).toDouble / (100.0 * (n - bestTau))
      assert(math.abs(r.getDouble(4) - r6(before)) < 1e-9, s"mean_before: $r")
      assert(math.abs(r.getDouble(5) - r6(after)) < 1e-9, s"mean_after: $r")
      assert(math.abs(r.getDouble(6) - r6(after - before)) < 1e-9, s"shift: $r")
    }
  }

  test("q149: planner boundaries are the exact ⌈k·N/8⌉ order statistics") {
    import graft.operators.LayoutOps
    val rows = LayoutOps.rangePlanner(spark, Sf0001).collect()
    val B    = LayoutOps.RangeBuckets
    assert(rows.length == 2 * (B - 1), s"rows: ${rows.toSeq}")
    // exact reference: sort every value, pick the ⌈k·N/B⌉-th
    val evVals = graft.core.Tables.events(spark, Sf0001)
      .select((col("value").cast("decimal(18,2)") * lit(100)).cast("long")).collect()
      .map(_.getLong(0)).sorted
    val docVals = graft.core.Tables.documents(spark, Sf0001)
      .select(col("n_chars")).collect().map(_.getLong(0)).sorted
    def check(label: String, vals: Array[Long], scale: Double): Unit = {
      val n = vals.length.toLong
      rows.filter(_.getString(0) == label).foreach { r =>
        val k      = r.getLong(1)
        val target = (k * n + B - 1) / B
        assert(r.getLong(2) == target, s"target_rank: $r")
        val bv = vals(target.toInt - 1) // 1-based order statistic
        assert(r.getDouble(3) == bv.toDouble / scale, s"boundary: $r want $bv")
        // n_below = rows ≤ boundary, exactly
        assert(r.getLong(4) == vals.count(_ <= bv).toLong, s"n_below: $r")
      }
    }
    check("events.value", evVals, 100.0)
    check("documents.n_chars", docVals, 1.0)
    checkBalance(rows, evVals, docVals)
  }

  private def checkBalance(
      rows: Array[org.apache.spark.sql.Row],
      evVals: Array[Long],
      docVals: Array[Long]): Unit =
    // partition sizes implied by the boundaries are balanced: every
    // bucket's row count stays within one histogram cell of N/B
    Seq("events.value" -> evVals, "documents.n_chars" -> docVals).foreach {
      case (label, vals) =>
        val cuts = rows.filter(_.getString(0) == label).map(_.getLong(4)).sorted
        val sizes = (cuts :+ vals.length.toLong).zip(0L +: cuts).map { case (hi, lo) => hi - lo }
        assert(sizes.sum == vals.length.toLong, s"$label sizes: ${sizes.toSeq}")
    }

  test("q151: attribution matches a driver-side session replay; totals reconcile") {
    val rows = TimeJoins.attribution(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val evs = graft.core.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), BigDecimal(r.getDecimal(4))))
    val firstT = scala.collection.mutable.Map[String, (Long, BigDecimal)]()
    val lastT  = scala.collection.mutable.Map[String, (Long, BigDecimal)]()
    evs.groupBy(_._1).foreach { case (_, es) =>
      var prevUs = Long.MinValue
      var (firstCh, lastCh): (Option[String], Option[String]) = (None, None)
      es.sortBy(e => (e._3, e._2)).foreach { case (_, _, us, tpe, v) =>
        if (prevUs == Long.MinValue || us - prevUs > 1800000000L) { firstCh = None; lastCh = None }
        prevUs = us
        if (tpe == "purchase") {
          val f = firstCh.getOrElse("direct")
          val l = lastCh.getOrElse("direct")
          val (fn, fv) = firstT.getOrElse(f, (0L, BigDecimal(0)))
          firstT(f) = (fn + 1, fv + v)
          val (ln, lv) = lastT.getOrElse(l, (0L, BigDecimal(0)))
          lastT(l) = (ln + 1, lv + v)
        } else {
          if (firstCh.isEmpty) firstCh = Some(tpe)
          lastCh = Some(tpe)
        }
      }
    }
    assert(rows.keySet == (firstT.keySet ++ lastT.keySet), s"channels: ${rows.keySet}")
    rows.foreach { case (ch, r) =>
      val (fn, fv) = firstT.getOrElse(ch, (0L, BigDecimal(0)))
      val (ln, lv) = lastT.getOrElse(ch, (0L, BigDecimal(0)))
      assert(r.getLong(1) == fn && r.getLong(3) == ln, s"counts for $ch: $r")
      assert(r.getDouble(2) == fv.toDouble && r.getDouble(4) == lv.toDouble, s"values for $ch: $r")
    }
    // both models conserve conversions and revenue
    assert(rows.values.map(_.getLong(1)).sum == rows.values.map(_.getLong(3)).sum)
    assert(rows.values.map(_.getDouble(2)).sum == rows.values.map(_.getDouble(4)).sum)
  }

  test("q152: full-dim recall is 1; a truncated dim matches a driver brute force") {
    import graft.operators.VectorOps
    val rows = VectorOps.truncationAudit(spark, Sf0001).collect()
    assert(rows.length == VectorOps.TruncDims.length * VectorOps.QueryCount, s"grain: ${rows.length}")
    rows.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"range: $r"))
    // d = 64 IS the exact ranking — recall must be exactly 1 per query
    rows.filter(_.getLong(0) == 64L).foreach(r =>
      assert(r.getDouble(3) == 1.0, s"full-dim self-check: $r"))
    // brute-force d = 8 for one query: top-5 by truncated cosine
    val vecs = graft.core.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }
      .toMap
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      val (as, bs) = (a.take(d), b.take(d))
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      val (na, nb) = (dot(as, as), dot(bs, bs))
      if (na > 0 && nb > 0) dot(as, bs) / (math.sqrt(na) * math.sqrt(nb)) else -2.0
    }
    val q0     = vecs(0L)
    val top8   = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q0, v, 8)) }
      .sortBy { case (id, s) => (-s, id) }.take(VectorOps.TopK).map(_._1).toSet
    val topFull = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q0, v, 64)) }
      .sortBy { case (id, s) => (-s, id) }.take(VectorOps.TopK).map(_._1).toSet
    val want = (top8 & topFull).size
    val got  = rows.find(r => r.getLong(0) == 8L && r.getLong(1) == 0L).get
    assert(got.getLong(2) == want.toLong, s"q0 d=8 hits: $got want $want")
  }

  test("q153: temporal split reconciles with a driver replay of the boundary rule") {
    import graft.operators.TrainingOps
    val rows = TrainingOps.temporalSplit(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val evs = graft.core.Tables.events(spark, Sf0001)
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")).as("us"),
        unix_micros(date_trunc("hour", col("ts"))).as("h_us"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n      = evs.length.toLong
    val target = (4 * n + 4) / 5
    val tUs = evs.map(_._4).sorted.groupBy(identity).toSeq.sortBy(_._1)
      .scanLeft((Long.MinValue, 0L)) { case ((_, cum), (h, g)) => (h, cum + g.length) }
      .find(_._2 >= target).get._1
    val hourUs = 3600000000L
    def split(us: Long): String =
      if (us < tUs + hourUs) "train"
      else if (us < tUs + hourUs + TrainingOps.EmbargoHours * hourUs) "embargo"
      else "test"
    val byType = evs.groupBy(_._1)
    rows.foreach { r =>
      val es     = byType(r.getString(0))
      val splits = es.map(e => (e._2, split(e._3)))
      assert(r.getLong(1) == splits.count(_._2 == "train").toLong, s"n_train: $r")
      assert(r.getLong(2) == splits.count(_._2 == "embargo").toLong, s"n_embargo: $r")
      assert(r.getLong(3) == splits.count(_._2 == "test").toLong, s"n_test: $r")
      val trainU = splits.filter(_._2 == "train").map(_._1).toSet
      val testU  = splits.filter(_._2 == "test").map(_._1).toSet
      assert(r.getLong(4) == trainU.size.toLong && r.getLong(5) == testU.size.toLong, s"users: $r")
      assert(r.getLong(6) == (trainU & testU).size.toLong, s"leak: $r")
    }
    // the boundary actually lands ≥ 80% of events in or before its hour
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    assert(rows.map(_.getLong(1)).sum * 5 >= total * 4, "train fraction below target")
  }

  test("q154: upsert rows satisfy the merge contract and cover every delta event") {
    val rows = TimeJoins.incrementalCube(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(4), s"n_before + n_delta != n_after: $r")
      assert(r.getLong(3) > 0, s"untouched row leaked into the upsert set: $r")
      assert(r.getDouble(6) >= r.getDouble(5) - 1e-9 || r.getLong(3) > 0, s"vols: $r")
    }
    // every delta event lands in exactly one emitted row; full recompute
    // equals before+delta per touched cell
    val ev = graft.core.Tables.events(spark, Sf0001)
      .select(col("event_type"), date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH"),
        col("value").cast("decimal(18,2)"),
        pmod(xxhash64(col("event_id")), lit(TimeJoins.DeltaMod)) === 0L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), BigDecimal(r.getDecimal(2)), r.getBoolean(3)))
    val deltaCells = ev.filter(_._4).groupBy(e => (e._1, e._2))
    assert(rows.length == deltaCells.size, s"touched cells: ${rows.length} vs ${deltaCells.size}")
    val fullCells = ev.groupBy(e => (e._1, e._2))
    rows.foreach { r =>
      val key  = (r.getString(0), r.getString(1))
      val cell = fullCells(key)
      assert(r.getLong(4) == cell.length.toLong, s"n_after vs full recompute: $r")
      assert(r.getDouble(6) == cell.map(_._3).sum.toDouble, s"vol_after vs full: $r")
    }
  }

  test("q155: manifest is layout-invariant and matches a driver xor-fold") {
    import graft.operators.StatsOps
    val rows = StatsOps.contentManifest(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("documents", "events"))
    // driver recomputation of the documents leg through the same rendering
    val hs = graft.core.Tables.documents(spark, Sf0001)
      .select(xxhash64(concat_ws("\u001f",
        col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))))
      .collect().map(_.getLong(0))
    val doc = rows.find(_.getString(0) == "documents").get
    assert(doc.getLong(1) == hs.length.toLong)
    assert(doc.getLong(2) == hs.reduce(_ ^ _), s"xor_fp: $doc")
    assert(doc.getLong(3) == hs.min && doc.getLong(4) == hs.max, s"min/max: $doc")
    // layout invariance: a repartitioned, reordered copy fingerprints equal
    val dir = java.nio.file.Files.createTempDirectory("q155spec").toString
    graft.core.Tables.documents(spark, Sf0001).orderBy(col("text"))
      .repartition(7).write.parquet(s"$dir/documents.parquet")
    graft.core.Tables.events(spark, Sf0001).orderBy(col("value"))
      .repartition(5).write.parquet(s"$dir/events.parquet")
    val alt = StatsOps.contentManifest(spark, dir).collect()
    assert(alt.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq,
      s"manifest must not see layout: $alt vs $rows")
  }

  test("q156: ablation counts reconcile with q100's funnel and each other") {
    import graft.operators.CleanPipeline
    val rows = CleanPipeline.gateAblation(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("1_exact_dup", "2_min_length", "3_stop_ratio", "4_near_dup"))
    rows.values.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"n_only > n_fail: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"pct range: $r")
    }
    // the independent dup count equals the funnel's stage-2 drop (same rule)
    val funnel = CleanPipeline.funnelReport(spark, Sf0001).collect()
    def stageDocs(st: String) =
      funnel.filter(_.getString(1) == st).map(_.getLong(2)).sum
    assert(rows("1_exact_dup").getLong(1) == stageDocs("1_raw") - stageDocs("2_exact_dedup"))
    // a doc failing only one gate is recoverable by relaxing it: totals sane
    val nDocs = stageDocs("1_raw")
    rows.values.foreach(r => assert(r.getLong(1) <= nDocs))
  }

  test("q157: planner stats match driver-side width sums; small dims broadcast") {
    import graft.operators.LayoutOps
    val rows = LayoutOps.joinPlanner(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("region", "nation", "supplier", "customer", "part"))
    val region = graft.core.Tables.t(spark, Sf0001, "region")
      .select(col("r_name")).collect().map(_.getString(0))
    val want = region.map(_.length.toLong + 8L).sum
    assert(rows("region").getLong(1) == region.length.toLong)
    assert(rows("region").getLong(2) == want, s"region bytes: ${rows("region")}")
    // at sf0.001 every dim is tiny — all must verdict broadcast, and the
    // verdict must be consistent with the threshold
    rows.values.foreach { r =>
      val expect = if (r.getLong(2) <= LayoutOps.BroadcastBytes) "broadcast" else "shuffle"
      assert(r.getString(4) == expect, s"verdict: $r")
      assert(r.getString(4) == "broadcast", s"sf0.001 dims must broadcast: $r")
    }
  }

  test("q167: file plans match driver-side ceiling math; _ALL row totals the sources") {
    import graft.operators.LayoutOps
    val T = LayoutOps.TargetShardBytes
    val rows = LayoutOps.compactionPlan(spark, Sf0001).collect()
    val census = graft.core.Tables.documents(spark, Sf0001)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    assert(rows.map(_.getString(0)).toSet == census.keySet + "_ALL")
    def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
    rows.foreach { r =>
      val (nd, nb) =
        if (r.getString(0) == "_ALL")
          (census.values.map(_._1).sum, census.values.map(_._2).sum)
        else census(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == nb, s"census: $r")
      val files = math.max(1L, ceilDiv(nb, T))
      assert(r.getLong(3) == files, s"n_files: $r")
      assert(r.getLong(4) == ceilDiv(nd, files), s"rows_per_file: $r")
      assert(r.getLong(5) == ceilDiv(nb, files), s"file_bytes: $r")
      assert(r.getString(6) == (if (nb * 2 < T) "coalesce" else "ok"), s"verdict: $r")
      // a planned file never exceeds the target by more than one row's worth
      assert(r.getLong(5) <= T || files == 1L)
    }
  }

  test("q158: economics reconcile with the token distribution; monotone in L") {
    import graft.operators.CurationOps
    val rows = CurationOps.seqLenEconomics(spark, Sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == CurationOps.SeqLenBudgets)
    val toks = graft.core.Tables.documents(spark, Sf0001)
      .select(size(split(trim(col("text")), "\\s+")).cast("long")).collect().map(_.getLong(0))
    rows.foreach { r =>
      val l = r.getLong(0)
      assert(r.getLong(1) == toks.length.toLong)
      assert(r.getLong(2) == toks.count(_ > l).toLong, s"n_truncated: $r")
      assert(r.getLong(3) == toks.map(math.min(_, l)).sum, s"kept: $r")
      assert(r.getLong(4) == toks.map(t => math.max(t - l, 0L)).sum, s"lost: $r")
      assert(r.getLong(3) + r.getLong(4) == toks.sum, s"kept + lost = total: $r")
      val bins = (r.getLong(3) + l - 1) / l
      assert(r.getLong(5) == bins, s"packed bins: $r")
      assert(r.getDouble(6) >= r.getDouble(7) - 1e-12, s"packing can't hurt fill: $r")
    }
    // truncation loss shrinks as L grows; packed fill stays near 1
    val lost = rows.map(_.getLong(4))
    assert(lost.zip(lost.tail).forall { case (a, b) => b <= a }, s"monotone: ${lost.toSeq}")
  }

  test("q159: k-anonymity counts reconcile with a driver census of the QI grain") {
    import graft.operators.CurationOps
    val rows = CurationOps.kAnonymity(spark, Sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == CurationOps.KThresholds)
    val sizes = graft.core.Tables.documents(spark, Sf0001)
      .select(col("lang"), col("source"), expr("n_chars DIV 100")).collect()
      .groupBy(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .values.map(_.length.toLong).toSeq
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == sizes.length.toLong, s"n_groups: $r")
      assert(r.getLong(2) == sizes.count(_ < k).toLong, s"below: $r")
      assert(r.getLong(3) == sizes.filter(_ < k).sum, s"at risk: $r")
      assert(r.getLong(5) == sizes.min, s"min size: $r")
    }
    // risk is monotone in k
    val risk = rows.map(_.getLong(3))
    assert(risk.zip(risk.tail).forall { case (a, b) => a <= b }, s"monotone: ${risk.toSeq}")
  }

  test("q160: allocations sum exactly to the budget and are max-min fair") {
    import graft.operators.CurationOps
    val rows = CurationOps.fairAllocation(spark, Sf0001).collect()
    assert(rows.length == 20)
    val supply = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val alloc  = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val budget = supply.values.sum * CurationOps.FairBudgetNum / CurationOps.FairBudgetDen
    assert(alloc.values.sum == budget, s"sum ${alloc.values.sum} != budget $budget")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"allocation exceeds supply: $r")
      if (r.getBoolean(3)) assert(r.getLong(2) == r.getLong(1), s"saturated ⇒ full: $r")
    }
    // max-min fairness: unsaturated allocations differ by at most one
    // token, and every saturated supply is below the unsaturated level
    val unsat = rows.filter(!_.getBoolean(3)).map(_.getLong(2))
    if (unsat.nonEmpty) {
      assert(unsat.max - unsat.min <= 1, s"levels: ${unsat.toSeq}")
      rows.filter(_.getBoolean(3)).foreach(r =>
        assert(r.getLong(1) <= unsat.max, s"saturated above level: $r"))
    }
  }

  test("q161: merged and direct union sketches are identical; errors in band") {
    import graft.operators.TrainingOps
    val rows = TrainingOps.sketchMerge(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.contains("_all_merged") && rows.contains("_all_direct"))
    val m = rows("_all_merged")
    val d = rows("_all_direct")
    // the merge algebra: element-max of shard registers == direct registers
    assert(m.getInt(1) == d.getInt(1) && m.getDouble(2) == d.getDouble(2) &&
      m.getLong(3) == d.getLong(3) && m.getDouble(4) == d.getDouble(4),
      s"merged != direct: $m vs $d")
    // per-scope estimates stay inside a generous 5σ band (σ ≈ 6.5%)
    rows.values.foreach(r =>
      assert(math.abs(r.getDouble(4)) < 0.33, s"HLL error out of band: $r"))
  }

  test("q168: every planted embedding defect is counted exactly once; testdata is clean") {
    import spark.implicits._
    import graft.operators.VectorOps
    val dir = java.nio.file.Files.createTempDirectory("q168spec").toString
    // docs 0..4; doc 4 deliberately unembedded
    (0L to 4L).map(i => (i, s"doc $i", "en", "s0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // vec 0 canonical (min id, dim 3); 1 ragged; 2 non-finite; 3 zero-norm
    // AND duplicated; 9 orphan
    Seq(
      (0L, Seq(1f, 2f, 3f), 0),
      (1L, Seq(1f, 2f), 0),
      (2L, Seq(Float.NaN, Float.PositiveInfinity, 1f), 0),
      (3L, Seq(0f, 0f, 0f), 0),
      (3L, Seq(1f, 1f, 1f), 0),
      (9L, Seq(1f, 0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.embeddingAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "1_dim_mismatch"    -> ((1L, 6L)),
      "2_nonfinite"       -> ((1L, 6L)),
      "3_zero_norm"       -> ((1L, 6L)),
      "4_dup_vec_id"      -> ((1L, 6L)),
      "5_doc_without_vec" -> ((1L, 5L)),
      "6_vec_without_doc" -> ((1L, 6L))), s"audit: $got")
    // the shipped testdata must audit clean — every downstream vector op relies on it
    val clean = VectorOps.embeddingAudit(spark, Sf0001).collect()
    clean.foreach(r => assert(r.getLong(1) == 0L, s"sf0.001 defect: $r"))
  }

  test("q169: planted runs compact exactly; history intervals tile per user on testdata") {
    import spark.implicits._
    import graft.operators.TimeJoins
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def us(s: String) = t(s).getTime * 1000L
    val dir = java.nio.file.Files.createTempDirectory("q169spec").toString
    Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, t("2024-01-01 10:05:00"), 1L, "view", 1.0, "{}"),
      (3L, t("2024-01-01 10:10:00"), 1L, "purchase", 1.0, "{}"),
      (4L, t("2024-01-01 10:20:00"), 1L, "view", 1.0, "{}"),
      (5L, t("2024-01-01 09:00:00"), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.scd2Compaction(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1L, 1L, "view", us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"), 2L, false),
      (1L, 2L, "purchase", us("2024-01-01 10:10:00"), us("2024-01-01 10:20:00"), 1L, false),
      (1L, 3L, "view", us("2024-01-01 10:20:00"), -1L, 1L, true),
      (2L, 1L, "click", us("2024-01-01 09:00:00"), -1L, 1L, true)), s"history: ${got.toSeq}")
    // testdata invariants: versions contiguous, intervals tile, runs maximal
    val hist = TimeJoins.scd2Compaction(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
    val evCounts = graft.core.Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(count(lit(1))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    hist.groupBy(_._1).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"versions $uid")
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._5 == b._4, s"tiling $uid: $a -> $b")
        assert(a._3 != b._3, s"maximal runs $uid: $a -> $b")
      }
      assert(sorted.count(_._7) == 1 && sorted.last._7, s"one current row $uid")
      assert(sorted.last._5 == -1L, s"open current interval $uid")
      assert(sorted.map(_._6).sum == evCounts(uid), s"event conservation $uid")
    }
  }

  test("q170: epoch permutations cover the corpus, match the hash ranks, and decorrelate") {
    import graft.operators.TrainingOps
    val S = TrainingOps.ShuffleShards
    val rows = TrainingOps.epochShuffle(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = graft.core.Tables.documents(spark, Sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    TrainingOps.ShuffleEpochs.foreach { e =>
      val ep = rows.filter(_._1 == e)
      assert(ep.map(_._2).toSet == ids, s"epoch $e covers the corpus exactly once")
      ep.groupBy(_._3).foreach { case (sh, g) =>
        assert(g.map(_._4).sorted.toSeq == (1L to g.length).toSeq, s"pos contiguous e$e s$sh")
      }
    }
    // shard/rank agree with an independent hash computation
    val want = graft.core.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), explode(expr("array(0L, 1L)")).as("epoch"))
      .select(col("epoch"), col("doc_id"), xxhash64(col("epoch"), col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wantShard = want.map { case (e, id, h) => (e, id) -> (((h % S) + S) % S) }.toMap
    rows.foreach { case (e, id, sh, _) => assert(sh == wantShard((e, id)), s"shard ($e,$id)") }
    val wantPos = want.groupBy { case (e, _, h) => (e, ((h % S) + S) % S) }
      .flatMap { case ((e, sh), g) =>
        g.toSeq.sortBy { case (_, id, h) => (h, id) }.zipWithIndex
          .map { case ((_, id, _), i) => (e, sh, id) -> (i + 1L) }
      }
    rows.foreach { case (e, id, sh, pos) => assert(pos == wantPos((e, sh, id)), s"pos ($e,$id)") }
    // the two epoch orders are decorrelated permutations (Spearman ~ 0)
    def order(e: Long) = rows.filter(_._1 == e).sortBy(r => (r._3, r._4)).map(_._2)
      .zipWithIndex.map { case (id, i) => id -> i.toDouble }.toMap
    val (o0, o1) = (order(0L), order(1L))
    val n = ids.size.toDouble
    val d2 = ids.toSeq.map(id => { val d = o0(id) - o1(id); d * d }).sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    assert(math.abs(rho) < 0.2, s"epoch orders correlate: rho=$rho")
  }

  test("q171: planted period-2 series hits ±1 at alternating lags; zero-variance legs go NULL") {
    import spark.implicits._
    import graft.operators.TimeJoins
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("q171spec").toString
    // type "a": 2 events at every even hour 0..8 → dense series 2,0,2,…,2
    // type "b": exactly 1 event every hour 0..7 → constant (zero variance)
    val a = (0 to 8 by 2).flatMap(h =>
      Seq((100L + h * 2, t(f"2024-01-01 $h%02d:00:00"), 1L, "a", 1.0, "{}"),
          (101L + h * 2, t(f"2024-01-01 $h%02d:30:00"), 2L, "a", 1.0, "{}")))
    val b = (0 to 7).map(h => (200L + h, t(f"2024-01-01 $h%02d:15:00"), 3L, "b", 1.0, "{}"))
    (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.acf(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(5)))
    val aRows = got.filter(_._1 == "a").map { case (_, l, np, r, s) => (l, np, r, s) }
    assert(aRows.toSeq == Seq(
      (1L, 8L, Some(-1.0), true), (2L, 7L, Some(1.0), true), (3L, 6L, Some(-1.0), true),
      (4L, 5L, Some(1.0), true), (5L, 4L, Some(-1.0), false), (6L, 3L, Some(1.0), false)),
      s"period-2 ACF: ${aRows.toSeq}")
    val bRows = got.filter(_._1 == "b")
    assert(bRows.length == 6 && bRows.forall(r => r._4.isEmpty && !r._5),
      s"constant series: ${bRows.toSeq}")
    // testdata invariants: every (type, lag) cell present, n_pairs = hours − lag,
    // |r| ≤ 1, and the white-noise band is positive
    val sf = TimeJoins.acf(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4)))
    val types = sf.map(_._1).distinct
    assert(sf.length == types.length * TimeJoins.AcfMaxLag)
    sf.groupBy(_._1).foreach { case (_, rows) =>
      val n0 = rows.find(_._2 == 1L).get._3 + 1
      rows.foreach { case (ty, l, np, r, band) =>
        assert(np == n0 - l, s"pair count $ty lag $l")
        r.foreach(v => assert(math.abs(v) <= 1.0, s"|r|>1 $ty lag $l"))
        assert(band > 0.0)
      }
    }
  }

  test("q172: planted lifetimes reproduce the textbook KM curve; testdata invariants hold") {
    import spark.implicits._
    import graft.operators.TimeJoins
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("q172spec").toString
    // frontier = Jan 30; censored iff last_day > Jan 23.
    // u1,u2: churn t=1; u3: censored t=2; u4: churn t=3; u5: censored t=3
    // → KM: S(1)=1−2/5=0.6, S(2)=0.6 (censor only), S(3)=0.6·(1−1/2)=0.3
    Seq(
      (1L, t("2024-01-10 10:00:00"), 1L), (2L, t("2024-01-11 10:00:00"), 1L),
      (3L, t("2024-01-12 10:00:00"), 2L), (4L, t("2024-01-13 10:00:00"), 2L),
      (5L, t("2024-01-26 10:00:00"), 3L), (6L, t("2024-01-28 10:00:00"), 3L),
      (7L, t("2024-01-10 10:00:00"), 4L), (8L, t("2024-01-13 10:00:00"), 4L),
      (9L, t("2024-01-27 10:00:00"), 5L), (10L, t("2024-01-30 10:00:00"), 5L))
      .map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.kmSurvival(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 5L, 2L, 0L, 0.6), (2L, 3L, 0L, 1L, 0.6), (3L, 2L, 1L, 1L, 0.3)),
      s"KM curve: ${got.toSeq}")
    // testdata invariants: S non-increasing in t, n_risk strictly decreasing,
    // risk conservation (n_risk(t_i+1) = n_risk(t_i) − d_i − c_i), S ∈ (0, 1]
    val sf = TimeJoins.kmSurvival(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(sf.nonEmpty)
    sf.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a._1 < b._1, "t ascending")
      assert(b._5 <= a._5 + 1e-12, s"S must not increase: $a -> $b")
      assert(b._2 == a._2 - a._3 - a._4, s"risk conservation: $a -> $b")
    }
    assert(sf.head._2 == sf.map(r => r._3 + r._4).sum, "everyone starts at risk")
    sf.foreach(r => assert(r._5 > 0.0 && r._5 <= 1.0, s"S in (0,1]: $r"))
  }

  test("q244: Greenwood bands wrap q172's curve; hand case matches") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("q244spec").toString
    Seq(
      (1L, t("2024-01-10 10:00:00"), 1L), (2L, t("2024-01-11 10:00:00"), 1L),
      (3L, t("2024-01-12 10:00:00"), 2L), (4L, t("2024-01-13 10:00:00"), 2L),
      (5L, t("2024-01-26 10:00:00"), 3L), (6L, t("2024-01-28 10:00:00"), 3L),
      (7L, t("2024-01-10 10:00:00"), 4L), (8L, t("2024-01-13 10:00:00"), 4L),
      (9L, t("2024-01-27 10:00:00"), 5L), (10L, t("2024-01-30 10:00:00"), 5L))
      .map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TimeJoins.kmGreenwood(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7)))
    // q172's fixture: t=1 S=0.6 g=2/(5·3); t=2 censor only; t=3 S=0.3 g+=1/(2·1)
    val g1 = r12(0.0 + 2.0 / (5.0 * 3.0))
    val g3 = r12(g1 + 1.0 / (2.0 * 1.0))
    val exp = Seq(
      (1L, 5L, 0.6, r6(0.6 * math.sqrt(g1))),
      (2L, 3L, 0.6, r6(0.6 * math.sqrt(g1))),
      (3L, 2L, 0.3, r6(0.3 * math.sqrt(g3))))
    assert(got.map(x => (x._1, x._2, x._3, x._4)).toSeq == exp, s"got ${got.toSeq}")
    got.foreach { case (_, _, s, se, lo, hi) =>
      assert(lo >= 0.0 && hi <= 1.0 && lo <= s && s <= hi, s"band wraps: $s [$lo,$hi] se=$se")
    }
    // q172 agreement: survival column identical on the shared fixture AND testdata
    val km = TimeJoins.kmSurvival(spark, dir).collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    got.foreach { case (tt, _, s, _, _, _) => assert(km(tt) == s, s"q172 agreement at t=$tt") }
    val sfG = TimeJoins.kmGreenwood(spark, Sf0001).collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val sfK = TimeJoins.kmSurvival(spark, Sf0001).collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(sfG == sfK, "testdata survival columns identical")
  }

  test("q237: log-rank statistic equals a driver-side reference on planted lifetimes") {
    import spark.implicits._
    import graft.operators.TimeJoins
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("q237spec").toString
    // 12 users, lifetimes 0..5 days, some active at the frontier (censored);
    // arms come from the hash coin — the reference recomputes them below
    // user 13 pins the frontier at Jan 28 → censor cutoff Jan 21, so users
    // 1..12 (last activity ≤ Jan 18) are all observed deaths and u13 is the
    // lone censored subject — both legs of the statistic exercised
    val users = (1L to 12L).map { u =>
      val first = s"2024-01-${10 + (u % 4)} 10:00:00"
      val last  = s"2024-01-${10 + (u % 4) + (u % 6)} 10:00:00"
      Seq((u * 2 - 1, t(first), u), (u * 2, t(last), u))
    } :+ Seq((25L, t("2024-01-10 10:00:00"), 13L), (26L, t("2024-01-28 10:00:00"), 13L))
    users.flatten
      .map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = TimeJoins.logrankTest(spark, dir).collect().head

    // driver-side reference: same arm coin, censor rule, and micro terms
    val arms = spark.range(1, 14).select(col("id"),
      pmod(xxhash64(col("id")), lit(2L)).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lives = (1L to 12L).map { u =>
      val fd = 10 + (u % 4); val ld = fd + (u % 6)
      (u, ld - fd, ld) // (user, lifetime t, last_day offset within Jan)
    } :+ ((13L, 18L, 28L))
    val maxDay = lives.map(_._3).max
    val cens   = lives.map { case (u, tt, ld) => (u, tt, ld > maxDay - 7) }
    val n1 = cens.count(c => arms(c._1) == 1L).toLong
    val n0 = cens.size.toLong - n1
    val byT = cens.groupBy(_._2).toSeq.sortBy(_._1).map { case (tt, g) =>
      (tt,
        g.count(c => !c._3 && arms(c._1) == 1L).toLong,
        g.count(c => !c._3 && arms(c._1) == 0L).toLong,
        g.count(c => c._3 && arms(c._1) == 1L).toLong,
        g.count(c => c._3 && arms(c._1) == 0L).toLong)
    }
    def micro(x: Double) = BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var rem1 = n1; var rem0 = n0
    var o1 = 0L; var e1s = 0L; var vs = 0L
    byT.foreach { case (_, d1, d0, c1, c0) =>
      val (r1, r0) = (rem1.toDouble, rem0.toDouble)
      val dt = (d1 + d0).toDouble
      o1 += d1
      if (dt > 0.0) e1s += micro(dt * (r1 / (r1 + r0)) * 1000000.0)
      if (dt > 0.0 && r1 + r0 > 1.0)
        vs += micro(dt * (r1 / (r1 + r0)) * (r0 / (r1 + r0))
          * ((r1 + r0 - dt) / (r1 + r0 - 1.0)) * 1000000.0)
      rem1 -= d1 + c1; rem0 -= d0 + c0
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) == 13L && row.getLong(1) == n1 && row.getLong(2) == n0)
    assert(row.getLong(3) == o1, "observed arm-1 deaths")
    assert(row.getDouble(4) == r6(e1s.toDouble / 1000000.0), "E1")
    assert(row.getDouble(5) == r6(vs.toDouble / 1000000.0), "V")
    if (vs > 0) {
      val z = r6((o1.toDouble - e1s.toDouble / 1000000.0) / math.sqrt(vs.toDouble / 1000000.0))
      assert(row.getDouble(6) == z, "z")
    }
    // testdata invariants: the synthetic corpora keep every user active at
    // the frontier (all censored, zero deaths), so the statistic must
    // degenerate HONESTLY — V = 0 and z/χ² NULL, not a fabricated number
    val sf = TimeJoins.logrankTest(spark, Sf0001).collect().head
    assert(sf.getLong(1) + sf.getLong(2) == sf.getLong(0))
    assert(sf.getDouble(5) >= 0.0, "variance non-negative")
    if (sf.getDouble(5) == 0.0)
      assert(sf.isNullAt(6) && sf.isNullAt(7), "z/chi2 must be NULL when V = 0")
  }

  test("q173: metrics agree with a driver-side confusion recomputation; _ALL row is micro-avg") {
    import graft.operators.CurationOps
    val rows = CurationOps.classifierEval(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getDouble(5), r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    val (all, per) = rows.partition(_._1 == "_ALL")
    assert(all.length == 1 && per.nonEmpty)
    // recompute the confusion matrix from q66's own per-doc output
    val pred = CurationOps.nbClassify(spark, Sf0001).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val n = pred.length.toLong
    val support = pred.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val npred   = pred.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tp      = pred.filter(p => p._1 == p._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    per.foreach { case (cls, s, np, t, p, rec, f1, k) =>
      assert(s == support(cls) && np == npred.getOrElse(cls, 0L) && t == tp.getOrElse(cls, 0L), cls)
      assert(p == (if (np > 0) Some(r6(t.toDouble / np)) else None), s"precision $cls")
      assert(rec == r6(t.toDouble / s) && f1 == r6(2.0 * t / (np + s)), s"recall/f1 $cls")
      assert(k.isEmpty, s"kappa only on _ALL: $cls")
    }
    val t = tp.values.sum
    val agr = support.map { case (c, s) => s * npred.getOrElse(c, 0L) }.sum
    val (_, sAll, npAll, tAll, pAll, _, _, kAll) = all.head
    assert(sAll == n && npAll == n && tAll == t)
    assert(pAll.contains(r6(t.toDouble / n)), "micro accuracy")
    assert(kAll.contains(r6((t * n - agr).toDouble / (n * n - agr).toDouble)), "kappa")
    // kappa must sit below raw accuracy whenever the classifier beats chance
    assert(kAll.get <= pAll.get + 1e-12, "chance correction lowers the score")
  }

  test("q174: planted moments land exactly; variance decomposes within+between on testdata") {
    import spark.implicits._
    import graft.operators.StatsOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("q174spec").toString
    // type "a": every shard sees {1,2,3} → between = 0, skew 0, kurt −1.5
    // type "b": shard0 = {1,1}, shard1 = {3,3} → within = 0, kurt −2
    val a = (0 to 11).map(i => (100L + i, t("2024-01-01 00:00:00"), 1L, "a", (i / 4 + 1).toDouble, "{}"))
    val b = Seq((200L, 1.0), (204L, 1.0), (201L, 3.0), (205L, 3.0))
      .map { case (id, v) => (id, t("2024-01-01 00:00:00"), 2L, "b", v, "{}") }
    (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsOps.momentsProfile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))).toMap
    def ~=(x: Double, y: Double) = math.abs(x - y) <= 1.5e-6
    val (na, meanA, sdA, skA, kuA, wA, bA, tA) = got("a")
    assert(na == 12 && ~=(meanA, 2.0) && ~=(sdA, 0.816497), s"a basic: ${got("a")}")
    assert(~=(skA, 0.0) && ~=(kuA, -1.5), s"a shape: ${got("a")}")
    assert(~=(bA, 0.0) && ~=(wA, tA) && ~=(tA, 0.666667), s"a decomposition: ${got("a")}")
    val (nb, meanB, sdB, skB, kuB, wB, bB, tB) = got("b")
    assert(nb == 4 && ~=(meanB, 2.0) && ~=(sdB, 1.0), s"b basic: ${got("b")}")
    assert(~=(skB, 0.0) && ~=(kuB, -2.0), s"b shape: ${got("b")}")
    assert(~=(wB, 0.0) && ~=(bB, 1.0) && ~=(tB, 1.0), s"b decomposition: ${got("b")}")
    // testdata: counts conserve, sd² = total_var, and total = within + between
    val sf = StatsOps.momentsProfile(spark, Sf0001).collect()
    val nEvents = graft.core.Tables.events(spark, Sf0001).count()
    assert(sf.map(_.getLong(1)).sum == nEvents, "population conserved")
    sf.foreach { r =>
      val (sd, w, b, tot) = (r.getDouble(3), r.getDouble(6), r.getDouble(7), r.getDouble(8))
      // sd and the variance legs are independently 6-dp rounded: error
      // bounds scale with the magnitudes (2·sd·½ulp₆ for the square)
      assert(math.abs(sd * sd - tot) <= 2 * sd * 1e-6 + 2e-6, s"sd² vs total_var: $r")
      assert(math.abs(w + b - tot) <= 1e-5 * math.max(1.0, tot), s"law of total variance: $r")
    }
  }

  test("q175: a homogeneous class is flagged at every l; sweep is monotone on testdata") {
    import spark.implicits._
    import graft.operators.CurationOps
    val dir = java.nio.file.Files.createTempDirectory("q175spec").toString
    // class (en, s1, bucket 1): labels all 7 → l = 1 (homogeneous)
    // class (en, s2, bucket 1): labels 1,2,3 → l = 3
    Seq(
      (1L, "t", "en", "s1", 110L), (2L, "t", "en", "s1", 120L), (3L, "t", "en", "s1", 130L),
      (4L, "t", "en", "s2", 110L), (5L, "t", "en", "s2", 120L), (6L, "t", "en", "s2", 130L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, Seq(0.1f), 7), (2L, Seq(0.1f), 7), (3L, Seq(0.1f), 7),
      (4L, Seq(0.1f), 1), (5L, Seq(0.1f), 2), (6L, Seq(0.1f), 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = CurationOps.lDiversity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (2L, 2L, 1L, 3L, 0.5, 1L, 1L),
      (3L, 2L, 1L, 3L, 0.5, 1L, 1L),
      (5L, 2L, 2L, 6L, 1.0, 1L, 1L)), s"planted sweep: ${got.toSeq}")
    // testdata: constants stay constant across the sweep; risk is monotone in l
    val sf = CurationOps.lDiversity(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getLong(6)))
    assert(sf.map(_._1).toSeq == CurationOps.LThresholds)
    assert(sf.map(_._2).distinct.length == 1 && sf.map(_._6).distinct.length == 1)
    sf.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 && a._4 <= b._4, s"monotone sweep: $a -> $b")
    }
    sf.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0 && r._7 >= 1L))
  }

  test("q176: planted geometry ranks the first relevant hit; misses score zero in the MRR") {
    import spark.implicits._
    import graft.operators.VectorOps
    val dir = java.nio.file.Files.createTempDirectory("q176spec").toString
    // q0=(1,0) label 1: neighbors c8 (wrong label, rank 1), c9 (label 1, rank 2) → rr 0.5
    // q1=(0,1) label 2: no label-2 candidate anywhere → miss, rr 0
    Seq(
      (0L, Seq(1.0f, 0.0f), 1), (1L, Seq(0.0f, 1.0f), 2),
      (8L, Seq(1.0f, 0.1f), 3), (9L, Seq(1.0f, 0.2f), 1),
      (10L, Seq(0.1f, 1.0f), 1), (11L, Seq(0.2f, 1.0f), 9))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.retrievalMrr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (-1L, -1, None, 0.25),
      (0L, 1, Some(2L), 0.5),
      (1L, 2, None, 0.0)), s"mrr rows: ${got.toSeq}")
    // testdata: QueryCount query rows + the summary; summary = mean of the
    // micro-quantized reciprocal ranks; rr bounded by [0, 1]
    val sf = VectorOps.retrievalMrr(spark, Sf0001).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getDouble(3)))
    val (sum8, per) = sf.partition(_._1 == -1L)
    assert(per.length == VectorOps.QueryCount && sum8.length == 1)
    per.foreach { case (_, rank, rr) =>
      assert(rr >= 0.0 && rr <= 1.0)
      rank.foreach(rk => assert(rk >= 1 && rk <= VectorOps.MrrK &&
        math.abs(rr - math.rint(1e6 / rk) / 1e6) < 1e-12))
      if (rank.isEmpty) assert(rr == 0.0)
    }
    val want = BigDecimal(per.map(p => math.rint(1e6 * p._3)).sum / 1e6 / per.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sum8.head._3 == want, s"summary fold: ${sum8.head._3} vs $want")
  }

  test("q177: agreement rows match recomputed set algebra; verified pairs are a subset of LSH") {
    import graft.operators.TextOps
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh   = pairs(TextOps.minhashLsh(spark, Sf0001))
    val sim   = pairs(TextOps.simhashPairs(spark, Sf0001))
    val ngram = pairs(TextOps.ngramJaccard(spark, Sf0001))
    val sets  = Map("minhash_lsh" -> lsh, "simhash" -> sim, "ngram_jaccard" -> ngram)
    val got = TextOps.dedupAgreement(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    assert(got.length == 3)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (ma, mb, na, nb, nBoth, onlyA, onlyB, j) =>
      val (sa, sb) = (sets(ma), sets(mb))
      assert(na == sa.size && nb == sb.size && nBoth == (sa & sb).size, s"$ma/$mb sizes")
      assert(onlyA == (sa -- sb).size && onlyB == (sb -- sa).size, s"$ma/$mb exclusives")
      val u = (sa | sb).size
      assert(j == (if (u > 0) Some(r6(nBoth.toDouble / u)) else None), s"$ma/$mb jaccard")
    }
    // the exact-verify stage only FILTERS the LSH candidates: q27 ⊆ q25,
    // so the (minhash_lsh, ngram_jaccard) row has no right-exclusive pairs
    val mn = got.find(r => r._1 == "minhash_lsh" && r._2 == "ngram_jaccard").get
    assert(mn._7 == 0L, s"verified pairs escaped the candidate set: $mn")
  }

  test("q178: planted imbalance alarms, a clean split doesn't; arms partition the users") {
    import spark.implicits._
    import graft.operators.StatsOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // find user ids landing in each arm under the real hash, then plant a
    // wildly imbalanced type (40 control, 1 treatment) and a balanced one
    val armOf = (1L to 200L).map { u =>
      u -> spark.range(1).select(pmod(xxhash64(lit(u)), lit(2L))).head.getLong(0)
    }.toMap
    val ctrl = (1L to 200L).filter(armOf(_) == 0L).take(40)
    val trt  = (1L to 200L).filter(armOf(_) == 1L).take(40)
    val bad  = (ctrl.map(u => (u, "skewed")) ++ trt.take(1).map(u => (u, "skewed")))
    val good = (ctrl.take(20).map(u => (u, "fair")) ++ trt.take(20).map(u => (u, "fair")))
    val dir = java.nio.file.Files.createTempDirectory("q178spec").toString
    (bad ++ good).zipWithIndex
      .map { case ((u, ty), i) => (i.toLong, t("2024-01-01 10:00:00"), u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsOps.srmGate(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val (nc, nt, chi, alarm) = got("skewed")
    assert(nc == 40 && nt == 1 && alarm, s"skewed: ${got("skewed")}")
    assert(math.abs(chi - 39.0 * 39.0 / 41.0) < 1e-6)
    val f = got("fair")
    assert(f._1 == 20 && f._2 == 20 && f._3 == 0.0 && !f._4, s"fair: $f")
    // testdata: _ALL counts partition the distinct-user population; the
    // hash split is clean there (no alarm at 5% on a healthy pipeline)
    val sf = StatsOps.srmGate(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    val all = sf("_ALL")
    val nUsers = graft.core.Tables.events(spark, Sf0001)
      .select(col("user_id")).distinct().count()
    assert(all._1 + all._2 == nUsers, "arms partition the population")
    assert(!all._3, s"healthy assignment must not alarm: $all")
  }

  test("q179: a star graph scores exactly −1; testdata statistic matches a driver recompute") {
    import spark.implicits._
    import graft.operators.{CurationOps, TextOps}
    // K_{1,3}: the purest original-with-copies shape → assortativity −1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val s = CurationOps.assortativityOf(star).collect().head
    assert(s.getLong(0) == 3 && s.getLong(1) == 4 && s.getLong(3) == 3)
    assert(s.getDouble(2) == 1.5 && s.getDouble(4) == -1.0, s"star: $s")
    // a 4-cycle is degree-regular → zero variance → NULL r
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("doc_a", "doc_b")
    assert(CurationOps.assortativityOf(cyc).collect().head.isNullAt(4), "regular graph")
    // testdata: recompute Newman's r from the actual pair set
    val edges = TextOps.minhashLsh(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size.toLong)
    val (sx, sxy, sxx) = edges.foldLeft((0L, 0L, 0L)) { case ((a, b, c), (u, v)) =>
      val (du, dv) = (deg(u), deg(v))
      (a + du + dv, b + 2 * du * dv, c + du * du + dv * dv)
    }
    val n    = 2L * edges.length
    val want = BigDecimal((n * sxy - sx * sx).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * sxx - sx * sx).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = CurationOps.dupAssortativity(spark, Sf0001).collect().head
    assert(got.getLong(0) == edges.length && got.getLong(1) == deg.size)
    assert(got.getDouble(4) == want, s"assortativity: ${got.getDouble(4)} vs $want")
    assert(got.getDouble(4) >= -1.0 - 1e-9 && got.getDouble(4) <= 1.0 + 1e-9)
  }

  test("q180: planted losses compact into maximal consecutive ranges; loss totals conserve") {
    import spark.implicits._
    import graft.operators.StatsOps
    def hts(hr: Int, min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $hr%02d:$min%02d:00")
    val M = StatsOps.BackfillDropMod
    // hours 0..5 with clean filler rows; drops (id ≡ 0 mod M) land in
    // hours 1, 2 (consecutive → ONE range) and hour 4 (singleton)
    val filler = (0 to 5).flatMap(h => (1 to 3).map(i => (h * 100L + i, hts(h, 5 * i))))
    val lost   = Seq((M, hts(1, 30)), (2 * M, hts(2, 30)), (3 * M, hts(4, 30)))
    val dir    = java.nio.file.Files.createTempDirectory("q180spec").toString
    (filler ++ lost).map { case (id, ts) => (id, ts, 1L, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsOps.backfillPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01 01", "2024-01-01 02", 2L, 2L),
      ("2024-01-01 04", "2024-01-01 04", 1L, 1L)), s"ranges: ${got.toSeq}")
    // testdata: missing-row totals conserve against the drop rule, and the
    // ranges are maximal (no two consecutive ranges touch)
    val sf = StatsOps.backfillPlan(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expectLost = graft.core.Tables.events(spark, Sf0001)
      .filter(pmod(col("event_id"), lit(M)) === 0).count()
    assert(sf.map(_._4).sum == expectLost, "loss conservation")
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    sf.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      val gap = (fmt.parse(b._1).getTime - fmt.parse(a._2).getTime) / 3600000L
      assert(gap >= 2, s"ranges must be maximal: $a then $b")
    }
    sf.foreach { case (s, e, nh, miss) =>
      assert((fmt.parse(e).getTime - fmt.parse(s).getTime) / 3600000L == nh - 1)
      assert(miss >= nh, "every hour in a range misses at least one row")
    }
  }

  test("q181: a heavy tail moves the mass median but not the count median; thresholds exact") {
    import spark.implicits._
    import graft.operators.StatsOps
    val dir = java.nio.file.Files.createTempDirectory("q181spec").toString
    // nine 10-char docs + one 1000-char doc: count median is 10, but the
    // single big doc holds 1000/1090 of the mass → every mass quantile ≥ p25
    // lands on 1000
    ((1 to 9).map(i => (i.toLong, "t", "en", "s", 10L)) :+ (10L, "t", "en", "s", 1000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StatsOps.weightedQuantiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq == Seq(
      ("_ALL", 1090L, 1000L, 1000L, 1000L, 1000L),
      ("s", 1090L, 1000L, 1000L, 1000L, 1000L)), s"heavy tail: ${got.toSeq}")
    // testdata: driver recompute of the integer threshold rule per source
    val sf = StatsOps.weightedQuantiles(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), Seq(r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))))
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def quantiles(vs: Seq[Long]): (Long, Seq[Long]) = {
      val hist = vs.groupBy(identity).view.mapValues(_.map(identity).sum).toSeq.sortBy(_._1)
      val wt   = hist.map(_._2).sum
      val cum  = hist.scanLeft(0L)(_ + _._2).tail.zip(hist.map(_._1))
      def pick(num: Long, den: Long) = cum.find { case (c, _) => c * den >= wt * num }.get._2
      (wt, Seq(pick(1, 4), pick(1, 2), pick(3, 4), pick(9, 10)))
    }
    val bySrc = docs.groupBy(_._1).view.mapValues(g => quantiles(g.map(_._2).toSeq)).toMap +
      ("_ALL" -> quantiles(docs.map(_._2).toSeq))
    sf.foreach { case (src, wt, qs) =>
      val (wWant, qWant) = bySrc(src)
      assert(wt == wWant && qs == qWant, s"$src: ($wt, $qs) vs ($wWant, $qWant)")
    }
    assert(sf.map(_._1).contains("_ALL"))
  }

  test("q182: a perfect daily period gives MASE 0; short series fall back to the day model") {
    import spark.implicits._
    import graft.operators.TimeJoins
    val dir = java.nio.file.Files.createTempDirectory("q182spec").toString
    // 72 hours of an exact period-24 pattern (hour-of-day h gets h%3+1
    // events) → day-naive error is identically 0; no week lag exists
    val evs = for {
      day <- 0 to 2; h <- 0 to 23; i <- 1 to (h % 3 + 1)
    } yield ((day * 100 + h * 4 + i).toLong,
      java.sql.Timestamp.valueOf(f"2024-01-0${day + 1} $h%02d:${5 * i}%02d:00"),
      1L, "a", 1.0, "{}")
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = TimeJoins.forecastBaseline(spark, dir).collect().head
    assert(r.getString(0) == "a" && r.getLong(1) == 72)
    assert(r.getDouble(2) > 0.0, "naive-1 must err on a periodic series")
    assert(r.getDouble(3) == 0.0 && r.getDouble(5) == 0.0, s"perfect day period: $r")
    assert(r.isNullAt(4) && r.isNullAt(6), "no week lag in 72 hours")
    assert(r.getString(7) == "day")
    // testdata: 720 h per type → week lag exists; best matches the exact
    // integer cross-comparison of the two seasonal MAEs
    val sf = TimeJoins.forecastBaseline(spark, Sf0001).collect()
    assert(sf.nonEmpty)
    sf.foreach { row =>
      assert(row.getLong(1) > 168 && !row.isNullAt(4) && !row.isNullAt(6))
      Seq(2, 3, 4).foreach(i => assert(row.getDouble(i) >= 0.0))
      val best = if (row.getDouble(5) <= row.getDouble(6)) "day" else "week"
      assert(row.getString(7) == best, s"best pick: $row")
    }
  }

  test("q183: _ALL aggregates the band rows; kept slots cover the distinct q25 pair set") {
    import graft.operators.TextOps
    val rows = TextOps.bucketBalance(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    val (all, per) = rows.partition(_._1 == -1L)
    assert(all.length == 1 && per.map(_._1).toSeq == (0L until per.length).toSeq)
    val a = all.head
    assert(a._2 == per.map(_._2).sum, "bucket counts roll up")
    assert(a._3 == per.map(_._3).max, "max bucket rolls up")
    assert(a._4 == per.map(_._4).sum && a._5 == per.map(_._5).sum && a._6 == per.map(_._6).sum)
    rows.foreach { r =>
      val share = if (r._5 + r._6 > 0)
        Some(BigDecimal(r._6.toDouble / (r._5 + r._6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
      assert(r._7 == share, s"drop share: $r")
    }
    // kept pair SLOTS (multi-band duplicates included) must cover the
    // distinct candidate set q25 actually emits
    val nPairs = TextOps.minhashLsh(spark, Sf0001).count()
    assert(a._5 >= nPairs, s"slots ${a._5} < distinct pairs $nPairs")
  }

  test("q184: fan-out profile matches driver recomputation; populations conserve") {
    import graft.operators.StatsOps
    val rows = StatsOps.fkProfile(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getLong(7),
        if (r.isNullAt(8)) None else Some(r.getDouble(8))))
    assert(rows.map(_._1).toSeq == StatsOps.FkRels.map(_._1).sorted)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    StatsOps.FkRels.foreach { case (name, pt, pk, ct, fk) =>
      val parents = graft.core.Tables.t(spark, Sf0001, pt)
        .select(col(pk).cast("long")).distinct().collect().map(_.getLong(0)).toSet
      val kids = graft.core.Tables.t(spark, Sf0001, ct)
        .select(col(fk).cast("long")).collect().map(_.getLong(0))
      val fanout = kids.filter(parents).groupBy(identity).view.mapValues(_.size.toLong)
      val row = rows.find(_._1 == name).get
      assert(row._2 == parents.size, s"$name parents")
      assert(row._3 == fanout.values.sum, s"$name matched children")
      assert(row._4 == parents.count(p => !fanout.contains(p)), s"$name childless")
      assert(row._5 == kids.count(k => !parents(k)), s"$name orphans")
      val mins = parents.toSeq.map(p => fanout.getOrElse(p, 0L))
      assert(row._6 == mins.min && row._8 == mins.max, s"$name min/max")
      assert(row._7 == r6(row._3.toDouble / row._2), s"$name avg")
      assert(row._9 == (if (row._3 > 0) Some(r6(row._8.toDouble * row._2 / row._3)) else None))
    }
    // orders->lineitem: every lineitem must have an order (no orphans)
    assert(rows.find(_._1 == "orders->lineitem").get._5 == 0L)
  }

  test("q185: yield flags match q20/q47 keepers; _ALL conserves; yields bounded") {
    import graft.operators.{CurationOps, TextOps}
    val rows = CurationOps.dedupYield(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8)))
    val (all, per) = rows.partition(_._1 == "_ALL")
    assert(all.length == 1 && per.nonEmpty)
    val a = all.head
    Seq[((String, Long, Long, Long, Long, Long, Long, Double, Double)) => Long](
      _._2, _._3, _._4, _._5, _._6, _._7).foreach(f => assert(f(a) == per.map(f).sum, "rollup"))
    // exact keeper count == q20's distinct-hash group count
    val nExactGroups = TextOps.dedupExact(spark, Sf0001).count()
    assert(a._4 == nExactGroups, s"exact keepers ${a._4} vs q20 groups $nExactGroups")
    // fuzzy keeper count == corpus − (clustered docs − clusters)
    val cl = CurationOps.dupClusters(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a._6 == a._2 - (cl.length - cl.map(_._2).distinct.length), "fuzzy keepers")
    rows.foreach { r =>
      assert(r._4 <= r._2 && r._6 <= r._2 && r._5 <= r._3 && r._7 <= r._3, s"bounds: $r")
      assert(r._8 > 0.0 && r._8 <= 1.0 && r._9 > 0.0 && r._9 <= 1.0)
    }
  }

  test("q186: a metronome user flags bot_like, a bursty human doesn't; singletons stay NULL") {
    import spark.implicits._
    import graft.operators.TimeJoins
    val dir = java.nio.file.Files.createTempDirectory("q186spec").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // user 1: 25 events exactly 60 s apart, one event type → CV = 0, bot
    // user 2: 25 events with wildly varying gaps, three types → human
    // user 3: a single event → no gaps, NULL stats, not bot
    val bot = (0 until 25).map(i =>
      (100L + i, new java.sql.Timestamp(t0 + i * 60000L), 1L, "view", 1.0, "{}"))
    val gaps = Seq(5L, 600L, 30L, 3600L, 12L, 7200L, 90L, 1L, 1800L, 45L, 300L, 8L,
      5400L, 20L, 900L, 60L, 2L, 2400L, 33L, 150L, 75L, 10000L, 7L, 480L)
    val humanTs = gaps.scanLeft(0L)(_ + _).map(s => new java.sql.Timestamp(t0 + s * 1000L))
    val human = humanTs.zipWithIndex.map { case (ts, i) =>
      (200L + i, ts, 2L, Seq("view", "click", "purchase")(i % 3), 1.0, "{}")
    }
    val lone = Seq((300L, new java.sql.Timestamp(t0), 3L, "signup", 1.0, "{}"))
    (bot ++ human ++ lone)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.botScreen(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getLong(4), r.getDouble(5), r.getBoolean(6))).toMap
    val b = got(1L)
    assert(b._1 == 25 && b._2.contains(60.0) && b._3.contains(0.0) && b._4 == 1 &&
      b._5 == 1.0 && b._6, s"metronome: $b")
    val h = got(2L)
    assert(h._1 == 25 && h._3.get > 1.0 && h._4 == 3 && !h._6, s"human: $h")
    val l = got(3L)
    assert(l._1 == 1 && l._2.isEmpty && l._3.isEmpty && !l._6, s"singleton: $l")
    // testdata: population conserved; verdict consistent with the screen rule
    val sf = TimeJoins.botScreen(spark, Sf0001).collect()
    assert(sf.map(_.getLong(1)).sum == graft.core.Tables.events(spark, Sf0001).count())
    sf.foreach { r =>
      val bot = !r.isNullAt(3) && r.getLong(1) >= TimeJoins.BotMinEvents &&
        r.getDouble(3) < TimeJoins.BotMaxCv + 1e-12
      if (r.getBoolean(6)) assert(bot, s"flag implies rule: $r")
    }
  }

  test("q187: bias rows agree with q185's keepers and a driver mean recomputation") {
    import graft.operators.{CurationOps, TimeJoins => _}
    val rows = CurationOps.dedupBias(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(8)) None else Some(r.getDouble(8)))).toMap
    val yieldRows = CurationOps.dedupYield(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(5))).toMap
    // kept/dropped counts are q185's fuzzy keeper numbers, per source
    rows.foreach { case (src, (k, d, _, _)) =>
      val (n, fk) = yieldRows(src)
      assert(k == fk && d == n - fk, s"$src keeper counts: ($k, $d) vs ($fk, ${n - fk})")
    }
    // _ALL deltas agree with a driver-side recomputation from the keeper rule
    val cl = CurationOps.dupClusters(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dropped = cl.filter { case (doc, lbl) => doc != lbl }.map(_._1).toSet
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (dr, ke) = docs.partition(d => dropped(d._1))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = r6(ke.map(_._2).sum.toDouble / ke.length - dr.map(_._2).sum.toDouble / dr.length)
    assert(rows("_ALL")._3.contains(want), s"delta_chars: ${rows("_ALL")._3} vs $want")
  }

  test("q188: planted disorder lands exact order stats; in-order feeds profile to zero") {
    import spark.implicits._
    import graft.operators.TimeJoins
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("q188spec").toString
    // type "a": ids 1..10 in ingest order; events 4 and 8 arrive 30 s and
    // 120 s behind the frontier, the rest advance it (lateness 0)
    val ts = Seq("10:00:00", "10:01:00", "10:02:00", "10:01:30", "10:04:00",
      "10:05:00", "10:06:00", "10:04:00", "10:08:00", "10:09:00")
    val a = ts.zipWithIndex.map { case (s, i) =>
      ((i + 1).toLong, t(s"2024-01-01 $s"), 1L, "a", 1.0, "{}")
    }
    // type "b": perfectly in order
    val b = (0 until 5).map(i =>
      (100L + i, t(f"2024-01-01 11:0$i%01d:00"), 2L, "b", 1.0, "{}"))
    (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeJoins.watermarkProfile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    // lateness multiset for "a": eight 0s, one 30, one 120 → p50=0, p90=30
    // (cum 9/10 at 30), p99=120, max=120
    assert(got("a") == ((10L, 0.8, 0L, 30L, 120L, 120L)), s"disorder: ${got("a")}")
    assert(got("b") == ((5L, 1.0, 0L, 0L, 0L, 0L)), s"in-order: ${got("b")}")
    // testdata: order stats are monotone and bounded by max; share in (0,1]
    val sf = TimeJoins.watermarkProfile(spark, Sf0001).collect()
    assert(sf.nonEmpty)
    sf.foreach { r =>
      val (p50, p90, p99, mx) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx, s"monotone: $r")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("q162: half-centroid cosine matches a driver recomputation; shares sum to 1") {
    import graft.operators.VectorOps
    val rows = VectorOps.embeddingDrift(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3, "share_a mass")
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-3, "share_b mass")
    // driver recomputation for one label through the same quantized sums
    val label0 = rows.head.getInt(0)
    val vecs = graft.core.Tables.embeddings(spark, Sf0001)
      .filter(col("label") === label0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def sumVec(half: Array[Array[Float]]): Array[Double] = {
      val d  = half.head.length
      val out = Array.fill(d)(0L)
      half.foreach(v => (0 until d).foreach(i =>
        out(i) += math.round(v(i).toDouble * 1000000)))
      out.map(_.toDouble)
    }
    val sa = sumVec(vecs.filter(_._1 % 2 == 0).map(_._2))
    val sb = sumVec(vecs.filter(_._1 % 2 != 0).map(_._2))
    def dot(x: Array[Double], y: Array[Double]) =
      x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
    val want = dot(sa, sb) / (math.sqrt(dot(sa, sa)) * math.sqrt(dot(sb, sb)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getDouble(3) == r6(want), s"cos: ${rows.head} want $want")
    assert(rows.head.getLong(1) == vecs.count(_._1 % 2 == 0).toLong)
    assert(rows.head.getLong(2) == vecs.count(_._1 % 2 != 0).toLong)
  }

  test("q163: S-curves behave and corpus-weighted columns match a driver fold") {
    import graft.operators.TextOps
    val rows = TextOps.lshPlanner(spark, Sf0001).collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq == TextOps.LshConfigs)
    // more bands (shorter rows) = higher candidate probability everywhere
    Seq(2, 3, 4).foreach { c =>
      val ps = rows.map(_.getDouble(c))
      assert(ps.zip(ps.tail).forall { case (hi, lo) => hi >= lo },
        s"S-curve monotone in b at probe col $c: ${ps.toSeq}")
    }
    // driver fold over the exact pair table reproduces the weighted columns
    val pairs = graft.operators.SharedStages.exactPairs(spark, Sf0001)
      .select(col("jaccard")).collect().map(_.getDouble(0))
    def powC(x: Double, n: Int): Double = if (n == 1) x else { val h = powC(x, n / 2); h * h }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val (b, rr) = (r.getInt(0), r.getInt(1))
      def pq(j: Double) =
        math.round((1.0 - powC(1.0 - powC(j, rr), b)) * 1000000).toLong
      val tru = pairs.filter(_ >= 0.9)
      val sub = pairs.filter(_ < 0.9)
      assert(r.getLong(6) == tru.length.toLong && r.getLong(8) == sub.length.toLong)
      assert(r.getDouble(5) == r6(tru.map(pq).sum.toDouble / (tru.length * 1000000.0)),
        s"recall: $r")
      val wantSub = BigDecimal(sub.map(pq).sum.toDouble / 1000000.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(7) == wantSub, s"sub load: $r")
    }
  }

  test("q164: agreement stats match a driver recomputation over both legs") {
    import graft.operators.{BoundedRank, CurationOps, VectorOps}
    val row = CurationOps.rankAgreement(spark, Sf0001).collect().head
    val text = BoundedRank
      .byValueDesc(CurationOps.bm25(spark, Sf0001), col("score"), col("doc_id"), "doc_id", "rt")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vec = VectorOps
      .cosineRanksForQuery(spark, Sf0001, CurationOps.HybridVecId, CurationOps.HybridK)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val common = (text.keySet & vec.keySet).toSeq.sorted
    val n      = common.length.toLong
    assert(row.getLong(0) == n && row.getLong(1) == n * (n - 1) / 2, s"grain: $row")
    if (n >= 2) {
      val rtt = common.sortBy(text).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val rvv = common.sortBy(vec).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val pairs = for { i <- common.indices; j <- i + 1 until common.length }
        yield (common(i), common(j))
      val c = pairs.count { case (x, y) => (rtt(x) - rtt(y)) * (rvv(x) - rvv(y)) > 0 }.toLong
      val d = pairs.length.toLong - c
      assert(row.getLong(2) == c && row.getLong(3) == d, s"concordance: $row want ($c,$d)")
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getDouble(4) == r6((c - d).toDouble / (n * (n - 1) / 2)), s"tau: $row")
      val sd2 = common.map(id => { val dd = rtt(id) - rvv(id); dd.toLong * dd }).sum
      assert(row.getDouble(5) == r6(1.0 - 6.0 * sd2 / (n * (n * n - 1)).toDouble), s"rho: $row")
      assert(math.abs(row.getDouble(4)) <= 1.0 && math.abs(row.getDouble(5)) <= 1.0 + 1e-9)
    }
  }

  test("q165: balance cells reconcile with q40's splits; shares sum per split") {
    import graft.operators.TrainingOps
    val rows = TrainingOps.splitBalance(spark, Sf0001).collect()
    // cells reconcile with the q40 assignment joined to sources
    val splits = TrainingOps.splitHash(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val srcs = graft.core.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (splits(r.getLong(0)), r.getString(1)))
    val census = srcs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.length == census.size, s"cells: ${rows.length}")
    rows.foreach(r =>
      assert(r.getLong(2) == census((r.getString(0), r.getString(1))), s"cell: $r"))
    // within each split the shares sum to ~1; deviations are consistent
    rows.groupBy(_.getString(0)).foreach { case (sp, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-3, s"share mass for $sp")
    }
    rows.foreach(r =>
      assert(math.abs(r.getDouble(5) - (r.getDouble(3) - r.getDouble(4))) < 2e-6, s"dev: $r"))
  }

  test("q150: advisor rows match a brute-force key census and ceiling math") {
    import graft.operators.Skew
    val rows = Skew.skewAdvisor(spark, Sf0001).collect()
    assert(rows.length == Skew.AdvisorTopK, s"rows: ${rows.length}")
    val census = graft.core.Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n      = census.map(_._2).sum
    val target = (n + Skew.AdvisorTasks - 1) / Skew.AdvisorTasks
    val want   = census.sortBy { case (uid, c) => (-c, uid) }.take(Skew.AdvisorTopK)
    rows.zip(want).foreach { case (r, (uid, c)) =>
      assert(r.getLong(0) == uid && r.getLong(1) == c, s"rank order: $r want ($uid,$c)")
      assert(r.getLong(3) == target, s"target_rows: $r")
      assert(r.getLong(4) == (c + target - 1) / target, s"salt_k: $r")
      assert(r.getLong(4) >= 1, s"salt_k floor: $r")
    }
  }

  test("q193: the two DP releases are one scale family (n20 = n05/4 before rounding)") {
    // same u serves both eps as a pure 1/eps scale: the e20 noise must be
    // a quarter of the e05 noise up to the independent 6-dp rounds
    val r = graft.operators.CurationOps.dpHistogram(spark, Sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val c   = row.getLong(2).toDouble
      val n05 = row.getDouble(3) - c
      val n20 = row.getDouble(4) - c
      assert(math.abs(n20 - n05 / 4.0) < 1e-5, s"scale family broken: $row")
    }
    // noise is two-sided across the table (some cells above, some below)
    assert(r.exists(row => row.getDouble(3) > row.getLong(2)) &&
      r.exists(row => row.getDouble(3) < row.getLong(2)))
  }

  test("q197: silhouettes live in [-1,1] and negative counts match the rows") {
    val r = graft.operators.VectorOps.silhouette(spark, Sf0001).collect()
    assert(r.length == graft.operators.VectorOps.IvfCells)
    r.foreach { row =>
      val mean = row.getDouble(2); val mn = row.getDouble(3)
      assert(mean >= -1.0 - 1e-9 && mean <= 1.0 + 1e-9, s"mean out of range: $row")
      assert(mn <= mean + 1e-9, s"min above mean: $row")
      assert(row.getLong(4) <= row.getLong(1), s"more negatives than members: $row")
    }
    // the quantizer is coherent: someone somewhere is positive
    assert(r.exists(_.getDouble(2) > 0.0))
  }

  test("q198: sync plan conserves bytes and the _ALL row is the true global plan") {
    val r = graft.operators.CurationOps.syncPlan(spark, Sf0001).collect()
      .map(row => row.getString(0) -> row).toMap
    val all = r("_ALL")
    r.foreach { case (_, row) =>
      assert(row.getLong(6) <= row.getLong(2), s"sends more than it has: $row")
      assert(row.getLong(4) + 0 >= row.getLong(5), s"shared exceeds distinct: $row")
    }
    // global dedup can only shrink the plan vs summing per-source sends
    val perSourceSend = r.filter(_._1 != "_ALL").values.map(_.getLong(6)).sum
    assert(all.getLong(6) <= perSourceSend, "global plan exceeds per-source upper bounds")
    assert(all.getLong(1) == r.filter(_._1 != "_ALL").values.map(_.getLong(1)).sum)
  }

  test("q200: shares sum to 1 and upsampled sources bind first") {
    val r = graft.operators.CurationOps.epochPlanner(spark, Sf0001).collect()
    assert(math.abs(r.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    assert(math.abs(r.map(_.getDouble(5)).sum - 1.0) < 1e-4)
    assert(r.count(_.getBoolean(7)) >= 1)
    // capacity p/q < 1 exactly when the temperature mix upsamples (q > p)
    r.foreach { row =>
      val p = row.getDouble(4); val q = row.getDouble(5); val cap = row.getDouble(6)
      if (q > p + 1e-9) assert(cap < 1.0 + 1e-6, s"upsampled but capacity >= 1: $row")
      if (q < p - 1e-9) assert(cap > 1.0 - 1e-6, s"downsampled but capacity <= 1: $row")
    }
    // the binding source has the smallest capacity
    val minCap = r.map(_.getDouble(6)).min
    r.filter(_.getBoolean(7)).foreach(row => assert(row.getDouble(6) == minCap))
  }

  test("D6: binary CDC chunks tile payloads and survive a prefix insertion") {
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRecord
    val rng  = new scala.util.Random(7)
    val base = Array.fill(4096)(rng.nextInt(256).toByte)
    val pre  = Array.fill(37)(rng.nextInt(256).toByte)
    val recs = Seq(
      MediaRecord(1L, base, "image/fake", 64, 64, "src0"),
      MediaRecord(2L, base.clone(), "image/fake", 64, 64, "src0"),   // verbatim copy
      MediaRecord(3L, pre ++ base, "image/fake", 64, 64, "src1"),    // prefix-edited
      MediaRecord(4L, Array.fill(4096)(rng.nextInt(256).toByte), "image/fake", 64, 64, "src2"))
    val ds = spark.createDataset(recs)
    // chunks tile each payload exactly
    Multimodal.mediaChunks(ds).collect().groupBy(_.media_id).foreach { case (id, cs) =>
      val tot = cs.map(_.clen).sum
      val exp = recs.find(_.media_id == id).get.payload.length
      assert(tot == exp, s"media $id: chunks cover $tot of $exp bytes")
      assert(cs.map(_.chunk_idx).sorted.toSeq == (0 until cs.length), s"media $id: gap in idx")
    }
    val r = Multimodal.mediaChunkDedupOf(ds).collect()
      .map(row => row.getLong(0) -> row).toMap
    assert(r(2).getDouble(5) == 1.0, "verbatim copy must dedup every byte")
    assert(r(3).getDouble(5) > 0.5,
      s"prefix-edited payload kept only ${r(3).getDouble(5)} dup bytes — boundaries did not re-align")
    assert(r(1).getDouble(5) == 0.0 && r(4).getDouble(5) == 0.0, "owners carry no dup bytes")
  }
}
