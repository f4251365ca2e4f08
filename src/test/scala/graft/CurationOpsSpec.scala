package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, TextOps}

/** Specs for the corpus-curation operators (q47-q51). Ground truth is
  * recomputed independently in driver-side Scala (union-find, regex on
  * planted strings, the BM25 formula over a hand-built corpus) — never by
  * trusting the operator's own plan.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- q47 ------------------------------------------------------------------

  test("q47: cluster assignment equals union-find over the verified pairs") {
    val pairs = TextOps
      .ngramJaccard(spark, Sf0001)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture corpus must contain near-dup pairs")

    // driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    val expectedSizes = expected.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }

    val got = CurationOps
      .dupClusters(spark, Sf0001)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
    assert(got.map(g => g._1 -> g._2).toMap == expected)
    got.foreach { case (_, c, sz) => assert(sz == expectedSizes(c)) }
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
  }

  test("q47: star contraction converges in O(log n) rounds on an adversarial chain") {
    import spark.implicits._
    // 64-node path graph 0-1-2-…-63: diameter 63, so plain min-label
    // propagation needs 63 rounds; large-star/small-star must stay
    // logarithmic. The bound is intentionally loose (2·log2 n) — the point
    // is the order of growth, not the exact constant.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = CurationOps.starContract(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 63L).map(_ -> 0L).toMap, "every chain node must label to the min id")
    assert(rounds <= 12, s"chain took $rounds rounds — propagation-like, not logarithmic")

    // two components + a singleton-free check: nodes only ever appear with
    // their own component's min
    val two = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("src", "dst")
    val (l2, _) = CurationOps.starContract(two)
    assert(l2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("q47: star contraction equals union-find on random graphs (property check)") {
    import spark.implicits._
    // deterministic seed: sparse, dense, and multi-component regimes; each
    // compared against a driver-side union-find ground truth
    val rng = new scala.util.Random(20260813L)
    for ((nodes, edgeCount) <- Seq((30, 15), (40, 80), (200, 60))) {
      val edges = Seq.fill(edgeCount)((rng.nextInt(nodes).toLong, rng.nextInt(nodes).toLong))
        .filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // canonical min-id label per node (union-find roots are not min ids)
      val members  = parent.keys.groupBy(find)
      val expected = members.values.flatMap { ns => val m = ns.min; ns.map(_ -> m) }.toMap
      val (labels, rounds) = CurationOps.starContract(edges.toDF("src", "dst"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"n=$nodes e=$edgeCount diverged from union-find")
      assert(rounds <= 12, s"n=$nodes e=$edgeCount took $rounds rounds")
    }
  }

  // --- q56 ------------------------------------------------------------------

  test("q56: every cluster keeps its longest member (ties to lower id)") {
    val toksLen = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").length.toLong)).toMap
    val clusters = CurationOps.dupClusters(spark, Sf0001)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
    val expected = clusters
      .groupBy(_._2)
      .map { case (cid, ms) =>
        val best = ms.map(_._1).minBy(id => (-toksLen(id), id))
        (cid, best, toksLen(best), ms.head._3)
      }
      .toSeq.sortBy(_._1)
    val got = CurationOps.clusterBest(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the rule must differ from min-id somewhere, or it isn't testing anything
    assert(got.exists { case (cid, keep, _, _) => keep != cid },
      "fixture should contain a cluster whose longest member is not the min id")
  }

  // --- q48 ------------------------------------------------------------------

  test("q48: planted PII is counted and scrubbed; clean text passes through") {
    val planted = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 10.0.0.1 now"),
      (2L, "call 555-123-4567 about the secret password key"),
      (3L, "nothing sensitive here at all"),
      (4L, "two mails a@b.io c@d.org one ip 192.168.1.255 and token"),
      // category overlap: the IP pass consumes 1.2.3.444, the counted phone
      // 444.555.6666 no longer matches — the residual pass must catch it
      (5L, "ip then phone 1.2.3.444.555.6666 end")
    ).toDF("doc_id", "text")
    val got = CurationOps
      .scrub(planted)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_email"), r.getAs[Long]("n_ip"),
          r.getAs[Long]("n_phone"), r.getAs[Long]("n_block"), r.getAs[String]("scrub_md5")))

    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)).toSeq == Seq(
      (1L, 1L, 1L, 0L, 0L),
      (2L, 0L, 0L, 1L, 3L),
      (3L, 0L, 0L, 0L, 0L),
      (4L, 2L, 1L, 0L, 1L),
      (5L, 0L, 1L, 1L, 0L)
    ))
    // scrubbed content check: md5 of the hand-scrubbed strings
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expectedScrubbed = Seq(
      "contact <EMAIL> or <IP> now",
      "call <PHONE> about the <TERM> <TERM> <TERM>",
      "nothing sensitive here at all",
      "two mails <EMAIL> <EMAIL> one ip <IP> and <TERM>",
      "ip then phone <IP>.<NUM> end"
    )
    assert(got.map(_._6).toSeq == expectedScrubbed.map(md5hex))
  }

  // --- q49 ------------------------------------------------------------------

  test("q49: scores equal the BM25 formula computed independently") {
    val corpus = Seq(
      (1L, "data data hash window filler filler filler filler"),
      (2L, "data only once with more tokens than the first one here"),
      (3L, "window window window hash"),
      (4L, "no query terms at all in this document"),
      (5L, "hash")
    ).toDF("doc_id", "text")

    // independent recomputation with plain Scala doubles
    val toks = Map(
      1L -> "data data hash window filler filler filler filler".split(" ").toSeq,
      2L -> "data only once with more tokens than the first one here".split(" ").toSeq,
      3L -> "window window window hash".split(" ").toSeq,
      4L -> "no query terms at all in this document".split(" ").toSeq,
      5L -> Seq("hash"))
    val n     = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def score(id: Long): Double = {
      val dl = toks(id).size.toDouble
      CurationOps.BmQuery.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        val df = toks.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * (tf * (CurationOps.BmK1 + 1)) /
          (tf + CurationOps.BmK1 * ((1 - CurationOps.BmB) + CurationOps.BmB * dl / avgdl))
      }.sum
    }
    val expected = toks.keys.toSeq
      .filter(id => CurationOps.BmQuery.exists(toks(id).contains))
      .map(id => id -> BigDecimal(score(id)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .sortBy { case (id, s) => (-s, id) }

    val got = CurationOps
      .bm25Of(corpus)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .toSeq
    assert(got == expected)
    // the all-filler doc must not appear
    assert(!got.exists(_._1 == 4L))
  }

  // --- q50 ------------------------------------------------------------------

  test("q50: per-shard layout is gapless and offsets are consistent") {
    val rows = CurationOps
      .packSequences(spark, Sf0001)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("n_tok"),
          r.getAs[Long]("begin_seq"), r.getAs[Long]("end_seq"), r.getAs[Long]("offset_in_seq")))
    assert(rows.length == 500)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (_, _, nTok, beginSeq, endSeq, off) =>
        assert(beginSeq == cum / CurationOps.PackSeqLen)
        assert(off == cum % CurationOps.PackSeqLen)
        assert(endSeq == (cum + nTok - 1) / CurationOps.PackSeqLen)
        assert(beginSeq <= endSeq)
        cum += nTok // gapless: next doc starts exactly where this one ended
      }
    }
    // shards are content-stable, not clustered by id range
    assert(rows.map(_._2).distinct.length == CurationOps.PackShards)
  }

  // --- q52 ------------------------------------------------------------------

  test("q52: batch verdicts match an independent recomputation") {
    val d = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md5 = d.map { case (id, t) =>
      id -> java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.toMap
    val pairs = TextOps.ngramJaccard(spark, Sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))

    val expected = d.map(_._1).filter(_ % 2 != 0).sorted.map { id =>
      val h = md5(id)
      val exact = d.exists { case (o, _) =>
        o != id && md5(o) == h && (o % 2 == 0 || o < id)
      }
      val near = pairs.exists { case (a, b) =>
        (b == id && (a % 2 == 0 || a < id)) || (a == id && b % 2 == 0)
      }
      (id, if (exact) "exact_dup" else if (near) "near_dup" else "kept")
    }.toSeq
    val got = CurationOps.incrementalDedup(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == expected)
    assert(got.exists(_._2 != "kept"), "fixture must contain dropped batch docs")
  }

  // --- q53 ------------------------------------------------------------------

  test("q53: repeat counts realize the recipe weights exactly") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val got = CurationOps.mixWeights(spark, Sf0001)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Double]("weight"), r.getAs[Long]("n_repeats")))
    assert(got.length == 500)
    got.foreach { case (id, src, w, n) =>
      val idx = src.drop(3).toInt
      assert(w == 0.5 + (idx % 4) * 0.75)
      val thr = ((idx % 4).toLong * 750000L + 500000L) % CurationOps.MixResolution
      val hmod = {
        val m = XXH64.hashLong(id, 42) % CurationOps.MixResolution
        if (m < 0) m + CurationOps.MixResolution else m
      }
      val expected = w.toLong + (if (hmod < thr) 1L else 0L)
      assert(n == expected, s"doc $id: got $n, expected $expected")
    }
    // every source with a fractional weight must split both ways somewhere
    val bySrc = got.groupBy(g => g._2.drop(3).toInt % 4)
    Seq(0, 1, 3).foreach { m =>
      val ns = bySrc(m).map(_._4).toSet
      assert(ns.size == 2, s"weight class $m should mix floor and floor+1, saw $ns")
    }
    assert(bySrc(2).map(_._4).toSet == Set(2L), "integer weight 2.0 never rounds")
  }

  // --- q55 ------------------------------------------------------------------

  test("q55: hybrid RRF fuses independently recomputed BM25 and cosine ranks") {
    // text leg: BM25 over the real sf0.001 corpus, recomputed in Scala
    val d = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
    val n     = d.length.toDouble
    val avgdl = d.map(_._2.size).sum.toDouble / n
    val dfs   = CurationOps.BmQuery.map(t => t -> d.count(_._2.contains(t)).toDouble).toMap
    def bm25Score(toks: Seq[String]): Double = {
      val dl = toks.size.toDouble
      CurationOps.BmQuery.map { t =>
        val tf  = toks.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
        idf * (tf * (CurationOps.BmK1 + 1)) /
          (tf + CurationOps.BmK1 * ((1 - CurationOps.BmB) + CurationOps.BmB * dl / avgdl))
      }.sum
    }
    val textRanks = d
      .filter { case (_, toks) => CurationOps.BmQuery.exists(toks.contains) }
      .map { case (id, toks) =>
        (id, BigDecimal(bm25Score(toks)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap

    // vector leg: cosine vs vec 0, recomputed with the same left-fold order
    val vecs = graft.core.Tables.embeddings(spark, Sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .filter { case (_, v) => math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)) > 0 }
    val q0 = vecs.find(_._1 == CurationOps.HybridVecId).get._2
    def nrm(v: Array[Double]) = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    val vecRanks = vecs
      .filter(_._1 != CurationOps.HybridVecId)
      .map { case (id, v) =>
        val dot = (0 until v.length).foldLeft(0.0)((a, i) => a + q0(i) * v(i))
        (id, dot / (nrm(q0) * nrm(v)))
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(CurationOps.HybridK)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap

    val expected = (textRanks.keySet ++ vecRanks.keySet).toSeq
      .map { id =>
        val rrf = textRanks.get(id).map(r => 1.0 / (r + CurationOps.RrfC)).getOrElse(0.0) +
          vecRanks.get(id).map(r => 1.0 / (r + CurationOps.RrfC)).getOrElse(0.0)
        (id, rrf)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(CurationOps.HybridTopK)

    val got = CurationOps.hybridRrf(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
    // the fusion must actually mix legs: some top doc carries both ranks
    assert(expected.exists { case (id, _) => textRanks.contains(id) && vecRanks.contains(id) } ||
      expected.map(_._1).toSet.intersect(textRanks.keySet).nonEmpty &&
        expected.map(_._1).toSet.intersect(vecRanks.keySet).nonEmpty)
  }

  // --- q54 ------------------------------------------------------------------

  test("q54: source overlap matrix matches an independent recomputation") {
    val d = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val docGrams = d.map { case (id, src, t) =>
      (id, src, t.trim.split("\\s+").toSeq.sliding(CurationOps.OverlapN)
        .filter(_.size == CurationOps.OverlapN).map(_.mkString(" ")).toSeq.distinct)
    }.filter(_._3.nonEmpty)
    val df = docGrams.flatMap(_._3).groupBy(identity).map { case (g, xs) => g -> xs.size }
    val srcGrams = docGrams
      .flatMap { case (_, src, gs) => gs.filter(df(_) <= CurationOps.OverlapMaxDf).map(src -> _) }
      .distinct
    val expected = srcGrams
      .groupBy(_._2)
      .toSeq
      .flatMap { case (_, xs) =>
        val ss = xs.map(_._1).distinct.sorted
        for { i <- ss.indices; j <- (i + 1) until ss.size } yield (ss(i), ss(j))
      }
      .groupBy(identity)
      .map { case ((a, b), xs) => (a, b, xs.size.toLong) }
      .toSeq.sortBy(x => (x._1, x._2))

    val got = CurationOps.sourceOverlap(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "planted near-dups must create cross-source overlap")
  }

  // --- q51 ------------------------------------------------------------------

  test("q51: a mosaic duplicate is flagged; novel docs are not") {
    val words  = ('a' to 'z').map(_.toString)
    val docA   = words.take(16).mkString(" ")            // 16 tokens → 9 grams
    val docB   = words.drop(10).take(16).mkString(" ")   // overlaps A on 10..15
    // stitched from the WHOLE of A and B: 25 grams, 18 owned by 1/2, the 7
    // seam-spanning grams novel → coverage 0.72 ≥ the 0.5 cut
    val mosaic = (words.take(16) ++ words.drop(10).take(16)).mkString(" ")
    val novel  = words.reverse.take(16).mkString(" ")
    val corpus = Seq((1L, docA), (2L, docB), (3L, mosaic), (4L, novel)).toDF("doc_id", "text")

    // independent ground truth: distinct 8-grams, owner = min doc_id
    val grams: Map[Long, Seq[String]] = Map(
      1L -> docA, 2L -> docB, 3L -> mosaic, 4L -> novel
    ).map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(CurationOps.CovN).map(_.mkString(" ")).toSeq.distinct
    }
    val owner = grams.toSeq
      .flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expected = grams.map { case (id, gs) =>
      val seen = gs.count(g => owner(g) < id).toLong
      val cov = BigDecimal(seen.toDouble / gs.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, gs.size.toLong, seen, cov, cov >= CurationOps.CovDupCut)
    }.toSeq.sortBy(_._1)

    val got = CurationOps
      .gramCoverageOf(corpus)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"), r.getAs[Long]("n_seen"),
          r.getAs[Double]("coverage"), r.getAs[Boolean]("is_dup")))
      .toSeq
    assert(got == expected)
    val byId = got.map(g => g._1 -> g._5).toMap
    assert(byId(3L), "the stitched mosaic doc must be flagged")
    assert(!byId(1L) && !byId(4L), "first owner and novel docs must pass")
  }

  test("q66: NB classifier separates planted domains and beats chance on the corpus") {
    val planted = (
      Seq.tabulate(10)(i => (i.toLong, s"alpha beta gamma delta extra$i", "catA")) ++
        Seq.tabulate(10)(i => ((i + 10).toLong, s"omega psi chi phi other$i", "catB"))
    ).toDF("doc_id", "text", "source")
    val got = operators.CurationOps.nbClassifyOf(planted).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    (0L to 9L).foreach(i => assert(got(i) == "catA", s"doc $i"))
    (10L to 19L).foreach(i => assert(got(i) == "catB", s"doc $i"))
    // corpus: 20 classes, chance = 5 % — the synthetic sources separate
    val corpus = operators.CurationOps.nbClassify(spark, Sf0001).collect()
    val acc    = corpus.count(_.getBoolean(3)).toDouble / corpus.length
    assert(acc > 0.15, s"training accuracy $acc not above chance")
  }

  // --- q57 ------------------------------------------------------------------

  test("q68: bigram-LM cross-entropy matches an independent recomputation") {
    import spark.implicits._
    val B = CurationOps.LmBuckets
    val corpus = Seq(
      (0L, "the cat sat", "s0"),
      (1L, "the cat ran", "s0"),
      (2L, "solo", "s1") // one token → no pairs → (0, NULL)
    ).toDF("doc_id", "text", "source")
    val got = CurationOps.lmScoreOf(corpus).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    // independent recomputation: buckets via the SQL builtin xxhash64
    // (interpreted path, not the compiled expression), arithmetic in Scala
    def bucketsOf(vals: Seq[String]): Map[String, Long] =
      vals.distinct.toDF("t")
        .selectExpr("t", s"pmod(xxhash64(t), $B) AS f")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs    = Seq("the cat sat", "the cat ran", "solo").map(_.split(" ").toSeq)
    val unis    = docs.flatten
    val bis     = docs.flatMap(t => t.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
    val uniF    = bucketsOf(unis)
    val biF     = bucketsOf(bis)
    val cu      = unis.groupBy(uniF).view.mapValues(_.size.toLong).toMap
    val cb      = bis.groupBy(biF).view.mapValues(_.size.toLong).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def xent(toks: Seq[String]): Option[Double] = {
      val pairs = toks.sliding(2).filter(_.size == 2).toSeq
      if (pairs.isEmpty) None
      else {
        val s = pairs.foldLeft(0.0) { (acc, p) =>
          acc + r6(StrictMath.log(
            (cb.getOrElse(biF(p.mkString(" ")), 0L) + 1).toDouble /
              (cu.getOrElse(uniF(p.head), 0L) + B).toDouble))
        }
        Some(r6(-s / pairs.size))
      }
    }
    assert(got(2L) == ((0L, None)))
    assert(got(0L) == ((2L, xent(docs(0)))))
    assert(got(1L) == ((2L, xent(docs(1)))))
    // "the cat" repeats across docs while "cat sat" is unique, so doc 0's
    // first pair must be more probable (smaller surprisal) than its second
    assert(got(0L)._2.get > 0, "cross-entropy of a finite corpus is positive")
  }

  test("q70: temperature mix flattens the source distribution toward uniform") {
    val rows = CurationOps.temperatureMix(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // probabilities are a distribution
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    // recompute from raw counts: prob_s = sqrt(p_s) / Σ sqrt(p)
    val n     = rows.map(_._2).sum.toDouble
    val sumW  = rows.sortBy(_._1).foldLeft(0.0)((a, r) => a + math.sqrt(r._2 / n))
    rows.foreach { case (_, nt, p, prob, factor) =>
      assert(math.abs(p - nt / n) < 1e-12)
      assert(math.abs(prob - math.sqrt(nt / n) / sumW) < 1e-12)
      assert(math.abs(factor - prob / p) < 1e-12)
    }
    // temperature flattening: below-average sources up-sample, above-average
    // ones down-sample — factor strictly ordered against share
    val (small, big) = (rows.minBy(_._3), rows.maxBy(_._3))
    if (small._3 < big._3) assert(small._5 > big._5)
  }

  test("q57: DSIR scores rank target-domain content above alien content") {
    // Target sources (src0/src1) write in vocab A, an alien source in vocab
    // B; two probe docs sit under NEUTRAL sources, so their score can only
    // come from their CONTENT — the defining property of importance
    // weighting (score by distribution, not by label).
    val tgtText   = "alpha beta gamma alpha beta gamma alpha beta"
    val alienText = "delta epsilon zeta delta epsilon zeta delta epsilon"
    val corpus = (
      (0 until 4).map(i => (i.toLong, tgtText, "src0")) ++
        (4 until 8).map(i => (i.toLong, tgtText, "src1")) ++
        (8 until 12).map(i => (i.toLong, alienText, "src5")) ++
        Seq((12L, "alpha beta gamma", "src7"), (13L, "delta epsilon zeta", "src8"))
    ).toDF("doc_id", "text", "source")

    val got = CurationOps
      .dsirWeightsOf(corpus)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_feat"),
          r.getAs[Double]("dsir_score")))
    assert(got.map(_._1).toSeq == (0L to 13L), "every doc scored, in doc_id order")
    // n_feat = unigrams + bigrams: 3 tokens → 3 + 2 = 5
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(12L)._3 == 5L)
    assert(byId(12L)._4 > 0.0, s"target-vocab probe must score positive: ${byId(12L)}")
    assert(byId(13L)._4 < 0.0, s"alien-vocab probe must score negative: ${byId(13L)}")
    assert(byId(12L)._4 > byId(13L)._4)
    // full-length docs: every target doc outranks every alien doc
    val tgtMin   = got.filter(g => g._2 == "src0" || g._2 == "src1").map(_._4).min
    val alienMax = got.filter(_._2 == "src5").map(_._4).max
    assert(tgtMin > alienMax)
  }

  // --- q78 ------------------------------------------------------------------

  test("q78: the fuzzy-dedup manifest is total, with one keeper per cluster") {
    // Three exact copies (identical shingle sets ⇒ identical signatures ⇒
    // LSH MUST pair them), plus two unrelated docs that share no shingle.
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val rows = Seq(
      (10L, dup, "en", "s0", 60L),
      (11L, dup, "en", "s0", 60L),
      (12L, dup, "en", "s1", 60L),
      (20L, "entirely different words about completely other topics here now", "en", "s0", 64L),
      (21L, "short", "en", "s1", 5L)
    )
    val dir = java.nio.file.Files.createTempDirectory("q78spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = CurationOps.fuzzyClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // total: every doc appears exactly once, in doc_id order
    assert(got.map(_._1).toSeq == Seq(10L, 11L, 12L, 20L, 21L))
    val byId = got.map(g => g._1 -> g).toMap
    // the copies form one cluster rooted at the min id, only the root keeps
    assert(Seq(10L, 11L, 12L).map(byId(_)._2).forall(_ == 10L))
    assert(Seq(10L, 11L, 12L).map(byId(_)._3).forall(_ == 3L))
    assert(byId(10L)._4 && !byId(11L)._4 && !byId(12L)._4)
    // singletons: own cluster, size 1, keeper
    Seq(20L, 21L).foreach { id =>
      assert(byId(id) == ((id, id, 1L, true)), s"doc $id must be a singleton keeper")
    }
    // invariant: exactly one keeper per cluster, and it is the cluster min
    got.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.count(_._4) == 1, s"cluster $cl must have exactly one keeper")
      assert(members.filter(_._4).head._1 == members.map(_._1).min)
    }
  }

  // --- q80 ------------------------------------------------------------------

  test("q80: chunk windows cover every token, overlap by stride, and hash stably") {
    val C = CurationOps.ChunkLen
    val S = CurationOps.ChunkStride
    val longDoc  = (0 until 100).map(i => s"t$i").mkString(" ") // 100 tokens
    val tinyDoc  = "a b c"                                      // < one window
    val exactDoc = (0 until C).map(i => s"x$i").mkString(" ")   // exactly one window
    val corpus = Seq((1L, longDoc), (2L, tinyDoc), (3L, exactDoc))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))

    val got = CurationOps.chunked(corpus).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = got.groupBy(_._1)

    // 100 tokens: last start = ⌈(100−64)/48⌉·48 = 48 → windows [0,64) and
    // [48,100) — the end is reached, no redundant third window
    assert(byDoc(1L).sortBy(_._2).map(c => (c._2, c._3)).toSeq ==
      Seq((0, 64), (1, 52)))
    // sub-window and exact-window docs yield exactly one full chunk
    assert(byDoc(2L).map(c => (c._2, c._3)).toSeq == Seq((0, 3)))
    assert(byDoc(3L).map(c => (c._2, c._3)).toSeq == Seq((0, C)))
    // every token of the long doc is covered by at least one chunk
    val covered = byDoc(1L).flatMap(c => (c._2 * S) until (c._2 * S + c._3)).toSet
    assert(covered == (0 until 100).toSet)
    // the content hash is md5 of the space-joined window, independently
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest((48 until 100).map(i => s"t$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(byDoc(1L).find(_._2 == 1).get._4 == expect)
  }

  // --- q81 ------------------------------------------------------------------

  test("q81: a repeated aligned window is dropped from the later doc only") {
    val C = CurationOps.ChunkLen
    val w = (0 until C).map(i => s"w$i")
    val z = (0 until 36).map(i => s"z$i")
    // docB opens with docA's exact window, then diverges; docC is unrelated
    val rows = Seq(
      (1L, w.mkString(" "), "en", "s0", 100L),
      (2L, (w ++ z).mkString(" "), "en", "s0", 100L),
      (3L, (0 until C).map(i => s"u$i").mkString(" "), "en", "s1", 100L)
    )
    val dir = java.nio.file.Files.createTempDirectory("q81spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = CurationOps.chunkDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // docA: its one chunk is the owner (lexicographically first)
    assert(got(1L) == ((1L, 1L, 64L, 64L, 1.0)))
    // docB: chunk 0 (== docA's window) dropped, tail chunk [48,100) kept
    assert(got(2L) == ((2L, 1L, 116L, 52L, 52.0 / 116.0)))
    // docC: untouched
    assert(got(3L) == ((1L, 1L, 64L, 64L, 1.0)))
  }

  // --- q97 ------------------------------------------------------------------

  test("q97: pagerank equals an independent power iteration; ranks sum to ~1 per component mass") {
    import graft.operators.{CurationOps, TextOps}
    val cand = TextOps.minhashLsh(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = (cand ++ cand.map(p => (p._2, p._1))).distinct
    val deg   = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val nodes = deg.keys.toSeq.sorted
    val n     = nodes.length
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pr = nodes.map(_ -> r6(1.0 / n)).toMap
    (1 to CurationOps.PrRounds).foreach { _ =>
      val in = edges.groupBy(_._2)
      pr = nodes.map { v =>
        // ascending-src fold, the operator's contract
        val s = in(v).map(_._1).sorted.foldLeft(0.0)((a, u) => a + pr(u) / deg(u))
        v -> r6((1 - CurationOps.PrDamping) / n + CurationOps.PrDamping * s)
      }.toMap
    }
    val got = CurationOps.pagerankDups(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == n)
    got.foreach { case (id, d, p) =>
      assert(d == deg(id))
      assert(p == pr(id), s"node $id: operator $p vs independent ${pr(id)}")
    }
    // probability mass is conserved up to rounding (undirected graph, no dangling nodes)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-3)
  }

  // --- q166 -----------------------------------------------------------------

  test("q166: HITS equals an independent mutual-reinforcement iteration on the oriented graph") {
    import graft.operators.{CurationOps, TextOps}
    val cand = TextOps.minhashLsh(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // oriented later-doc → earlier-doc: src = doc_b, dst = doc_a
    val edges = cand.map(p => (p._2, p._1)).distinct
    val srcs  = edges.map(_._1).distinct
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var h = srcs.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    val in  = edges.groupBy(_._2)
    val out = edges.groupBy(_._1)
    (1 to CurationOps.HitsRounds).foreach { _ =>
      // ascending-neighbor folds, the operator's contract
      val araw = in.map { case (v, es) =>
        v -> es.map(_._1).sorted.foldLeft(0.0)((acc, u) => acc + h(u))
      }
      val amax = araw.values.max
      a = araw.map { case (v, s) => v -> r6(s / amax) }
      val hraw = out.map { case (u, es) =>
        u -> es.map(_._2).sorted.foldLeft(0.0)((acc, v) => acc + a(v))
      }
      val hmax = hraw.values.max
      h = hraw.map { case (u, s) => u -> r6(s / hmax) }
    }
    val got = CurationOps.hitsScores(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    assert(got.length == nodes.length)
    got.foreach { case (id, hub, auth, od, idg) =>
      assert(hub == h.getOrElse(id, 0.0), s"hub $id: $hub vs ${h.getOrElse(id, 0.0)}")
      assert(auth == a.getOrElse(id, 0.0), s"auth $id: $auth vs ${a.getOrElse(id, 0.0)}")
      assert(od == out.get(id).map(_.length.toLong).getOrElse(0L), s"out_deg $id")
      assert(idg == in.get(id).map(_.length.toLong).getOrElse(0L), s"in_deg $id")
    }
    // max-normalization pins both score maxima at exactly 1.0
    assert(got.map(_._2).max == 1.0 && got.map(_._3).max == 1.0)
  }

  // --- q104 -----------------------------------------------------------------

  test("q104: per-node triangle counts equal an independent enumeration") {
    import graft.operators.{CurationOps, TextOps}
    val edges = TextOps.minhashLsh(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def conn(x: Long, y: Long) = edges((math.min(x, y), math.max(x, y)))
    val expected = (for {
      a <- nodes; b <- nodes if a < b && conn(a, b)
      c <- nodes if b < c && conn(b, c) && conn(a, c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val got = CurationOps.dupTriangles(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got vs $expected")
  }

  // --- q105 -----------------------------------------------------------------

  test("q105: every planted constraint violation is counted exactly once") {
    import spark.implicits._
    import graft.operators.CurationOps
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("q105spec").toString
    // orders: 10 ok (has lineitem), 11 childless, 12 dangling custkey
    Seq(
      (10L, 1L, "O", 10.0, d("2024-01-05"), "1-URGENT"),
      (11L, 1L, "O", 10.0, d("2024-01-05"), "1-URGENT"),
      (12L, 99L, "O", 10.0, d("2024-01-05"), "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // lineitems: one ok, one orphan (order 77), one negative qty, one bad
    // discount, one shipped before its order date
    Seq(
      (10L, 1L, 1L, 1, 5.0, 10.0, 0.1, 0.0, "N", "O", d("2024-01-06")),
      (77L, 1L, 1L, 1, 5.0, 10.0, 0.1, 0.0, "N", "O", d("2024-01-06")),
      (10L, 2L, 1L, 2, -3.0, 10.0, 0.1, 0.0, "N", "O", d("2024-01-06")),
      (12L, 3L, 1L, 3, 5.0, 10.0, 1.5, 0.0, "N", "O", d("2024-01-06")),
      (12L, 4L, 1L, 4, 5.0, 10.0, 0.1, 0.0, "N", "O", d("2024-01-02"))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "Customer#1", "addr", 1L, "ph", 0.0, "BUILDING", "c"))
      .toDF("c_custkey", "c_name", "c_address", "c_nationkey", "c_phone",
        "c_acctbal", "c_mktsegment", "c_comment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = CurationOps.integrityAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("1_orphan_lineitems", 1L, 5L),
      ("2_childless_orders", 1L, 3L),
      ("3_dangling_custkey", 1L, 3L),
      ("4_nonpositive_quantity", 1L, 5L),
      ("5_discount_out_of_range", 1L, 5L),
      ("6_ship_before_order", 1L, 5L)))
  }

  // --- q98 ------------------------------------------------------------------

  test("q98: snapshot diff classifies added/removed/changed/unchanged with char accounting") {
    import spark.implicits._
    import graft.operators.CurationOps
    val prev = Seq((1L, "s0", "aaa"), (2L, "s0", "bbbb"), (3L, "s1", "ccc"))
      .toDF("doc_id", "source", "text")
    val cur = Seq((2L, "s0", "bbbb"), (3L, "s1", "CCCCC"), (4L, "s1", "dd"))
      .toDF("doc_id", "source", "text")
    val got = CurationOps.snapshotDiff(prev, cur).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val expected = Seq(
      ("s0", "removed", 1L, 3L, 0L),
      ("s0", "unchanged", 1L, 4L, 4L),
      ("s1", "added", 1L, 0L, 2L),
      ("s1", "changed", 1L, 3L, 5L)
    )
    assert(got == expected)
  }

  // --- q100 -----------------------------------------------------------------

  test("q100: funnel stages are monotone per source and stage 4 equals q33's survivors") {
    import graft.operators.{CleanPipeline, CurationOps}
    val rows = CleanPipeline.funnelReport(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._1)
    bySrc.foreach { case (src, rs) =>
      val byStage = rs.map(r => r._2 -> ((r._3, r._4))).toMap
      val order   = Seq("1_raw", "2_exact_dedup", "3_quality", "4_near_dup")
      val present = order.filter(byStage.contains)
      assert(present.headOption.contains("1_raw"), s"$src lost its raw stage")
      present.sliding(2).foreach {
        case Seq(a, b) =>
          assert(byStage(a)._1 >= byStage(b)._1 && byStage(a)._2 >= byStage(b)._2,
            s"$src: stage $b grew vs $a")
        case _ =>
      }
    }
    val s4 = rows.filter(_._2 == "4_near_dup")
    val clean = CleanPipeline.clean(spark, Sf0001).collect()
    assert(s4.map(_._3).sum == clean.length.toLong,
      "funnel stage 4 must count exactly q33's surviving docs")
    assert(s4.map(_._4).sum == clean.map(_.getAs[Int]("n_tokens").toLong).sum)
  }

  test("q189: CDC chunks survive a prefix insertion (the fixed-width failure mode)") {
    import spark.implicits._
    // content-defined boundaries are a pure function of local content, so
    // prepending a preamble shifts every FIXED-width window but leaves the
    // shared text's chunks byte-identical — the q80/q81 grain would see
    // almost no overlap here, CDC must see most of the bytes as dup
    val base   = ("spark shuffles partition the keyspace and combiners fold early " * 8).trim
    val edited = "a loud preamble stitched onto the front of a repost " + base
    val out = CurationOps
      .cdcChunksOf(Seq(
        (1L, base),
        (2L, edited),
        (3L, base), // verbatim copy: every chunk owned by doc 1
        (4L, "abc") // shorter than the rolling window: one chunk, no crash
      ).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("dup_chars"), r.getAs[Double]("cdc_dup_ratio"))))
      .toMap
    assert(out(1L)._2 == base.length.toLong, "chunks must cover every char exactly once")
    assert(out(1L)._3 == 0L, "first owner has no dup bytes")
    assert(out(3L)._4 == 1.0, s"verbatim copy must be fully chunk-dup: ${out(3L)}")
    assert(out(2L)._4 > 0.5,
      s"prefix-edited doc must share most chunk bytes with the original: ${out(2L)}")
    assert(out(4L) == ((1L, 3L, 0L, 0.0)), s"short doc: ${out(4L)}")
  }
}
