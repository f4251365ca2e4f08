package graft

import org.apache.spark.sql.functions._

import graft.operators.StatsOps

class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q108: contingency cells match hand-computed chi-square, zero cells included") {
    def t(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
    // a@10h: 3, a@11h: 1, b@11h: 2, b@10h: ZERO (must still appear).
    // marginals: a=4, b=2; 10h=3, 11h=3; N=6 → expected a10=2, a11=2, b10=1, b11=1
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, t("2024-01-01 10:10:00"), 1L, "a", 1.0, "{}"),
      (3L, t("2024-01-02 10:20:00"), 2L, "a", 1.0, "{}"),
      (4L, t("2024-01-01 11:00:00"), 1L, "a", 1.0, "{}"),
      (5L, t("2024-01-01 11:10:00"), 2L, "b", 1.0, "{}"),
      (6L, t("2024-01-03 11:20:00"), 3L, "b", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("q108spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsOps.chisqIndependence(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("a", 10, 3L, 2.0, 0.5), ("a", 11, 1L, 2.0, 0.5),
      ("b", 10, 0L, 1.0, 1.0), ("b", 11, 2L, 1.0, 1.0)))
  }

  test("q109: frontier keeps exactly the non-dominated docs; ties both survive") {
    val rows = Seq(
      (1L, "aa bb cc dd ee", "en", "s", 1L),      // 5 tokens, vocab 5 — frontier
      (2L, "aa aa bb bb cc", "en", "s", 1L),      // 5 tokens, vocab 3 — dominated by d1
      (3L, "aa aa aa bb bb bb", "en", "s", 1L),   // 6 tokens, vocab 2 — frontier (longest)
      (4L, "xx yy zz", "en", "s", 1L),            // 3 tokens, vocab 3 — dominated by d1
      (5L, "ff gg hh ii jj", "en", "s", 1L)       // ties d1 on both axes — both stay
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q109spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StatsOps.paretoFrontier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((3L, 6L, 2L), (1L, 5L, 5L), (5L, 5L, 5L)))
  }

  test("q79: range-partitioned ranks equal the textbook percent_rank window exactly") {
    import org.apache.spark.sql.expressions.Window
    // Ties galore (scores repeat across sources), a dominant source, and a
    // single-doc source to exercise the n_s=1 → 0.0 guard.
    val words = Seq("the", "a", "an", "cat", "dog", "runs", "of", "to")
    val rows = (0 until 120).map { i =>
      val text = (0 to i % 7).map(j => words((i + j) % words.size)).mkString(" ")
      (i.toLong, text, "en", s"src${i % 3}", text.length.toLong)
    } :+ ((120L, "lonely text here", "en", "src_solo", 16L))
    val dir = java.nio.file.Files.createTempDirectory("q79spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = StatsOps.quantileNormalize(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap

    // The single-partition textbook spelling — fine at spec scale, the very
    // plan q79 exists to avoid at corpus scale. Equality must be EXACT:
    // both reduce to strictly_less/(n-1) on identical integers.
    val naive = StatsOps.quantileNormalize(spark, dir)
      .select(col("doc_id"), col("source"), col("score"))
      .withColumn("pc", percent_rank().over(Window.orderBy(col("score"))))
      .withColumn("ps", percent_rank().over(Window.partitionBy(col("source")).orderBy(col("score"))))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap

    assert(got.keySet == naive.keySet && got.keySet.size == 121)
    got.foreach { case (id, (pc, ps)) =>
      assert(pc == naive(id)._1, s"doc $id corpus pct: got $pc want ${naive(id)._1}")
      assert(ps == naive(id)._2, s"doc $id source pct: got $ps want ${naive(id)._2}")
    }
    assert(got(120L)._2 == 0.0, "single-doc source pins pct_source to 0")
  }

  test("q86: confusion matrix counts planted hits and misses exactly") {
    // 3 gold-en docs that read English, 1 gold-en doc that reads French
    // (the planted confusion), 2 gold-fr docs that read French
    val rows = Seq(
      (0L, "the cat and the dog of town", "en"),
      (1L, "a road to the north and a river", "en"),
      (2L, "the one and only a to of", "en"),
      (3L, "le chat et les chiens un matin", "en"),
      (4L, "le jour et la nuit des saisons un", "fr"),
      (5L, "les enfants et le parc un soir", "fr")
    ).map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("q86spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = StatsOps.langidConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got.keySet == Set(("en", "en"), ("en", "fr"), ("fr", "fr")))
    assert(got(("en", "en")) == ((3L, 0.75, true)))
    assert(got(("en", "fr")) == ((1L, 0.25, false)))
    assert(got(("fr", "fr")) == ((2L, 1.0, true)))
  }

  test("q87: planted cross-split near-dups are reported as leaks") {
    import graft.operators.TrainingOps
    // Find two doc ids that q40's hash rule sends to DIFFERENT splits and
    // two it sends to the SAME split, then plant near-identical text on
    // them — the audit must classify each pair by the same rule.
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val ids = (0L until 200L)
    // derive splits by running the operator itself on a probe corpus
    val probeDir = java.nio.file.Files.createTempDirectory("q87probe").toString
    ids.map(id => (id, "x", "en", "s0", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$probeDir/documents.parquet")
    val sp = TrainingOps.splitHash(spark, probeDir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val (sameA, sameB) = ids.combinations(2).map(c => (c(0), c(1)))
      .find { case (a, b) => sp(a) == sp(b) }.get
    val (crossA, crossB) = ids.combinations(2).map(c => (c(0), c(1)))
      .find { case (a, b) => sp(a) != sp(b) && Set(a, b).intersect(Set(sameA, sameB)).isEmpty }.get

    val rows = Seq(
      (sameA, s"$base same one", "en", "s0", 100L),
      (sameB, s"$base same two", "en", "s0", 100L),
      (crossA, s"$base cross one", "en", "s0", 100L),
      (crossB, s"$base cross two", "en", "s0", 100L)
    )
    val dir = java.nio.file.Files.createTempDirectory("q87spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TrainingOps.splitLeakage(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    val sameKey  = (sp(sameA), sp(sameB))
    val crossKey = (Seq(sp(crossA), sp(crossB)).min, Seq(sp(crossA), sp(crossB)).max)
    assert(got(sameKey)._1 >= 1L && !got(sameKey)._2, s"same-split pair must not be a leak: $got")
    assert(got(crossKey)._1 >= 1L && got(crossKey)._2, s"cross-split pair must be a leak: $got")
  }

  test("q88: positions are unique, round-robin across sources, quality-first within") {
    val words = Seq("the", "and", "of", "rock", "tree", "blue")
    val rows = (0 until 90).map { i =>
      val text = (0 to i % 6).map(j => words((i * 3 + j) % words.size)).mkString(" ")
      (i.toLong, text, "en", s"src${i % 3}", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("q88spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = StatsOps.curriculumOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == 90)
    // positions collision-free
    assert(got.map(_._4).distinct.length == 90)
    // the first |sources| positions cover every source exactly once
    val firstRound = got.sortBy(_._4).take(3).map(_._2).toSet
    assert(firstRound == Set("src0", "src1", "src2"))
    // within each source, ascending position = descending score (doc_id ties)
    got.groupBy(_._2).values.foreach { docs =>
      val ordered = docs.sortBy(_._4).map(d => (-d._3, d._1)).toSeq
      assert(ordered == ordered.sorted, "within-source order must be quality-first")
    }
  }

  test("q82: growth curve is monotone, ends at the true totals, and fits beta > 0") {
    // 40 docs, each introducing fresh bigrams → vocabulary genuinely grows
    val rows = (0 until 40).map { i =>
      val text = (0 until 10).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, text, "en", "s0", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("q82spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = StatsOps.heapsLaw(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to StatsOps.HeapsCheckpoints))
    // monotone non-decreasing in every cumulative column
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4, s"not monotone: $a -> $b")
    }
    // the last checkpoint is the whole corpus: 40 docs, 400 tokens, and
    // every doc's 9 bigrams are distinct across docs → 360
    assert(got.last._2 == 40L && got.last._3 == 400L && got.last._4 == 360L)
    // fresh vocabulary every doc → a decisively positive Heaps slope,
    // identical on every row
    assert(got.map(_._5).distinct.length == 1)
    assert(got.head._5 > 0.5, s"expected strong growth, got beta=${got.head._5}")
  }

  test("q71: KL drift is ~0 for the corpus vs itself and large for an alien source") {
    // Build a corpus where src_same mirrors the corpus mix and src_alien
    // writes a disjoint vocabulary: KL(src_alien) must dominate.
    val common = Seq("the", "cat", "sat", "on", "a", "mat")
    val alien  = Seq("zzq", "vvw", "kkj", "qqp", "xxr", "jjy")
    // 90/10 mix: the majority source nearly IS the pooled corpus, the alien
    // minority is nothing like it — and enough tokens that add-one smoothing
    // over the 128 buckets doesn't wash out the signal.
    val rows = (0 until 540).map { i =>
      (i.toLong, common(i % common.size) + " " + common((i + 1) % common.size), "en", "src_same", 7L)
    } ++ (540 until 600).map { i =>
      (i.toLong, alien(i % alien.size) + " " + alien((i + 1) % alien.size), "en", "src_alien", 7L)
    }
    val df  = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q71spec").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StatsOps.sourceDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set("src_same", "src_alien"))
    assert(got("src_same")._1 == 1080L && got("src_alien")._1 == 120L)
    // KL is non-negative and the alien source drifts much harder than the
    // majority source (which nearly IS the corpus distribution)
    assert(got("src_same")._2 >= 0.0 && got("src_alien")._2 >= 0.0)
    assert(got("src_alien")._2 > 4 * got("src_same")._2,
      s"alien source should dominate drift: $got")
  }

  test("q72: centroid cosine matrix matches hand-computed centroids") {
    // label 0 → centroid (2,0,0,0); label 1 → (0,2,0,0); label 2 → (3,3,0,0)
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(3f, 0f, 0f, 0f), 0),
      (3L, Seq(0f, 1f, 0f, 0f), 1),
      (4L, Seq(0f, 3f, 0f, 0f), 1),
      (5L, Seq(2f, 2f, 0f, 0f), 2),
      (6L, Seq(4f, 4f, 0f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("q72spec").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.VectorOps.centroidSim(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((0, 1), (0, 2), (1, 2)))
    assert(got((0, 1)) == 0.0)
    assert(math.abs(got((0, 2)) - 0.707107) < 1e-9)
    assert(math.abs(got((1, 2)) - 0.707107) < 1e-9)
  }

  test("q73: corpus-common terms are downweighted, doc-distinctive terms win") {
    val rows = Seq(
      (0L, "apple apple banana", "en", "s0", 18L),
      (1L, "banana cherry", "en", "s0", 13L),
      (2L, "banana banana banana", "en", "s0", 20L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q73spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StatsOps.tfidfTerms(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> ((r.getString(1), r.getDouble(3))))
      .toMap
    // banana appears in every doc → idf = ln(1) = 0; the rare terms win
    assert(got((0L, 1))._1 == "apple")
    assert(math.abs(got((0L, 1))._2 - 2 * math.log(3.0)) < 1e-6)
    assert(got((1L, 1))._1 == "cherry")
    assert(got((2L, 1)) == (("banana", 0.0))) // only term, zero score, still ranked
    // every doc's ranks are 1..min(k, n_terms) with descending scores
    got.groupBy(_._1._1).foreach { case (_, g) =>
      val byRank = g.toSeq.sortBy(_._1._2).map(_._2._2)
      assert(byRank == byRank.sorted.reverse)
    }
  }

  test("q74: sweep reports exact confusion counts at every threshold") {
    // 10 en docs scoring 1.0, 5 en docs scoring 0.0, 10 de docs scoring 0.0
    val rows =
      (0 until 10).map(i => (i.toLong, "the of and to", "en", "s0", 13L)) ++
        (10 until 15).map(i => (i.toLong, "cat dog fish", "en", "s0", 12L)) ++
        (15 until 25).map(i => (i.toLong, "hund katze maus", "de", "s0", 15L))
    val dir = java.nio.file.Files.createTempDirectory("q74spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StatsOps.thresholdSweep(spark, dir).collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getDouble(5),
          Option(r.get(6)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got.size == StatsOps.SweepSteps + 1)
    // t = 0: everything predicted positive
    assert(got(0.0)._1 == 15L && got(0.0)._2 == 10L && got(0.0)._3 == 0L)
    assert(got(0.0)._4.contains(0.6) && got(0.0)._5 == 1.0)
    // any t > 0: only the stopword-heavy en docs pass — perfect precision,
    // recall loses the 5 stopword-free en docs
    assert(got(0.1) == ((10L, 0L, 5L, Some(1.0), 10.0 / 15.0,
      Some(2.0 * 1.0 * (10.0 / 15.0) / (1.0 + 10.0 / 15.0)))))
    // F1 at its best operating point beats both extremes' F1
    val f1s = got.values.flatMap(_._6)
    assert(f1s.max == 0.8)
  }

  test("q75: projection equals a driver-side recomputation from the hash signs") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val emb  = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = graft.operators.VectorOps.randomProjection(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == emb.size * graft.operators.VectorOps.JlDims)
    val scale = math.sqrt(graft.operators.VectorOps.JlDims.toDouble)
    emb.take(5).foreach { case (id, v) =>
      for (j <- 0 until graft.operators.VectorOps.JlDims) {
        var dot = 0.0
        for (d <- v.indices) {
          val idx = (graft.operators.VectorOps.JlTable.toLong * 64L + j) * 64L + d
          val w   = if ((XXH64.hashLong(idx, 42L) & 1L) == 1L) 1.0 else -1.0
          dot += v(d) * w
        }
        assert(got((id, j)) == dot / scale, s"vec $id dim $j")
      }
    }
  }

  test("q75: pairwise distances survive the projection in expectation (JL property)") {
    val proj = graft.operators.VectorOps.randomProjection(spark, Sf0001).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val orig = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x AS double)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(30)
    val ratios = for {
      (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      od = d2(orig(a), orig(b)) if od > 0
    } yield d2(proj(a).toArray, proj(b).toArray) / od
    // E[ratio] = 1 (Rademacher projections are unbiased); var ≈ 2/k per
    // pair, so the mean over ~400 pairs concentrates tightly
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"JL distance preservation broken: mean ratio $mean")
  }

  test("q76: card reports exact volumes, shares, and cross-source dup rate") {
    val rows = Seq(
      (0L, "the cat", "en", "s0", 7L),
      (1L, "the cat", "en", "s0", 7L), // exact dup of doc 0
      (2L, "hund katze", "de", "s0", 10L),
      (3L, "the cat", "en", "s1", 7L) // dup of doc 0 ACROSS sources
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q76spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StatsOps.datasetCard(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got("s0") == ((3L, 6L, 24L, 2.0 / 3.0, 2.0 / 6.0, 1.0 / 3.0)))
    assert(got("s1") == ((1L, 2L, 7L, 1.0, 0.5, 1.0)), "cross-source dup must count")
  }

  test("q77: slope matches the closed-form fit; flat sources fit slope 0") {
    val rows = Seq(
      // zipf-ish source: freqs 8, 4, 2, 1 over ranks 1..4
      (0L, "a a a a a a a a b b b b", "en", "zipfy", 23L),
      (1L, "c c d", "en", "zipfy", 5L),
      // flat source: every term exactly once → ln f ≡ 0 → slope 0
      (2L, "u v w x y z", "en", "flat", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q77spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StatsOps.zipfSlope(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("flat")._1 == 6L && got("flat")._2 == 0.0)
    // closed-form least squares over the same rounded points
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = (1 to 4).map(r => r6(math.log(r.toDouble)))
    val ys = Seq(8, 4, 2, 1).map(f => r6(math.log(f.toDouble)))
    val n  = 4.0
    val (sx, sy)   = (xs.sum, ys.sum)
    val (sxy, sxx) = (xs.zip(ys).map { case (x, y) => x * y }.sum, xs.map(x => x * x).sum)
    val expected   = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(got("zipfy")._1 == 4L)
    assert(math.abs(got("zipfy")._2 - expected) < 1e-6)
    assert(got("zipfy")._2 < -0.9, "power-law source must fit a steep negative slope")
  }

  test("q71: output is one bounded row per source on the synthetic corpus") {
    val out = StatsOps.sourceDrift(spark, Sf0001)
    val n   = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(countDistinct(col("source"))).as[Long].head()
    assert(out.count() == n)
    // drift of every source against the pooled corpus is finite and ≥ 0
    assert(out.collect().forall(r => r.getDouble(2) >= 0.0))
  }

  test("q174/E38: the cent-quantized moment domain raises loudly instead of nulling") {
    // Under the non-ANSI default a DECIMAL(38,0) v^4 overflow would NULL
    // the power sum silently while the DuckDB HUGEINT oracle errors —
    // the shared guard must fail at the offending row instead.
    import spark.implicits._
    val ok = Seq(0.0, 99999.99, -99999.99).toDF("value")
      .select(StatsOps.centMomentValue.as("v")).collect().map(_.getDecimal(0).longValueExact())
    assert(ok.toSeq == Seq(0L, 9999999L, -9999999L))
    val e = intercept[Exception] {
      Seq(100000.0).toDF("value").select(StatsOps.centMomentValue.as("v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("cent-quantized domain")), s"unexpected failure: $e")
  }

  test("q174/E38: a power SUM that overflows to NULL raises at the aggregate, not silently") {
    // The per-value guard bounds v^4 < 1e28; the SUM itself can still leave
    // DECIMAL(38,0) past ~1e10 rows per cell. Under non-ANSI Spark that
    // returns NULL while the HUGEINT oracle raises — guardedPowerSum must
    // convert the NULL-over-nonempty-input case into a loud failure.
    import spark.implicits._
    val overflowed = Seq((5L, Option.empty[java.math.BigDecimal]))
      .toDF("n", "s4").withColumn("s4", col("s4").cast("decimal(38,0)"))
    val e = intercept[Exception] {
      overflowed.select(col("n"), StatsOps.guardedPowerSum("s4", "n")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("DECIMAL(38,0) overflow")), s"unexpected failure: $e")
    // pass-through on healthy sums, and n = 0 (empty cell) stays NULL-legal
    val ok = Seq((5L, "123"), (0L, null)).toDF("n", "s4raw")
      .withColumn("s4", col("s4raw").cast("decimal(38,0)"))
      .select(col("n"), StatsOps.guardedPowerSum("s4", "n"))
      .collect().map(r => (r.getLong(0), Option(r.getDecimal(1)).map(_.longValueExact())))
    assert(ok.toSeq == Seq((5L, Some(123L)), (0L, None)))
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Calibration fixture: two exact-dup pairs (3-gram Jaccard = 1) plus
    * unique docs spanning the score range, incl. an all-stopword doc whose
    * stop_ratio = 1.0 must land in the LAST bin (the least() cap), not a
    * phantom 11th.
    */
  private def calibDir(): String = {
    val docs = Seq(
      (1L, "the cat runs to the house quickly today now"),
      (2L, "the cat runs to the house quickly today now"), // dup of 1
      (3L, "dog walks yard slowly tonight yes cat house"),
      (4L, "dog walks yard slowly tonight yes cat house"), // dup of 3
      (5L, "the a an and of to in is"),                    // stop_ratio 1.0
      (6L, "cat dog house yard walks runs slowly quickly"),// stop_ratio 0.0
      (7L, "the dog of yard walks cat runs house"),
      (8L, "a cat and dog in house to yard is near"),
      (9L, "the the cat cat dog dog walks walks now"),
      (10L, "of the and a cat dog house walk")
    ).map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("calibspec").toString
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q233: bins, gaps, and ECE equal a driver-side integer recomputation") {
    val dir = calibDir()
    // the operator's own doc-grain stage supplies (bin, pos, s_micro); the
    // reference below redoes ALL downstream arithmetic in exact integers
    val scored = StatsOps.calibScored(spark, dir)
      .collect().map(r => (r.getLong(3), r.getBoolean(1), r.getLong(2))).toSeq
    assert(scored.size == 10 && scored.map(_._1).max == 9L,
      "stop_ratio=1.0 must cap into bin 9")
    assert(scored.count(_._2) == 4, "both exact-dup pairs must be dup-labeled")
    val ref = scored.groupBy(_._1).map { case (bin, rs) =>
      val n = rs.size.toLong
      val d = rs.count(_._2).toLong
      val s = rs.map(_._3).sum
      bin -> (n, d, s)
    }
    val nAll   = ref.values.map(_._1).sum
    val eceNum = ref.values.map { case (_, d, s) => math.abs(d * 1000000L - s) }.sum
    val got = StatsOps.calibrationBins(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == ref.keys.toSeq.sorted)
    got.foreach { r =>
      val (n, d, s) = ref(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == d)
      assert(r.getDouble(3) == r6(d.toDouble / n))
      assert(r.getDouble(4) == r6(s.toDouble / 1000000.0 / n))
      assert(r.getDouble(5) == r6(math.abs(d * 1000000L - s).toDouble / 1000000.0 / n))
      assert(r.getDouble(6) == r6(eceNum.toDouble / 1000000.0 / nAll))
    }
  }

  test("q234: Brier + Murphy terms equal a driver-side recomputation; identity holds within quantization") {
    val dir = calibDir()
    val scored = StatsOps.calibScored(spark, dir)
      .collect().map(r => (r.getLong(3), r.getBoolean(1), r.getLong(2))).toSeq
    val n   = scored.size.toLong
    val dd  = scored.count(_._2).toLong
    val ssq = scored.map { case (_, pos, s) =>
      val e = s - (if (pos) 1000000L else 0L); e * e
    }.sum
    val bins = scored.groupBy(_._1).values.map { rs =>
      (rs.size.toLong, rs.count(_._2).toLong, rs.map(_._3).sum)
    }.toSeq
    def micro(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val relS = bins.map { case (nb, db, sb) =>
      micro((sb.toDouble - 1000000.0 * db) * (sb.toDouble - 1000000.0 * db)
        / 1.0e12 / nb / n * 1000000.0)
    }.sum
    val resS = bins.map { case (nb, db, sb) =>
      micro((db.toDouble * n - dd.toDouble * nb) * (db.toDouble * n - dd.toDouble * nb)
        / nb / n / n / n * 1000000.0)
    }.sum
    val row = StatsOps.brierDecomposition(spark, dir).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == dd)
    assert(row.getDouble(2) == r6(ssq.toDouble / 1.0e12 / n), "brier")
    assert(row.getDouble(3) == r6(relS.toDouble / 1000000.0), "reliability")
    assert(row.getDouble(4) == r6(resS.toDouble / 1000000.0), "resolution")
    assert(row.getDouble(5) == r6(dd.toDouble * (n - dd) / n / n), "uncertainty")
    // the published within_bin residual closes the 4-term identity
    // EXACTLY on emitted values (it is defined from the published 6-dp
    // components, so closure is by construction — the assertion pins the
    // definition, the tiny tolerance absorbs the final re-round ulp)
    val residual = row.getDouble(2) - row.getDouble(3) + row.getDouble(4) - row.getDouble(5)
    assert(row.getDouble(6) == r6(residual), "within_bin definition")
    assert(math.abs(
      row.getDouble(2) -
        (row.getDouble(3) - row.getDouble(4) + row.getDouble(5) + row.getDouble(6))) < 1e-9,
      "4-term identity must close on published values")
    // with real within-bin score spread the residual is small but nonzero
    assert(math.abs(row.getDouble(6)) < 0.05, s"residual ${row.getDouble(6)}")
  }

  test("q235: perfectly dependent 2x2 grid scores MI = ln 2 and NMI = 1; independence scores 0") {
    import spark.implicits._
    def write(rows: Seq[(Long, String, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("q235spec").toString
      rows.map { case (id, src, lang) => (id, s"text $id", lang, src, 7L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    // diagonal: source determines lang exactly, balanced 2+2
    val dep = write(Seq((1L, "s1", "en"), (2L, "s1", "en"), (3L, "s2", "fr"), (4L, "s2", "fr")))
    val r1 = StatsOps.mutualInformation(spark, dep).collect().head
    val ln2q = 2 * micro6(0.5 * math.log(2.0)) // two cells, each (1/2)·ln2 (math.log = Spark's ln)
    assert(r1.getLong(0) == 4L && r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == ln2q / 1.0e6, "MI = ln 2 (micro-quantized)")
    assert(r1.getDouble(3) == r1.getDouble(2) && r1.getDouble(4) == r1.getDouble(2))
    assert(r1.getDouble(5) == 1.0, "NMI = 1 under perfect dependence")
    // product grid: every (source, lang) cell equal → MI = 0
    val ind = write(Seq((1L, "s1", "en"), (2L, "s1", "fr"), (3L, "s2", "en"), (4L, "s2", "fr")))
    val r2 = StatsOps.mutualInformation(spark, ind).collect().head
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(5) == 0.0)
  }

  private def micro6(x: Double): Long =
    BigDecimal(x * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("q236: perfect association scores V = 1, independence scores V = 0, zero cells counted") {
    import spark.implicits._
    def write(rows: Seq[(Long, String, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("q236spec").toString
      rows.map { case (id, src, lang) => (id, s"text $id", lang, src, 7L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val dep = write(Seq((1L, "s1", "en"), (2L, "s1", "en"), (3L, "s2", "fr"), (4L, "s2", "fr")))
    val r1 = StatsOps.cramersV(spark, dep).collect().head
    // every universe cell contributes (|n−1|)²/1 = 1 (two observed, two ZERO
    // cells) → χ² = 4 = N → V = 1; dof = 1
    assert(r1.getLong(0) == 4L && r1.getLong(3) == 1L)
    assert(r1.getDouble(4) == 4.0 && r1.getDouble(5) == 1.0)
    val ind = write(Seq((1L, "s1", "en"), (2L, "s1", "fr"), (3L, "s2", "en"), (4L, "s2", "fr")))
    val r2 = StatsOps.cramersV(spark, ind).collect().head
    assert(r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.0)
  }

  test("q238: MDE equals a driver-side recomputation with the same z constants") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("q238spec").toString
    // 8 users, one metric; per-user totals 1.00..8.00 → known moments
    val rows = (1L to 8L).map(u => (u, t(s"2024-01-0${(u % 7) + 1} 10:00:00"), u, "buy", u.toDouble, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsOps.mdePower(spark, dir).collect().head
    val arms = spark.range(1, 9).select(col("id"), pmod(xxhash64(col("id")), lit(2L)).as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ys = (1L to 8L).map(u => u -> u * 100L).toMap // cents
    val n = 8.0
    val sy = ys.values.sum
    val syy = ys.values.map(y => y * y).sum
    val nt = arms.count(_._2 == 1L).toLong
    val nc = 8L - nt
    val syc = ys.filter(kv => arms(kv._1) == 0L).values.sum
    val s2 = (n * syy.toDouble - sy.toDouble * sy.toDouble) / n / (n - 1.0)
    val mdeC = (StatsOps.ZAlphaTwoSided + StatsOps.ZPower80) *
      math.sqrt(s2 * (1.0 / nt + 1.0 / nc))
    assert(got.getLong(1) == 8L && got.getLong(2) == nt && got.getLong(3) == nc)
    assert(got.getDouble(4) == r6(sy.toDouble / n / 100.0), "mean")
    assert(got.getDouble(5) == r6(math.sqrt(s2) / 100.0), "sd")
    assert(got.getDouble(6) == r6(mdeC / 100.0), "mde_abs")
    assert(got.getDouble(7) == r6(mdeC / (syc.toDouble / nc)), "mde_rel")
  }

  test("q239: distinct-n ratios count planted template repetition exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q239spec").toString
    // 'tpl' repeats one bigram pattern (low distinct-2); 'var' is all-fresh
    Seq(
      (1L, "x y x y x y", "en", "tpl", 11L),   // 6 tokens: uni {x,y}, bigrams: "x y"×3, "y x"×2
      (2L, "x y x y", "en", "tpl", 7L),        // 4 tokens: "x y"×2, "y x"×1
      (3L, "a b c d e", "en", "var", 9L),      // all distinct
      (4L, "f", "en", "var", 1L)               // single token → zero bigrams
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StatsOps.distinctNgrams(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val tpl = got("tpl")
    assert(tpl.getLong(1) == 2L && tpl.getLong(2) == 10L && tpl.getLong(3) == 2L)
    assert(tpl.getDouble(4) == r6(2.0 / 10.0))
    assert(tpl.getLong(5) == 8L && tpl.getLong(6) == 2L, "bigrams: x y / y x only")
    assert(tpl.getDouble(7) == r6(2.0 / 8.0))
    val vr = got("var")
    assert(vr.getLong(2) == 6L && vr.getLong(3) == 6L && vr.getDouble(4) == 1.0)
    assert(vr.getLong(5) == 4L && vr.getLong(6) == 4L && vr.getDouble(7) == 1.0)
  }

  test("q240: within-equal corpora put ALL inequality between sources; identity holds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q240spec").toString
    // source A: 3 docs × 4 tokens; source B: 2 docs × 8 tokens — zero
    // within-source inequality, so T_total must equal T_between exactly
    // (same micro-quantized fold shapes on both)
    val mk = (n: Int, w: String) => (1 to n).map(_ => Seq.fill(4)(w).mkString(" "))
    val docs = mk(3, "aa").zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "A", 11L) } ++
      Seq.tabulate(2)(i => ((10 + i).toLong, Seq.fill(8)("bb").mkString(" "), "en", "B", 23L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = StatsOps.theilDecomposition(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("A", "B", "_ALL"))
    assert(rows("A").getDouble(4) == 0.0 && rows("B").getDouble(4) == 0.0,
      "equal within-source masses → zero within index")
    val all = rows("_ALL")
    assert(all.getDouble(5) == 0.0, "summed within contribution")
    // T_between = Σ share·ln(share·N/n_s): A share 12/28, B share 16/28
    def term(xs: Double, ns: Double, xx: Double, nn: Double) =
      micro6((xs / xx) * math.log(xs * nn / (xx * ns)))
    val tb = term(12, 3, 28, 5) + term(16, 2, 28, 5)
    assert(all.getDouble(6) == r6(tb.toDouble / 1000000.0), "between index")
    // identity: with zero within, total == between up to per-doc quantization
    assert(math.abs(all.getDouble(7) - all.getDouble(6)) < 1e-5,
      s"total ${all.getDouble(7)} vs between ${all.getDouble(6)}")
  }

  test("q241: jackknife SE equals the hand formula on two known sources") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q241spec").toString
    // A: 2 docs × 3 tokens; B: 1 doc × 9 tokens → R = 15/3 = 5,
    // LOO: drop A → 9/1 = 9, drop B → 6/2 = 3
    Seq(
      (1L, "t t t", "en", "A", 5L), (2L, "t t t", "en", "A", 5L),
      (3L, "t t t t t t t t t", "en", "B", 17L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = StatsOps.jackknifeRatio(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 3L && r.getLong(3) == 15L)
    assert(r.getDouble(4) == 5.0, "ratio")
    // m ∈ {9e6, 3e6}; v = (smm − sm²/g)/1e12 · (g−1)/g = (90e12−72e12)/1e12 · 0.5 = 9
    val se = math.sqrt(9.0)
    assert(r.getDouble(5) == r6(se), "jackknife SE")
    assert(r.getDouble(6) == r6(5.0 - StatsOps.ZAlphaTwoSided * se), "ci_lo")
    assert(r.getDouble(7) == r6(5.0 + StatsOps.ZAlphaTwoSided * se), "ci_hi")
  }

  test("round-11 statistics: structural invariants hold on the real corpus") {
    // q233: bins partition the corpus; ECE and every gap are probabilities
    val bins = StatsOps.calibrationBins(spark, Sf0001).collect()
    val nDocs = graft.core.Tables.documents(spark, Sf0001).count()
    assert(bins.map(_.getLong(1)).sum == nDocs, "bins partition the corpus")
    bins.foreach { r =>
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0, "ECE in [0,1]")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, "gap in [0,1]")
    }
    // q235: MI non-negative, NMI a correlation-like [0,1] (quantization slack)
    val mi = StatsOps.mutualInformation(spark, Sf0001).collect().head
    assert(mi.getDouble(2) >= -1e-5, "MI >= 0 up to micro-quantization")
    if (!mi.isNullAt(5))
      assert(mi.getDouble(5) >= -1e-5 && mi.getDouble(5) <= 1.0 + 1e-5, "NMI in [0,1]")
    // q236: chi-square and V in range
    val cv = StatsOps.cramersV(spark, Sf0001).collect().head
    assert(cv.getDouble(4) >= 0.0 && cv.getLong(3) >= 1L)
    if (!cv.isNullAt(5)) assert(cv.getDouble(5) >= 0.0 && cv.getDouble(5) <= 1.0 + 1e-6)
    // q240: the Theil decomposition identity survives micro-quantization
    val th = StatsOps.theilDecomposition(spark, Sf0001).collect()
      .find(_.getString(0) == "_ALL").get
    assert(math.abs(th.getDouble(7) - (th.getDouble(6) + th.getDouble(5))) < 1e-4,
      s"T_total ${th.getDouble(7)} vs between ${th.getDouble(6)} + within ${th.getDouble(5)}")
    // q242: isotonic curve monotone, mass preserved vs the raw bins
    val iso = StatsOps.isotonicBins(spark, Sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    iso.map(_._3).sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-12, "monotone") }
    val mass = iso.map { case (n, _, v) => v * n }.sum
    assert(math.abs(mass - iso.map(_._2).sum) < 1e-3, "PAV mass preservation")
    // q245: HHI a probability, effective count bounded by observed sources
    StatsOps.hhiMix(spark, Sf0001).collect().foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0 + 1e-6, "HHI in (0,1]")
      if (!r.isNullAt(4))
        assert(r.getDouble(4) <= r.getLong(2).toDouble + 1e-6, "eff <= seen sources")
    }
    // q247: Lorenz curve ends at 1 with ascending shares
    val lz = StatsOps.lorenzDeciles(spark, Sf0001).collect()
    assert(lz.last.getDouble(4) == 1.0)
    lz.map(_.getDouble(3)).sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-12, "shares ascend under ascending rank") }
  }

  test("q248: McNemar cells reconcile with q246's counts; arithmetic matches by hand") {
    val cr = StatsOps.captureRecapture(spark, Sf0001).collect().head
    val (n1, n2, m) = (cr.getLong(0), cr.getLong(1), cr.getLong(2))
    val r = StatsOps.mcnemarDetectors(spark, Sf0001).collect().head
    assert(r.getLong(0) == m && r.getLong(1) == n1 - m && r.getLong(2) == n2 - m,
      "discordant cells derive from the same three counts as q246")
    val (b, c) = (n1 - m, n2 - m)
    if (b + c > 0) {
      val chi = ((b - c) * (b - c)).toDouble / (b + c).toDouble
      assert(r.getDouble(3) == r6(chi), "chi2")
      assert(r.getBoolean(4) == (chi > StatsOps.SrmCritical), "flag on the raw double")
    } else assert(r.isNullAt(3) && !r.getBoolean(4))
  }

  test("q249: gain curve equals a driver-side recomputation; capture ends at 1 and lift starts high") {
    import graft.operators.TextOps
    val pairs = TextOps.ngramJaccardPairs(spark, Sf0001)
      .select("doc_a", "doc_b").collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val scored = TextOps.qualityScore(spark, Sf0001)
      .select(col("doc_id"), col("stop_ratio")).collect()
      .map(r => (r.getLong(0), -r.getDouble(1), pairs(r.getLong(0))))
      .sortBy(x => (x._2, x._1))
    val nn = scored.length.toLong
    val dd = scored.count(_._3).toLong
    val byDec = scored.zipWithIndex
      .groupBy { case (_, r) => 10L * r / nn }
      .toSeq.sortBy(_._1)
      .map { case (dec, rs) => (dec, rs.length.toLong, rs.count(_._1._3).toLong) }
    val got = StatsOps.liftDeciles(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(x => (x._1, x._2, x._3)).toSeq == byDec, s"decile grains: ${got.toSeq}")
    var cumD = 0L; var cumN = 0L
    got.zip(byDec).foreach { case ((_, _, _, cap, lift), (_, n, d)) =>
      cumD += d; cumN += n
      assert(cap == r6(cumD.toDouble / dd), "cumulative capture")
      assert(lift == r6((cumD.toDouble / dd) / (cumN.toDouble / nn)), "lift")
    }
    assert(got.last._4 == 1.0, "full review catches everything")
    assert(got.last._5 == 1.0, "lift collapses to exactly 1 at full coverage")
  }

  test("q245: planted single-source language scores HHI 1 / eff 1; uniform scores 1/k") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q245spec").toString
    // 'mono': all docs one source → HHI 1, eff 1
    // 'quad': 4 sources × 2 docs → HHI 4·(1/4)² = 0.25, eff 4
    val docs = (1 to 4).map(i => (i.toLong, s"m $i", "mono", "sA")) ++
      (5 to 12).map(i => (i.toLong, s"q $i", "quad", s"s${(i - 5) % 4}"))
    docs.map { case (id, t, lang, src) => (id, t, lang, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = StatsOps.hhiMix(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(rows("mono") == ((4L, 1L, 1.0, 1.0)))
    assert(rows("quad") == ((8L, 4L, 0.25, 4.0)))
    // _ALL: sA has 4+2=6 docs, s0..s3 have 2 each... wait: quad sources are
    // s0..s3 (2 docs each), mono is sA (4 docs): 5 sources, N=12
    val all = rows("_ALL")
    assert(all._1 == 12L && all._2 == 5L)
    def micro6(x: Double) = BigDecimal(x * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hs = micro6((4.0 / 12) * (4.0 / 12)) + 4 * micro6((2.0 / 12) * (2.0 / 12))
    assert(all._3 == r6(hs.toDouble / 1000000.0))
    assert(all._4 == r6(1.0 / (hs.toDouble / 1000000.0)))
  }

  test("q246: Chapman estimator matches hand-computed counts on planted dup structure") {
    // sf0.001 ground truth: both detectors see dup pairs; hand-verify the
    // arithmetic from the operator's own reported counts (the counts
    // themselves are pinned by the q25/q26/q27 oracles)
    val r = StatsOps.captureRecapture(spark, Sf0001).collect().head
    val (n1, n2, m) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n1 > 0 && n2 > 0 && m > 0, s"both detectors and their overlap non-empty: $n1 $n2 $m")
    assert(m <= math.min(n1, n2), "overlap bounded by both catches")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val est = ((n1 + 1).toDouble * (n2 + 1).toDouble / (m + 1).toDouble) - 1.0
    val v = ((n1 + 1).toDouble * (n2 + 1).toDouble * (n1 - m).toDouble * (n2 - m).toDouble) /
      ((m + 1).toDouble * (m + 1).toDouble * (m + 2).toDouble)
    assert(r.getDouble(3) == r6(est), "Chapman estimate")
    assert(r.getDouble(4) == r6(math.sqrt(v)), "Chapman SE")
    assert(r.getDouble(5) == r6(n1.toDouble / est) && r.getDouble(6) == r6(n2.toDouble / est))
    // the estimate can never undercut the union lower bound
    assert(est >= m.toDouble, "estimate at least the overlap")
  }

  test("q247: deciles partition the corpus; shares sum to 1; curve is convex-ish (sorted ascending)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q247spec").toString
    // 20 docs with token counts 1..20 → decile i holds docs 2i+1, 2i+2
    val docs = (1 to 20).map(i => (i.toLong, Seq.fill(i)("t").mkString(" "), "en", "s", i.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = StatsOps.lorenzDeciles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == (0L to 9L), s"all deciles present: ${got.toSeq}")
    assert(got.forall(_._2 == 2L), "2 docs per decile")
    val total = 210.0
    got.zipWithIndex.foreach { case ((_, _, sx, share, cum), i) =>
      val want = (4 * i + 3).toLong // (2i+1) + (2i+2)
      assert(sx == want, s"decile $i mass")
      assert(share == r6(want / total))
      val cumWant = (1 to 2 * i + 2).sum.toLong
      assert(cum == r6(cumWant / total))
    }
    // shares ascend (ranked ascending) and the curve ends at 1
    got.map(_._4).sliding(2).filter(_.length == 2).foreach { case Array(a, b) => assert(a <= b) }
    assert(got.last._5 == 1.0)
    // testdata sanity: top decile holds more than 10% of mass
    val sf = StatsOps.lorenzDeciles(spark, Sf0001).collect()
    assert(sf.last.getDouble(3) > 0.1, "top decile over-weighted on real data")
  }

  test("q242: isotonic fit equals the PAV stack algorithm and is monotone") {
    val dir = calibDir()
    val bins = StatsOps.calibScored(spark, dir)
      .collect().map(r => (r.getLong(3), r.getBoolean(1))).toSeq
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, rs) => (b, rs.size.toLong, rs.count(_._2).toLong) }
    // driver-side PAV: pool adjacent blocks while the left mean exceeds
    // the right (strict violation; equal means pool or not — same fit)
    case class Blk(n: Long, d: Long, upto: Int)
    val stack = scala.collection.mutable.ArrayBuffer[Blk]()
    bins.zipWithIndex.foreach { case ((_, n, d), i) =>
      stack += Blk(n, d, i)
      while (stack.size > 1 && {
        val a = stack(stack.size - 2); val b = stack.last
        a.d * b.n > b.d * a.n
      }) {
        val b = stack.remove(stack.size - 1); val a = stack.remove(stack.size - 1)
        stack += Blk(a.n + b.n, a.d + b.d, b.upto)
      }
    }
    val pav = Array.ofDim[Double](bins.size)
    var lo = 0
    stack.foreach { blk =>
      (lo to blk.upto).foreach(i => pav(i) = blk.d.toDouble / blk.n)
      lo = blk.upto + 1
    }
    val got = StatsOps.isotonicBins(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == bins.map(_._1))
    got.zipWithIndex.foreach { case ((b, _, iso), i) =>
      assert(math.abs(iso - pav(i)) < 2e-6, s"bin $b: iso $iso vs PAV ${pav(i)}")
    }
    got.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 + 1e-12, s"isotonic must be non-decreasing: $a -> $b")
    }
    // mass preservation: Σ n·iso == Σ d (PAV preserves the weighted mean)
    val mass = got.zip(bins).map { case ((_, _, iso), (_, n, _)) => iso * n }.sum
    assert(math.abs(mass - bins.map(_._3).sum) < 1e-3, s"mass $mass vs ${bins.map(_._3).sum}")
  }

  test("q243: cumulative looks equal a driver-side recomputation; boundary decays as 1/sqrt(f)") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("q243spec").toString
    // 4 looks — Jan 1..3 plus Feb 1 (same day-of-month as Jan 1: looks key
    // on the ABSOLUTE epoch day, so it must stay a separate look) — 4
    // events/day, one metric
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-02-01")
    val rows = (0 until 16).map { i =>
      (i.toLong, t(s"${days(i / 4)} 10:0${i % 4}:00"), (i % 6).toLong + 1L, "buy",
        (i + 1).toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsOps.sequentialLooks(spark, dir).collect()
    val dayKey = days.map(d => java.time.LocalDate.parse(d).toEpochDay)
    val gotDays = got.map(_.getLong(1)).distinct.sorted.toSeq
    // looks key on the ABSOLUTE epoch day (underpowered looks may drop —
    // n>1 per arm — but no day outside the calendar may appear, and Feb 1
    // must be its own look rather than folding into Jan 1's day-of-month)
    assert(gotDays.forall(dayKey.contains), s"unexpected look days $gotDays")
    assert(gotDays.contains(dayKey.last), "Feb 1 must be a separate look, not folded into Jan 1")
    val arms = spark.range(1, 7).select(col("id"), pmod(xxhash64(col("id")), lit(2L)).as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evs = (0 until 16).map { i =>
      (dayKey(i / 4), arms((i % 6).toLong + 1L), (i + 1).toLong * 100L)
    }
    val nFinal = 16.0
    assert(got.nonEmpty)
    got.foreach { r =>
      val day = r.getLong(1)
      val cum = evs.filter(_._1 <= day)
      val a1 = cum.filter(_._2 == 1L).map(_._3); val a0 = cum.filter(_._2 == 0L).map(_._3)
      val (n1, n0) = (a1.size.toDouble, a0.size.toDouble)
      assert(n1 > 1 && n0 > 1, "operator must only emit powered looks")
      val delta = a1.sum / n1 - a0.sum / n0
      val se2 =
        (n1 * a1.map(x => x.toDouble * x).sum - a1.sum.toDouble * a1.sum) / n1 / (n1 - 1.0) / n1 +
        (n0 * a0.map(x => x.toDouble * x).sum - a0.sum.toDouble * a0.sum) / n0 / (n0 - 1.0) / n0
      val f = (n1 + n0) / nFinal
      assert(r.getLong(2) == n1.toLong && r.getLong(3) == n0.toLong)
      assert(r.getDouble(4) == r6(delta / 100.0), s"uplift day $day")
      assert(r.getDouble(5) == r6(f), "info frac")
      if (se2 > 0) assert(r.getDouble(6) == r6(delta / math.sqrt(se2)), "z")
      assert(r.getDouble(7) == r6(StatsOps.ZAlphaTwoSided / math.sqrt(f)), "boundary")
    }
    // boundary strictly decays with information
    val bs = got.map(r => (r.getLong(1), r.getDouble(7))).sortBy(_._1)
    bs.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b._2 < a._2, s"OBF boundary must shrink: $a -> $b") }
  }
}
