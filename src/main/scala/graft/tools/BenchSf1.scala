package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Full-suite sf1 scale rehearsal: every registered query timed at sf0.1
  * AND on the deterministic 10× corpus ([[ScaleData]]), with the per-query
  * scaling exponent `log10(t_sf1 / t_sf0.1)` — 0 ≈ overhead-bound, 1 =
  * linear, > 1 superlinear. Extends the driver bench's top-10 lane
  * (BENCH_SF1.json) to all queries so a superlinear query OUTSIDE the
  * expensive tail can't hide; writes BENCH_SF1_FULL.json and EXITS
  * NONZERO when any query outside the justified allowlist shows
  * `scale_exp > 0.9` with a non-trivial absolute sf1 time (> 1 s — a
  * sub-second query's exponent is timer noise, not a scale smell).
  *
  * Usage: `sbt "runMain graft.tools.BenchSf1 [sf01Dir] [outJson]"`.
  */
object BenchSf1 {

  /** Queries where ~linear growth is the honest cost of the semantics,
    * with the reason recorded — anything here still appears in the
    * artifact, it just doesn't fail the gate.
    */
  /** The embed-pair family's story since r13: the plane count is derived
    * from the corpus ([[graft.operators.VectorOps.nearDupPlanesFor]] —
    * planes = max(5, ceil(log2(n/32)))), so expected bucket occupancy —
    * and the per-doc candidate-pair density — is constant BY CONSTRUCTION
    * as the corpus grows; over-cap buckets deterministically SAMPLE to
    * [[graft.operators.TextOps.MaxBucket]] members instead of dropping.
    * The claim is measured, not asserted: the gate records per-doc pair
    * density at both SFs and revokes the exemption past
    * [[PairDensityGate]]× (the r12 run measured the old fixed-plane
    * setting at ×10.1 and caught the stale justification; this text and
    * the sizing both answer that measurement).
    */
  private val EmbedLshWhy =
    "embed-LSH pair family at corpus-sized planes (max(5, ceil(log2(n/32))), r13): expected " +
      "per-doc candidate density constant by construction -> pair-linear cost; over-cap " +
      "buckets sample to the cap (content-stable xxhash64 order) instead of dropping; " +
      "density ratio measured below and revocable"

  val LinearAllowlist: Map[String, String] = Map(
    "q94_gap_fill" -> ("resampling emits the full (user, hour) grid — output itself grows " +
      "linearly with the key space; everything stays keyed and partitioned"),
    "q96_edit_verify" -> ("exact levenshtein verification of every LSH candidate pair: " +
      "pairs grow linearly with the corpus (dup structure is linear by construction — " +
      "measured density ratio 1.0 at r12), per-pair cost is constant — candidate-bounded, " +
      "never corpus^2"),
    "q30_embed_neardup"        -> EmbedLshWhy,
    "q65_semdedup"             -> (EmbedLshWhy + "; SemDeDup keeper rule on the same pairs"),
    "q212_semantic_decontam"   -> (EmbedLshWhy + "; plus pair-keyed split joins"),
    "q213_knn_label_agreement" -> (EmbedLshWhy + "; both pair orientations through the top-k heap"),
    "q227_knn_hubness"         -> (EmbedLshWhy + "; in-degree fold over the q213 edge list"),
    "q228_fleiss_kappa"        -> (EmbedLshWhy + "; per-item vote table over the q213 kNN panel"),
    "q251_embed_recall"        -> (EmbedLshWhy + "; plus a probe-bounded exact truth scan")
  )

  val ExpGate    = 0.9
  val MinSf1Secs = 1.0

  /** The measured quantity each allowlist entry's justification rests on —
    * "pair-linear" is CHECKED, not asserted (r11's q96 measured exp 1.1
    * against a pair-linear justification the replica corpus could have
    * violated): the gate records the metric at both SFs and FAILS an entry
    * whose per-doc density grows more than [[PairDensityGate]]×.
    */
  val AllowlistMetric: Map[String, String] = Map(
    "q96_edit_verify"         -> "text_candidate_pairs",
    "q30_embed_neardup"       -> "embed_neardup_pairs",
    "q65_semdedup"            -> "embed_neardup_pairs",
    "q212_semantic_decontam"  -> "embed_neardup_pairs",
    "q213_knn_label_agreement" -> "embed_neardup_pairs",
    "q227_knn_hubness"        -> "embed_neardup_pairs",
    "q228_fleiss_kappa"       -> "embed_neardup_pairs",
    "q251_embed_recall"       -> "embed_neardup_pairs",
    "q94_gap_fill"            -> "output_rows"
  )
  val PairDensityGate = 2.0

  def main(args: Array[String]): Unit = {
    val sf01Dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("/root/repo/BENCH_SF1_FULL.json")
    val cpus    = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf1Dir = ScaleData.ensure(spark, sf01Dir, "/tmp/graft_sf1")

    def timeOne(name: String, dir: String): Double = {
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench-sf1-full] $name@$dir failed: ${e.getMessage}")
            None
        } finally graft.core.CacheScope.drain(spark)
      }
      // untimed GC between queries (graft.Bench's attribution rule): a
      // heap-churning query must not tax its successors' timings
      System.gc()
      if (times.nonEmpty) times.min else -1.0
    }

    // warmup the common physical shapes (same rationale as graft.Bench)
    try {
      timeOne(SparkEntry.queries.keys.min, sf01Dir)
      ()
    } catch { case _: Throwable => () }

    // shared-stage prewarm per dir (same attribution rule as graft.Bench:
    // one-time builds must not land on the first consumer's timing line)
    val shared = Seq(sf01Dir, sf1Dir).map { dir =>
      dir -> graft.operators.SharedStages.prewarm(spark, dir).map { case (n, build) =>
        val t0 = System.nanoTime()
        try { build(); n -> (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench-sf1-full] shared:$n@$dir failed: ${e.getMessage}")
            n -> -1.0
        }
      }
    }

    // the allowlist's own evidence: per-doc pair densities at both SFs.
    // A FAILED measurement is not a free pass: missing stats for a gated
    // entry are treated as a gate violation below (the r12 advisory —
    // an empty map must not make every density check vacuously hold).
    def pairStats(dir: String): Map[String, Long] =
      try {
        val vo    = graft.operators.VectorOps
        val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
        val textPairs = graft.operators.SharedStages.minhashEdges(spark, dir).count()
        val embPairs =
          vo.nearDupPairsRaw(spark, vo.emb(spark, dir), vo.nearDupPlanesFor(spark, dir)).count()
        val gapRows = SparkEntry.queries("q94_gap_fill")(spark, dir).count()
        graft.core.CacheScope.drain(spark)
        Map(
          "docs"                 -> nDocs,
          "planes"               -> vo.nearDupPlanesFor(spark, dir).toLong,
          "text_candidate_pairs" -> textPairs,
          "embed_neardup_pairs"  -> embPairs,
          "output_rows"          -> gapRows)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench-sf1-full] pairStats@$dir failed: ${e.getMessage}")
          Map.empty
      }
    val stats01 = pairStats(sf01Dir)
    val stats1  = pairStats(sf1Dir)

    val names = SparkEntry.queries.keys.toSeq.sorted
    val rows = names.map { name =>
      val t01 = timeOne(name, sf01Dir)
      val t1  = timeOne(name, sf1Dir)
      val exp = if (t01 > 0 && t1 > 0) Some(math.log10(t1 / t01)) else None
      (name, t01, t1, exp)
    }
    graft.operators.SharedStages.release(spark)

    // an allowlisted query whose measured per-doc density grew past the
    // gate loses its exemption: its justification is measured false. A
    // query whose measurement is MISSING (pairStats threw) also loses it —
    // an empty stats map must not make the check vacuously pass.
    val densityRatio: Map[String, Double] = AllowlistMetric.flatMap { case (q, metric) =>
      for {
        d01 <- stats01.get("docs"); d1 <- stats1.get("docs")
        p01 <- stats01.get(metric); p1 <- stats1.get(metric)
        if d01 > 0 && d1 > 0 && p01 > 0
      } yield q -> (p1.toDouble / d1) / (p01.toDouble / d01)
    }
    val brokenJustification = AllowlistMetric.keySet.filter { q =>
      densityRatio.get(q).forall(_ > PairDensityGate) // forall: missing measurement ⇒ broken
    }

    val violations = rows.collect {
      case (name, _, t1, Some(exp))
          if exp > ExpGate && t1 > MinSf1Secs &&
            (!LinearAllowlist.contains(name) || brokenJustification.contains(name)) =>
        (name, t1, exp)
    }
    val lines = rows.map { case (name, t01, t1, exp) =>
      val e  = exp.map(v => f"$v%.2f").getOrElse("null")
      val al = if (LinearAllowlist.contains(name)) ", \"allowlisted\": true" else ""
      f"""  "$name": {"sf01_s": $t01%.2f, "sf1_s": $t1%.2f, "scale_exp": $e$al}"""
    }
    val vio = violations
      .map { case (n, t1, e) => f"""{"query": "$n", "sf1_s": $t1%.2f, "scale_exp": $e%.2f}""" }
      .mkString("[", ", ", "]")
    val allowJson = LinearAllowlist.toSeq.sorted.map { case (k, why) =>
      val measured = AllowlistMetric.get(k).map { m =>
        val p01   = stats01.getOrElse(m, -1L)
        val p1    = stats1.getOrElse(m, -1L)
        val ratio = densityRatio.get(k).map(r => f"$r%.3f").getOrElse("null")
        // null ratio = measurement failed; justification_holds is then
        // null in the artifact AND the entry counts as a gate violation
        val holds =
          if (densityRatio.contains(k)) (!brokenJustification.contains(k)).toString else "null"
        s""", "metric": "$m", "pairs_sf01": $p01, "pairs_sf1": $p1,""" +
          s""" "per_doc_density_ratio": $ratio,""" +
          s""" "justification_holds": $holds"""
      }.getOrElse("")
      s"""  "$k": {"why": "$why"$measured}"""
    }
    val sharedJson = shared.map { case (dir, ss) =>
      val nm = if (dir == sf1Dir) "sf1" else "sf01"
      s""""$nm": {${ss.map { case (n, t) => f""""$n": $t%.2f""" }.mkString(", ")}}"""
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath),
      s"""{"replicas": ${ScaleData.Replicas},
         |"note": "ALL registered queries re-timed on the deterministic 10x corpus; scale_exp = log10(t_sf1/t_sf0.1): 0=overhead-bound, 1=linear; gate: exp > $ExpGate AND sf1_s > $MinSf1Secs s outside the allowlist fails; allowlist entries carry their MEASURED pair densities and lose the exemption when per-doc density grows > ${PairDensityGate}x",
         |"docs": {"sf01": ${stats01.getOrElse("docs", -1L)}, "sf1": ${stats1.getOrElse("docs", -1L)}},
         |"neardup_planes": {"sf01": ${stats01.getOrElse("planes", -1L)}, "sf1": ${stats1.getOrElse("planes", -1L)}},
         |"shared_prewarm_s": {${sharedJson.mkString(", ")}},
         |"gate_violations": $vio,
         |"allowlist": {
         |${allowJson.mkString(",\n")}
         |},
         |"queries": {
         |${lines.mkString(",\n")}
         |}}
         |""".stripMargin)
    println(s"[bench-sf1-full] wrote $outPath; ${rows.size} queries, " +
      s"${violations.size} gate violations")
    violations.foreach { case (n, t1, e) =>
      System.err.println(f"[bench-sf1-full] GATE: $n sf1=$t1%.2fs exp=$e%.2f")
    }
    spark.stop()
    if (violations.nonEmpty) sys.exit(4)
  }
}
