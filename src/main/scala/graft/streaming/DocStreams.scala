package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, TextOps}

/** §2.E streaming twin of the MinHash-LSH dedup path (batch: TextOps C6).
  *
  * The expensive parts of MinHash — shingling and the k signature folds —
  * are pure map-side expressions, shared verbatim with the batch operator
  * ([[TextOps.shingleCol]]/[[TextOps.minhashSigCols]]/[[TextOps.bandArray]]),
  * so the streaming form costs one watermarked windowed aggregation: bucket
  * membership per (window, band, band-hash). State is bounded by
  * watermark × band cardinality; buckets emit once, when their window
  * closes (append mode).
  */
object DocStreams {

  case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class SrcDoc(doc_id: Long, text: String, source: String, ts: java.sql.Timestamp)
  case class Vec(vec_id: Long, v: Seq[Double], ts: java.sql.Timestamp)

  /** §2.E streaming ingest gate — the stateless front of the batch clean
    * pipeline applied to a live document stream in ONE map-side pass:
    * quality gates (q22's token/stopword rules via the shared
    * [[TextOps.stopCountExpr]]), PII/blocklist scrubbing (q48's
    * [[CurationOps.scrubCol]]), and the content-stable split assignment
    * (q40's hash rule). No state, no watermark, no shuffle — every rule is
    * per-row, so the streaming twin is the batch expression tree verbatim,
    * and throughput is bounded by the source, not by state store I/O.
    */
  def ingestGate(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio", TextOps.stopCountExpr / col("n_tokens"))
      .filter(
        col("n_tokens") >= graft.operators.CleanPipeline.MinTokens &&
          col("stop_ratio") <= graft.operators.CleanPipeline.MaxStopRatio)
      .select(
        col("doc_id"),
        col("ts"),
        col("n_tokens"),
        CurationOps.piiCountCol(col("text")).as("n_pii"),
        md5(CurationOps.scrubCol(col("text"))).as("scrub_md5"),
        graft.operators.TrainingOps
          .splitNameCol(graft.operators.TrainingOps.splitBucketCol(col("doc_id")))
          .as("split")
      )
  }

  /** §2.E stream chunker (twin: q80) — incoming documents split into the
    * same overlapping [[CurationOps.ChunkLen]]-token windows the batch
    * chunker emits, with the batch operator's OWN expression tree
    * ([[CurationOps.chunked]] — start-offset rule, slice, content md5 all
    * shared, so the two cannot diverge). The event time rides through
    * every chunk, ready for a downstream watermark. Stateless: one
    * projection + one explode per micro-batch, no watermark, no shuffle,
    * no state store — the chunk stream is as fast as the source feeds it.
    */
  def streamChunker(docs: DataFrame): DataFrame =
    CurationOps.chunked(
      docs.select(col("doc_id"), col("ts"), split(trim(col("text")), "\\s+").as("toks")))

  /** E46: streaming CDC chunker (twin: q189) — incoming documents split
    * at the SAME content-defined boundaries the batch operator computes,
    * via the same compiled kernel
    * ([[graft.functions.Expressions.cdc_chunks]]), each chunk carrying
    * its md5 identity and length — the writer-side feed of a chunk-level
    * dedup store: because boundaries are a pure function of local
    * content, a live ingest's chunk hashes can probe the SAME chunk
    * ownership table batch q189 maintains (an E12-style Bloom/snapshot
    * gate rides directly on `h`), and a re-posted document with a new
    * preamble still hits the store on every unshifted chunk. Stateless:
    * one compiled projection + one explode per micro-batch, no
    * watermark, no shuffle, no state store; spec-pinned bit-equal to the
    * batch chunk grain on the same feed.
    */
  def cdcChunkStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("ts"),
        explode(graft.functions.Expressions.cdc_chunks(col("text"))).as("chunk"))
      .select(col("doc_id"), col("ts"),
        md5(col("chunk").cast("binary")).as("h"),
        length(col("chunk")).cast("long").as("clen"))

  /** §2.E streaming quantile gate (twin: q79) — each incoming document's
    * quality score calibrated against a CORPUS SNAPSHOT's score CDF
    * ([[graft.operators.StatsOps.scoreCdfModel]]), gating on "is this doc
    * above the snapshot's P·100th percentile" instead of a raw threshold —
    * the cut that stays meaningful when sources drift. The snapshot CDF
    * rides as literals (≤ CdfBins cumulative counts + extent — the
    * model-gate shape), so the whole gate is one stateless map-side
    * projection: the score is q79's expression, the percentile is q79's
    * strictly-less/n at bin resolution, and
    * [[graft.operators.StatsOps.cdfPct]] is the same arithmetic as a pure
    * function (spec-pinned ==). Out-of-extent scores clamp to the edge
    * bins — a stream CAN see values the snapshot never did.
    */
  def quantileGate(
      docs: DataFrame,
      hist: Seq[(Int, Long)],
      mn: Double,
      mx: Double,
      n: Long,
      minPct: Double
  ): DataFrame = {
    import graft.operators.StatsOps.CdfBins
    val byBin = hist.toMap
    // cumBelow(b) = snapshot values in bins strictly below b
    val cumBelow = (0 until CdfBins).map(b => (0 until b).map(i => byBin.getOrElse(i, 0L)).sum)
    val w        = (mx - mn) / CdfBins
    val toks     = split(trim(col("text")), "\\s+")
    val score    = (TextOps.stopCountExpr / size(toks)).as("score")
    val bin =
      if (w == 0.0) lit(0)
      else greatest(lit(0), least(lit(CdfBins - 1), floor((col("score") - mn) / w).cast("int")))
    docs
      .select(col("doc_id"), col("ts"), score)
      .withColumn("bin", bin)
      .withColumn(
        "pct",
        element_at(typedLit(cumBelow), col("bin") + 1).cast("double") / lit(n.toDouble))
      .withColumn("keep", col("pct") >= minPct)
      .drop("bin")
  }

  /** §2.E streaming budget-admission gate (twin: q106) — each incoming
    * document judged against the MARGINAL quality cut of a corpus
    * snapshot's greedy token-budget selection: q106 admits quality-first
    * until the budget is spent, and the score of its last admitted
    * document is exactly the bar a new document must clear to have made
    * that cut. The threshold is ONE collected double (the model-gate
    * rule: [[budgetThreshold]] runs the batch selection and takes
    * `min(score) WHERE selected`), so the stream side is a stateless
    * map-side projection sharing q106's scoring expression verbatim — no
    * state, no watermark, no shuffle.
    *
    * Note the semantics: a budget is inherently a GLOBAL, order-dependent
    * constraint — a stream cannot know future arrivals, so the gate
    * applies the snapshot's marginal bar (admit-if-you'd-have-beaten-the-
    * cut), the same calibrate-on-snapshot / apply-on-stream contract as
    * E18's quantile gate.
    */
  def budgetGate(docs: DataFrame, thr: Double): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    docs
      .select(
        col("doc_id"),
        col("ts"),
        size(toks).cast("long").as("tokens"),
        (TextOps.stopCountExpr / size(toks)).as("score"))
      .withColumn("keep", col("score") >= lit(thr))
  }

  /** The snapshot's marginal admitted score — q106's own selection, one
    * collected row. */
  def budgetThreshold(spark: org.apache.spark.sql.SparkSession, dir: String): Double =
    graft.operators.TrainingOps
      .tokenBudgetSelect(spark, dir)
      .filter(col("selected"))
      .agg(min(col("score")))
      .collect()(0)
      .getDouble(0)

  /** §2.E stream-static join: incoming documents deduped against a STATIC
    * already-ingested corpus snapshot — the streaming twin of q52's exact
    * leg, and the join modality (stream ⋈ static) the rest of §2.E doesn't
    * exercise. The snapshot is FIXED for the lifetime of the query:
    * file-based sources pin their listing when the DataFrame is created, so
    * picking up a newer snapshot means rebuilding the DataFrame and
    * restarting the query (or routing through a refreshable table format).
    * Because it cannot change mid-query, the hashed-and-distinct snapshot
    * is persisted here — without that, every micro-batch would re-scan,
    * re-md5, and re-shuffle the full corpus for an identical result.
    * Within the stream itself, duplicates drop via watermark-bounded
    * content-hash state (`dropDuplicatesWithinWatermark`, E3's tool) —
    * state stays bounded by the watermark horizon, not the stream's
    * lifetime.
    */
  def snapshotDedup(
      stream: DataFrame,
      snapshot: DataFrame,
      watermarkDur: String = "10 minutes"
  ): DataFrame = {
    val s = stream
      .withWatermark("ts", watermarkDur)
      .withColumn("h", md5(col("text")))
    val snap = snapshot
      .select(md5(col("text")).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    s.join(snap, Seq("h"), "left_anti")
      .dropDuplicatesWithinWatermark("h")
      .select(col("doc_id"), col("ts"), col("h"))
  }

  /** Near-dup candidate pairs per event-time window.
    *
    * Pairs may repeat across bands (the batch path's `distinct` would be a
    * second stateful operator here); the downstream exact-verify stage —
    * identical to the batch one — dedups, and the repeat factor is bounded
    * by the band count (8).
    */
  def minhashCandidates(
      docs: DataFrame,
      windowDur: String = "10 minutes",
      watermarkDur: String = "10 minutes"
  ): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val shingled = docs
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", TextOps.shingleCol)
    val bands = shingled
      .withColumn("sigs", TextOps.minhashSigsArray)
      .select(Seq(col("ts"), col("doc_id")) ++ TextOps.minhashSigCols: _*)
      .select(col("ts"), col("doc_id"), explode(TextOps.bandArray).as("b"))
      .select(col("ts"), col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    bands
      .groupBy(window(col("ts"), windowDur), col("band"), col("bh"))
      .agg(
        count(lit(1)).as("nb"),
        // bounded cap+1 heap + exact count (batch bucketPairs rule): a
        // viral bucket's STREAMING STATE clamps at cap+1 ids per window
        graft.functions.Expressions
          .collect_topk(col("doc_id"), TextOps.MaxBucket + 1).as("ids"))
      .filter(col("nb").between(2, TextOps.MaxBucket))
      .select(col("window"), array_sort(col("ids")).as("ids"))
      .select(
        col("window"),
        explode(expr(TextOps.pairExpansionSql("ids", "a AS doc_a, b AS doc_b"))).as("p")
      )
      .select(
        col("window.start").as("window_start"),
        col("p.doc_a").as("doc_a"),
        col("p.doc_b").as("doc_b")
      )
  }

  /** §2.E model-apply gate: score incoming documents against a PRECOMPUTED
    * importance model (q57's ≤ [[CurationOps.DsirBuckets]]-row log-ratio
    * table from [[CurationOps.dsirModel]]) and tag a keep verdict. The model
    * rides as a LITERAL map column — the streaming shape of a broadcast
    * model join, and what streaming inference wants: no state, no
    * watermark, no shuffle, no per-batch model re-derivation; refreshing
    * the model = restarting the query with a new literal. Features a model
    * has never seen contribute 0 (no evidence either way). Scoring folds
    * the doc's hashed features in document order, so it equals the batch
    * q57 score up to float re-association (batch folds by ascending
    * feature; spec-checked at 1e-6).
    */
  /** §2.E Bloom-filter gate: q62's built snapshot filter
    * ([[graft.operators.TrainingOps.bloomFilterWords]], ≤128 longs) rides
    * as a LITERAL word array over the stream — stateless, shuffle-free
    * streaming membership: per document, the [[graft.operators
    * .TrainingOps.bloomPosCols]] probe expressions (shared verbatim with
    * the batch gate, so the bit domains cannot drift) index the literal
    * and `maybe_dup` is the all-bits-set test. Like E11's model gate,
    * refreshing the filter = restarting the query with a new literal —
    * the streaming form of a broadcast sketch. No false negatives by
    * construction; false positives are the filter's documented rate.
    */
  def bloomGate(stream: DataFrame, filterWords: Map[Int, Long]): DataFrame = {
    import graft.operators.TrainingOps
    val words = array(
      (0 until TrainingOps.BloomBits / 64).map(w => lit(filterWords.getOrElse(w, 0L))): _*)
    stream
      .withColumn("ws", words)
      .withColumn("ps", array(TrainingOps.bloomPosCols.map(c => c): _*))
      .withColumn(
        "maybe_dup",
        expr("forall(ps, p -> (element_at(ws, int(p div 64) + 1) & shiftleft(1L, p % 64)) != 0)"))
      .select(col("doc_id"), col("ts"), col("maybe_dup"))
  }

  /** §2.E LM-fluency gate (E14): q68's trained hashed bigram model applied
    * to a live stream through the SAME codegen'd
    * [[graft.functions.Expressions.LmXent]] projection as the batch
    * operator — stateless, shuffle-free, the q57/E11 model-apply shape.
    * Because the expression is shared verbatim (model maps as reference
    * objects), streaming scores equal the batch q68 column EXACTLY, not
    * just approximately; refreshing the model = restarting the query with
    * a newly collected pair of count maps. Documents too short to have a
    * bigram (n_pairs = 0) fail the gate — no fluency evidence.
    */
  def lmGate(
      stream: DataFrame,
      bigram: Map[Long, Long],
      unigram: Map[Long, Long],
      maxXent: Double = 10.0
  ): DataFrame =
    stream
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn(
        "s",
        graft.functions.Expressions.lm_xent(col("toks"), bigram, unigram, CurationOps.LmBuckets))
      .select(
        col("doc_id"),
        col("ts"),
        col("s.n_pairs").as("n_pairs"),
        col("s.lm_xent").as("lm_xent"),
        (col("s.lm_xent").isNotNull && col("s.lm_xent") <= maxXent).as("keep"))

  /** §2.E windowed drift monitor (E16): q71's per-source bucket histogram
    * under an event-time window — the live view of "which source started
    * sounding different?". Binning is the SAME in-row hashed-unigram
    * expression as the batch operator (no literals, no model: the hash IS
    * the binning), so the only stateful operator is the windowed
    * (window, source, bucket) count — state ≤ |sources|×buckets rows per
    * open window no matter the stream volume, the E15 histogram shape.
    * Windows emit their histogram rows on watermark close (append mode);
    * the KL against a reference snapshot distribution is extracted at the
    * sink via [[graft.operators.StatsOps.driftKl]] — the batch q71 formula
    * verbatim, so a window whose content equals a batch source scores
    * IDENTICALLY to q71 on that corpus (spec-pinned).
    */
  def driftMonitor(
      stream: DataFrame,
      buckets: Int = graft.operators.StatsOps.DriftBuckets,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"
  ): DataFrame =
    stream
      .withWatermark("ts", watermarkDur)
      .select(
        col("ts"),
        col("source"),
        explode(expr(
          s"transform(split(trim(text), '\\\\s+'), t -> pmod(xxhash64(t), $buckets))")).as("f"))
      .groupBy(window(col("ts"), windowDur), col("source"), col("f"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("window_start"), col("source"), col("f"), col("c"))

  /** §2.E BPE vocabulary-fit gate (E19): q91's learned merge table applied
    * to a live stream through the SAME codegen'd
    * [[graft.functions.Expressions.BpeEncode]] projection as the batch
    * operator — stateless, shuffle-free, the E14 model-apply shape. The
    * compression ratio (chars per BPE token) is the fit signal: text the
    * vocabulary was trained for compresses well; out-of-domain or junk
    * text stays near 1 char/token and fails the gate. Shared expression +
    * literal merge table ⇒ streaming stats equal batch q91 EXACTLY;
    * refreshing the vocabulary = restarting the query with a newly
    * trained merge table.
    */
  def bpeGate(
      stream: DataFrame,
      lefts: Array[String],
      rights: Array[String],
      minRatio: Double = 1.5
  ): DataFrame =
    stream
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("e", graft.functions.Expressions.bpe_encode(col("toks"), lefts, rights))
      .select(
        col("doc_id"),
        col("ts"),
        col("e")(0).as("n_words"),
        col("e")(1).as("n_raw_syms"),
        col("e")(2).as("n_bpe_toks"),
        when(col("e")(2) > 0,
          round(col("e")(1).cast("double") / col("e")(2), 6)).as("compression"))
      .withColumn("keep", coalesce(col("compression") >= minRatio, lit(false)))

  /** §2.E streaming normalization gate (E20, twin: q93): the SAME codegen'd
    * [[graft.functions.Expressions.NormalizeText]] pass applied per event —
    * stateless, shuffle-free. Emits the cleaned text plus repair telemetry;
    * `keep` rejects docs the cleaner had to rewrite heavily (control-char
    * density above `maxCtrlFrac` of the raw byte length — binary junk
    * masquerading as text), the standard ingest tripwire.
    */
  def normalizeGate(stream: DataFrame, maxCtrlFrac: Double = 0.05): DataFrame =
    stream
      .withColumn("nt", graft.functions.Expressions.normalize_text(col("text")))
      .select(
        col("doc_id"),
        col("ts"),
        col("nt.clean").as("clean"),
        col("nt.n_ctrl").as("n_ctrl"),
        col("nt.changed_nfc").as("changed_nfc"),
        octet_length(col("text")).cast("long").as("len_raw"))
      .withColumn(
        "keep",
        col("len_raw") === 0L ||
          col("n_ctrl").cast("double") / col("len_raw") <= maxCtrlFrac)

  def dsirScoreGate(
      stream: DataFrame,
      model: Map[Long, Double],
      threshold: Double = 0.0
  ): DataFrame = {
    val m = map(model.toSeq.sortBy(_._1).flatMap { case (f, lr) => Seq(lit(f), lit(lr)) }: _*)
    stream
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("feats", CurationOps.dsirFeats)
      .withColumn(
        "dsir_score",
        aggregate(col("feats"), lit(0.0), (acc, f) => acc + coalesce(element_at(m, f), lit(0.0))))
      .select(
        col("doc_id"),
        col("ts"),
        col("dsir_score"),
        (col("dsir_score") >= threshold).as("keep"))
  }

  /** E44: streaming training-shard router — the writer-side data layer of
    * q170's epoch reshuffle: each incoming document is routed map-side to
    * its deterministic shard (`xxhash64(epoch, doc_id) mod S` — the SAME
    * chained-hash rule as batch, so the stream assignment is bit-equal to
    * q170's epoch-0 shard column, spec-pinned) and carries the hash that
    * defines its in-shard READ order; a live ingest can therefore append
    * to the correct training shard immediately, and the final in-shard
    * sort (by `h`, the batch rank order) happens at write/compaction —
    * arrival order never matters. Stateless, shuffle-free, no watermark:
    * pure routing.
    */
  def shardRouter(docs: DataFrame, epoch: Long = 0L): DataFrame = {
    val h = xxhash64(lit(epoch), col("doc_id"))
    docs.select(
      col("doc_id"),
      col("ts"),
      lit(epoch).as("epoch"),
      pmod(h, lit(graft.operators.TrainingOps.ShuffleShards)).as("shard"),
      h.as("h"))
  }

  /** E43: streaming mass-histogram emission — q181's data layer, and the
    * third op (after E34's xor, E38's power sums) whose stream/batch
    * reconciliation is EXACT BY ALGEBRA: per closed window × (source,
    * length) cell the doc count and character MASS; histogram cells are
    * additive, so element-wise summing any window span reproduces the
    * batch (source, length) histogram bit-for-bit (spec-pinned), and
    * q181's integer `cumw·den ≥ W·num` threshold rule then picks the
    * mass quantiles WITHOUT re-touching raw data — how a live ingest
    * keeps "half our bytes are in docs shorter than X" current. One
    * watermarked tumbling-window aggregate, map-side partials, append
    * exactly once.
    *
    * Bit-for-bit reconciliation with batch q181 is CONDITIONED on the
    * invariant `n_chars == length(text)`: the stream derives the length
    * key from the text itself (`length`, codepoint count) while q181
    * buckets on the stored `n_chars` column. The synthetic generator
    * maintains the invariant; a production feed whose `n_chars` counts
    * BYTES (or strips before storing) must either carry its own n_chars
    * on the streaming record or accept cell-key drift between the two.
    */
  def massHistStream(
      docs: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("source"), length(col("text")).cast("long").as("v"))
      .groupBy(window(col("ts"), windowDur), col("source"), col("v"))
      .agg(count(lit(1)).as("n_docs"), sum(col("v")).as("mass"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("source"),
        col("v"),
        col("n_docs"),
        col("mass"))

  case class StratDoc(doc_id: Long, lang: String, source: String, ts: java.sql.Timestamp)

  /** E47: streaming per-stratum reservoir — the live twin of batch q192,
    * sharing its kernel verbatim ([[graft.operators.TrainingOps
    * .reservoirOf]]): per (source, lang) stratum the running k-sample
    * under ascending `xxhash64(doc_id)`. Because the draw key is a pure
    * content hash, the reservoir after ANY prefix of the stream equals
    * the batch sample of exactly those documents (spec-pinned at the
    * half-corpus and full-corpus points) — arrival order, batching, and
    * restarts never change the sample. State is the CollectTopK buffer:
    * ≤ k rows per stratum in the state store, no matter the stream
    * volume — the same bounded-state argument as E13, here as an
    * UNWINDOWED running aggregate (complete mode: strata are a bounded
    * key space by contract, so the re-emitted result is bounded too;
    * the final sort is legal exactly because the mode is complete).
    */
  def reservoirStream(docs: DataFrame): DataFrame =
    graft.operators.TrainingOps.reservoirOf(docs)

  /** E49: streaming binary chunker (twin: D6, kernel shared verbatim —
    * [[graft.operators.Multimodal.mediaChunks]]): each incoming media
    * payload splits at the SAME content-defined byte boundaries, so a
    * live ingest appends to the media chunk store with identities
    * bit-equal to the batch grain (spec-pinned) — the writer-side feed
    * of D6's dedup statistics and q198's sync planning at the media
    * grain, with an E12-style Bloom/snapshot gate riding directly on
    * `h`. Stateless mapPartitions projection: no watermark, no shuffle,
    * no state; throughput bounded by the source and one md5 per chunk.
    */
  def mediaChunkStream(
      media: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord]): DataFrame =
    graft.operators.Multimodal.mediaChunks(media).toDF()

  /** E50: streaming contamination gate (twin: q39/q205) — each incoming
    * document is screened against the EVAL-SET gram store before it can
    * enter a training shard: shared ≤df-capped 8-gram count + a
    * contaminated flag, per doc, map-side. Unlike E12's Bloom (a sketch
    * over an unbounded corpus), the benchmark side here is SMALL BY
    * NATURE — an eval suite is thousands of docs, its capped distinct
    * grams a bounded set — so the gate broadcasts the exact gram set as
    * a literal (the E11/E14 model-gate shape) and owes nothing to a
    * state store: stateless projection, no watermark, no shuffle, exact
    * evidence (the gram hashes are q39's own kernel, so a flagged doc
    * is exactly a doc q39 would pair). Refresh cadence = eval-set
    * release cadence, the snapshot-refresh-by-restart contract.
    */
  def contaminationGate(docs: DataFrame, benchGrams: Set[Long]): DataFrame = {
    import graft.operators.{TextOps, TrainingOps}
    val n = TrainingOps.DecontamN
    val granted = typedLit(benchGrams.toSeq.sorted)
    docs
      .select(col("doc_id"), col("ts"), TextOps.toks.as("toks"))
      .select(
        col("doc_id"),
        col("ts"),
        size(filter(
          TextOps.distinctGramHashExpr(n),
          g => array_contains(granted, g))).as("n_shared"))
      .select(
        col("doc_id"), col("ts"), col("n_shared"),
        (col("n_shared") > 0).as("contaminated"))
  }

  /** E64: streaming contamination SEVERITY sweep — q205's live leg at all
    * three gram grains (E50 screens the 8-gram grain alone): per incoming
    * doc, the shared capped-gram count at n = 4 / 8 / 13 against the
    * broadcast per-grain eval-set gram stores, and the graded verdict —
    * `verbatim` (13-gram evidence, the GPT-3/Dolma strict rule), `strong`
    * (8-gram, q39's grain), `weak` (4-gram only — phrase-level,
    * paraphrase-adjacent), `clean`. Same stateless broadcast-literal
    * shape as E50 (an eval suite's capped gram stores are bounded by
    * nature): no state store, no watermark, no shuffle; the hashes are
    * q205's own kernel, so a doc graded at grain n is exactly a doc q205
    * counts as contaminated at n (spec-reconciled).
    */
  def contaminationSweepGate(docs: DataFrame, benchByN: Map[Int, Set[Long]]): DataFrame = {
    import graft.operators.{TextOps, TrainingOps}
    require(TrainingOps.SweepNs == Seq(4, 8, 13), "severity tiers assume the 4/8/13 sweep")
    val shares = TrainingOps.SweepNs.map { n =>
      val granted = typedLit(benchByN.getOrElse(n, Set.empty[Long]).toSeq.sorted)
      size(filter(
        TextOps.distinctGramHashExpr(n),
        g => array_contains(granted, g))).as(s"n_shared_$n")
    }
    docs
      .select(col("doc_id"), col("ts"), TextOps.toks.as("toks"))
      .select(Seq(col("doc_id"), col("ts")) ++ shares: _*)
      .withColumn("severity",
        when(col("n_shared_13") > 0, "verbatim")
          .when(col("n_shared_8") > 0, "strong")
          .when(col("n_shared_4") > 0, "weak")
          .otherwise("clean"))
  }

  /** One eval-set vector in E65's broadcast LSH store: its id, its
    * (table, bucket) cells flattened to unique longs
    * (`t · 2^planes + bucket` — bucket ids collide ACROSS tables, the
    * flattening keeps cells distinct), the double vector, and its norm.
    */
  case class EvalVec(vec_id: Long, cells: Seq[Long], v: Seq[Double], nrm: Double)

  /** E65: streaming semantic-decontamination gate (twin: q212 — the
    * embedding-space complement of E50/E64's gram gates): each incoming
    * TRAIN-candidate vector is screened against the broadcast EVAL-SET
    * LSH store before it can enter a training shard — a paraphrased
    * benchmark answer shares no 8-gram with its source (E50/E64 pass it)
    * but its embedding still lands in an eval vector's bucket. Per
    * incoming vector: the eval candidates sharing ≥ 1 LSH cell at cosine
    * ≥ the q30 candidate gate, the best one (max cosine, ties to the
    * smallest eval id), and the leak verdict at
    * [[graft.operators.VectorOps.SemLeakThreshold]].
    *
    * Same stateless broadcast-literal shape as E50 (enforced, not
    * assumed — see [[evalLshStore]]'s cap): no state store, no
    * watermark, no shuffle. The store's cells and the incoming buckets
    * use the SAME corpus-derived plane AND table counts and hyperplane
    * family ([[graft.functions.Expressions.hyperplane_bucket]]); the
    * incoming side expands its cells to the hamming-1 probe set (r14's
    * pair-side multi-probe), so store-overlap is EXACTLY the batch
    * candidate rule `hamming(bucket_eval, bucket_in) ≤ 1 in some table`;
    * the cosine is the same termwise fold — so a flagged vector is
    * exactly a vector batch q212 would pair (spec-reconciled; the one
    * divergence is the batch side's over-cap bucket SAMPLING, which at
    * eval-suite bucket sizes never engages). Zero-norm vectors carry no
    * direction and pass clean, q30's rule. Refresh cadence = eval-set
    * release cadence, the snapshot-refresh-by-restart contract.
    */
  def semanticLeakGate(vecs: DataFrame, evalStore: Seq[EvalVec], planes: Int): DataFrame = {
    import graft.functions.Expressions.{dot_product, hyperplane_bucket, l2_norm}
    import graft.operators.VectorOps
    val store = typedLit(evalStore)
    val cells = array((0 until VectorOps.nearDupTablesFor(planes)).map { t =>
      (lit(t.toLong) * lit(1L << planes) +
        hyperplane_bucket(col("v"), t, planes).cast("long")).as(s"c$t")
    }: _*)
    vecs
      .withColumn("nrm", l2_norm(col("v")))
      // home cells, then the hamming-1 probe expansion: the bucket part
      // occupies the low `planes` bits of a cell id, so flipping bit
      // p < planes stays inside the same table's cell range
      .withColumn("hcells", cells)
      .withColumn("cells",
        expr(s"""flatten(transform(hcells, c ->
                |  concat(array(c),
                |         transform(sequence(0, ${planes - 1}),
                |                   p -> c ^ shiftleft(cast(1 AS bigint), p)))))""".stripMargin))
      .withColumn("hits",
        when(col("nrm") > 0,
          filter(
            transform(
              filter(store, e => arrays_overlap(e.getField("cells"), col("cells"))),
              e => struct(
                e.getField("vec_id").as("eval_id"),
                (dot_product(e.getField("v"), col("v")) / (e.getField("nrm") * col("nrm")))
                  .as("sim"))),
            s => s.getField("sim") >= VectorOps.NearDupThreshold))
          .otherwise(expr("CAST(array() AS array<struct<eval_id:bigint,sim:double>>)")))
      .withColumn("n_eval_cands", size(col("hits")).cast("long"))
      .withColumn("best_sim_raw", array_max(expr("transform(hits, s -> s.sim)")))
      .withColumn("best_eval",
        array_min(expr("transform(filter(hits, s -> s.sim = best_sim_raw), s -> s.eval_id)")))
      .select(
        col("vec_id"), col("ts"),
        col("n_eval_cands"),
        col("best_eval"),
        round(col("best_sim_raw"), 4).as("best_sim"),
        coalesce(col("best_sim_raw") >= VectorOps.SemLeakThreshold, lit(false)).as("is_leak"))
  }

  /** Hard ceiling on the broadcast eval store: the gate inlines the store
    * into the plan (a Catalyst literal), so its size must be ENFORCED,
    * not assumed.
    */
  val MaxEvalStore = 8192

  /** The eval-side LSH store E65 broadcasts, with the plane and table
    * counts derived from the SAME corpus count batch q212 uses: every
    * non-train-split vector (q40's content-stable split rule on vec_id)
    * with its flattened HOME LSH cells (the incoming side carries the
    * hamming-1 probe expansion).
    *
    * Boundedness is ENFORCED, not assumed: the q40 split makes the
    * non-train side ~(100 − SplitTrainPct)% OF THE CORPUS — a fraction,
    * not a constant — so this demo source only stays broadcastable while
    * the corpus is small. The collect asserts [[MaxEvalStore]] and fails
    * LOUDLY past it; a production deployment sources this store from a
    * genuinely bounded eval-suite table (the released benchmark itself),
    * for which the E50/E64 broadcast shape is the honest contract.
    */
  def evalLshStore(
      spark: org.apache.spark.sql.SparkSession, dir: String): (Seq[EvalVec], Int) = {
    import graft.functions.Expressions.hyperplane_bucket
    import graft.operators.{TrainingOps, VectorOps}
    val planes = VectorOps.nearDupPlanesFor(spark, dir)
    val cells = array((0 until VectorOps.nearDupTablesFor(planes)).map { t =>
      lit(t.toLong) * lit(1L << planes) + hyperplane_bucket(col("v"), t, planes).cast("long")
    }: _*)
    val rows = VectorOps.emb(spark, dir)
      .withColumn("split",
        TrainingOps.splitNameCol(TrainingOps.splitBucketCol(col("vec_id"))))
      .filter(col("split") =!= "train")
      .select(col("vec_id"), cells.as("cells"), col("v"), col("nrm"))
      .limit(MaxEvalStore + 1)
      .collect()
    require(rows.length <= MaxEvalStore,
      s"eval LSH store exceeds MaxEvalStore=$MaxEvalStore vectors — the q40-split demo " +
        "source scales with the corpus; source the store from a bounded eval-suite table")
    val store = rows.map(r => EvalVec(
      r.getLong(0),
      r.getSeq[Long](1),
      r.getSeq[Double](2),
      r.getDouble(3)))
      .toSeq
    (store, planes)
  }

  /** E66: streaming LSH occupancy tripwire (twin: q252 — the live side of
    * the q251/q252 monitoring pair): per closed window × LSH table, the
    * bucket count, member total, largest bucket, mean occupancy against
    * the [[graft.operators.VectorOps.LshTargetOccupancy]] design point,
    * and the over-cap bucket count — the tripwire that says "this feed's
    * occupancy has drifted off the design point: the corpus count the
    * planes were derived from is stale, re-derive before the next dedup
    * campaign" (or "one cluster is flooding a single bucket") while the
    * window is quarantinable, instead of at the next batch audit.
    *
    * Scale shape: E55/E63's chained stateful windows — stage 1 collapses
    * each window to the (table, bucket) grain over the COMBINED home +
    * hamming-1 probe emission (q252's r14 grain — the membership the
    * pair expansion actually runs over), map-side hyperplane projection
    * + two integer counts, state bounded by watermark × live cells;
    * stage 2 re-windows via `window_time` and folds five integer sums to
    * ≤[[graft.operators.VectorOps.nearDupTablesFor]] rows per window;
    * the distinct-bucket count is an ordinary `count(1)` over stage-1
    * cells, never a distinct over stream state. Zero-norm vectors are
    * dropped (q30's corpus rule). Window = reconciliation grain:
    * batch-grouping the same records by the same windows reproduces
    * every column exactly (spec-pinned against q252's own aggregate
    * shapes).
    */
  def occupancyTripwire(
      vecs: DataFrame,
      planes: Int,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    import graft.functions.Expressions.{hyperplane_bucket, l2_norm}
    import graft.operators.{TextOps, VectorOps}
    val tables = VectorOps.nearDupTablesFor(planes)
    val cells = vecs
      .withColumn("nrm", l2_norm(col("v")))
      .filter(col("nrm") > 0)
      .withWatermark("ts", watermarkDur)
      .select(
        col("ts"),
        posexplode(array((0 until tables).map(t => hyperplane_bucket(col("v"), t, planes)): _*))
          .as(Seq("tbl", "hb")))
      .select(
        col("ts"), col("tbl"),
        explode(
          expr(
            s"""concat(
               |  array(named_struct('bucket', hb, 'home', true)),
               |  transform(sequence(0, ${planes - 1}),
               |            p -> named_struct('bucket', cast(hb ^ shiftleft(1, p) AS int),
               |                              'home', false)))""".stripMargin)).as("be"))
      .groupBy(window(col("ts"), windowDur), col("tbl"), col("be.bucket").as("bucket"))
      .agg(
        count(lit(1)).as("nb"),
        sum(when(col("be.home"), 1L).otherwise(0L)).as("nh"))
    cells
      .groupBy(window(window_time(col("window")), windowDur), col("tbl"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("nb")).as("n_members"),
        sum(col("nh")).as("n_home_members"),
        max(col("nb")).as("max_bucket"),
        sum(when(col("nb") > TextOps.MaxBucket, 1L).otherwise(0L)).as("n_overcap"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("tbl"),
        lit(planes).as("planes"),
        col("n_buckets"),
        col("n_members"),
        col("n_home_members"),
        col("max_bucket"),
        round(col("n_members").cast("double") / col("n_buckets").cast("double"), 6)
          .as("mean_occupancy"),
        col("n_overcap"))
  }

  /** A q251 probe vector with its per-table HOME buckets — the broadcast
    * store of the E67 recall canary.
    */
  case class ProbeVec(p_id: Long, v: Seq[Double], nrm: Double, bks: Seq[Int])

  /** E67: streaming recall canary (twin: q251 — the live leg of the
    * q251/q252 monitoring pair; E66 watches the geometry's COST, this
    * watches its RECALL): the [[graft.operators.VectorOps.EmbedRecallProbes]]-bounded
    * probe set broadcasts with its exact vectors and per-table home
    * buckets; every arriving vector that is a TRUE near-threshold partner
    * of a probe (exact cosine ≥ the q30 gate — computed in-row against
    * the 64-vector store) is checked against the geometry: would the
    * multi-table hamming-1 pipeline have caught the pair
    * (`hamming(bucket_probe, bucket_in) ≤ 1` in some table)? Per closed
    * window × severity threshold: true pairs seen, pairs the geometry
    * catches, live recall — the tripwire that says "the corpus drifted
    * (or grew) past the plane/table derivation: re-derive before the
    * next dedup campaign" BEFORE a batch q251 audit would.
    *
    * Pair-once rule (q251's distinct-pair semantics): an arriving vector
    * that is ITSELF a probe only pairs against smaller probe ids, so a
    * probe-probe pair counts exactly once across the replay; every other
    * arrival pairs against all probes. Zero-norm arrivals pass clean
    * (q30's rule). Stateless per-row screen + one windowed integer
    * rollup (≤ |thresholds| rows per window, the full grid like q251's —
    * a no-truth window reports n_true = 0 with NULL recall). Probe-less
    * arrivals flow to the rollup as a null hit (`explode_outer`) rather
    * than being dropped: a row filtered out before the stateful operator
    * never advances the watermark (measured — a quiet feed would
    * otherwise never close its windows). The one divergence from batch
    * q251 is the batch side's over-cap bucket SAMPLING, which at
    * probe-store bucket sizes never engages (spec-pinned equality on the
    * same records).
    */
  def recallCanary(
      vecs: DataFrame,
      store: Seq[ProbeVec],
      planes: Int,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    import graft.functions.Expressions.{dot_product, hyperplane_bucket, l2_norm}
    import graft.operators.VectorOps
    val tables   = VectorOps.nearDupTablesFor(planes)
    val probeIds = store.map(_.p_id)
    val probes   = typedLit(store)
    val thGrid   = array(VectorOps.EmbedRecallThresholds.map(lit(_)): _*)
    vecs
      .withColumn("nrm", l2_norm(col("v")))
      .filter(col("nrm") > 0)
      .withWatermark("ts", watermarkDur)
      .withColumn("bks",
        array((0 until tables).map(t => hyperplane_bucket(col("v"), t, planes)): _*))
      .withColumn("is_probe", col("vec_id").isInCollection(probeIds))
      .withColumn("hits",
        filter(
          transform(probes, p => struct(
            p.getField("p_id").as("p_id"),
            (dot_product(p.getField("v"), col("v")) / (p.getField("nrm") * col("nrm")))
              .as("sim"),
            exists(
              zip_with(p.getField("bks"), col("bks"),
                (a, b) => bit_count(a.bitwiseXOR(b)) <= lit(1)),
              x => x).as("caught"))),
          h =>
            h.getField("p_id") =!= col("vec_id") &&
              (!col("is_probe") || h.getField("p_id") < col("vec_id")) &&
              h.getField("sim") >= VectorOps.NearDupThreshold))
      .select(col("ts"), explode_outer(col("hits")).as("h"))
      .select(col("ts"), col("h.sim").as("sim"), col("h.caught").as("caught"),
        explode(thGrid).as("threshold"))
      .filter(col("sim").isNull || col("sim") >= col("threshold"))
      .groupBy(window(col("ts"), windowDur), col("threshold"))
      .agg(
        sum(when(col("sim").isNotNull, 1L).otherwise(0L)).as("n_true"),
        sum(when(col("caught"), 1L).otherwise(0L)).as("n_caught"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("threshold"),
        col("n_true"),
        col("n_caught"),
        when(col("n_true") > 0,
          round(col("n_caught").cast("double") / col("n_true").cast("double"), 6))
          .as("recall"),
        lit(planes).as("planes"),
        lit(tables).as("tables"))
  }

  /** The probe store E67 broadcasts: q251's exact probe pick (smallest
    * signed xxhash64, then id — content-stable) with each probe's vector,
    * norm, and per-table home buckets at the corpus-derived geometry.
    * [[graft.operators.VectorOps.EmbedRecallProbes]]-bounded by
    * construction.
    */
  def recallProbeStore(
      spark: org.apache.spark.sql.SparkSession, dir: String): (Seq[ProbeVec], Int) = {
    import graft.functions.Expressions.hyperplane_bucket
    import graft.operators.VectorOps
    val planes = VectorOps.nearDupPlanesFor(spark, dir)
    val tables = VectorOps.nearDupTablesFor(planes)
    val bks = array((0 until tables).map(t => hyperplane_bucket(col("v"), t, planes)): _*)
    val rows = VectorOps.emb(spark, dir)
      .select(col("vec_id"), col("v"), col("nrm"), bks.as("bks"),
        xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(VectorOps.EmbedRecallProbes)
      .collect()
      .map(r => ProbeVec(
        r.getLong(0),
        r.getSeq[Double](1),
        r.getDouble(2),
        r.getSeq[Int](3)))
      .toSeq
    (rows, planes)
  }

  /** The per-grain eval gram stores E64 broadcasts. */
  def benchGramSets(
      spark: org.apache.spark.sql.SparkSession, dir: String): Map[Int, Set[Long]] =
    graft.operators.TrainingOps.SweepNs.map(n => n -> benchGramSetAt(spark, dir, n)).toMap

  /** The benchmark gram set E50 broadcasts: q39's bench split and DF cap
    * on a corpus snapshot — bounded by the eval suite's size.
    */
  def benchGramSet(spark: org.apache.spark.sql.SparkSession, dir: String): Set[Long] =
    benchGramSetAt(spark, dir, graft.operators.TrainingOps.DecontamN)

  /** [[benchGramSet]] at an explicit gram grain (the E64 sweep). r14: a
    * [[graft.operators.TrainingOps.SweepNs]] grain reads the session-shared
    * [[graft.operators.SharedStages.dfCapGrams]] stage (a kept gram's ids
    * list is COMPLETE by the cap, so bench membership is an in-row
    * exists) — the store build stops re-scanning the corpus q39/q205
    * already aggregated; any other grain falls back to the bespoke
    * one-pass aggregate.
    */
  def benchGramSetAt(
      spark: org.apache.spark.sql.SparkSession, dir: String, n: Int): Set[Long] = {
    import graft.operators.{SharedStages, TextOps, TrainingOps}
    if (TrainingOps.SweepNs.contains(n))
      SharedStages.dfCapGrams(spark, dir)
        .filter(col("n") === n &&
          expr(s"exists(ids, d -> d % ${TrainingOps.BenchEvery} = 0)"))
        .select(col("g"))
        .collect().map(_.getLong(0)).toSet
    else {
      val sh = graft.core.Tables.documents(spark, dir)
        .select(col("doc_id"), TextOps.toks.as("toks"))
        .filter(size(col("toks")) >= n)
        .select(col("doc_id"), explode(TextOps.distinctGramHashExpr(n)).as("g"))
      // q39's one-pass DF-cap shape: exact df + bench membership in ONE
      // map-side-combinable gram-keyed aggregate — never a keyed count
      // window (one task per hot gram; the round-8 verdict's hazard #4)
      sh.groupBy(col("g"))
        .agg(
          count(lit(1)).as("df"),
          max(when(col("doc_id") % TrainingOps.BenchEvery === 0, 1).otherwise(0)).as("hb"))
        .filter(col("df") <= TrainingOps.DecontamMaxDf && col("hb") === 1)
        .select(col("g"))
        .collect().map(_.getLong(0)).toSet
    }
  }

  /** E52: streaming HT/PPS estimator envelopes — q210's live leg, and the
    * fourth op (after E34 xor, E38 power sums, E43 mass cells) whose
    * stream/batch reconciliation is EXACT BY ALGEBRA: per closed window ×
    * source the count/true-token/sampled/HT/variance envelope, every
    * component an integer (the HT and variance terms ride q210's own
    * quantize-once kernel, [[graft.operators.TrainingOps.htEnvelopeAggs]],
    * shared verbatim) — envelopes are ADDITIVE, so element-wise summing
    * any window span reproduces batch q210's per-source sums bit-for-bit
    * (spec-pinned) and the estimate/SE derive from the merged vector
    * without re-touching raw documents: how a live ingest keeps "how many
    * tokens are we collecting, ± what" current. One watermarked tumbling
    * window aggregate, map-side partials, append exactly once. Stored-
    * column invariant (E43's rule): the stream derives n_chars from the
    * text itself; a feed whose stored n_chars differs must carry its own.
    */
  def htStream(
      docs: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    import graft.operators.TrainingOps
    val base = docs
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("source"), col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(TextOps.toks).cast("long").as("n_tok"))
    base
      .select((base.columns.map(col) ++ TrainingOps.htInclusionCols): _*)
      .groupBy(window(col("ts"), windowDur), col("source"))
      .agg(TrainingOps.htEnvelopeAggs.head, TrainingOps.htEnvelopeAggs.tail: _*)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("source"), col("n_docs"), col("tok_true"), col("n_sampled"),
        col("ht_q"), col("var_q"))
  }

  /** E53: streaming conformal-coverage monitor — q216's live leg. The
    * batch side CALIBRATES thresholds `t_α` on the held-out split with
    * the finite-sample guarantee; this watches whether the LIVE stream
    * still honors them: per closed window × α, docs scored (q22's shared
    * stop-ratio expression — batch and stream cannot diverge), docs
    * within threshold, and empirical coverage beside the target. Coverage
    * decaying below `1−α` is THE distribution-shift tripwire conformal
    * prediction gives for free — exchangeability broke, recalibrate
    * before trusting the gate (the streaming complement of q216's
    * holdout coverage column, sitting beside E16's PSI-style drift
    * monitor with a guarantee attached instead of a heuristic band).
    *
    * Scale shape: thresholds arrive as a bounded (≤|alphas|) broadcast
    * literal from the batch calibration — the model-collection rule;
    * scoring is one map-side projection; the ×|alphas| expansion is
    * in-row; state is ONE watermarked tumbling-window aggregate keyed by
    * (window, α) with map-side partials, append exactly once. The
    * (n_docs, n_within) counts are integers and ADDITIVE across windows,
    * so summing any window span reproduces the batch coverage fraction
    * on the same documents exactly (spec-pinned).
    */
  def conformalMonitor(
      docs: DataFrame,
      thresholds: Seq[(Double, Double)],
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val thr = array(thresholds.map { case (a, t) =>
      struct(lit(a).as("alpha"), lit(t).as("t"))
    }: _*)
    docs
      .withWatermark("ts", watermarkDur)
      .select(
        col("ts"),
        (TextOps.stopCountExpr / size(TextOps.toks)).as("v"),
        explode(thr).as("th"))
      .select(col("ts"), col("v"), col("th.alpha").as("alpha"), col("th.t").as("t"))
      .groupBy(window(col("ts"), windowDur), col("alpha"), col("t"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("v") <= col("t"), 1L).otherwise(0L)).as("n_within"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("alpha"), col("t"), col("n_docs"), col("n_within"),
        round(col("n_within").cast("double") / col("n_docs").cast("double"), 6)
          .as("coverage"),
        (lit(1.0) - col("alpha")).as("target"))
  }

  /** E55: streaming within-window duplicate-pair meter — q219's live leg,
    * and the suite's demonstration of CHAINED stateful window aggregates
    * (Spark's multiple-stateful-operator support): stage 1 collapses each
    * window to (content-hash → copies, sampled copies) — map-side
    * combinable, the only corpus-sized state; stage 2 re-windows the
    * BOUNDED per-hash table via `window_time` and folds the exact
    * `Σ C(k,2)` within-window dup pairs, the sampled pairs, and q219's
    * ×(1/p²) Horvitz-Thompson estimate. A feed whose estimated pair rate
    * jumps is re-crawling itself — caught per window, before the batch
    * dedup pass ever runs. Counts are integers and the window is the
    * reconciliation grain: batch-grouping the same records by the same
    * windows reproduces every column exactly (spec-pinned).
    */
  def dupPairsStream(
      docs: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    import graft.operators.TrainingOps.DupEstPct
    val scale = (100L / DupEstPct) * (100L / DupEstPct)
    val perKey = docs
      .withWatermark("ts", watermarkDur)
      .select(
        col("ts"), md5(col("text")).as("h"),
        when(pmod(xxhash64(col("doc_id")), lit(100)) < DupEstPct, 1L).otherwise(0L).as("s"))
      .groupBy(window(col("ts"), windowDur), col("h"))
      .agg(count(lit(1)).as("k"), sum(col("s")).as("ks"))
    perKey
      .groupBy(window(window_time(col("window")), windowDur))
      .agg(
        sum(col("k")).as("n_docs"),
        sum(col("ks")).as("n_sampled"),
        sum(expr("k * (k - 1) div 2")).as("dup_pairs"),
        sum(expr("ks * (ks - 1) div 2")).as("sample_dup_pairs"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_docs"), col("n_sampled"), col("dup_pairs"), col("sample_dup_pairs"),
        (col("sample_dup_pairs") * lit(scale)).as("est_dup_pairs"))
  }

  /** E56: streaming k-anonymity tripwire — q159's live leg, the second
    * chained-stateful-window pipeline (E55's shape): stage 1 collapses
    * each window to the quasi-identifier grain `(source, n_chars DIV
    * 100)` — counts, map-side combinable, the QI set is a deployment
    * choice — and stage 2 re-windows that bounded class table via
    * `window_time` to report, per closed window, equivalence classes
    * seen, classes below k = 5, and documents sitting in them. A batch
    * q159 audit certifies the CORPUS; this catches the re-identification
    * risk ARRIVING (a niche feed whose rare (source, size) combination
    * points at individuals) while the window is still quarantinable.
    * Window = the reconciliation grain: batch-grouping the same records
    * by the same windows reproduces every column exactly (spec-pinned).
    * E43's stored-column rule: length derives from the text itself.
    */
  val StreamKanonK = 5L

  def kanonTripwire(
      docs: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val classes = docs
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("source"),
        expr("CAST(length(text) AS BIGINT) div 100").as("szb"))
      .groupBy(window(col("ts"), windowDur), col("source"), col("szb"))
      .agg(count(lit(1)).as("k"))
    classes
      .groupBy(window(window_time(col("window")), windowDur))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("k") < StreamKanonK, 1L).otherwise(0L)).as("n_below_k"),
        sum(when(col("k") < StreamKanonK, col("k")).otherwise(0L)).as("n_docs_at_risk"),
        sum(col("k")).as("n_docs"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_docs"), col("n_classes"), col("n_below_k"), col("n_docs_at_risk"),
        round(col("n_docs_at_risk").cast("double") / col("n_docs").cast("double"), 6)
          .as("at_risk_share"))
  }

  case class LangDoc(doc_id: Long, text: String, lang: String, source: String,
      ts: java.sql.Timestamp)

  /** E57: streaming t-closeness tripwire — the third leg of the privacy
    * trio's live side (E56 watches class SIZE / k-anonymity; this watches
    * class COMPOSITION): per closed window, quasi-identifier classes
    * `(source, length(text) DIV 100)` whose SENSITIVE-attribute (lang)
    * distribution diverges from the corpus baseline by more than `t` in
    * total variation — the t-closeness breach l-diversity misses when a
    * class has many distinct values but a heavily skewed mix (a niche
    * feed whose rare-language concentration points at a community even
    * though k and l both pass). Batch q229 certifies the corpus; this
    * catches a skewed class ARRIVING while the window is still
    * quarantinable.
    *
    * Scale shape (E55/E56's chained-stateful-window pipeline): stage 1
    * collapses each window to the QI grain with ONE bounded column per
    * baseline language (conditional integer sums — the lang domain
    * arrives as a ≤|langs| broadcast literal from the batch snapshot,
    * the model-collection rule; unseen languages fold into an `other`
    * bucket with zero baseline mass, maximally conservative). The TVD
    * numerator `Σ_v |k_v·N − g_v·n_c|` is computed IN-ROW on the bounded
    * class row as DECIMAL(38,0) cross-multiplication (a long overflows
    * once window-class counts × corpus size pass ~10¹⁸), then stage 2
    * re-windows the bounded class table via `window_time`. Counts are
    * integers and additive; window = the reconciliation grain —
    * batch-grouping the same records reproduces every column exactly
    * (spec-pinned incl. a planted skewed class).
    */
  val StreamTclosenessT = 0.3

  def tclosenessTripwire(
      docs: DataFrame,
      langDist: Seq[(String, Long)],
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val bigN = langDist.map(_._2).sum
    val langCounts = langDist.map { case (l, _) =>
      sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"k_$l")
    } :+ sum(when(col("lang").isInCollection(langDist.map(_._1)), 0L).otherwise(1L))
      .as("k_other") :+ count(lit(1)).as("n_c")
    val classes = docs
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("source"), col("lang"),
        expr("CAST(length(text) AS BIGINT) div 100").as("szb"))
      .groupBy(window(col("ts"), windowDur), col("source"), col("szb"))
      .agg(langCounts.head, langCounts.tail: _*)
    // |k_v·N − g_v·n_c| per baseline language, plus the other-bucket term
    // |k_other·N − 0| — all integer-valued DECIMAL(38,0) arithmetic
    val numer = (langDist.map { case (l, g) =>
      abs(col(s"k_$l").cast("decimal(38,0)") * lit(bigN)
        - lit(g) * col("n_c").cast("decimal(38,0)"))
    } :+ abs(col("k_other").cast("decimal(38,0)") * lit(bigN)))
      .reduce(_ + _)
    val scored = classes
      .withColumn("tvd_num", numer)
      .withColumn("tvd",
        col("tvd_num").cast("double")
          / (lit(2.0) * col("n_c").cast("double") * lit(bigN.toDouble)))
    scored
      .groupBy(window(window_time(col("window")), windowDur))
      .agg(
        sum(col("n_c")).as("n_docs"),
        count(lit(1)).as("n_classes"),
        sum(when(col("tvd") > StreamTclosenessT, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("tvd") > StreamTclosenessT, col("n_c")).otherwise(0L))
          .as("n_docs_at_risk"),
        max(col("tvd")).as("max_tvd"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_docs"), col("n_classes"), col("n_violating"), col("n_docs_at_risk"),
        round(col("max_tvd"), 6).as("max_tvd"))
  }

  /** E58: streaming l-diversity tripwire — q175's live leg, completing
    * the privacy trio's stream side (E56 watches class SIZE, E57 class
    * COMPOSITION vs a baseline; this watches class VALUE DIVERSITY): per
    * closed window, quasi-identifier classes `(source, length(text) DIV
    * 100)` whose sensitive attribute (lang) takes fewer than
    * [[StreamLdivL]] distinct values — including the fully homogeneous
    * classes (one value) where membership alone discloses the attribute,
    * the leak k-anonymity misses when a class is big but uniform.
    *
    * Scale shape: THREE chained stateful window aggregates (one past
    * E55/E56's two — Spark's multiple-stateful-operator chaining via
    * `window_time` carries it): stage 1 collapses to the (QI, lang) cell
    * grain (counts, map-side combinable); stage 2 re-windows the bounded
    * cell table to the QI class grain, where the distinct-value count is
    * an ordinary `count(1)` over cells — never a `countDistinct` holding
    * a value set in stream state; stage 3 re-windows the class table to
    * the per-window report. All counts integer and additive within the
    * window; window = the reconciliation grain — batch-grouping the same
    * records reproduces every column exactly (spec-pinned incl. a
    * planted homogeneous class).
    */
  val StreamLdivL = 3L

  def ldiversityTripwire(
      docs: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val cells = docs
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("source"), col("lang"),
        expr("CAST(length(text) AS BIGINT) div 100").as("szb"))
      .groupBy(window(col("ts"), windowDur), col("source"), col("szb"), col("lang"))
      .agg(count(lit(1)).as("k"))
    val classes = cells
      .groupBy(window(window_time(col("window")), windowDur), col("source"), col("szb"))
      .agg(count(lit(1)).as("l"), sum(col("k")).as("n_c"))
    classes
      .groupBy(window(window_time(col("window")), windowDur))
      .agg(
        sum(col("n_c")).as("n_docs"),
        count(lit(1)).as("n_classes"),
        sum(when(col("l") < StreamLdivL, 1L).otherwise(0L)).as("n_below_l"),
        sum(when(col("l") < StreamLdivL, col("n_c")).otherwise(0L)).as("n_docs_at_risk"),
        sum(when(col("l") === 1L, 1L).otherwise(0L)).as("n_homogeneous"),
        min(col("l")).as("min_diversity"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_docs"), col("n_classes"), col("n_below_l"), col("n_docs_at_risk"),
        col("n_homogeneous"), col("min_diversity"))
  }

  /** Bounded (≤|langs|) corpus language baseline for [[tclosenessTripwire]]
    * — collected from the batch snapshot (the model-collection rule), so
    * batch q229 and the stream tripwire measure against the identical
    * distribution.
    */
  def langDistFrom(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[(String, Long)] =
    graft.core.Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("g"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)

  case class TsMedia(media_id: Long, payload: Array[Byte], source: String, ts: java.sql.Timestamp)

  /** E54: streaming audio-quality monitor — the D2 audio kernel
    * ([[graft.operators.Multimodal.decodeAudio]]/`audioFeatures`, shared
    * verbatim so batch and stream cannot diverge) applied at ingest: per
    * closed window × source, media seen, payloads that decode as WAV/PCM,
    * silent count (RMS < 0.001 full-scale), clipped count (peak ≥ 0.999),
    * and the mean RMS level — the "is this feed dead air / hot-mic
    * garbage?" gate a live media ingest needs BEFORE paying storage
    * (the audio complement of E49's chunker and E9's text gate).
    *
    * Scale shape: decode runs executor-local in `mapPartitions` (exactly
    * where the batch kernel runs — no shuffle); per-row features quantize
    * to integer micro-units immediately, so the ONE watermarked
    * tumbling-window aggregate carries only integer sums with map-side
    * partials, append exactly once. Counts and quantized sums are
    * ADDITIVE: any window span sums to the batch kernel's per-source
    * totals on the same records exactly (spec-pinned).
    */
  def audioMonitor(
      media: org.apache.spark.sql.Dataset[TsMedia],
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    import media.sparkSession.implicits._
    import graft.operators.Multimodal
    val scored = media
      .mapPartitions(_.map { m =>
        Multimodal.decodeAudio(m.payload) match {
          case Some((_, _, samples)) =>
            val f = Multimodal.audioFeatures(samples)
            (m.ts, m.source, 1,
              Math.round(f(1) * 1000000), Math.round(f(2) * 1000000))
          case None => (m.ts, m.source, 0, 0L, 0L)
        }
      })
      .toDF("ts", "source", "decoded", "rq", "pq")
    scored
      .withWatermark("ts", watermarkDur)
      .groupBy(window(col("ts"), windowDur), col("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("decoded")).as("n_audio"),
        sum(when(col("decoded") === 1 && col("rq") < 1000L, 1L).otherwise(0L)).as("n_silent"),
        sum(when(col("decoded") === 1 && col("pq") >= 999000L, 1L).otherwise(0L)).as("n_clipped"),
        sum(col("rq")).as("rms_q"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("source"), col("n_media"), col("n_audio"), col("n_silent"), col("n_clipped"),
        col("rms_q"),
        when(col("n_audio") === 0L, lit(null).cast("double"))
          .otherwise(round(col("rms_q").cast("double")
            / (col("n_audio") * lit(1000000L)).cast("double"), 6))
          .as("mean_rms"))
  }

  /** The calibrated (α, t_α) pairs E53 broadcasts: q216's 'val'-split
    * PUBLISHED thresholds on a corpus snapshot — bounded by the α grid.
    * The monitor consumes the 6-dp published value (the number the gate
    * actually ships), so batch and stream gate on the identical literal.
    */
  def conformalThresholds(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[(Double, Double)] =
    graft.operators.StatsOps.conformalGate(spark, dir)
      .select(col("alpha"), col("threshold"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq.sortBy(_._1)

  /** E63: streaming source-concentration tripwire — q245's live leg: per
    * closed window, the HHI of source shares, the effective source count,
    * and the dominant source with its share. A healthy multi-source feed
    * whose window HHI spikes toward 1 is one upstream crawler flooding
    * the pipe (or the others silently dying) — the supply-diversity
    * failure q245 certifies per corpus, caught while the window is still
    * quarantinable.
    *
    * Scale shape (E55's chained pipeline): stage 1 collapses each window
    * to the (source → count) grain — map-side combinable, bounded by
    * |sources| per window; stage 2 re-windows via `window_time` and
    * folds Σc, Σc² (DECIMAL(38,0)), and the max-count source via ONE
    * ordered struct max. The identity `HHI = Σc²/(Σc)²` keeps the whole
    * statistic in exact integers until one divide — no per-source share
    * column ever materializes. Window = reconciliation grain
    * (spec-pinned exact batch reproduction).
    */
  def hhiTripwire(
      docs: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val perSrc = docs
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("source"))
      .groupBy(window(col("ts"), windowDur), col("source"))
      .agg(count(lit(1)).as("c"))
    perSrc
      .groupBy(window(window_time(col("window")), windowDur))
      .agg(
        sum(col("c")).as("t"),
        count(lit(1)).as("n_sources"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"),
        max(struct(col("c"), col("source"))).as("top"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("t").as("n_docs"),
        col("n_sources"),
        round(col("s2").cast("double")
          / (col("t").cast("double") * col("t").cast("double")), 6).as("hhi"),
        when(col("s2").cast("double") > 0.0,
          round((col("t").cast("double") * col("t").cast("double"))
            / col("s2").cast("double"), 6)).as("eff_sources"),
        col("top.source").as("top_source"),
        round(col("top.c").cast("double") / col("t").cast("double"), 6).as("top_share"))
  }

  /** E62: streaming Brier monitor — q234's live leg beside E60 (E60 bins
    * the gap; this folds the single proper-score number a pager
    * thresholds): per closed window, the Brier score of q22's stop-ratio
    * signal against the within-window EXACT-copy truth (E55/E60's
    * windowable dup label), plus the window base rate. A Brier step-change
    * is the one-number alarm that the score/truth relationship moved —
    * cheaper to page on than E60's per-bin table, with E60 as the
    * drill-down.
    *
    * Scale shape: stage 1 is E60's content-hash window grain (k copies +
    * the hash-functional micro score); the per-hash squared error
    * `k·(s_micro − 10⁶·y)²` (y = 1 iff k ≥ 2) is a projection between
    * the two stateful aggregates — DECIMAL(38,0), integer-exact; stage 2
    * re-windows via `window_time` and folds three integer sums. Window =
    * reconciliation grain: batch-grouping the same records by the same
    * windows with the same copy rule reproduces every column exactly
    * (spec-pinned).
    */
  def brierTripwire(
      docs: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val perHash = docs
      .withWatermark("ts", watermarkDur)
      .select(
        col("ts"), md5(col("text")).as("h"),
        (TextOps.stopCountExpr / size(TextOps.toks)).as("v"))
      .select(col("ts"), col("h"),
        expr("CAST(round(v * 1000000.0, 0) AS BIGINT)").as("s_micro"))
      .groupBy(window(col("ts"), windowDur), col("h"), col("s_micro"))
      .agg(count(lit(1)).as("k"))
      .select(col("window"), col("k"), col("s_micro"),
        expr(
          """CAST(k AS DECIMAL(38,0))
             * (s_micro - (CASE WHEN k >= 2 THEN 1000000 ELSE 0 END))
             * (s_micro - (CASE WHEN k >= 2 THEN 1000000 ELSE 0 END))""").as("sq"))
    perHash
      .groupBy(window(window_time(col("window")), windowDur))
      .agg(
        sum(col("k")).as("n_docs"),
        sum(when(col("k") >= 2L, col("k")).otherwise(0L)).as("n_dup"),
        sum(col("sq")).as("serr"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_docs"),
        col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs").cast("double"), 6).as("base_rate"),
        round(col("serr").cast("double") / lit(1.0e12) / col("n_docs").cast("double"), 6)
          .as("brier"))
  }

  /** E60: streaming calibration-reliability tripwire — q233's live leg,
    * on the E55 chained-stateful-window shape. The batch q233 calibrates
    * q22's stop-ratio signal against VERIFIED near-dup truth; a stream
    * can't run pair verification, so the live leg uses the within-window
    * EXACT-copy truth E55 already maintains (same content hash appearing
    * ≥ 2 times in the window) — the strict subset of dup truth that is
    * windowable, and precisely the label a re-crawling feed trips first.
    * Per closed window × score bin: docs, exact-copy docs, observed dup
    * rate, mean score, and the |accuracy − confidence| gap — a bin whose
    * gap blows out live says the batch-calibrated signal no longer means
    * what the reliability diagram certified, before the next batch audit
    * would notice.
    *
    * Scale shape: stage 1 collapses each window to the content-hash grain
    * (map-side combinable; same text ⇒ same score ⇒ same bin, so the
    * bin/s_micro columns are hash-functional and ride the SAME aggregate
    * — no extra state); stage 2 re-windows the bounded per-hash table via
    * `window_time` to the ≤[[graft.operators.StatsOps.CalibBins]]-per-
    * window bin grain. Counts and micro-sums are integers; window = the
    * reconciliation grain — batch-grouping the same records by the same
    * windows with the same within-window copy rule reproduces every
    * column exactly (spec-pinned).
    */
  def calibBinsTripwire(
      docs: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val bins = graft.operators.StatsOps.CalibBins
    val perHash = docs
      .withWatermark("ts", watermarkDur)
      .select(
        col("ts"), md5(col("text")).as("h"),
        (TextOps.stopCountExpr / size(TextOps.toks)).as("v"))
      .select(
        col("ts"), col("h"),
        expr("CAST(round(v * 1000000.0, 0) AS BIGINT)").as("s_micro"),
        least(floor(col("v") * lit(bins.toDouble)), lit((bins - 1).toLong)).as("bin"))
      .groupBy(window(col("ts"), windowDur), col("h"), col("bin"), col("s_micro"))
      .agg(count(lit(1)).as("k"))
    perHash
      .groupBy(window(window_time(col("window")), windowDur), col("bin"))
      .agg(
        sum(col("k")).as("n_docs"),
        sum(when(col("k") >= 2L, col("k")).otherwise(0L)).as("n_dup"),
        sum(col("k") * col("s_micro")).as("s"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("bin"),
        col("n_docs"),
        col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs").cast("double"), 6).as("dup_rate"),
        round(col("s").cast("double") / lit(1000000.0) / col("n_docs").cast("double"), 6)
          .as("avg_score"),
        round(abs(col("n_dup") * lit(1000000L) - col("s")).cast("double") / lit(1000000.0)
          / col("n_docs").cast("double"), 6).as("gap"))
  }
}
