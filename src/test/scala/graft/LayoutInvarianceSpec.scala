package graft

import org.apache.spark.sql.DataFrame

/** SURVEY §4's central determinism claim, asserted end-to-end: operator
  * OUTPUT is a pure function of the data — never of the cluster layout.
  * Every hash-split, range-rank, fold, and sample in the library is built
  * content-stable precisely so that re-running on a different executor
  * count or scan split produces byte-identical results; this suite
  * actually re-runs a representative slice under a different layout.
  *
  * The probe set covers the mechanisms most at risk from re-layout:
  * q20 (hash groupBy dedup), q24 (map-side fingerprints), q79 (the
  * range-partition + partition-prefix rank machinery, where
  * `spark_partition_id` values CHANGE under re-layout and the counts must
  * not), q81 (chunk explode + owner aggregate), q82 (sort-free ranks
  * feeding cumulative histograms), q92 (strictlyLess-ranked file
  * assignment — every box would shift if the rank drifted by one), q95
  * (prefix self-join + distinct whose pair set must be layout-free), q97
  * (5 float power-iteration rounds over checkpointed edges — fold order
  * is pinned per node, so re-layout must not move a single 6dp rank),
  * q106 (greedy budget selection whose order comes from the
  * partition-prefix rank — a layout-sensitive offset fold), q110
  * (session path assembly from per-key sorted event folds), q112
  * (rolling distinct-actives scatter over date offsets), q124 (Poisson
  * bootstrap whose CI is an order statistic over 32 float replicate
  * means), q126 (cluster bootstrap + arm hashing at the user grain),
  * q133 (session first-view carry + ⌈p·N⌉ order-stat quantiles), q135
  * (12 rounded float power-iteration rounds), q138 (signature-component
  * folds joined per pair), q139 (star-contraction labels feeding the
  * hash split — a drifting label would silently re-split documents),
  * q143 (gram df join-back over the exploded shingle grain), q148 (the
  * change-point argmax over prefix-sum windows — an exact-integer key,
  * but the window itself re-partitions under re-layout), q149 (the
  * equi-depth boundary pick from the cumulative histogram), q151
  * (session-window channel carries + full-outer rollup join), q152
  * (float cosine rank ties at four truncation dims), q153 (the boundary
  * hour from the cumulative hour histogram + the (type, user) overlap
  * rollup), q155 (the xor/min/max manifest — DESIGNED to be
  * layout-blind, so a drift here is the clearest possible regression),
  * q166 (10 max-normalized float HITS half-rounds over checkpointed
  * directed edges), q169 (change-flag window + run aggregate + lead carry
  * riding ONE shared partitioning), q170 (per-epoch hash-rank
  * permutations — a training order that moved under re-layout would
  * silently change what a run trains on).
  * Caches AND the session-shared checkpointed stages are cleared between
  * runs so the second pass genuinely re-derives everything under the new
  * layout.
  */
class LayoutInvarianceSpec extends SparkSpec {

  private val Probes =
    Seq("q20_dedup_exact", "q24_fingerprint", "q79_quantile_normalize",
      "q81_chunk_dedup", "q82_heaps_law", "q92_zorder_layout",
      "q95_prefix_join", "q97_pagerank_dups", "q106_token_budget",
      "q110_session_paths", "q112_rolling_actives",
      "q124_bootstrap_ci", "q126_ab_uplift", "q133_conversion_latency",
      "q135_stationary_mix", "q138_minhash_calibration",
      "q139_grouped_split", "q143_doc_novelty",
      "q148_changepoint", "q149_range_planner", "q151_attribution",
      "q152_trunc_audit", "q153_temporal_split", "q155_content_manifest",
      "q166_hits_scores", "q169_scd2_compaction", "q170_epoch_shuffle",
      // round-6 evaluation layer: q171 (integer moment sums + float r —
      // an unpinned partial-sum order would move the 6dp correlations),
      // q172 (the KM ordered product fold over a collected array — the
      // array's sort_array order must not depend on collection order),
      // q174 (quantized within/between terms summed order-free), q176
      // (float cosine rank ties + the micro-quantized summary fold),
      // q177 (three bucket-derived pair sets and their exact counts)
      "q171_acf_volume", "q172_km_survival", "q174_moments_profile",
      "q176_retrieval_mrr", "q177_dedup_agreement",
      // q180 (the island row_number over the mismatch table — rank drift
      // would re-fragment ranges), q183 (bucket counts off the shared
      // signature stage), q185/q187 (keeper flags joining the shared
      // star-contraction labels — a drifting label re-flags documents),
      // q186 (per-user gap windows + DECIMAL moment sums)
      "q180_backfill_plan", "q183_bucket_balance", "q185_dedup_yield",
      "q186_bot_screen", "q187_dedup_bias",
      // round-7 layer: q189 (chunk ownership under the min-owner rule —
      // a layout-dependent min would re-attribute dup bytes), q191
      // (source-ordered entropy/chi2 folds over the shard grid), q192
      // (the CollectTopK heap must equal the window rank regardless of
      // which partition feeds the heap first), q194 (integer covariance
      // cells + the driver's IEEE iteration — any partial-sum drift
      // would move every spectral output), q196 (bucket-ordered JS
      // folds), q197 (micro-int silhouette sums), q198 (distinct-chunk
      // membership join), q200 (source-ordered Σ√p fold + min-capacity
      // tie flag)
      "q189_cdc_chunks", "q191_shard_mix", "q192_reservoir",
      "q194_embed_spectrum", "q196_source_divergence", "q197_silhouette",
      "q198_sync_plan", "q200_epoch_planner",
      // round-13 layer: q30 (the derived-planes bucket pipeline and the
      // xxhash64-ordered over-cap sample must not depend on which
      // partition feeds a bucket's heap first), q251 (the TakeOrdered
      // probe pick + the candidate left join), q252 (bucket occupancy
      // counts under re-layout)
      "q30_embed_neardup", "q251_embed_recall", "q252_lsh_occupancy")

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, Sf0001).collect().map(_.toString).toSeq

  test("outputs are identical under a different shuffle/scan layout") {
    val conf       = spark.conf
    val oldShuffle = conf.get("spark.sql.shuffle.partitions")
    val oldBytes   = conf.get("spark.sql.files.maxPartitionBytes")
    spark.catalog.clearCache()
    operators.SharedStages.release(spark)
    val base = Probes.map(n => n -> run(n)).toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      // force full re-derivation under the new layout — including the
      // session-shared checkpointed stages, which clearCache can't see
      spark.catalog.clearCache()
      operators.SharedStages.release(spark)
      Probes.foreach { n =>
        val again = run(n)
        assert(again == base(n), s"$n output changed under re-layout")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", oldShuffle)
      conf.set("spark.sql.files.maxPartitionBytes", oldBytes)
      spark.catalog.clearCache()
      operators.SharedStages.release(spark)
    }
  }
}
