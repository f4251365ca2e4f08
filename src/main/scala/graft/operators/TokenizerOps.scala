package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Tokenizer-training operators: the corpus-scale side of building a BPE
  * vocabulary — the step every LLM data pipeline runs once per corpus
  * refresh, and the canonical map-reduce workload (word counting) feeding a
  * bounded training loop.
  */
object TokenizerOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  // --- q90: BPE merge-rule training ----------------------------------------

  /** Dictionary cap: BPE trains on the word-frequency DICTIONARY, not the
    * corpus — top-V words by (count desc, word asc). Distinct words grow
    * sublinearly (Heaps' law, measured by q82) but are not bounded, so the
    * cap is what makes the collected training set a model-sized object at
    * 100 TB; 2048 words cover the mass that decides early merges.
    */
  val BpeVocabWords = 2048

  /** How many merge rules to learn. Fixed so the oracle unrolls exactly. */
  val BpeMerges = 8

  /** Byte-pair-encoding merge-rule training (Sennrich et al. 2016, the
    * public BPE algorithm): start from characters, repeatedly count
    * adjacent symbol pairs over the word-frequency dictionary and merge the
    * most frequent pair, greedy left-to-right within each word. Output is
    * the learned merge table — rank, pair, merged symbol, and the pair's
    * weighted frequency at merge time.
    *
    * Scale shape: the 100 TB work is the word count — one corpus scan with
    * map-side partial aggregation on the word, then a bounded
    * TakeOrdered(V) — after which training runs on the collected ≤V-row
    * dictionary (the model-collection rule: same shape as the ANN trainers
    * and the DSIR/NB model builds — the loop never touches the corpus
    * again). Merge application inside the loop is driver-local over ≤V
    * short symbol arrays.
    *
    * Determinism: counts are exact integers; argmax tie-breaks by
    * (count desc, left asc, right asc); greedy merge is a pure
    * left-to-right scan. No floats anywhere, so the oracle — the same K
    * rounds unrolled as DuckDB CTEs (the q32/q46 Lloyd-chain pattern),
    * with greedy non-overlap expressed as "odd positions within each run
    * of consecutive candidate sites" — is exact by construction.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dict: Array[(String, Long)] = docs(spark, dir)
      .select(explode(TextOps.toks).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(BpeVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    var words: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank   = 1
    var done   = false
    while (rank <= BpeMerges && !done) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (ss, c) =>
        var i = 0
        while (i < ss.length - 1) {
          val k = (ss(i), ss(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), c) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, l + r, c))
        words = words.map { case (ss, wc) => (greedyMerge(ss, l, r), wc) }
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "lft", "rgt", "merged", "pair_count")
      .orderBy(col("rank"))
  }

  /** One greedy left-to-right merge pass: at each site where `l` is
    * immediately followed by `r`, emit the merged symbol and skip both —
    * a merged symbol never re-matches as `l` within the same pass (it is
    * textually `l+r`, and `r` is non-empty).
    */
  private[graft] def greedyMerge(ss: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i   = 0
    while (i < ss.length) {
      if (i < ss.length - 1 && ss(i) == l && ss(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += ss(i); i += 1 }
    }
    out.toArray
  }

  /** Oracle: the identical K rounds unrolled as CTEs. Per round: positional
    * explode + lookahead (`y`), pair counts (`p`), argmax with the same
    * tie-break (`b`), candidate sites (`c`), greedy selection = odd
    * row_number within each run of consecutive candidates (`s`), rebuild
    * (`w{r+1}`). All integer/string ops — exact on any engine. The
    * round-carried CTEs are MATERIALIZED: DuckDB inlines plain CTEs at
    * every reference, which re-expands the whole prefix chain per round —
    * exponential plan growth (it exhausts file handles re-opening the
    * scan) — while materialization keeps the chain linear, mirroring how
    * the Scala loop actually executes.
    */
  lazy val bpeTrainSql: String = {
    val rounds = (1 to BpeMerges).map { r =>
      s"""y$r AS MATERIALIZED (
         |  SELECT wid, i, s, lead(s) OVER (PARTITION BY wid ORDER BY i) AS s2, c
         |  FROM (SELECT wid, i, ss[i] AS s, c FROM w$r, unnest(generate_series(1, len(ss))) AS t(i))),
         |p$r AS (SELECT s AS l, s2 AS rgt, sum(c)::BIGINT AS cnt FROM y$r WHERE s2 IS NOT NULL GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT l, rgt, cnt FROM p$r ORDER BY cnt DESC, l, rgt LIMIT 1),
         |c$r AS (SELECT y.wid, y.i FROM y$r y, b$r b WHERE y.s = b.l AND y.s2 = b.rgt),
         |r$r AS (SELECT wid, i, i - row_number() OVER (PARTITION BY wid ORDER BY i) AS rn FROM c$r),
         |s$r AS MATERIALIZED (SELECT wid, i FROM (
         |  SELECT wid, i, row_number() OVER (PARTITION BY wid, rn ORDER BY i) AS k FROM r$r) WHERE k % 2 = 1),
         |w${r + 1} AS MATERIALIZED (
         |  SELECT y.wid, list(CASE WHEN m.i IS NOT NULL THEN y.s || y.s2 ELSE y.s END ORDER BY y.i) AS ss,
         |         any_value(y.c) AS c
         |  FROM y$r y LEFT JOIN s$r m ON m.wid = y.wid AND m.i = y.i
         |             LEFT JOIN s$r p ON p.wid = y.wid AND p.i = y.i - 1
         |  WHERE p.i IS NULL
         |  GROUP BY y.wid)""".stripMargin
    }.mkString(",\n")
    val out = (1 to BpeMerges)
      .map(r => s"SELECT $r AS rank, l, rgt, cnt FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""WITH q90wf AS MATERIALIZED (
       |  SELECT w, count(*)::BIGINT AS c
       |  FROM (SELECT unnest(${TextOps.DuckToks}) AS w FROM documents)
       |  WHERE len(w) > 0
       |  GROUP BY w ORDER BY c DESC, w LIMIT $BpeVocabWords),
       |w1 AS (
       |  SELECT row_number() OVER (ORDER BY c DESC, w) AS wid,
       |         regexp_extract_all(w, '.') AS ss, c
       |  FROM q90wf),
       |$rounds
       |SELECT rank::INT AS rank, l AS lft, rgt, l || rgt AS merged, cnt AS pair_count
       |FROM ($out)
       |ORDER BY rank""".stripMargin
  }
}
