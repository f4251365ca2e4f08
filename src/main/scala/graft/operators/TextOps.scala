package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Expressions.{poly_fingerprint, simhash64}

/** §2.C text-analysis + deduplication operators over the `documents` table.
  *
  * Scale posture: everything here is map-side until the dedup bucket joins,
  * which shuffle on (band, signature) keys only — never an n² cross join.
  * Candidate generation (MinHash-LSH / SimHash bands) is linear in corpus
  * size; exact verification (Jaccard) runs only on candidates.
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  private val toks: Column = split(trim(col("text")), "\\s+")

  // --- C1 q20: exact dedup via content-hash groupBy ------------------------
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("h"))

  val dedupExactSql: String =
    """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin

  // --- C2 q21: token counting (whitespace + BPE-ish regex) -----------------
  // BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
  // the standard byte-pair pre-split shape. Spark SQL string literals eat
  // one level of backslash ('\s' → 's'), DuckDB's don't — hence two forms.
  private val BpeReSpark = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]"
  private val BpeReDuck  = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_ws_tokens"),
        expr(s"size(regexp_extract_all(text, '$BpeReSpark', 0))").as("n_bpe_tokens"),
        length(col("text")).as("n_chars_actual")
      )
      .orderBy(col("doc_id"))

  val tokenCountSql: String =
    s"""SELECT doc_id,
       | len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       | len(regexp_extract_all(text, '$BpeReDuck')) AS n_bpe_tokens,
       | length(text) AS n_chars_actual
       |FROM documents ORDER BY doc_id""".stripMargin

  // --- C3 q22: quality scoring ---------------------------------------------
  private val Stopwords = Seq("the", "a", "an", "and", "of", "to", "in", "is")

  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        expr(s"size(filter(split(trim(text), '\\\\s+'), t -> t IN ($stopList)))")
          .as("n_stop"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .as("n_punct"),
        length(regexp_replace(col("text"), "\\s", "")).as("n_nonspace")
      )
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens"))
      .withColumn("avg_token_len", col("n_nonspace") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreSql: String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, n_tokens, n_stop, n_punct, n_nonspace,
       | n_stop / n_tokens AS stop_ratio,
       | n_nonspace / n_tokens AS avg_token_len
       |FROM (
       | SELECT doc_id,
       |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |  len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN ($stopList))) AS n_stop,
       |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
       |  length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
       | FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // --- C4 q23: language-ID heuristic (rows-only) ---------------------------
  private val LangStops: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ein", "ist"),
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "que", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et", "un")
  )

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val counts = LangStops.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString(", ")
      expr(s"size(filter(split(trim(lower(text)), '\\\\s+'), t -> t IN ($lst)))")
        .as(s"c_$lang")
    }
    val base = docs(spark, dir).select(col("doc_id") +: counts: _*)
    // deterministic argmax: first language (alphabetical) with the max count;
    // all-zero → 'und' (undetermined)
    val langs  = LangStops.map(_._1)
    val maxCnt = greatest(langs.map(l => col(s"c_$l")): _*)
    val guess = langs
      .foldLeft(when(maxCnt === 0, "und")) { (acc, l) =>
        acc.when(col(s"c_$l") === maxCnt, l)
      }
      .otherwise("und")
    base
      .withColumn("lang_guess", guess)
      .orderBy(col("doc_id"))
  }

  // --- C5 q24: document fingerprint (rows-only) ----------------------------
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), poly_fingerprint(toks).as("fp"))
      .orderBy(col("doc_id"))

  // --- shared shingle machinery for C6/C8 ----------------------------------
  /** doc_id + distinct 3-token shingles (docs shorter than 3 tokens drop out). */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        expr(
          "array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
        ).as("shingles")
      )

  // --- C6 q25: MinHash + LSH banding → near-dup candidate pairs ------------
  // k=32 permutations, 8 bands × 4 rows: P(candidate | jaccard j) =
  // 1-(1-j^4)^8 — ≈1.0 at j≥0.9, ≈0 for unrelated docs. Shuffle is on
  // (band, band_hash) only; bucket sizes stay tiny under any corpus size
  // unless docs truly collide.
  private val MinhashK = 32
  private val Bands    = 8
  private val RowsPerBand = MinhashK / Bands

  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    // permutation i: re-hash the shingle hash with the permutation index
    // (overflow-free under ANSI mode, deterministic, codegen-friendly);
    // min per doc per permutation = the signature.
    val mins = (0 until MinhashK).map { i =>
      min(xxhash64(col("h"), lit(i))).as(s"s$i")
    }
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    val bandStructs = (0 until Bands).map { bIdx =>
      val cols = (0 until RowsPerBand).map(r => col(s"s${bIdx * RowsPerBand + r}"))
      struct(lit(bIdx).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val x = bands.alias("x")
    val y = bands.alias("y")
    x.join(y, col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- C7 q26: SimHash + hamming bands → near-dup pairs --------------------
  // 64-bit simhash; 4 bands of 16 bits block candidates (hamming ≤ 3 ⇒ at
  // least one band identical); exact hamming filter afterwards.
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sims = docs(spark, dir)
      .select(col("doc_id"), explode(toks).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("hs"))
      .select(col("doc_id"), simhash64(col("hs")).as("sim"))
    val bandStructs = (0 until 4).map { bIdx =>
      struct(
        lit(bIdx).as("band"),
        (shiftrightunsigned(col("sim"), bIdx * 16).bitwiseAND(lit(0xffffL))).as("bh")
      )
    }
    val bands = sims
      .select(col("doc_id"), col("sim"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("sim"), col("b.band").as("band"), col("b.bh").as("bh"))
    val x = bands.alias("x")
    val y = bands.alias("y")
    x.join(y, col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"),
        expr("bit_count(x.sim ^ y.sim)").as("hamming")
      )
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- C8 q27: exact n-gram Jaccard verification of LSH candidates ---------
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val cands = minhashLsh(spark, dir)
    val sh    = shingled(spark, dir)
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b")))
      )
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
