package graft

import org.apache.spark.sql.functions._

import graft.operators.TokenizerOps

/** q90 BPE merge-rule training: greedy-merge semantics and the full
  * training loop against the hand-computed classic corpus
  * (Sennrich et al. 2016's low/lower/newest/widest example).
  */
class TokenizerOpsSpec extends SparkSpec {
  import spark.implicits._

  test("greedyMerge is left-to-right non-overlapping; merged symbols never re-match") {
    // overlapping run: aaa → (aa)(a), the middle 'a' is consumed by site 0
    assert(TokenizerOps.greedyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(TokenizerOps.greedyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    // disjoint sites both merge in one pass
    assert(TokenizerOps.greedyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
    // no site → unchanged
    assert(TokenizerOps.greedyMerge(Array("x", "y"), "a", "b").toSeq == Seq("x", "y"))
    // a merged symbol is textually l+r and must not cascade within the pass:
    // ["ab","b"] after merging (a,b) does NOT become ["abb"]
    assert(TokenizerOps.greedyMerge(Array("a", "b", "b"), "a", "b").toSeq == Seq("ab", "b"))
  }

  test("q90 learns the classic merge table on the textbook corpus") {
    // word frequencies: low:5 lower:2 newest:6 widest:3
    val text5  = Array.fill(5)("low").mkString(" ")
    val rows = Seq(
      (0L, s"$text5 lower lower", "en", "s0", 30L),
      (1L, Array.fill(6)("newest").mkString(" "), "en", "s0", 41L),
      (2L, Array.fill(3)("widest").mkString(" "), "en", "s1", 20L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q90spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TokenizerOps.bpeTrain(spark, dir).orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    // Hand-derived with the (count desc, left asc, right asc) tie-break:
    // r1 (e,s)=9 beats (s,t)=9 on left; r3 (l,o)=7 beats (o,w)=7; r5
    // (e,w)=6 beats (n,e),(w,est); r6 (ew,est)=6 beats (n,ew); r8
    // (d,est)=3 beats (i,d),(w,i).
    val expected = Seq(
      (1, "e",  "s",    "es",     9L),
      (2, "es", "t",    "est",    9L),
      (3, "l",  "o",    "lo",     7L),
      (4, "lo", "w",    "low",    7L),
      (5, "e",  "w",    "ew",     6L),
      (6, "ew", "est",  "ewest",  6L),
      (7, "n",  "ewest", "newest", 6L),
      (8, "d",  "est",  "dest",   3L)
    )
    assert(got == expected)
  }

  test("q91 encodes the textbook corpus with hand-computed token counts") {
    val text5 = Array.fill(5)("low").mkString(" ")
    val rows = Seq(
      (0L, s"$text5 lower lower", "en", "s0", 30L),
      (1L, Array.fill(6)("newest").mkString(" "), "en", "s0", 41L),
      (2L, Array.fill(3)("widest").mkString(" "), "en", "s1", 20L),
      (3L, "   ", "en", "s1", 3L) // whitespace-only: zero words, null ratio
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("q91spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TokenizerOps.bpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4))).toSeq
    // low→[low] (1 tok), lower→[low,e,r] (3), newest→[newest] (1),
    // widest→[w,i,dest] (3) under the 8 learned merges
    val expected: Seq[(Long, Long, Long, Long, Any)] = Seq(
      (0L, 7L, 25L, 11L, 2.272727), // round(25/11, 6)
      (1L, 6L, 36L, 6L, 6.0),
      (2L, 3L, 18L, 9L, 2.0),
      (3L, 0L, 0L, 0L, null)
    )
    assert(got == expected)
  }

  test("q90 on the test corpus: ranks are 1..K, counts non-increasing, merges well-formed") {
    val out = TokenizerOps.bpeTrain(spark, Sf0001).collect()
    assert(out.length == TokenizerOps.BpeMerges)
    assert(out.map(_.getInt(0)).toSeq == (1 to TokenizerOps.BpeMerges))
    val counts = out.map(_.getLong(4)).toSeq
    assert(counts == counts.sorted.reverse, "pair frequency must be non-increasing in rank")
    out.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2), "merged = lft || rgt")
    }
  }
}
