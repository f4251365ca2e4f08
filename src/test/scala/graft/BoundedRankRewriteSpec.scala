package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{logical => L}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** graft.plans.BoundedRankRewrite: `row_number().over(...) <= k` filters
  * must plan as the bounded-heap CollectTopK aggregate (q61's plan) with
  * the window gone — and produce exactly the rows the window plan
  * produces, including null placement and pagination conjuncts.
  */
class BoundedRankRewriteSpec extends SparkSpec {

  private def optimizedHasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case w: L.Window => w }.nonEmpty

  private def optimizedHasTopK(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("collect_top_k")

  test("q08's window-rank plan rewrites to ObjectHashAggregate[collect_topk], window gone") {
    val q08 = SparkEntry.queries("q08_topk_per_group")(spark, Sf0001)
    assert(!optimizedHasWindow(q08), "Window survived the rewrite")
    assert(optimizedHasTopK(q08), "collect_topk missing from the optimized plan")
    val phys = q08.queryExecution.executedPlan.toString
    assert(phys.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$phys")
    assert(!phys.contains("WindowGroupLimit"), "window machinery still present")
    // and the rewritten q08 still equals the oracle-pinned q61 heap twin
    val a = q08.collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q61_topk_agg")(spark, Sf0001).collect().map(_.toSeq).toSeq
    assert(a == b, "rewritten q08 diverged from q61")
  }

  /** Spark SQL's double comparison: -0.0 ties 0.0, NaN ties NaN and is
    * the largest value (SQLOrderingUtil semantics).
    */
  private def sqlCompare(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** Driver-side reference: rank rows like row_number over (part, order). */
  private def expectTop(
      rows: Seq[(String, Option[Double], Long)],
      k: Int,
      asc: Boolean,
      lo: Int = 1): Set[(String, Option[Double], Long, Int)] =
    rows.groupBy(_._1).flatMap { case (_, g) =>
      val sorted = g.sortWith { (x, y) =>
        (x._2, y._2) match {
          case (None, None)       => x._3 < y._3
          case (None, _)          => asc  // nulls first when asc, last when desc
          case (_, None)          => !asc
          case (Some(a), Some(b)) =>
            val c = sqlCompare(a, b)
            if (c != 0) { if (asc) c < 0 else c > 0 } else x._3 < y._3
        }
      }
      sorted.zipWithIndex.collect {
        case (r, i) if i + 1 >= lo && i + 1 <= k => (r._1, r._2, r._3, i + 1)
      }
    }.toSet

  private val mixed: Seq[(String, Option[Double], Long)] = Seq(
    ("a", Some(3.0), 1L), ("a", Some(5.0), 2L), ("a", None, 3L),
    ("a", Some(5.0), 4L), ("a", Some(1.0), 5L),
    ("b", None, 6L), ("b", None, 7L), ("b", Some(2.0), 8L))

  private def ranked(asc: Boolean, cond: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val key = if (asc) col("v").asc else col("v").desc
    val w   = Window.partitionBy(col("g")).orderBy(key, col("id"))
    mixed.toDF("g", "v", "id").withColumn("rn", row_number().over(w)).filter(cond)
  }

  test("nullable DESC key: nulls place last, ties break by id — window-exact rows") {
    val df = ranked(asc = false, col("rn") <= 3)
    assert(!optimizedHasWindow(df) && optimizedHasTopK(df))
    val got = df.collect().map(r =>
      (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getInt(3))).toSet
    assert(got == expectTop(mixed, 3, asc = false), s"got $got")
  }

  test("nullable ASC key: nulls place FIRST (rank 1) — window-exact rows") {
    val df = ranked(asc = true, col("rn") <= 2)
    assert(!optimizedHasWindow(df) && optimizedHasTopK(df))
    val got = df.collect().map(r =>
      (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getInt(3))).toSet
    assert(got == expectTop(mixed, 2, asc = true), s"got $got")
  }

  test("pagination conjunct (rn between 2 and 3) re-applies above the rewrite") {
    val df = ranked(asc = false, col("rn") <= 3 && col("rn") >= 2)
    assert(!optimizedHasWindow(df) && optimizedHasTopK(df))
    val got = df.collect().map(r =>
      (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getInt(3))).toSet
    assert(got == expectTop(mixed, 3, asc = false, lo = 2), s"got $got")
  }

  /** Scala `==` on boxed doubles is numeric (NaN != NaN); compare result
    * sets on bit patterns so NaN rows can match.
    */
  private def bits(s: Set[(String, Option[Double], Long, Int)]): Set[(String, Option[Long], Long, Int)] =
    s.map { case (g, v, id, rn) => (g, v.map(java.lang.Double.doubleToLongBits), id, rn) }

  // the hostile corner of the double domain: every value whose ordering
  // differs from naive arithmetic reversal (-NaN = NaN, -0.0 ties 0.0)
  private val hostileDoubles = Array(
    Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, -0.0, 0.0,
    Double.MaxValue, Double.MinValue)

  test("randomized: rewrite matches the driver-side rank rule on 40 seeded corpora incl. NaN/Inf/-0.0") {
    import spark.implicits._
    val rng = new scala.util.Random(0xBADC0DEL)
    for (round <- 1 to 40) {
      val nGroups = 1 + rng.nextInt(4)
      val rows: Seq[(String, Option[Double], Long)] = (1 to 20 + rng.nextInt(30)).map { i =>
        val v =
          if (rng.nextInt(5) == 0) None
          else if (rng.nextInt(4) == 0) Some(hostileDoubles(rng.nextInt(hostileDoubles.length)))
          // coarse values force ties; id breaks them
          else Some(rng.nextInt(4).toDouble)
        (s"g${rng.nextInt(nGroups)}", v, i.toLong)
      }
      val asc = rng.nextBoolean()
      val k   = 1 + rng.nextInt(5)
      val key = if (asc) col("v").asc else col("v").desc
      val w   = Window.partitionBy(col("g")).orderBy(key, col("id"))
      val df = rows.toDF("g", "v", "id")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      assert(!optimizedHasWindow(df) && optimizedHasTopK(df), s"round $round: no rewrite")
      val got = df.collect().map(r =>
        (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getInt(3))).toSet
      val want = expectTop(rows, k, asc)
      assert(bits(got) == bits(want), s"round $round (asc=$asc k=$k): $got vs $want")
    }
  }

  test("ASC float key ranks NaN last (after +Inf), exactly like the window plan") {
    import spark.implicits._
    val rows: Seq[(String, Option[Double], Long)] = Seq(
      ("a", Some(Double.NaN), 1L), ("a", Some(1.0), 2L), ("a", Some(2.0), 3L),
      ("a", Some(Double.PositiveInfinity), 4L), ("a", None, 5L),
      ("b", Some(Double.NaN), 6L), ("b", Some(Double.NegativeInfinity), 7L))
    val w  = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id"))
    val df = rows.toDF("g", "v", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(!optimizedHasWindow(df) && optimizedHasTopK(df))
    val got = df.collect().map(r =>
      (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getInt(3))).toSet
    assert(bits(got) == bits(expectTop(rows, 3, asc = true)), s"got $got")
    // the defect this guards: {null, 1.0, 2.0} must win in group a — not NaN
    assert(!got.exists { case (g, v, _, _) => g == "a" && v.exists(_.isNaN) })
  }

  test("ASC integral key ranks Long.MinValue first (bitwise-NOT reversal, no wrap)") {
    import spark.implicits._
    val rows = Seq(("a", Long.MinValue, 1L), ("a", 0L, 2L), ("a", 5L, 3L),
      ("a", Long.MaxValue, 4L), ("b", Long.MinValue, 5L), ("b", -1L, 6L))
    val w  = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id"))
    val df = rows.toDF("g", "v", "id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(!optimizedHasWindow(df) && optimizedHasTopK(df))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == Set(("a", Long.MinValue, 1), ("a", 0L, 2),
      ("b", Long.MinValue, 1), ("b", -1L, 2)), s"got $got")
  }

  test("ASC string key falls through to the stock window plan") {
    import spark.implicits._
    val d = Seq(("a", "x", 1L), ("a", "y", 2L)).toDF("g", "v", "id")
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id"))
    val df = d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
    assert(optimizedHasWindow(df) && !optimizedHasTopK(df))
  }

  private def optimizedHasTopKRank(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("collect_top_k_rank")

  /** Driver-side rank() rule: ties (on the KEY only — no id tiebreak)
    * share a place, next distinct key jumps to position+1; keep rank ≤ k
    * (the boundary tie-group survives whole).
    */
  private def expectRankTop(
      rows: Seq[(String, Option[Double], Long)],
      k: Int,
      asc: Boolean): Set[(String, Option[Double], Long, Int)] = {
    def lt(x: Option[Double], y: Option[Double]): Boolean = (x, y) match {
      case (None, None)       => false
      case (None, _)          => asc
      case (_, None)          => !asc
      case (Some(a), Some(b)) =>
        val c = sqlCompare(a, b); if (asc) c < 0 else c > 0
    }
    def tie(x: Option[Double], y: Option[Double]): Boolean = !lt(x, y) && !lt(y, x)
    rows.groupBy(_._1).flatMap { case (_, g) =>
      val sorted = g.sortWith((x, y) => lt(x._2, y._2))
      val ranks  = new Array[Int](sorted.length)
      sorted.zipWithIndex.foreach { case (r, i) =>
        ranks(i) = if (i > 0 && tie(r._2, sorted(i - 1)._2)) ranks(i - 1) else i + 1
      }
      sorted.zipWithIndex.collect {
        case (r, i) if ranks(i) <= k => (r._1, r._2, r._3, ranks(i))
      }
    }.toSet
  }

  test("rank() <= k: window gone, boundary tie-group survives whole (output > k rows)") {
    import spark.implicits._
    // group a desc: 5,5,3,3,3,1 — rank()<=3 keeps 5,5 (rank 1) AND all
    // three 3s (shared rank 3): five rows, more than k
    val rows: Seq[(String, Option[Double], Long)] = Seq(
      ("a", Some(5.0), 1L), ("a", Some(5.0), 2L), ("a", Some(3.0), 3L),
      ("a", Some(3.0), 4L), ("a", Some(3.0), 5L), ("a", Some(1.0), 6L),
      ("b", None, 7L), ("b", None, 8L), ("b", Some(9.0), 9L))
    val w  = Window.partitionBy(col("g")).orderBy(col("v").desc)
    val df = rows.toDF("g", "v", "id")
      .withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(!optimizedHasWindow(df) && optimizedHasTopKRank(df), "rank rewrite missing")
    val got = df.collect().map(r =>
      (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getInt(3))).toSet
    assert(got == expectRankTop(rows, 3, asc = false), s"got $got")
    assert(got.count(_._1 == "a") == 5, "boundary ties must survive")
  }

  test("randomized rank(): ties-kept rewrite matches the driver rank rule on 40 seeded corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(0x5EEDED12L)
    for (round <- 1 to 40) {
      val nGroups = 1 + rng.nextInt(4)
      val rows: Seq[(String, Option[Double], Long)] = (1 to 20 + rng.nextInt(30)).map { i =>
        val v =
          if (rng.nextInt(5) == 0) None
          else if (rng.nextInt(4) == 0) Some(hostileDoubles(rng.nextInt(hostileDoubles.length)))
          // coarse values force heavy KEY ties — the rank-specific surface
          else Some(rng.nextInt(3).toDouble)
        (s"g${rng.nextInt(nGroups)}", v, i.toLong)
      }
      val asc = rng.nextBoolean()
      val k   = 1 + rng.nextInt(5)
      val key = if (asc) col("v").asc else col("v").desc
      val w   = Window.partitionBy(col("g")).orderBy(key)
      val df = rows.toDF("g", "v", "id")
        .withColumn("rn", rank().over(w)).filter(col("rn") <= k)
      assert(!optimizedHasWindow(df) && optimizedHasTopKRank(df), s"round $round: no rewrite")
      val got = df.collect().map(r =>
        (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getInt(3))).toSet
      val want = expectRankTop(rows, k, asc)
      assert(bits(got) == bits(want), s"round $round (asc=$asc k=$k): $got vs $want")
    }
  }

  test("rank() heap boundary fast path: prune-heavy corpus matches the driver rank rule") {
    import spark.implicits._
    // Large single-group corpora exercise the RankTopKBuffer boundary
    // reject (update() only copies rows at/above the current rank-k cut,
    // set after the first real prune): >64 rows per task forces prunes,
    // the coarse 0..9 domain forces tie-groups hundreds wide, and the
    // ascending-id value pattern makes later rows alternately beat and
    // lose to the boundary. Run at 1 and 8 partitions so both the pure
    // update() path and the merge() path carry the cut.
    val rng = new scala.util.Random(0xB0DA11L)
    val rows: Seq[(String, Option[Double], Long)] = (1 to 5000).map { i =>
      (s"g${i % 3}", Some(rng.nextInt(10).toDouble), i.toLong)
    }
    for (parts <- Seq(1, 8); asc <- Seq(true, false)) {
      val key = if (asc) col("v").asc else col("v").desc
      val w   = Window.partitionBy(col("g")).orderBy(key)
      val df = rows.toDF("g", "v", "id").repartition(parts)
        .withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
      assert(!optimizedHasWindow(df) && optimizedHasTopKRank(df), "rank rewrite missing")
      val got = df.collect().map(r =>
        (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getInt(3))).toSet
      val want = expectRankTop(rows, 2, asc)
      assert(got == want, s"parts=$parts asc=$asc: ${got.size} vs ${want.size} rows")
    }
  }

  test("q250 (registered): plans as the ties-kept heap — no Window, no corpus sort") {
    val df = SparkEntry.queries("q250_rank_topk_ties")(spark, Sf0001)
    assert(!optimizedHasWindow(df) && optimizedHasTopKRank(df), "rank rewrite missing")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$phys")
    assert(!phys.contains("WindowGroupLimit"), "window machinery still present")
    // ties-kept contract on real data: far more than k rows per group
    val got = df.collect()
    val perGroup = got.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perGroup.values.forall(_ > 2), s"expected tie-groups beyond k=2: $perGroup")
  }

  test("rank() = 1 keeps ALL tied-first rows") {
    import spark.implicits._
    val rows = Seq(("a", 7.0, 1L), ("a", 7.0, 2L), ("a", 2.0, 3L), ("b", 1.0, 4L))
    val w  = Window.partitionBy(col("g")).orderBy(col("v").desc)
    val df = rows.toDF("g", "v", "id")
      .withColumn("rn", rank().over(w)).filter(col("rn") === 1)
    assert(!optimizedHasWindow(df) && optimizedHasTopKRank(df))
    val got = df.collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 4L)), s"got $got")
  }

  test("guards: k beyond MaxK, dense_rank, and DESC NULLS FIRST keep the stock window plan") {
    import spark.implicits._
    val d = mixed.toDF("g", "v", "id")
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val big = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= graft.plans.BoundedRankRewrite.MaxK + 1)
    assert(optimizedHasWindow(big) && !optimizedHasTopK(big))
    val dr = d.withColumn("rn", dense_rank().over(w)).filter(col("rn") <= 2)
    assert(optimizedHasWindow(dr) && !optimizedHasTopK(dr))
    val nf = Window.partitionBy(col("g")).orderBy(col("v").desc_nulls_first, col("id"))
    val nfd = d.withColumn("rn", row_number().over(nf)).filter(col("rn") <= 2)
    assert(optimizedHasWindow(nfd) && !optimizedHasTopK(nfd))
  }
}
