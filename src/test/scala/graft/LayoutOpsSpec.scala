package graft

import org.apache.spark.sql.functions._

import graft.operators.LayoutOps

/** q92 Z-order layout: hand-checked corner geometry plus the layout
  * properties that make min/max pruning work on the test corpus.
  */
class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q92 orders the four extent corners along the z-curve with point boxes") {
    // corners of a 101×101 extent: z must sort (0,0) < (0,100) < (100,0) < (100,100)
    val rows = Seq(
      (10L, 1, 0L, 0L), (11L, 1, 0L, 100L), (12L, 1, 100L, 0L), (13L, 1, 100L, 100L)
    ).toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("q92spec").toString
    rows.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val got = LayoutOps.zorderLayout(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    // 4 rows into 16 balanced slots → files 0,4,8,12, one point box each;
    // coverage = 1/(101·101) rounded to 6dp
    val c = BigDecimal(1.0 / (101.0 * 101.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq(
      (0L, 1L, 0L, 0L, 0L, 0L, c),
      (4L, 1L, 0L, 0L, 100L, 100L, c),
      (8L, 1L, 100L, 100L, 0L, 0L, c),
      (12L, 1L, 100L, 100L, 100L, 100L, c)
    )
    assert(got == expected)
  }

  test("q92 on the test corpus: balanced files, boxes inside the extent, real skipping power") {
    val li  = graft.core.Tables.lineitem(spark, Sf001)
    val n   = li.count()
    val ext = li.agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .collect()(0)
    val out = LayoutOps.zorderLayout(spark, Sf001).collect()
    assert(out.length == LayoutOps.ZFiles)
    assert(out.map(_.getLong(1)).sum == n, "every row lands in exactly one file")
    val sizes = out.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1L, "rank-div assignment must balance within one row")
    out.foreach { r =>
      assert(r.getLong(2) >= ext.getLong(0) && r.getLong(3) <= ext.getLong(1))
      assert(r.getLong(4) >= ext.getLong(2) && r.getLong(5) <= ext.getLong(3))
    }
    // the point of the layout: the mean bounding box covers a small
    // fraction of the extent rectangle, so min/max stats prune most files
    // for a predicate on either dimension
    val meanCov = out.map(_.getDouble(6)).sum / out.length
    assert(meanCov < 0.35, s"z-order boxes should be tight, got mean coverage $meanCov")
  }

  test("q149 write executor: rangeWriteDocs lays out EXACTLY the planned buckets") {
    import org.apache.spark.sql.functions.col
    val outDir = java.nio.file.Files.createTempDirectory("graft_rangewrite").toString
    val layout = LayoutOps.rangeWriteDocs(spark, Sf001, outDir).collect()
    val nDocs  = graft.core.Tables.documents(spark, Sf001).count()
    // every bucket present, one parquet file each, all rows accounted for
    assert(layout.map(_.getInt(0)).toSeq == (0 until LayoutOps.RangeBuckets),
      s"buckets: ${layout.map(_.getInt(0)).mkString(",")}")
    layout.foreach(r => assert(r.getInt(1) == 1, s"bucket ${r.getInt(0)}: ${r.getInt(1)} files"))
    assert(layout.map(_.getLong(3)).sum == nDocs)
    // the plan→layout contract: bucket row counts equal the planner's
    // n_below deltas (cumulative rows at each boundary)
    val plan = LayoutOps.rangePlanner(spark, Sf001)
      .filter(col("col_name") === "documents.n_chars")
      .orderBy(col("k")).collect().map(_.getLong(4))
    val wantDeltas = (plan :+ nDocs).zip(0L +: plan).map { case (hi, lo) => hi - lo }
    assert(layout.map(_.getLong(3)).toSeq == wantDeltas.toSeq,
      s"layout ${layout.map(_.getLong(3)).mkString(",")} vs plan ${wantDeltas.mkString(",")}")
    // equi-depth bytes: no file more than 3x the smallest (docs are
    // near-constant width; the bound is loose on purpose)
    val bytes = layout.map(_.getLong(2))
    assert(bytes.max <= 3 * bytes.min, s"file sizes ${bytes.mkString(",")}")
  }

  test("q167 write executor: compactionWriteDocs materializes EXACTLY the planned file counts") {
    import org.apache.spark.sql.functions.col
    val outDir = java.nio.file.Files.createTempDirectory("graft_compactwrite").toString
    val layout = LayoutOps.compactionWriteDocs(spark, Sf001, outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    val plan = LayoutOps.compactionPlan(spark, Sf001)
      .filter(col("source") =!= "_ALL").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(6)))
    val coalesceSrcs = plan.filter(_._5 == "coalesce").map(_._1).toSet
    val okPlan       = plan.filterNot(p => coalesceSrcs(p._1))
    // every ok source has its own directory with EXACTLY the planned file
    // count, one parquet part per planned file
    okPlan.foreach { case (src, nDocs, _, nFiles, _) =>
      val got = layout.find(_._1 == src).getOrElse(fail(s"no output dir for $src"))
      assert(got._3 == math.min(nDocs, nFiles), s"$src: ${got._3} files, planned $nFiles")
      assert(got._2 == got._3, s"$src: planned_files column disagrees")
      assert(got._4 == 1, s"$src: a planned file split across ${got._4} parts")
      assert(got._5 == nDocs, s"$src: rows")
    }
    // coalesce sources pack together: ONE shared directory at the ceiling
    // file count — never one undersized file per source
    if (coalesceSrcs.nonEmpty) {
      val packedDocs  = plan.filter(p => coalesceSrcs(p._1)).map(_._2).sum
      val packedBytes = plan.filter(p => coalesceSrcs(p._1)).map(_._3).sum
      val T           = LayoutOps.TargetShardBytes
      val wantFiles   = math.max(1L, math.min(packedDocs, (packedBytes + T - 1) / T))
      val got = layout.find(_._1 == "_PACKED").getOrElse(fail("no _PACKED dir"))
      assert(got._3 == wantFiles, s"_PACKED: ${got._3} files, want $wantFiles")
      assert(got._5 == packedDocs, "_PACKED rows")
      assert(layout.count(l => coalesceSrcs(l._1)) == 0,
        "a coalesce source leaked its own directory")
    }
    // total rows conserved
    assert(layout.map(_._5).sum == graft.core.Tables.documents(spark, Sf001).count())
  }
}
