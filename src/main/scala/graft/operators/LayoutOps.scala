package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Storage-layout operators: how the table is ARRANGED on disk decides how
  * much of 100 TB a selective scan must read. Z-ordering clusters rows so
  * each output file covers a small rectangle of the (partkey, suppkey)
  * space — min/max file statistics then prune most files for predicates on
  * EITHER dimension, which a single-column sort only gives the leading
  * column.
  */
object LayoutOps {

  /** Bits per dimension in the interleaved key (16 ⇒ a 32-bit z value). */
  val ZBits = 16

  /** Output files the layout is balanced into. */
  val ZFiles = 16

  /** Spread the low 16 bits of `c` so bit i lands at position 2i — the
    * classic magic-number dilation (4 shift/mask steps, all codegen'd
    * builtins; the identical arithmetic runs in the oracle).
    */
  private def spreadBits(c: Column): Column = {
    var t = c
    t = t.bitwiseOR(shiftleft(t, 8)).bitwiseAND(lit(16711935L))   // 0x00FF00FF
    t = t.bitwiseOR(shiftleft(t, 4)).bitwiseAND(lit(252645135L))  // 0x0F0F0F0F
    t = t.bitwiseOR(shiftleft(t, 2)).bitwiseAND(lit(858993459L))  // 0x33333333
    t = t.bitwiseOR(shiftleft(t, 1)).bitwiseAND(lit(1431655765L)) // 0x55555555
    t
  }

  /** Exact integer quantization of column `v` into [0, 2^ZBits) over the
    * closed extent [lo, hi]: `((v − lo) · (2^B − 1)) div (hi − lo)`.
    * Non-negative operands, so Spark's truncating `div` equals DuckDB's
    * flooring `//` (the q80 rule). Degenerate extent (hi = lo) maps
    * everything to 0. Takes column NAMES (integer `div` only exists in
    * SQL form).
    */
  private def quantize(v: String, lo: String, hi: String): Column =
    expr(
      s"CASE WHEN $hi = $lo THEN 0L ELSE (($v - $lo) * ${(1 << ZBits) - 1}) div ($hi - $lo) END")

  /** q92: Z-order layout audit of lineitem over (l_partkey, l_suppkey).
    *
    * Pipeline: ONE extent aggregate (1 row, broadcast) → map-side exact
    * quantization + bit-interleaved z value → the sort-free global rank
    * ([[StatsOps.strictlyLess]] on the unique (z, orderkey, linenumber,
    * partkey, suppkey) tuple — range repartition + keyed windows, never a
    * single-task sort)
    * → balanced file assignment `(rank · F) div n` → per-file bounding
    * boxes with their coverage fraction of the global extent rectangle.
    *
    * At 100 TB the write path is `repartitionByRange(z)` + per-file
    * min/max stats; the rank-div emulation here is what makes file
    * membership deterministic and the oracle exact. Output is ≤ZFiles
    * rows: tight per-file boxes (coverage ≪ 1) are precisely what lets
    * min/max pruning skip files for predicates on either key — the
    * measurable benefit of the layout, reported by the operator itself.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))

    val ext = li.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))

    val keyed = li
      .crossJoin(broadcast(ext))
      .withColumn("bx", quantize("l_partkey", "pmin", "pmax"))
      .withColumn("by", quantize("l_suppkey", "smin", "smax"))
      .withColumn("z", shiftleft(spreadBits(col("bx")), 1).bitwiseOR(spreadBits(col("by"))))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("z"))

    // the synthetic lineitem does NOT key on (orderkey, linenumber) — only
    // the full 4-column tuple is unique, so rank on all of it
    val ranked = StatsOps.strictlyLess(
      keyed, Nil, Seq("z", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"), "rk",
      // the rank input is a bare scan + broadcast + bit arithmetic —
      // recomputing it for the range sampler is cheaper than persisting
      // the full fact table
      cacheInput = false)

    ranked
      .withColumn("file_id", expr(s"(rk * $ZFiles) div n_s"))
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"),
        min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"))
      .crossJoin(broadcast(ext))
      .withColumn(
        "coverage",
        round(
          ((col("p_hi") - col("p_lo") + 1L) * (col("s_hi") - col("s_lo") + 1L)).cast("double") /
            ((col("pmax") - col("pmin") + 1L) * (col("smax") - col("smin") + 1L)).cast("double"),
          6))
      .select("file_id", "n_rows", "p_lo", "p_hi", "s_lo", "s_hi", "coverage")
      .orderBy(col("file_id"))
  }

  /** q92 oracle: identical integer arithmetic — extent, quantization with
    * flooring division, the same 4-step bit dilation, row_number−1 on the
    * same unique tuple, `(rank · F) // n` file assignment, box aggregates.
    */
  lazy val zorderLayoutSql: String = {
    val m = (1 << ZBits) - 1
    // the same 4-step dilation as spreadBits, one lateral alias per step
    def spread(v: String, o: String): String =
      s"""($v | ($v << 8)) & 16711935 AS ${o}1,
         |    (${o}1 | (${o}1 << 4)) & 252645135 AS ${o}2,
         |    (${o}2 | (${o}2 << 2)) & 858993459 AS ${o}3,
         |    (${o}3 | (${o}3 << 1)) & 1431655765 AS $o""".stripMargin
    s"""WITH ext AS (
       |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
       |         min(l_suppkey) AS smin, max(l_suppkey) AS smax,
       |         count(*)::BIGINT AS n
       |  FROM lineitem),
       |q AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |    CASE WHEN pmax = pmin THEN 0 ELSE ((l_partkey - pmin) * $m) // (pmax - pmin) END AS bx,
       |    CASE WHEN smax = smin THEN 0 ELSE ((l_suppkey - smin) * $m) // (smax - smin) END AS by
       |  FROM lineitem, ext),
       |z AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |    ${spread("bx", "sx")},
       |    ${spread("by", "sy")},
       |    (sx << 1) | sy AS z
       |  FROM q),
       |r AS (
       |  SELECT *, row_number() OVER (ORDER BY z, l_orderkey, l_linenumber, l_partkey, l_suppkey) - 1 AS rk
       |  FROM z),
       |f AS (
       |  SELECT *, (rk * $ZFiles) // (SELECT n FROM ext) AS file_id FROM r)
       |SELECT file_id, count(*)::BIGINT AS n_rows,
       |  min(l_partkey) AS p_lo, max(l_partkey) AS p_hi,
       |  min(l_suppkey) AS s_lo, max(l_suppkey) AS s_hi,
       |  round(((max(l_partkey) - min(l_partkey) + 1) * (max(l_suppkey) - min(l_suppkey) + 1))::DOUBLE
       |    / (SELECT ((pmax - pmin + 1) * (smax - smin + 1))::DOUBLE FROM ext), 6) AS coverage
       |FROM f
       |GROUP BY file_id
       |ORDER BY file_id""".stripMargin
  }

  // --- q149: equi-depth range-partition planner ------------------------------

  /** Range buckets the planner splits each column's domain into. */
  val RangeBuckets = 8

  /** The boundary table a range-partitioned global sort or sorted write
    * needs BEFORE it runs: per sort column, the [[RangeBuckets]]−1
    * equi-depth split points — boundary k = the smallest value whose
    * cumulative row count reaches the ⌈k·N/B⌉ order statistic — plus the
    * exact rank each boundary lands on. This is what `RangePartitioner`
    * estimates by sampling at every shuffle; computing it EXACTLY from
    * the value histogram turns a 1000-executor sorted write from "hope
    * the sample was fair" into bounded, known partition sizes (`n_below`
    * deltas), and the published table is reusable across every query
    * that range-partitions on the same column.
    *
    * Scale shape: ONE map-side histogram aggregate per column (the q43
    * rule — the cumulative window runs on the value-domain-bounded
    * histogram, never the corpus); the 1-row total and the B−1 bucket
    * indices broadcast onto it. Determinism: ranks and targets are pure
    * integer arithmetic (`⌈k·N/B⌉ = (k·N + B−1) DIV B`), the boundary
    * pick is a closed half-open rank interval (`cum−c < target ≤ cum`),
    * and the only doubles are final exact-integer conversions.
    */
  def rangePlanner(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = RangeBuckets
    def plan(hist: DataFrame, label: String, boundary: Column): DataFrame = {
      val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ks = spark.range(1, B).select(col("id").as("k"))
      hist
        .withColumn("cum", sum(col("c")).over(w))
        .crossJoin(broadcast(hist.groupBy().agg(sum(col("c")).as("n"))))
        .crossJoin(broadcast(ks))
        .withColumn("target_rank", expr(s"(k * n + ${B - 1}) DIV $B"))
        .filter(col("cum") >= col("target_rank") && col("cum") - col("c") < col("target_rank"))
        .select(
          lit(label).as("col_name"),
          col("k"),
          col("target_rank"),
          boundary.as("boundary"),
          col("cum").as("n_below"))
    }
    val evHist = Tables
      .events(spark, dir)
      .select((col("value").cast("decimal(18,2)") * lit(100)).cast("long").as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"))
    val docHist = Tables
      .documents(spark, dir)
      .select(col("n_chars").as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"))
    plan(evHist, "events.value", col("v").cast("double") / lit(100.0))
      .unionByName(plan(docHist, "documents.n_chars", col("v").cast("double")))
      .orderBy(col("col_name"), col("k"))
  }

  /** q149 oracle: identical histograms, integer targets, and half-open
    * rank-interval boundary pick (HUGEINT sums cast back to BIGINT).
    */
  lazy val rangePlannerSql: String = {
    val B = RangeBuckets
    def chain(src: String, hist: String, bdry: String, label: String) =
      s"""${src}h AS (SELECT v, count(*)::BIGINT AS c FROM ($hist) GROUP BY v),
         |${src}w AS (
         |  SELECT v, c,
         |    CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |    CAST(sum(c) OVER () AS BIGINT) AS n
         |  FROM ${src}h),
         |${src}b AS (
         |  SELECT '$label' AS col_name, k,
         |    CAST((k * n + ${B - 1}) // $B AS BIGINT) AS target_rank,
         |    $bdry AS boundary, cum AS n_below
         |  FROM ${src}w, (SELECT unnest(generate_series(1, ${B - 1})) AS k) ks
         |  WHERE cum >= (k * n + ${B - 1}) // $B
         |    AND cum - c < (k * n + ${B - 1}) // $B)""".stripMargin
    s"""WITH ${chain(
         "ev",
         "SELECT (CAST(value AS DECIMAL(18,2)) * 100)::BIGINT AS v FROM events",
         "v::DOUBLE / 100.0",
         "events.value")},
       |${chain("doc", "SELECT n_chars AS v FROM documents", "v::DOUBLE", "documents.n_chars")}
       |SELECT * FROM evb UNION ALL SELECT * FROM docb
       |ORDER BY col_name, k""".stripMargin
  }

  /** WRITE-SIDE executor for [[rangePlanner]] — the layout family's
    * missing last mile: actually lay `documents` out range-partitioned on
    * `n_chars` by the planner's EXACT equi-depth boundaries, one parquet
    * file per bucket, and report the measured layout (rows + bytes per
    * bucket file) for assertion against the plan.
    *
    * Why not `repartitionByRange(B, col)`: that samples
    * (`RangePartitioner`) — partition sizes are only approximately
    * equi-depth and change with the sample seed, which is exactly what
    * q149 computes the histogram to avoid. Here each row's bucket is the
    * COUNT OF PLANNED BOUNDARIES STRICTLY BELOW its value (ties land
    * left, matching `n_below`'s `v ≤ boundary` cumulative), a broadcast
    * map-side projection; one hash exchange on the B-value bucket key
    * routes rows, and `partitionBy("bucket")` gives each bucket its own
    * directory/file. At 1000 executors the same plan holds: B output
    * files of KNOWN row counts, no sampling variance, boundary table
    * reusable across every write on the same column.
    *
    * The bucket rows come back from the FILESYSTEM (file bytes + parquet
    * row counts), so the spec asserts the plan→layout contract end to
    * end: bucket row counts equal the planner's `n_below` deltas, and
    * every bucket landed in exactly one file.
    */
  def rangeWriteDocs(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    import spark.implicits._
    val B = RangeBuckets
    val bounds = rangePlanner(spark, dir)
      .filter(col("col_name") === "documents.n_chars")
      .orderBy(col("k"))
      .select(col("boundary"))
      .collect()
      .map(_.getDouble(0)) // B−1 planned split points, a model-sized object
    val boundsArr = array(bounds.map(lit(_)): _*)
    val bucket =
      size(filter(boundsArr, b => b < col("n_chars").cast("double"))).as("bucket")
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"), bucket)
      .repartition(B, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
    // measured layout, read back through the Hadoop FileSystem — the
    // write path is FS-agnostic (partitionBy to any scheme), so the
    // report must be too (file://, hdfs://, s3a:// — the A12 posture;
    // java.io.File here returned null → NPE for any scheme'd outDir)
    val buckets = partitionDirs(spark, outDir, "bucket=").map { case (fs, st, name) =>
      val files = fs.listStatus(st.getPath).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val rows = spark.read.parquet(st.getPath.toString).count()
      (name.toInt, files.size, files.map(_.getLen).sum, rows)
    }
    buckets.toDF("bucket", "n_files", "bytes", "n_rows").orderBy(col("bucket"))
  }

  /** `outDir`'s child partition directories with the given prefix, listed
    * through the session Hadoop `FileSystem` (any scheme — the same
    * resolution the A12 ingest uses), with the prefix stripped.
    */
  private def partitionDirs(spark: SparkSession, outDir: String, prefix: String)
      : Seq[(org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.FileStatus, String)] = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs   = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => (fs, st, st.getPath.getName.stripPrefix(prefix)))
  }

  // --- q157: broadcast-vs-shuffle join planner -------------------------------

  /** Broadcast threshold the planner advises against (bytes) — the same
    * 64 MiB the bench session sets `autoBroadcastJoinThreshold` to.
    */
  val BroadcastBytes = 64L * 1024 * 1024

  /** The join-strategy statistics table a cost-based planner consults
    * before joining the fact table to each dimension: per dim — exact row
    * count, exact in-memory data bytes under a canonical width model
    * (8 per numeric, string lengths as stored), average row width, and
    * the verdict `broadcast` (ships to every executor once, zero
    * shuffle of the 100 TB fact side) vs `shuffle` (both sides hash-
    * exchange). Spark's own `SizeInBytesOnlyStatsPlanVisitor` GUESSES
    * this from file sizes and falls back to conservative defaults after
    * any projection; computing it exactly once per snapshot and
    * publishing it is how a campaign pins join strategies instead of
    * re-deriving them per query — and the q150 salt advisor covers the
    * keys this table routes to `shuffle`.
    *
    * Scale shape: one map-side width projection + ONE 1-row combine per
    * dimension (count/sum both partial-aggregable); dims union to a
    * 5-row table. Determinism: pure integer sums, one divide-round.
    */
  def joinPlanner(spark: SparkSession, dir: String): DataFrame = {
    def leg(tbl: String, strCols: Seq[String], numCols: Int): DataFrame = {
      val bytes = strCols
        .map(c => length(col(c)).cast("long"))
        .foldLeft(lit(8L * numCols))(_ + _)
      Tables
        .t(spark, dir, tbl)
        .select(bytes.as("b"))
        .groupBy()
        .agg(count(lit(1)).as("n_rows"), sum(col("b")).as("data_bytes"))
        .select(
          lit(tbl).as("tbl"),
          col("n_rows"),
          col("data_bytes"),
          round(col("data_bytes").cast("double") / col("n_rows").cast("double"), 2)
            .as("avg_row_bytes"),
          when(col("data_bytes") <= BroadcastBytes, "broadcast")
            .otherwise("shuffle")
            .as("strategy"))
    }
    leg("region", Seq("r_name"), 1)
      .unionByName(leg("nation", Seq("n_name"), 2))
      .unionByName(leg("supplier", Seq("s_name"), 3))
      .unionByName(leg("customer", Seq("c_name", "c_mktsegment"), 3))
      .unionByName(leg("part", Seq("p_name", "p_brand", "p_type"), 3))
      .orderBy(col("tbl"))
  }

  /** q157 oracle: identical width model, sums, and threshold verdict. */
  lazy val joinPlannerSql: String = {
    def leg(tbl: String, strCols: Seq[String], numCols: Int): String = {
      val bytes = (strCols.map(c => s"length($c)::BIGINT") :+ s"${8L * numCols}")
        .mkString(" + ")
      s"""SELECT '$tbl' AS tbl, count(*)::BIGINT AS n_rows,
         |  CAST(sum($bytes) AS BIGINT) AS data_bytes,
         |  round(CAST(sum($bytes) AS DOUBLE) / count(*)::DOUBLE, 2) AS avg_row_bytes,
         |  CASE WHEN CAST(sum($bytes) AS BIGINT) <= $BroadcastBytes
         |    THEN 'broadcast' ELSE 'shuffle' END AS strategy
         |FROM $tbl""".stripMargin
    }
    Seq(
      leg("region", Seq("r_name"), 1),
      leg("nation", Seq("n_name"), 2),
      leg("supplier", Seq("s_name"), 3),
      leg("customer", Seq("c_name", "c_mktsegment"), 3),
      leg("part", Seq("p_name", "p_brand", "p_type"), 3)
    ).map(l => s"($l)").mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY tbl")
  }

  // --- q167: output compaction / shard-size planner ---------------------------

  /** Target bytes per output shard. Production uses 256–1024 MiB (parquet
    * row-group economics); 64 KiB keeps every verdict branch exercised at
    * the test SFs. The planner math is scale-free.
    */
  val TargetShardBytes = 64L * 1024

  /** The output-layout planner for writing the corpus back out: per
    * source (the natural output partition), the exact file plan a writer
    * should use — file count at [[TargetShardBytes]], rows and bytes per
    * file — plus the small-files verdict: a source under HALF a shard
    * ('coalesce') must be packed with its siblings rather than emitted
    * as its own undersized file, the classic 100 TB writer failure mode
    * (a million 2 MB files kills the namenode and the next reader's task
    * scheduler; q92 plans WITHIN-file order, q149 plans range bounds —
    * q167 plans the file COUNT). The `_ALL` row is the cross-source
    * total: total shards if small sources are packed together, the
    * number a post-write `repartition(n)` should target.
    *
    * Scale shape: ONE map-side-combinable (source) aggregate (persisted;
    * its 1-row rollup is the only other pass), pure integer ceiling
    * arithmetic after — `(b + T − 1) div T` on non-negative operands, so
    * Spark's truncating `div` equals DuckDB's flooring `//` (the q80
    * rule). No doubles anywhere.
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val T = TargetShardBytes
    val per = graft.core.CacheScope.persist(
      Tables
        .documents(spark, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_bytes")))
    val tot = per
      .groupBy()
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_bytes")).as("n_bytes"))
      .select(lit("_ALL").as("source"), col("n_docs"), col("n_bytes"))
    def planned(df: DataFrame): DataFrame =
      df.select(
        col("source"),
        col("n_docs"),
        col("n_bytes"),
        expr(s"greatest(1L, (n_bytes + ${T - 1}) div $T)").as("n_files"),
        expr(s"(n_docs + greatest(1L, (n_bytes + ${T - 1}) div $T) - 1) div greatest(1L, (n_bytes + ${T - 1}) div $T)")
          .as("rows_per_file"),
        expr(s"(n_bytes + greatest(1L, (n_bytes + ${T - 1}) div $T) - 1) div greatest(1L, (n_bytes + ${T - 1}) div $T)")
          .as("file_bytes"),
        when(col("n_bytes") * 2 < T, lit("coalesce")).otherwise(lit("ok")).as("verdict"))
    planned(per)
      .unionByName(planned(tot))
      .orderBy(col("source"))
  }

  /** WRITE-SIDE executor for [[compactionPlan]] (the C228/rangeWriteDocs
    * pattern for the file-COUNT axis): actually lay `documents` out by the
    * planner's verdicts — each `ok` source gets its OWN directory with
    * exactly its planned `n_files` parquet files (balanced row split:
    * file k = ranks [⌊k·n/f⌋, ⌊(k+1)·n/f⌋) — every planned file nonempty,
    * sizes within ±1 row); every `coalesce` source is PACKED with its
    * siblings into one shared `_PACKED` directory of
    * `ceil(Σbytes / TargetShardBytes)` files — the planner's whole point:
    * undersized sources must not each emit their own small file.
    *
    * Routing is one map-side projection (verdicts and file counts are a
    * broadcast |sources|-bounded map literal) over a per-directory rank
    * window (keyed, spill-safe), then ONE hash exchange on the
    * (directory, file) key; `partitionBy(out_src, file_idx)` writes each
    * planned file from exactly one task. At 1000 executors the same plan
    * holds: known file counts, no sampling variance. The report comes
    * back from the FILESYSTEM (directories, file counts, parquet row
    * counts), so the spec asserts the plan→layout contract end to end.
    */
  def compactionWriteDocs(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val T = TargetShardBytes
    val plan = compactionPlan(spark, dir)
      .filter(col("source") =!= "_ALL")
      .select("source", "n_docs", "n_bytes", "n_files", "verdict")
      .collect() // |sources|-bounded — the planner table itself
    val coalesceSrcs = plan.filter(_.getString(4) == "coalesce").map(_.getString(0)).toSet
    val packedDocs   = plan.filter(r => coalesceSrcs(r.getString(0))).map(_.getLong(1)).sum
    val packedBytes  = plan.filter(r => coalesceSrcs(r.getString(0))).map(_.getLong(2)).sum
    val packedFiles  = math.max(1L, math.min(packedDocs, (packedBytes + T - 1) / T))
    // out-directory → (rows, planned files); file count never exceeds rows
    val dirPlan: Map[String, (Long, Long)] =
      plan.filterNot(r => coalesceSrcs(r.getString(0)))
        .map(r => r.getString(0) -> ((r.getLong(1), math.min(r.getLong(1), r.getLong(3)))))
        .toMap ++ (if (coalesceSrcs.nonEmpty) Map("_PACKED" -> ((packedDocs, packedFiles)))
                   else Map.empty)
    val rowsMap  = typedLit(dirPlan.map { case (k, v) => k -> v._1 })
    val filesMap = typedLit(dirPlan.map { case (k, v) => k -> v._2 })
    val w = Window.partitionBy(col("out_src")).orderBy(col("source"), col("doc_id"))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      // guard the empty-collection case with a plain passthrough rather
      // than an "" sentinel in the IN-list: the sentinel routed a
      // genuinely empty-string source to _PACKED even when its verdict
      // was ok, where the missing nf/nr map entries then yielded null
      // file_idx rows silently written to the Hive default partition
      .withColumn("out_src",
        if (coalesceSrcs.isEmpty) col("source")
        else
          when(col("source").isInCollection(coalesceSrcs.toSeq), lit("_PACKED"))
            .otherwise(col("source")))
      .withColumn("rk", row_number().over(w))
      .withColumn("nf", element_at(filesMap, col("out_src")))
      .withColumn("nr", element_at(rowsMap, col("out_src")))
      // integer div (Spark's `/` is double division; `div` stays exact)
      .withColumn("file_idx", expr("(CAST(rk - 1 AS BIGINT) * nf) div nr"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("out_src"), col("file_idx"))
      .repartition(col("out_src"), col("file_idx"))
      .write.mode("overwrite").partitionBy("out_src", "file_idx").parquet(outDir)
    // measured layout, read back through the Hadoop FileSystem (the A12
    // posture — any scheme'd outDir works, like the write side)
    val dirs = partitionDirs(spark, outDir, "out_src=").map { case (fs, st, name) =>
      val buckets = fs.listStatus(st.getPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("file_idx="))
      val parts = buckets.map(b =>
        fs.listStatus(b.getPath).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
      val rows = spark.read.parquet(st.getPath.toString).count()
      (name, dirPlan.get(name).map(_._2).getOrElse(-1L), buckets.size.toLong,
        if (parts.isEmpty) 0 else parts.max, rows)
    }
    dirs.toDF("out_src", "planned_files", "actual_files", "max_parts_per_file", "n_rows")
      .orderBy(col("out_src"))
  }

  /** Oracle: identical per-source aggregate, the same integer ceiling
    * shapes with DuckDB's flooring `//`, shared [[TargetShardBytes]].
    */
  lazy val compactionPlanSql: String = {
    val T = TargetShardBytes
    val planned =
      s"""SELECT source, n_docs, n_bytes,
         |  greatest(1, (n_bytes + ${T - 1}) // $T)::BIGINT AS n_files,
         |  ((n_docs + greatest(1, (n_bytes + ${T - 1}) // $T) - 1)
         |    // greatest(1, (n_bytes + ${T - 1}) // $T))::BIGINT AS rows_per_file,
         |  ((n_bytes + greatest(1, (n_bytes + ${T - 1}) // $T) - 1)
         |    // greatest(1, (n_bytes + ${T - 1}) // $T))::BIGINT AS file_bytes,
         |  CASE WHEN n_bytes * 2 < $T THEN 'coalesce' ELSE 'ok' END AS verdict"""
        .stripMargin
    s"""WITH q167p AS MATERIALIZED (
       |  SELECT source, count(*)::BIGINT AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_bytes
       |  FROM documents GROUP BY source),
       |q167t AS (
       |  SELECT '_ALL' AS source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |    CAST(sum(n_bytes) AS BIGINT) AS n_bytes FROM q167p)
       |SELECT * FROM ($planned FROM q167p)
       |UNION ALL SELECT * FROM ($planned FROM q167t)
       |ORDER BY source""".stripMargin
  }
}
