package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.InferType

/** §2.B relational query surface.
  *
  * Each query mirrors a capability of the reference
  * (jshrake/healthkit-to-sqlite README example queries + the ETL semantics of
  * `src/core.rs`), expressed over the driver's TPC-H-ish testdata so the
  * DuckDB oracle can check it.
  *
  * Determinism rules (SURVEY §4): money/quantity sums accumulate in DECIMAL
  * and cast to DOUBLE at the end; timestamps are returned as formatted
  * strings or epoch-micro bigints; ratios are a single double division of
  * exact values; every computed column is aliased identically here and in
  * the oracle SQL.
  */
object Relational {

  /** Exact 2-dp accumulation: cast to decimal, sum, emit double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  // --- B1: groupBy + aggregate (README "total workout duration" analog) ----
  def q01(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(
          col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        ).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- B2: date-range + category filter (README December-2022 query) -------
  def q02(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .events(spark, dir)
      .filter(
        col("ts") >= lit("2024-01-10 00:00:00") &&
          col("ts") < lit("2024-01-20 00:00:00") &&
          col("event_type").isin("click", "purchase", "view")
      )
      .groupBy(col("event_type"))
      .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  val q02Sql: String =
    """SELECT event_type,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      | COUNT(*) AS n_events
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      | AND event_type IN ('click','purchase','view')
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- B3: JSON extraction (README json_extract on workoutStatistics) ------
  def q03(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k")
      )
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      .orderBy(col("event_type"))
  }

  // Oracle uses regexp extraction — same result without relying on the
  // DuckDB json extension being loadable.
  val q03Sql: String =
    """SELECT event_type,
      | CAST(SUM(CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      | COUNT(CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS BIGINT)) AS n_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- B4: broadcast dimension join ---------------------------------------
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q04Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_cust,
      | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // --- B5: value-string type inference (core.rs:171-204) -------------------
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val strings = ev.select(
      explode(
        array(
          col("value").cast("string"),
          col("user_id").cast("string"),
          date_format(col("ts"), "yyyy-MM-dd"),
          col("event_type")
        )
      ).as("s")
    )
    strings
      .groupBy(InferType.inferType(col("s")).as("ty"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("ty"))
  }

  val q05Sql: String = {
    val kase = InferType.duckdbCase("s")
    s"""SELECT $kase AS ty, COUNT(*) AS n FROM (
       | SELECT CAST(value AS VARCHAR) AS s FROM events
       | UNION ALL SELECT CAST(user_id AS VARCHAR) FROM events
       | UNION ALL SELECT strftime(ts, '%Y-%m-%d') FROM events
       | UNION ALL SELECT event_type FROM events
       |) GROUP BY 1 ORDER BY ty""".stripMargin
  }

  // --- B6: per-type pivot (Record-type → table fan-out, core.rs:311) -------
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def q06(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables
      .events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .count()
    EventTypes
      .foldLeft(pivoted) { (df, t) =>
        df.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t)
      }
      .orderBy(col("user_id"))
  }

  val q06Sql: String = {
    val conds = EventTypes
      .map(t => s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t")
      .mkString(", ")
    s"SELECT user_id, $conds FROM events GROUP BY user_id ORDER BY user_id"
  }

  // --- B7: window functions (running aggregates) ---------------------------
  def q07(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        col("event_id"),
        row_number().over(w).as("rn"),
        sum(col("value").cast("decimal(18,2)"))
          .over(wRows)
          .cast("double")
          .as("running_value")
      )
      .orderBy(col("user_id"), col("rn"))
  }

  val q07Sql: String =
    """SELECT user_id, event_id,
      | ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, rn""".stripMargin

  // --- B8: top-k per group -------------------------------------------------
  def q08(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 10)
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  val q08Sql: String =
    """SELECT o_orderpriority, o_orderkey, rk FROM (
      | SELECT o_orderpriority, o_orderkey,
      |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk
      | FROM orders)
      |WHERE rk <= 10 ORDER BY o_orderpriority, rk""".stripMargin

  // --- B24 q61: heap-based top-k per group (no sort of the corpus) ---------
  /** q08's exact semantics via a bounded-heap aggregate instead of a window
    * rank. The window plan shuffles EVERY order row and sorts each
    * partition before discarding all but k rows per group; `collect_topk`
    * keeps ≤ k rows per group inside each map task (partial
    * ObjectHashAggregate), so the exchange carries at most k·groups rows
    * per map partition and nothing ever sorts the corpus — the plan that
    * survives a 100× fact-table scale-up. The heap key
    * (price, −orderkey) makes "k largest" equal the window's rank ≤ k
    * under (price DESC, orderkey ASC); orderkey rides as a third struct
    * field (never compared — the first two are unique). The final in-row
    * `array_sort` touches ≤ k elements per group.
    */
  def q61(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Expressions.collect_topk
    val item = struct(
      col("o_totalprice").as("p"),
      (-col("o_orderkey")).as("nk"),
      col("o_orderkey").as("o_orderkey"))
    Tables
      .orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(collect_topk(item, 10).as("top"))
      .select(col("o_orderpriority"), posexplode(reverse(array_sort(col("top")))))
      .select(
        col("o_orderpriority"),
        col("col.o_orderkey").as("o_orderkey"),
        (col("pos") + 1).cast("int").as("rk"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** Identical output to q08 by design — the oracle IS the window
    * formulation, which is the point: same semantics, better plan.
    */
  val q61Sql: String = q08Sql

  // --- B25 q250: ties-kept rank() top-k through the bounded-heap rewrite ---
  /** Top-2 RANKED quantities per return flag, ties kept — the query shape
    * `rank().over(...) <= k` that [[graft.plans.BoundedRankRewrite]]'s
    * round-12 extension rewrites to the [[graft.plans.CollectTopKRank]]
    * ties-aware heap: l_quantity is a 1..50 integer domain, so the top-2
    * places per flag hold ~2·N/50 rows (1,175 at sf0.01, vs 6 for
    * row_number) — exactly the ties-kept contract, oracled end-to-end
    * with DuckDB's own `rank()`. Plan shape after the rewrite: partial
    * ObjectHashAggregate heaps (k + the boundary tie-group per group per
    * map task), one exchange on the 3-value flag key, NO corpus sort —
    * the stock window plan shuffles and fully sorts all 6 M·SF rows.
    * A spec pins that this registered query's optimized plan contains
    * `collect_top_k_rank` and no Window.
    */
  def q250(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("qty").desc)
    Tables
      .lineitem(spark, dir)
      .select(
        col("l_returnflag"),
        col("l_orderkey"),
        col("l_linenumber"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 2)
      .orderBy(col("l_returnflag"), col("rnk"), col("l_orderkey"), col("l_linenumber"))
  }

  val q250Sql: String =
    """SELECT l_returnflag, l_orderkey, l_linenumber, qty, rnk FROM (
      | SELECT l_returnflag, l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
      |  RANK() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT) DESC) AS rnk
      | FROM lineitem)
      |WHERE rnk <= 2 ORDER BY l_returnflag, rnk, l_orderkey, l_linenumber""".stripMargin

  // --- B9: anti + semi join (orders with/without lineitems) ----------------
  def q09(spark: SparkSession, dir: String): DataFrame = {
    // Both verdicts (anti + semi) from ONE pass: a left join against the
    // distinct lineitem key set, tags derived in the projection. The
    // two-legged anti/semi spelling scanned each table twice and built
    // the lineitem key set as a BROADCAST hash relation twice — a
    // fact-table broadcast that is driver-bound at bench scale (the r14
    // sf1 lane measured 4.6 s, nearly all broadcast build) and impossible
    // at 100 TB; here the distinct is map-side partial-aggregated and the
    // single equi-join shuffles on the key (AQE may still broadcast the
    // key set when it is genuinely small). Output identical: tag order is
    // normalized by the final sort.
    val o = Tables.orders(spark, dir)
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"))
      .distinct()
      .withColumn("present", lit(1))
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        when(col("present").isNull, "no_items")
          .when(col("o_orderstatus") === "F", "filled_with_items")
          .as("tag"))
      .filter(col("tag").isNotNull)
      .orderBy(col("tag"), col("o_orderkey"))
  }

  val q09Sql: String =
    """SELECT o_orderkey, tag FROM (
      | SELECT o_orderkey, 'no_items' AS tag FROM orders
      |  WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      | UNION ALL
      | SELECT o_orderkey, 'filled_with_items' AS tag FROM orders
      |  WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |   AND o_orderstatus = 'F')
      |ORDER BY tag, o_orderkey""".stripMargin

  // --- B10: sessionization (batch twin of streaming E2) --------------------
  // Gap > 30 min starts a new session; arithmetic in exact epoch micros so
  // Spark (µs) and DuckDB (ns→µs) agree bit-for-bit.
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum    = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn(
        "new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L)
      )
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q10Sql: String =
    """WITH e AS (
      | SELECT user_id, event_id, epoch_us(ts) AS us,
      |  LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      | FROM events),
      |s AS (
      | SELECT user_id, event_id, us,
      |  CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |   OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM e)
      |SELECT user_id, session_id, COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us
      |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // --- B11: tumbling time-window aggregation (batch twin of E1) ------------
  def q11(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .events(spark, dir)
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  val q11Sql: String =
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
      | COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // --- B12: fact-fact shuffle join + rollup (AQE path) ---------------------
  // Pre-aggregate lineitem to order grain first: the per-order partial
  // shrinks the join input ~4× and turns COUNT(DISTINCT orderkey) into a
  // plain COUNT(*) — avoiding the Expand operator countDistinct would
  // inject (which triples the aggregated rows at 100 TB).
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val ordRev = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(
          col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        ).as("ord_rev")
      )
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    ordRev
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("ord_rev")).cast("double").as("revenue")
      )
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
  }

  val q12Sql: String =
    """SELECT c_mktsegment, o_orderpriority,
      | COUNT(DISTINCT o_orderkey) AS n_orders,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderpriority
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin

  // --- B13: global top-n (ORDER BY + LIMIT → TakeOrderedAndProject) --------
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val q13Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // --- B14: rollup (hierarchical grouping sets) ----------------------------
  def q14(spark: SparkSession, dir: String): DataFrame =
    // pre-aggregate to the (priority, status) grain BEFORE the rollup
    // Expand: Spark's grouping-sets plan replicates every input row once
    // per grouping set, so feeding it the corpus triples the aggregated
    // volume — feeding it the ≤|prio|×|status| partial table computes the
    // identical result (long counts re-sum exactly; decimal sums are
    // associative-exact, cast to double only at the end)
    Tables
      .orders(spark, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n0"), sum(col("o_totalprice").cast("decimal(18,2)")).as("t0"))
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(sum(col("n0")).as("n"), sum(col("t0")).cast("double").as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"),
        col("total")
      )
      .orderBy(col("prio"), col("status"))

  val q14Sql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
      | COALESCE(o_orderstatus, 'ALL') AS status,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY prio, status""".stripMargin

  // --- B14b: CUBE over two dimensions (all grouping-set combinations) ------
  def q18(spark: SparkSession, dir: String): DataFrame =
    // pre-aggregate before the cube Expand — the q14 rule: the corpus
    // collapses map-side to ≤|flag|×|status| partials, and the 4-way
    // grouping-set replication runs on that tiny table with identical
    // (exact long / exact decimal) re-summed results
    Tables
      .lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n0"), sum(col("l_quantity").cast("decimal(18,2)")).as("q0"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n0")).as("n"), sum(col("q0")).cast("double").as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"),
        col("qty")
      )
      .orderBy(col("rf"), col("ls"))

  val q18Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      | COALESCE(l_linestatus, 'ALL') AS ls,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // --- B22: scalar string/date function suite ------------------------------
  // upper/substring/concat/LIKE + year/month/quarter — the everyday scalar
  // surface, typed to match DuckDB exactly (casts where return types differ).
  def q19(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .filter(col("o_orderpriority").like("%-%"))
      .select(
        upper(substring(col("o_orderpriority"), 3, 30)).as("prio_name"),
        concat(col("o_orderstatus"), lit("/"), substring(col("o_orderpriority"), 1, 1)).as("code"),
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr")
      )
      .groupBy(col("prio_name"), col("code"), col("yr"), col("qtr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prio_name"), col("code"), col("yr"), col("qtr"))

  val q19Sql: String =
    """SELECT upper(substring(o_orderpriority, 3, 30)) AS prio_name,
      | o_orderstatus || '/' || substring(o_orderpriority, 1, 1) AS code,
      | year(o_orderdate) AS yr,
      | quarter(o_orderdate) AS qtr,
      | COUNT(*) AS n
      |FROM orders
      |WHERE o_orderpriority LIKE '%-%'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY prio_name, code, yr, qtr""".stripMargin

  // --- B15: scalar-subquery filter (customers above global avg balance) ----
  // Threshold rounded to 2 dp on both sides so parallel-vs-serial double
  // summation ulp differences can't flip boundary rows.
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val thresh = c.agg(round(avg(col("c_acctbal")), 2).as("t"))
    c.crossJoin(broadcast(thresh))
      .filter(col("c_acctbal") > col("t"))
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val q15Sql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (SELECT ROUND(AVG(c_acctbal), 2) FROM customer)
      |ORDER BY c_custkey""".stripMargin

  // --- B23: sequence/funnel analytics (signup → purchase conversion) -------
  // Per user: did a purchase happen after the first signup? Classic
  // event-sequence rollup; exact integer micros keep both engines aligned.
  def q35(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val firstSignup = ev
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("signup_us"))
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    firstSignup
      .join(purchases, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("signup_us"))
      .agg(
        sum(when(col("p_us") > col("signup_us"), 1L).otherwise(0L)).as("n_purchases_after"),
        count(col("p_us")).as("n_purchases_total")
      )
      .withColumn("converted", col("n_purchases_after") > 0)
      .orderBy(col("user_id"))
  }

  val q35Sql: String =
    """WITH fs AS (
      | SELECT user_id, MIN(epoch_us(ts)) AS signup_us FROM events
      | WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (
      | SELECT user_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase')
      |SELECT fs.user_id, fs.signup_us,
      | CAST(SUM(CASE WHEN p.p_us > fs.signup_us THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases_after,
      | COUNT(p.p_us) AS n_purchases_total,
      | CAST(SUM(CASE WHEN p.p_us > fs.signup_us THEN 1 ELSE 0 END) AS BIGINT) > 0 AS converted
      |FROM fs LEFT JOIN p ON fs.user_id = p.user_id
      |GROUP BY fs.user_id, fs.signup_us
      |ORDER BY fs.user_id""".stripMargin

  // --- B16: set operations (INTERSECT / EXCEPT / UNION ALL) ----------------
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("key")).distinct()
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("key")).distinct()
    val both     = c.intersect(s).select(lit("both").as("tag"), col("key"))
    val custOnly = c.except(s).select(lit("cust_only").as("tag"), col("key"))
    both.unionAll(custOnly).orderBy(col("tag"), col("key"))
  }

  val q16Sql: String =
    """SELECT tag, key FROM (
      | SELECT 'both' AS tag, key FROM (
      |  SELECT DISTINCT c_nationkey AS key FROM customer
      |  INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      | UNION ALL
      | SELECT 'cust_only' AS tag, key FROM (
      |  SELECT DISTINCT c_nationkey AS key FROM customer
      |  EXCEPT SELECT DISTINCT s_nationkey FROM supplier))
      |ORDER BY tag, key""".stripMargin
}
