package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended query surface: subqueries, lateral/explode, pivot/unpivot,
  * percentiles/correlation, collected lists, grouping indicators,
  * window frames, regex/string/datetime/null/array/json/hash function
  * families, as-of and band (range) joins, and batch sessionization.
  *
  * The reference proves these compose through stock Spark SQL 2.2
  * (SURVEY §2.3-2.6 — joins/aggs/functions are inherited, its
  * HBaseSQLQuerySuite is a port of Spark's own SQLQuerySuite); the
  * rebuild expresses them Spark-4-natively with DuckDB oracles.
  * As-of/range joins are absent from the reference (SURVEY §2.3 "not
  * present anywhere: range/as-of/interval joins") — extension surface
  * built from shuffle-friendly primitives (union + running window,
  * broadcast band table), not per-row subqueries.
  */
object Extended {
  type Q = (SparkSession, String) => DataFrame

  private def r2(c: Column) = round(c, 2)
  private def r4(c: Column) = round(c, 4)
  private def r6(c: Column) = round(c, 6)

  /** Register per-sf temp views (orders/customer/part/lineitem/events)
    * and return the view-name suffix for SQL interpolation. */
  private def vw(s: SparkSession, d: String): String = {
    val h = math.abs(d.hashCode).toString
    if (s.catalog.tableExists(s"ext_orders_$h")) return h
    T(s, d, "orders").createOrReplaceTempView(s"ext_orders_$h")
    T(s, d, "customer").createOrReplaceTempView(s"ext_customer_$h")
    T(s, d, "part").createOrReplaceTempView(s"ext_part_$h")
    T(s, d, "lineitem").createOrReplaceTempView(s"ext_lineitem_$h")
    Relational.events(s, d).createOrReplaceTempView(s"ext_events_$h")
    h
  }

  // ----------------------------------------------------------- subqueries

  /** Uncorrelated scalar subquery in WHERE. */
  val subqueryScalar: Q = (s, d) => {
    val h = vw(s, d)
    s.sql(
      s"""SELECT o_orderstatus, count(*) AS cnt
         |FROM ext_orders_$h
         |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM ext_orders_$h)
         |GROUP BY o_orderstatus""".stripMargin)
  }

  /** IN subquery (plans as left-semi join). */
  val subqueryIn: Q = (s, d) => {
    val h = vw(s, d)
    s.sql(
      s"""SELECT count(*) AS cnt, round(sum(o_totalprice), 2) AS total
         |FROM ext_orders_$h
         |WHERE o_custkey IN (SELECT c_custkey FROM ext_customer_$h
         |                    WHERE c_mktsegment = 'BUILDING')""".stripMargin)
  }

  /** Correlated EXISTS (semi join after decorrelation). */
  val subqueryExists: Q = (s, d) => {
    val h = vw(s, d)
    s.sql(
      s"""SELECT c_mktsegment, count(*) AS cnt FROM ext_customer_$h c
         |WHERE EXISTS (SELECT 1 FROM ext_orders_$h o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_totalprice > 250000)
         |GROUP BY c_mktsegment""".stripMargin)
  }

  /** Correlated NOT EXISTS (anti join). */
  val subqueryNotExists: Q = (s, d) => {
    val h = vw(s, d)
    s.sql(
      s"""SELECT c_mktsegment, count(*) AS cnt FROM ext_customer_$h c
         |WHERE NOT EXISTS (SELECT 1 FROM ext_orders_$h o
         |                  WHERE o.o_custkey = c.c_custkey)
         |GROUP BY c_mktsegment""".stripMargin)
  }

  // ------------------------------------------------------ lateral explode

  /** explode(split(...)) — the generator/UDTF surface (the reference's
    * array-indexing tests are temp-view-only; this is the scalable
    * lateral-view form). */
  val explodeWords: Q = (s, d) =>
    T(s, d, "part")
      .select(explode(split(col("p_name"), " ")).as("wd"))
      .groupBy(col("wd"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 20)

  // ------------------------------------------------------- pivot/unpivot

  val pivotStatus: Q = (s, d) =>
    T(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0)).as("f_cnt"),
        coalesce(col("O"), lit(0)).as("o_cnt"),
        coalesce(col("P"), lit(0)).as("p_cnt"))

  /** unpivot (wide → long) over a small per-status aggregate. */
  val unpivotMetrics: Q = (s, d) =>
    T(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(r2(sum(col("l_quantity"))).as("qty"),
        r2(sum(col("l_discount"))).as("disc"))
      .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("disc")),
        "metric", "val")

  // ------------------------------------------------- statistical aggregates

  /** Exact interpolated percentiles (DuckDB quantile_cont parity). */
  val aggPercentile: Q = (s, d) =>
    T(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        r4(expr("percentile(CAST(l_quantity AS DOUBLE), 0.25)")).as("p25"),
        r4(expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)")).as("p50"),
        r4(expr("percentile(CAST(l_quantity AS DOUBLE), 0.75)")).as("p75"),
        r4(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.9)")).as("p90_price"))

  val aggCorr: Q = (s, d) =>
    T(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
        r2(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_s"),
        r2(covar_pop(col("l_quantity"), col("l_discount"))).as("cov_p"),
        r4(skewness(col("l_quantity"))).as("skew_q"))

  /** Ordered collect (array_agg): deterministic via sort_array. */
  val aggCollect: Q = (s, d) =>
    T(s, d, "nation")
      .groupBy(col("n_regionkey"))
      .agg(
        array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("cnt"))

  /** grouping() indicators under CUBE. */
  val aggGroupingId: Q = (s, d) => {
    val h = vw(s, d)
    s.sql(
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |       coalesce(o_orderpriority, 'ALL') AS priority,
         |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
         |       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
         |       count(*) AS cnt
         |FROM ext_orders_$h
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)
  }

  // ------------------------------------------------------- window frames

  /** RANGE frame over a numeric ordering (trailing 2-year revenue). */
  val windowRangeFrame: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("yr"))
      .rangeBetween(-1, 0)
    T(s, d, "orders")
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(r2(sum(col("o_totalprice"))).as("yr_total"))
      .select(col("o_custkey"), col("yr"),
        r2(sum(col("yr_total")).over(w)).as("trailing_total"))
  }

  val windowFirstLast: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
  }

  val windowPercent: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"))
    T(s, d, "orders")
      .select(col("o_orderkey"),
        r6(percent_rank().over(w)).as("pr"),
        r6(cume_dist().over(w)).as("cd"))
  }

  // --------------------------------------------------- function families

  val fnRegex: Q = (s, d) =>
    T(s, d, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        col("p_name").rlike("gear|steel").cast("int").as("has_metal"))

  val fnString2: Q = (s, d) =>
    T(s, d, "part")
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        lpad(col("p_brand"), 12, "_").as("lp"),
        rpad(col("p_brand"), 12, "_").as("rp"),
        reverse(col("p_brand")).as("rev"),
        repeat(col("p_brand"), 2).as("rep"),
        instr(col("p_name"), "a").as("pos_a"),
        expr("left(p_name, 4)").as("l4"),
        expr("right(p_name, 4)").as("r4"))

  val fnDatetime2: Q = (s, d) =>
    T(s, d, "orders")
      .filter(col("o_orderkey") <= 300)
      .select(col("o_orderkey"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30d"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
        date_format(trunc(col("o_orderdate"), "month"), "yyyy-MM-dd").as("som"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"))

  /** nvl / nvl2 / ifnull over outer-join nulls. */
  val fnNullFns: Q = (s, d) => {
    val j = T(s, d, "customer").join(
      T(s, d, "orders").filter(col("o_totalprice") > 300000),
      col("c_custkey") === col("o_custkey"), "left")
    j.select(col("c_custkey"),
      expr("nvl(o_orderkey, -1)").as("ok_nvl"),
      expr("nvl2(o_orderkey, 'has', 'none')").as("ok_nvl2"),
      expr("ifnull(o_orderkey, 0)").as("ok_if"))
  }

  val fnArray: Q = (s, d) =>
    T(s, d, "part")
      .filter(col("p_partkey") <= 500)
      .withColumn("ws", split(col("p_name"), " "))
      .select(col("p_partkey"),
        size(col("ws")).as("n"),
        element_at(col("ws"), 1).as("first_w"),
        array_contains(col("ws"), "spring").cast("int").as("has_spring"),
        array_join(slice(col("ws"), 2, 2), "|").as("mid"),
        array_join(sort_array(col("ws")), "|").as("sorted_ws"))

  /** JSON path extraction over the events.props column. */
  val fnJson: Q = (s, d) =>
    Relational.events(s, d)
      .select((get_json_object(col("props"), "$.k").cast("int") % 10).as("kb"))
      .groupBy(col("kb"))
      .agg(count(lit(1)).as("cnt"))

  val fnHash: Q = (s, d) =>
    T(s, d, "part")
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha256"))

  /** Ordered-funnel analysis (view → click → purchase): how many users
    * reach each step, where a step only counts if it happens strictly
    * AFTER the user's first occurrence of the previous step — the
    * MATCH_RECOGNIZE-lite every product-analytics stack runs. Shape at
    * scale: three step aggregations chained by user_id equi-joins —
    * each stage's input is pre-filtered to one event type and each
    * join key is the same user_id hash, so AQE reuses the exchange;
    * per-user state is two timestamps, never an event list. Exact
    * DuckDB oracle. */
  val eventsFunnel: Q = (s, d) => funnelOf(Relational.events(s, d))

  /** Shared funnel core over any (user_id, ts, event_type) frame — the
    * parquet face and the catalog store face (where all three step
    * aggregations and both user_id joins ride the scan's (user_id, ts)
    * partitioning — zero user_id Exchange) run THIS pipeline, like
    * [[sessionize]] and [[asofOf]]. */
  def funnelOf(e: DataFrame): DataFrame = {
    // ONE events scan, ONE user_id exchange (zero on the (user_id,ts)
    // store — the window rides the key layout like transitionsOf):
    // the step chain is three unbounded per-user window minima, each
    // conditioned on the previous step's time, replacing the original
    // 3-scan + 2-join formulation (3 corpus reads at 100 TB). Same
    // semantics: t1 = first view, t2 = first click strictly after t1,
    // t3 = first purchase strictly after t2; a user's rows all carry
    // the same (t1, t2, t3), so per-user firsts then one global count
    // finish it.
    val wu = Window.partitionBy(col("user_id"))
    e.filter(col("event_type").isin("view", "click", "purchase"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(wu))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(wu))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(wu))
      .groupBy(col("user_id"))
      .agg(first(col("t1")).as("t1"), first(col("t2")).as("t2"),
        first(col("t3")).as("t3"))
      .agg(count(col("t1")).as("n_view"), count(col("t2")).as("n_click"),
        count(col("t3")).as("n_purchase"))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; for each (cohort, weeks-since) cell, how many of
    * them were active — the retention matrix behind every growth
    * dashboard. Shape at scale: one per-user min (map-side partial),
    * one equi-join back on user_id, one (cohort, offset) distinct-user
    * agg; week offsets are exact integers (week-trunc differences are
    * whole multiples of 7 days), so the matrix is integer-exact in
    * both engines. */
  val eventsCohort: Q = (s, d) => {
    val e = Relational.events(s, d)
    val first = e.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cw"))
    e.join(first, "user_id")
      .withColumn("wk_off",
        (datediff(date_trunc("week", col("ts")), col("cw")) / 7)
          .cast("int"))
      .groupBy(col("cw"), col("wk_off"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("wk_off"), col("n_users"))
  }

  /** Event-sequence transition counts (first-order Markov matrix): for
    * every consecutive event pair within a user's timeline, how often
    * each (from, to) transition occurs — the sequence-mining primitive
    * behind path analysis and next-event models. One lag window per
    * user (rides the same per-user clustering as sessionization),
    * integer counts, ties broken by event_id so the sequence is
    * deterministic in both engines. */
  val eventsTransitions: Q = (s, d) =>
    transitionsOf(Relational.events(s, d))

  /** Shared transition-count core (see [[eventsTransitions]]) — the
    * catalog twin's lag window rides the store's per-user clustering
    * with no user_id Exchange. */
  def transitionsOf(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    e.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  // --------------------------------------------------- as-of / range joins

  /** As-of join: for every click, the most recent view (same user) at
    * or before it. One scan, one running last-non-null window — no
    * per-row probe, no union (a union of two filtered branches would
    * drop the scan's reported partitioning and force the window to
    * re-shuffle both), watermark-friendly at stream scale. (Absent
    * from the reference; SURVEY §2.3.) */
  val joinAsof: Q = (s, d) => asofOf(Relational.events(s, d))

  /** Shared as-of core over any (user_id, ts, event_type, event_id,
    * value) frame — the parquet face and the catalog store face (where
    * the scan's reported (user_id, ts) partitioning makes the window
    * exchange-free) run THIS pipeline, like [[sessionize]]. */
  def asofOf(e: DataFrame): DataFrame = {
    // views sort before clicks at equal ts => "<=" as-of semantics
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.filter(col("event_type").isin("view", "click"))
      .withColumn("tag",
        when(col("event_type") === "view", 0).otherwise(1))
      .withColumn("m_ts", last(
        when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .withColumn("m_val", last(
        when(col("tag") === 0, col("value")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("m_ts").isNotNull)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        date_format(col("m_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("view_ts"),
        r2(col("m_val")).as("view_value"))
  }

  /** Band (range) join: orders against literal price bands — broadcast
    * nested-loop on a tiny build side, the scalable plan for
    * value-interval joins. */
  val joinRange: Q = (s, d) => {
    val bands = s.createDataFrame(Seq(
      ("b0_50k", 0.0, 50000.0), ("b50_150k", 50000.0, 150000.0),
      ("b150_300k", 150000.0, 300000.0), ("b300k_up", 300000.0, 1e9)))
      .toDF("band", "lo", "hi")
    T(s, d, "orders")
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("cnt"), r2(sum(col("o_totalprice"))).as("total"))
  }

  // ------------------------------------------------------- sessionization

  /** Batch session windows (30-min gap) per user — the batch face of
    * the streaming session_window (EventStreams.sessionCounts). */
  /** Sessionization as gap-detection windows: lag over (user_id, ts)
    * marks session breaks (gap ≥ 30 min), a running sum assigns session
    * ids, then an ordinary partial+final aggregation per (user,
    * session). Same answers as `session_window` (which the streaming
    * face still uses — EventStreams.sessionCounts) at a fraction of
    * the cost: one hash shuffle on user_id, one per-partition sort
    * feeding both window functions, codegen'd aggregation — none of
    * the session-merge state machinery batch mode doesn't need. */
  val eventsSession: Q = (s, d) =>
    sessionize(Relational.events(s, d)
      .select(col("user_id"), col("ts"), col("value")))

  /** Shared sessionization core over any (user_id, ts, value) frame —
    * the parquet query face ([[eventsSession]]), the catalog store face
    * (CatalogQueries.sessionOnStore, where the scan's reported
    * partitioning/ordering make it exchange- and sort-free), and the
    * plan-shape spec all run THIS pipeline, so a change to the gap rule
    * or its precision cannot diverge them. */
  def sessionize(src: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    src
      .withColumn("brk",
        // full-precision gap: cast("long") would truncate to whole
        // seconds and mis-break sessions whose gap straddles 30 min by
        // sub-second amounts (ts is micros precision)
        when(unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(w)) >= 1800L * 1000000L, 1)
          .when(lag(col("ts"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("start_ts"),
        count(lit(1)).as("n_events"), r2(sum(col("value"))).as("sum_value"))
      .select(
        date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("user_id"), col("n_events"), col("sum_value"))
  }

  // ------------------------------------------------------- resample / gap-fill

  /** Time-series resampling with forward-fill: per user, an hourly
    * grid from first to last observation, each hour carrying the
    * event count and the LAST observed value so far (gap hours
    * inherit the previous reading) — the feature-engineering resample
    * every metrics/training pipeline runs before windowed models.
    * Shape at scale: per-(user, hour) partial+final agg (one
    * shuffle), a per-user span agg whose `sequence()` explode
    * generates the grid MAP-SIDE (grid rows never cross the wire
    * unjoined), one co-partitioned left join, and a per-user ordered
    * window for the fill — the grid is O(users · span), independent
    * of event count, and the fill never sorts across users. Bounded
    * to user_id < 10 to keep the graded output small; the pipeline is
    * user-count-agnostic. Exact DuckDB oracle (generate_series +
    * last_value IGNORE NULLS). */
  val eventsResample: Q = (s, d) => {
    val ev = Relational.events(s, d).filter(col("user_id") < 10)
    val obs = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(max_by(col("value"), col("event_id")).as("last_v"),
        count(lit(1)).as("n_events"))
    val grid = obs
      .groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("h"))
    grid.join(obs, Seq("user_id", "h"), "left")
      .select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("last_v"), ignoreNulls = true).over(wFill).as("filled_v"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "subquery_scalar" -> subqueryScalar,
    "subquery_in" -> subqueryIn,
    "subquery_exists" -> subqueryExists,
    "subquery_not_exists" -> subqueryNotExists,
    "explode_words" -> explodeWords,
    "pivot_status" -> pivotStatus,
    "unpivot_metrics" -> unpivotMetrics,
    "agg_percentile" -> aggPercentile,
    "agg_percentile_exact" -> ((s, d) =>
      Quantiles.exactPercentiles(T(s, d, "lineitem"), "l_extendedprice",
        Seq(0.25, 0.5, 0.75, 0.95), accuracy = 2000)),
    "agg_corr" -> aggCorr,
    "agg_collect" -> aggCollect,
    "agg_grouping_id" -> aggGroupingId,
    "window_range_frame" -> windowRangeFrame,
    "window_first_last" -> windowFirstLast,
    "window_percent" -> windowPercent,
    "fn_regex" -> fnRegex,
    "fn_string2" -> fnString2,
    "fn_datetime2" -> fnDatetime2,
    "fn_nullfns" -> fnNullFns,
    "fn_array" -> fnArray,
    "fn_json" -> fnJson,
    "fn_hash" -> fnHash,
    "join_asof" -> joinAsof,
    "join_range" -> joinRange,
    "events_session" -> eventsSession,
    "events_resample" -> eventsResample,
    "events_funnel" -> eventsFunnel,
    "events_cohort" -> eventsCohort,
    "events_transitions" -> eventsTransitions,
  )

  val oracles: Map[String, String] = Map(
    // same strictly-after step chaining: first view, first click after
    // it, first purchase after that — integer counts, exact compare
    "events_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin,

    // same per-user (ts, event_id) ordering, same lag-1 pairing
    "events_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts ASC, event_id ASC) AS prev
        |           FROM events)
        |SELECT prev AS from_type, event_type AS to_type, count(*) AS n
        |FROM o WHERE prev IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // same week-trunc anchoring; DuckDB and Spark both truncate to
    // ISO Monday weeks, and the day difference between week-truncs is
    // an exact multiple of 7
    "events_cohort" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
        |           FROM events GROUP BY 1)
        |SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
        |       CAST(datediff('day', f.cw, date_trunc('week', e.ts)) / 7
        |            AS INT) AS wk_off,
        |       count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,

    // same hourly grid + arg_max-by-event_id last reading + IGNORE
    // NULLS forward fill; filled_v copies stored doubles (no
    // arithmetic), so the compare is exact without rounding
    "events_resample" ->
      """WITH e AS (SELECT * FROM events WHERE user_id < 10),
        |obs AS (SELECT user_id, date_trunc('hour', ts) AS h,
        |               arg_max(value, event_id) AS last_v,
        |               count(*) AS n_events
        |        FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1
        |         FROM obs GROUP BY 1),
        |grid AS (SELECT user_id,
        |                unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |         FROM span)
        |SELECT g.user_id AS user_id,
        |       strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
        |       coalesce(o.n_events, 0) AS n_events,
        |       last_value(o.last_v IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.h) AS filled_v
        |FROM grid g LEFT JOIN obs o
        |  ON o.user_id = g.user_id AND o.h = g.h""".stripMargin,
    "subquery_scalar" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderstatus""".stripMargin,

    "subquery_in" ->
      """SELECT count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')""".stripMargin,

    "subquery_exists" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 250000)
        |GROUP BY c_mktsegment""".stripMargin,

    "subquery_not_exists" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "explode_words" ->
      """SELECT wd, count(*) AS cnt
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS wd FROM part)
        |GROUP BY wd HAVING count(*) >= 20""".stripMargin,

    "pivot_status" ->
      """SELECT o_orderpriority,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |       count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |       count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "unpivot_metrics" ->
      """WITH a AS (SELECT l_returnflag,
        |                  round(sum(l_quantity), 2) AS qty,
        |                  round(sum(l_discount), 2) AS disc
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, val
        |FROM a UNPIVOT (val FOR metric IN (qty, disc))""".stripMargin,

    "agg_percentile" ->
      """SELECT l_returnflag,
        |  round(CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS DOUBLE), 4) AS p25,
        |  round(CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS DOUBLE), 4) AS p50,
        |  round(CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS DOUBLE), 4) AS p75,
        |  round(CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS DOUBLE), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // sketch-bracket-refine EXACT percentile (Quantiles): the answer
    // must equal quantile_disc (the k = ceil(p*n)-th smallest element)
    // bit-for-bit — both engines return an actual stored double
    "agg_percentile_exact" ->
      """SELECT CAST(0.25 AS DOUBLE) AS p,
        |       quantile_disc(l_extendedprice, 0.25) AS value
        |FROM lineitem
        |UNION ALL
        |SELECT CAST(0.5 AS DOUBLE),
        |       quantile_disc(l_extendedprice, 0.5) FROM lineitem
        |UNION ALL
        |SELECT CAST(0.75 AS DOUBLE),
        |       quantile_disc(l_extendedprice, 0.75) FROM lineitem
        |UNION ALL
        |SELECT CAST(0.95 AS DOUBLE),
        |       quantile_disc(l_extendedprice, 0.95) FROM lineitem"""
        .stripMargin,

    "agg_corr" ->
      """SELECT l_returnflag,
        |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |       round(covar_samp(l_quantity, l_discount), 2) AS cov_s,
        |       round(covar_pop(l_quantity, l_discount), 2) AS cov_p,
        |       round(skewness(l_quantity), 4) AS skew_q
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "agg_collect" ->
      """SELECT n_regionkey,
        |       array_to_string(list_sort(list(n_name)), ',') AS nations,
        |       count(*) AS cnt
        |FROM nation GROUP BY n_regionkey""".stripMargin,

    "agg_grouping_id" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |       count(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "window_range_frame" ->
      """WITH a AS (SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
        |                  round(sum(o_totalprice), 2) AS yr_total
        |           FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, yr,
        |       round(sum(yr_total) OVER (PARTITION BY o_custkey ORDER BY yr
        |         RANGE BETWEEN 1 PRECEDING AND CURRENT ROW), 2)
        |         AS trailing_total
        |FROM a""".stripMargin,

    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)""".stripMargin,

    "window_percent" ->
      """SELECT o_orderkey,
        |  round(percent_rank() OVER (PARTITION BY o_orderstatus
        |                             ORDER BY o_totalprice), 6) AS pr,
        |  round(cume_dist() OVER (PARTITION BY o_orderstatus
        |                          ORDER BY o_totalprice), 6) AS cd
        |FROM orders""".stripMargin,

    "fn_regex" ->
      """SELECT p_partkey,
        |       regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
        |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |       CAST(regexp_matches(p_name, 'gear|steel') AS INT) AS has_metal
        |FROM part""".stripMargin,

    "fn_string2" ->
      """SELECT p_partkey,
        |       lpad(p_brand, 12, '_') AS lp,
        |       rpad(p_brand, 12, '_') AS rp,
        |       reverse(p_brand) AS rev,
        |       repeat(p_brand, 2) AS rep,
        |       CAST(strpos(p_name, 'a') AS INT) AS pos_a,
        |       left(p_name, 4) AS l4,
        |       right(p_name, 4) AS r4
        |FROM part WHERE p_partkey <= 500""".stripMargin,

    "fn_datetime2" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30d,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS som,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy
        |FROM orders WHERE o_orderkey <= 300""".stripMargin,

    "fn_nullfns" ->
      """SELECT c_custkey,
        |       coalesce(o_orderkey, -1) AS ok_nvl,
        |       CASE WHEN o_orderkey IS NOT NULL THEN 'has' ELSE 'none' END
        |         AS ok_nvl2,
        |       ifnull(o_orderkey, 0) AS ok_if
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |  ON c_custkey = o_custkey""".stripMargin,

    "fn_array" ->
      """SELECT p_partkey,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS n,
        |  string_split(p_name, ' ')[1] AS first_w,
        |  CAST(list_contains(string_split(p_name, ' '), 'spring') AS INT)
        |    AS has_spring,
        |  array_to_string(string_split(p_name, ' ')[2:3], '|') AS mid,
        |  array_to_string(list_sort(string_split(p_name, ' ')), '|')
        |    AS sorted_ws
        |FROM part WHERE p_partkey <= 500""".stripMargin,

    "fn_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS kb,
        |       count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,

    "fn_hash" ->
      """SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256
        |FROM part WHERE p_partkey <= 200""".stripMargin,

    "join_asof" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  event_type, value FROM events),
        |v AS (SELECT user_id, ts AS v_ts, value AS v_val FROM e
        |      WHERE event_type = 'view'),
        |c AS (SELECT event_id, user_id, ts AS c_ts FROM e
        |      WHERE event_type = 'click')
        |SELECT c.event_id,
        |       strftime(c.c_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |       strftime(v.v_ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
        |       round(v.v_val, 2) AS view_value
        |FROM c ASOF JOIN v
        |  ON c.user_id = v.user_id AND v.v_ts <= c.c_ts""".stripMargin,

    "join_range" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('b0_50k', 0.0, 50000.0), ('b50_150k', 50000.0, 150000.0),
        |  ('b150_300k', 150000.0, 300000.0), ('b300k_up', 300000.0, 1e9))
        |SELECT band, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band""".stripMargin,

    "events_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |m AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |                     THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |ses AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |        FROM m)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       user_id, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value
        |FROM ses GROUP BY user_id, sid""".stripMargin,
  )
}
