package graft.operators

/** DuckDB oracle SQL for [[Relational.queries]]. The driver creates one
  * view per parquet table (same names) and hash-compares the result with
  * the Spark output after sorting columns by name — so aliases, rounding
  * and output types must line up exactly with the Scala side.
  *
  * DuckDB-vs-Spark deltas handled here:
  *  - `ceil`/`floor`/`year`/`row_number`/`ntile`/`datediff` return wider
  *    types in DuckDB → explicit casts to match Spark (BIGINT/INT);
  *  - `regexp_replace` needs the 'g' flag to match Spark's replace-all;
  *  - null-safe equality is `IS [NOT] DISTINCT FROM`;
  *  - timestamps are formatted with strftime to match date_format.
  */
object RelationalOracles {
  val oracles: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,

    "point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |       round(o_totalprice, 2) AS price,
        |       strftime(o_orderdate, '%Y-%m-%d') AS odate
        |FROM orders WHERE o_orderkey = 100""".stripMargin,

    "range_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 200""".stripMargin,

    "filter_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%gear%' OR p_type LIKE 'ECON%'""".stripMargin,

    "filter_in" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin,

    "filter_between" ->
      """SELECT count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem WHERE l_quantity BETWEEN 10 AND 20""".stripMargin,

    "filter_not" ->
      """SELECT event_type, count(*) AS cnt,
        |       round(sum(value), 2) AS sum_value
        |FROM events
        |WHERE NOT (event_type = 'click' OR value < 10)
        |GROUP BY event_type""".stripMargin,

    "filter_nullsafe" ->
      """SELECT c_mktsegment, count(*) AS cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderstatus IS DISTINCT FROM 'O'
        |GROUP BY c_mktsegment""".stripMargin,

    "filter_isnull" ->
      """SELECT c_mktsegment,
        |       count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_no_order,
        |       count(CASE WHEN o_orderkey IS NOT NULL THEN 1 END) AS n_order
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "join_inner" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,

    "join_left" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders,
        |       count(*) AS n_rows
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "join_right" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders,
        |       count(*) AS n_rows
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "join_full" ->
      """SELECT coalesce(nk1, nk2) AS nationkey,
        |       coalesce(n_supp, 0) AS n_supp,
        |       coalesce(n_cust, 0) AS n_cust
        |FROM (SELECT s_nationkey AS nk1, count(*) AS n_supp
        |      FROM supplier GROUP BY 1) s
        |FULL OUTER JOIN
        |     (SELECT c_nationkey AS nk2, count(*) AS n_cust
        |      FROM customer GROUP BY 1) c
        |ON nk1 = nk2""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_totalprice > 100000)""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 100000)""".stripMargin,

    "join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",

    "join_theta" ->
      """SELECT s_nationkey AS nationkey, count(*) AS n_pairs
        |FROM supplier s JOIN customer c
        |  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
        |GROUP BY 1""".stripMargin,

    "join_multi" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= '1996-01-01'
        |GROUP BY n_name""".stripMargin,

    "join_nullsafe" ->
      """SELECT rk1 AS regionkey, count(*) AS n_pairs
        |FROM (SELECT n_nationkey AS k1, n_regionkey AS rk1 FROM nation) a
        |JOIN (SELECT n_nationkey AS k2, n_regionkey AS rk2 FROM nation) b
        |  ON rk1 IS NOT DISTINCT FROM rk2
        |GROUP BY 1""".stripMargin,

    "agg_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2)
        |         AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        |         AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "agg_having" ->
      """SELECT l_partkey, round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_partkey
        |HAVING round(sum(l_quantity), 2) > 800""".stripMargin,

    // HLL sketch gate face: exact counts + the pinned within-5σ
    // quality column (the estimates themselves are checked in-face
    // against these exact counts; see Relational.aggApproxDistinct)
    "agg_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |       count(DISTINCT l_orderkey) AS exact_orders,
        |       CAST(1 AS INT) AS within_rsd
        |FROM lineitem""".stripMargin,

    "agg_count_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_part,
        |       count(DISTINCT (l_suppkey, l_partkey)) AS n_sp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "agg_minmax" ->
      """SELECT c_mktsegment,
        |       round(min(c_acctbal), 2) AS min_bal,
        |       round(max(c_acctbal), 2) AS max_bal,
        |       round(avg(c_acctbal), 4) AS avg_bal,
        |       round(sum(c_acctbal), 2) AS sum_bal,
        |       count(*) AS cnt
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "agg_expr_group" ->
      """SELECT cast(year(o_orderdate) AS INT) AS yr, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS cnt
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |       coalesce(l_linestatus, 'ALL') AS lstatus,
        |       count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
        .stripMargin,

    "agg_minby" ->
      """SELECT c_nationkey,
        |       arg_min(c_name, c_custkey) AS first_name,
        |       arg_max(c_name, c_custkey) AS last_name,
        |       count(*) AS cnt
        |FROM customer GROUP BY c_nationkey""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |       round(var_samp(l_quantity), 4) AS var_qty,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "sort_multi" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
        |FROM lineitem WHERE l_quantity > 49
        |ORDER BY l_returnflag ASC, l_orderkey DESC, l_linenumber ASC"""
        .stripMargin,

    // SORT BY is partition-local: same row set, unspecified order (the
    // driver compare is order-independent)
    "sort_by" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM lineitem WHERE l_quantity > 49""".stripMargin,

    "topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,

    "distinct_pairs" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "union_all" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS src
        |FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src
        |FROM supplier""".stripMargin,

    "union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,

    "except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders""".stripMargin,

    "intersect" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders""".stripMargin,

    "fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        |       substring(p_name, 1, 5) AS sub,
        |       CAST(length(p_name) AS INT) AS len,
        |       concat(p_brand, '-', p_type) AS cat,
        |       regexp_replace(p_type, ' ', '_', 'g') AS rep
        |FROM part""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_orderkey % 7 AS mod7,
        |       round(abs(l_discount - 0.05), 4) AS absd,
        |       round(sqrt(l_quantity), 6) AS sqrtq,
        |       cast(ceil(l_extendedprice) AS BIGINT) AS ceilp,
        |       cast(floor(l_extendedprice) AS BIGINT) AS floorp,
        |       round(pow(l_tax + 1, 2), 6) AS powt
        |FROM lineitem WHERE l_orderkey <= 300""".stripMargin,

    "fn_bitwise" ->
      """SELECT s_suppkey,
        |       s_suppkey & 3 AS band,
        |       s_suppkey | 8 AS bor,
        |       xor(s_suppkey, 5) AS bxor
        |FROM supplier""".stripMargin,

    "fn_case" ->
      """SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |       count(*) AS cnt
        |FROM orders GROUP BY 1""".stripMargin,

    "fn_cast" ->
      """SELECT o_orderkey,
        |       cast(o_orderkey AS VARCHAR) AS okstr,
        |       cast(floor(o_totalprice) AS BIGINT) AS price_int,
        |       cast(o_orderstatus AS VARCHAR) AS st,
        |       cast('123' AS INT) AS i123
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,

    "fn_datetime" ->
      """SELECT o_orderkey,
        |       cast(year(o_orderdate) AS INT) AS yr,
        |       cast(month(o_orderdate) AS INT) AS mo,
        |       cast(day(o_orderdate) AS INT) AS dom,
        |       cast(quarter(o_orderdate) AS INT) AS qtr,
        |       strftime(o_orderdate, '%Y-%m-%d') AS ods,
        |       cast(date_diff('day', DATE '1995-01-01',
        |                      cast(o_orderdate AS DATE)) AS INT) AS dd
        |FROM orders WHERE o_orderkey <= 200""".stripMargin,

    "fn_conditional" ->
      """SELECT c_custkey,
        |       round(greatest(c_acctbal, 0.0), 2) AS g,
        |       round(least(c_acctbal, 1000.0), 2) AS l,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'B2B') AS seg
        |FROM customer""".stripMargin,

    "window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |       cast(rn AS INT) AS rn, cast(rk AS INT) AS rk,
        |       cast(drk AS INT) AS drk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER w AS rn,
        |             rank() OVER w AS rk,
        |             dense_rank() OVER w AS drk
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey
        |                   ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE rn <= 3""".stripMargin,

    "window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY o_orderdate ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |         AS running_total
        |FROM orders""".stripMargin,

    "window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |       round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |       round(lead(o_totalprice, 1) OVER w, 2) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "window_ntile" ->
      """SELECT c_custkey,
        |       cast(ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC)
        |            AS INT) AS tile
        |FROM customer""".stripMargin,

    "events_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |         AS window_start,
        |       event_type, count(*) AS cnt,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "events_sliding" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS cnt
        |FROM (SELECT date_trunc('hour', ts) AS ws, event_type FROM events
        |      UNION ALL
        |      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws,
        |             event_type FROM events)
        |GROUP BY 1, 2""".stripMargin,
  )
}
