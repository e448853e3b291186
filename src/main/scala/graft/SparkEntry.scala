package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a `queries` entry; each
  * SQL-expressible one also has a DuckDB oracle in `oracleSql` with
  * identically-aliased output columns.
  */
object SparkEntry {

  private def tables(spark: SparkSession, dir: String): Tables = Tables(spark, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingAgg(tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.7 analytics core
    "q1_pricing_agg"       -> ((s, d) => Analytics.q1PricingAgg(tables(s, d))),
    "q3_topk_join"         -> ((s, d) => Analytics.q3TopkJoin(tables(s, d))),
    "q5_star_join"         -> ((s, d) => Analytics.q5StarJoin(tables(s, d))),
    "q_window_funnel"      -> ((s, d) => Analytics.qWindowFunnel(tables(s, d))),
    "q_retention"          -> ((s, d) => Analytics.qRetention(tables(s, d))),
    "q_event_counts_daily" -> ((s, d) => Analytics.qEventCountsDaily(tables(s, d))),
    "q_user_ltv"           -> ((s, d) => Analytics.qUserLtv(tables(s, d))),
    "q_distinct_users"     -> ((s, d) => Analytics.qDistinctUsers(tables(s, d)))
  )

  /** DuckDB-runnable oracle SQL per query (same parquet tables, same column
    * aliases, same ordering).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),4) AS sum_qty,
         round(sum(l_extendedprice),4) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
         round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_extendedprice),4) AS avg_price,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_topk_join" ->
      """SELECT l_orderkey,
         round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",
    "q5_star_join" ->
      """SELECT n_name,
         round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "q_window_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type='view' GROUP BY user_id
         ), c AS (
           SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type='click' AND e.ts > v.v_ts GROUP BY e.user_id
         ), p AS (
           SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type='purchase' AND e.ts > c.c_ts GROUP BY e.user_id
         )
         SELECT (SELECT count(*) FROM v) AS n_view,
                (SELECT count(*) FROM c) AS n_click_after_view,
                (SELECT count(*) FROM p) AS n_purchase_after_click""",
    "q_retention" ->
      """WITH by_day AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
         ), cohort AS (
           SELECT user_id, min(d) AS d0 FROM by_day GROUP BY user_id
         ), retained AS (
           SELECT c.d0, count(*) AS retained_7d FROM cohort c
           JOIN by_day b ON c.user_id = b.user_id AND b.d = c.d0 + INTERVAL 7 DAY
           GROUP BY c.d0
         )
         SELECT strftime(c.d0, '%Y-%m-%d') AS cohort_day,
                count(*) AS cohort_size,
                coalesce(any_value(r.retained_7d), 0) AS retained_7d
         FROM cohort c LEFT JOIN retained r ON c.d0 = r.d0
         GROUP BY c.d0
         ORDER BY cohort_day""",
    "q_event_counts_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         count(*) AS n, round(sum(value),4) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q_user_ltv" ->
      """SELECT user_id, count(*) AS n_events,
         round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END),4) AS ltv,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
