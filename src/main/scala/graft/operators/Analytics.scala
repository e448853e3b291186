package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Analytics core (SURVEY.md §2.7, rows 28–35).
  *
  * These are the rollup/funnel/retention workloads the reference serves out
  * of Doris after ETL; graft answers them directly on the lake. Every query
  * is a declarative DataFrame plan: aggregations get map-side partial
  * aggregation, dimension tables stay under the broadcast threshold, and all
  * scans prune columns at the parquet reader.
  */
object Analytics {

  /** TPC-H Q1-style multi-measure pricing summary. Single shuffle on the
    * two low-cardinality group keys; partial aggregation does nearly all the
    * work map-side, so this scales linearly in input at 100 TB.
    */
  def q1PricingAgg(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4)
          .as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style top-k revenue join. customer is the small side (filter on
    * segment first), so Catalyst broadcasts it; lineitem/orders shuffle once
    * on orderkey. Top-k via orderBy.limit = per-partition partial top-k.
    */
  def q3TopkJoin(t: Tables): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders.filter(col("o_orderdate") < cutoff), col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_shipdate") > cutoff), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate")
      )
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style star join: all four dims broadcast; the single big
    * shuffle joins lineitem⋈orders on orderkey.
    */
  def q5StarJoin(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders.filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.region.filter(col("r_name") === "ASIA"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Per-user funnel stage timestamps in ONE shuffle: group once on
    * user_id, keep min(view) plus the click/purchase timestamp arrays
    * (collect_list drops the nulls the `when` injects), then each later
    * stage is an array_min over a filtered array — the exact "earliest
    * qualifying event strictly after the previous stage" semantics, with
    * no self-join and no event rescan. `within` bounds each stage relative
    * to the stage-1 timestamp (None = unbounded).
    */
  private def funnelStages(t: Tables, within: Option[Long]): DataFrame = {
    val e = t.events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type").as("et"), col("ts"))
    def inWindow(x: Column): Column = within.fold(lit(true)) { w =>
      unix_timestamp(x) <= unix_timestamp(col("v_ts")) + w
    }
    e.groupBy(col("user_id"))
      .agg(
        min(when(col("et") === "view", col("ts"))).as("v_ts"),
        collect_list(when(col("et") === "click", col("ts"))).as("clicks"),
        collect_list(when(col("et") === "purchase", col("ts"))).as("purchases"))
      .withColumn("c_ts",
        array_min(filter(col("clicks"), x => x > col("v_ts") && inWindow(x))))
      .withColumn("p_ts",
        array_min(filter(col("purchases"), x => x > col("c_ts") && inWindow(x))))
  }

  /** Ordered event funnel view→click→purchase: each stage is the earliest
    * qualifying event strictly after the previous stage's timestamp.
    * One exchange total (the user_id groupBy); the final 1-row rollup is a
    * partial-aggregated count over stage timestamps.
    */
  def qWindowFunnel(t: Tables): DataFrame =
    funnelStages(t, None).agg(
      count(col("v_ts")).as("n_view"),
      count(col("c_ts")).as("n_click_after_view"),
      count(col("p_ts")).as("n_purchase_after_click"))

  /** Time-bounded funnel (windowFunnel semantics): stages must complete
    * within `windowSec` of the stage-1 event. Same single-shuffle shape.
    */
  def qFunnelWindowed(t: Tables, windowSec: Long = 7L * 86400L): DataFrame =
    funnelStages(t, Some(windowSec)).agg(
      count(col("v_ts")).as("n_view"),
      count(col("c_ts")).as("n_click_7d"),
      count(col("p_ts")).as("n_purchase_7d"))

  /** Cohort retention: users grouped by first-seen day, retained = active
    * exactly 7 days later. Two aggregations + one join, all keyed on user_id
    * then cohort day.
    */
  def qRetention(t: Tables): DataFrame = {
    val byDay = t.events.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cohort = byDay.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    val retained = cohort
      .join(byDay, cohort("user_id") === byDay("user_id") && byDay("d") === date_add(col("d0"), 7))
      .groupBy(col("d0")).agg(count(lit(1)).as("retained_7d"))
    cohort.groupBy(col("d0")).agg(count(lit(1)).as("cohort_size"))
      .join(retained, Seq("d0"), "left")
      .select(
        date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
        col("cohort_size"),
        coalesce(col("retained_7d"), lit(0L)).as("retained_7d"))
      .orderBy(col("cohort_day"))
  }

  /** Daily event rollup — the Doris event_attr day rollup re-expressed. */
  def qEventCountsDaily(t: Tables): DataFrame =
    t.events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .orderBy(col("day"), col("event_type"))

  /** Per-user lifetime aggregates. */
  def qUserLtv(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))), 4)
          .as("ltv"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen")
      )
      .orderBy(col("user_id"))

  /** Exact distinct users per event type (the HLL-sketch variant lives in
    * the bench as approx_count_distinct; exact here for the oracle).
    */
  def qDistinctUsers(t: Tables): DataFrame =
    t.events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  /** Session stats rollup (the 会话分析 board): per-day session counts,
    * mean session length in seconds and mean events per session, built on
    * the #8 sessionizer output — one extra narrow groupBy over sessions.
    * floor-rounded means for oracle stability.
    */
  def qSessionStats(t: Tables): DataFrame =
    Identity.sessionize(t)
      .withColumn("day", substring(col("start_ts"), 1, 10))
      .withColumn("dur_sec",
        unix_timestamp(col("end_ts"), "yyyy-MM-dd HH:mm:ss") -
          unix_timestamp(col("start_ts"), "yyyy-MM-dd HH:mm:ss"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_sessions"),
        (floor(avg(col("dur_sec")) * 100) / 100).as("avg_dur_sec"),
        (floor(avg(col("n_events")) * 100) / 100).as("avg_events"))
      .orderBy(col("day"))

  /** Bounce rate per day: share of sessions with a single event. Rides the
    * #8 sessionizer; one extra narrow aggregate.
    */
  def qBounceRate(t: Tables): DataFrame =
    Identity.sessionize(t)
      .withColumn("day", substring(col("start_ts"), 1, 10))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        (floor(col("n_bounce").cast("double") / col("n_sessions") * 10000) / 10000)
          .as("bounce_rate"))
      .orderBy(col("day"))

  /** Rolling 7-day active users per day (DAU/WAU board): distinct
    * (user, day) first — the shuffle runs over |users × days|, not events —
    * then a bounded self-join over the 7-day window (rolling DISTINCT can't
    * be a window-frame sum). Day span is bounded, so the join fans out ≤7×.
    */
  def qRollingActive(t: Tables): DataFrame = {
    val byDay = t.events.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val days = byDay.select(col("d").as("day")).distinct()
    days.join(byDay, col("d") <= col("day") && col("d") >= date_sub(col("day"), 6))
      .groupBy(col("day"))
      .agg(
        countDistinct(col("user_id")).as("wau"),
        count(lit(1)).as("active_user_days"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("wau"), col("active_user_days"))
      .orderBy(col("day"))
  }

  /** Path analysis (Zhuge's 路径分析 feature, served off the event_attr
    * rollups): next-event transition matrix per user ordered by time. One
    * shuffle on user_id shared by the lag window, then a tiny groupBy.
    */
  def qEventPath(t: Tables): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    t.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_event", lag(col("event_type"), 1).over(w))
      .filter(col("prev_event").isNotNull)
      .groupBy(col("prev_event"), col("event_type").as("next_event"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_event"), col("next_event"))
  }

  /** RFM user segmentation (user-group feature): recency bucketed against a
    * pinned "today" (2024-07-01, same pin discipline as the DQ window),
    * frequency and monetary from one pass.
    */
  def qUserSegment(t: Tables): DataFrame = {
    val pinnedNow = lit("2024-07-01 00:00:00").cast("timestamp")
    t.events
      .groupBy(col("user_id"))
      .agg(
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("frequency"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 4)
          .as("monetary"))
      .select(
        col("user_id"),
        datediff(pinnedNow.cast("date"), col("last_ts").cast("date")).as("recency_days"),
        col("frequency"), col("monetary"),
        when(col("frequency") >= 100 && col("monetary") >= 1000, "vip")
          .when(col("monetary") >= 100, "paying")
          .when(col("frequency") >= 10, "active")
          .otherwise("casual").as("segment"))
      .orderBy(col("user_id"))
  }

  /** HLL-sketch variant of #35: approx_count_distinct mergeable partial
    * sketches — at 100 TB this is the difference between shuffling every
    * distinct key and shuffling a few KB of sketch per group. Rows-only
    * (sketch estimates aren't oracle-portable); the spec bounds its error
    * against the exact count.
    */
  def qDistinctUsersApprox(t: Tables): DataFrame =
    t.events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))
      .orderBy(col("event_type"))

  /** q_value_quantiles — exact p50/p90/p99 of event value per type
    * (interpolated, the SQL-standard continuous quantile — bit-matching the
    * oracle's quantile_cont). Exact percentile is a per-group sort; at
    * 100 TB the production path swaps in `approx_percentile` (mergeable
    * t-digest partials, one map-side-combined pass, bounded error) — same
    * query shape, so the swap is a one-line change where exactness is not
    * contractual.
    */
  def valueQuantiles(t: Tables): DataFrame =
    t.events
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.5D, 0.9D, 0.99D))").as("qs"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        (floor(element_at(col("qs"), 1) * 10000) / 10000).as("p50"),
        (floor(element_at(col("qs"), 2) * 10000) / 10000).as("p90"),
        (floor(element_at(col("qs"), 3) * 10000) / 10000).as("p99"))
      .orderBy(col("event_type"))

  /** q_asof_join — as-of join: each purchase picks the most recent click at
    * or before it on the same user (ties resolved by the (ts, event_id)
    * total order, identical in the oracle). Spark has no native ASOF JOIN;
    * the scale-correct re-expression is NOT a range self-join (quadratic
    * per user, nested-loop under the hood) but ONE shuffle on user_id:
    * interleave both event kinds in the same sorted window and carry the
    * last-seen click forward with last(ignoreNulls) — linear scan per user,
    * single Exchange, codegen window. The same shape serves any
    * "latest state at event time" lookup (price as-of trade, config as-of
    * event) at 100 TB.
    */
  def asofJoin(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "click", col("event_id")).as("c_id"),
        when(col("event_type") === "click", col("ts")).as("c_ts"))
      .withColumn("asof_click_id", last(col("c_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_ts", last(col("c_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("asof_click_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("asof_click_ts"))).as("gap_sec"))
      .orderBy(col("event_id"))
  }
}
