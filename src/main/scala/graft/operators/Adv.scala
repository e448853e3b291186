package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ads / attribution (SURVEY.md §2.6, rows 25-27) — batch analogs of
  * GateJob/AdvJob: click↔conversion attribution joins keyed on device,
  * per-user first/last touch, conversion dedup. All shuffles key on the
  * device/user axes the identity stage already established; the time-window
  * join is an equi-join on device plus a range predicate (at 100 TB: both
  * sides bucketed by device, AQE skew-join for hot devices).
  */
object Adv {

  private def env(t: Tables): DataFrame = Envelope.attach(t.events)

  /** Attribution lookback window (seconds): clicks up to 3 days before. */
  val lookbackSec = 3L * 86400L

  /** #25 adv_click_join — AdvLidAndUserFirstEndFlatMapFunction /
    * ToufangAdClickRow: attribute each conversion (purchase) to the LAST
    * click on the same device within the lookback window. Equi-join on
    * (appkey, did) carries the shuffle; the window predicate filters in-join;
    * row_number picks last-touch deterministically.
    */
  def clickJoin(t: Tables): DataFrame = {
    val e = env(t).filter(col("appkey") =!= "" && col("did") =!= "")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("appkey"), col("did"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    val convs = e.filter(col("event_type") === "purchase")
      .select(col("appkey"), col("did"),
        col("event_id").as("conv_id"), col("ts").as("conv_ts"))
    val joined = convs.join(clicks, Seq("appkey", "did"))
      .filter(col("click_ts") <= col("conv_ts") &&
        unix_timestamp(col("conv_ts")) - unix_timestamp(col("click_ts")) <= lookbackSec)
    val lastTouch = Window.partitionBy("conv_id")
      .orderBy(col("click_ts").desc, col("click_id").desc)
    joined.withColumn("rn", row_number().over(lastTouch)).filter(col("rn") === 1)
      .select(col("conv_id"), col("click_id"))
      .orderBy(col("conv_id"))
  }

  /** Traffic source of one event (EventAttrTransfer UTM fallback chain,
    * reused from #18): utm param else search-engine host else referrer host
    * else direct.
    */
  private def sourceCol = {
    val utmSource = nullif(parse_url(col("url"), lit("QUERY"), lit("utm_source")), lit(""))
    val host = parse_url(col("referrer"), lit("HOST"))
    when(utmSource.isNotNull, utmSource)
      .when(Enrich.engineOf(col("referrer")) =!= "unknown", host)
      .when(col("referrer") =!= "", host)
      .otherwise(Enrich.NullValue)
  }

  /** #26 adv_first_last_touch — per-user first and last traffic source
    * (AdvLidAndUserFirstEndFlatMapFunction's user first/end state). One
    * shuffle on user_id; both window ranks share it.
    */
  def firstLastTouch(t: Tables): DataFrame = {
    val e = env(t).select(col("user_id"), col("ts"), col("event_id"), sourceCol.as("source"))
    val asc  = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val desc = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn_first", row_number().over(asc))
      .withColumn("rn_last", row_number().over(desc))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("rn_first") === 1, col("source"))).as("first_source"),
        max(when(col("rn_last") === 1, col("source"))).as("last_source"),
        count(lit(1)).as("n_touch"))
      .orderBy(col("user_id"))
  }

  /** adv_multi_touch — linear multi-touch attribution: every touch (event
    * with a known traffic source) of a converting user shares conversion
    * credit equally. Touch counting and crediting ride one user_id shuffle.
    * floor-rounded so the oracle can't tie-diverge.
    */
  def multiTouch(t: Tables): DataFrame = {
    // ONE evaluation of the regex-heavy sourceCol (8 rlikes + parse_url per
    // row): the per-user touch count is a window over the same user_id
    // shuffle the conversion join needs — no second scan, no self-join.
    val touches = env(t)
      .select(col("user_id"), sourceCol.as("source"))
      .filter(col("source") =!= Enrich.NullValue)
      .withColumn("n_touch",
        count(lit(1)).over(Window.partitionBy("user_id")))
    val conversions = t.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(col("value")).as("conv_value"))
    touches
      .join(conversions, "user_id")
      .groupBy(col("source"))
      .agg(
        (floor(sum(col("conv_value") / col("n_touch")) * 10000) / 10000).as("credit"),
        count(lit(1)).as("n_touches"))
      .orderBy(col("source"))
  }

  /** #27 adv_conversion — AdvConvertEventFlatMapFunction: conversion event
    * extraction, deduped to one row per (user, conversion event, day).
    */
  def conversion(t: Tables): DataFrame =
    t.events
      .filter(col("event_type") === "purchase")
      .groupBy(
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("conv_day"))
      .agg(count(lit(1)).as("n_raw"), round(sum(col("value")), 4).as("conv_value"))
      .orderBy(col("user_id"), col("conv_day"))
}
