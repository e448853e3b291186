package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DW user rollup tables — the reference's DUPLICATE KEY Doris tables
  * downstream of event_attr (etl-flink-pipeline/src/main/resources/sql/
  * 1.sql:396-444): t_user_join (用户加入表), t_user_active (用户活跃表),
  * t_user_duration (用户时长表). No Flink operator fills them (they are
  * warehouse-side products over b_user_event_attr), so the batch
  * re-expression derives them from the SAME admitted event set as
  * `Route.routeEventAttr` — dt in the event_attr family, zgid resolved,
  * non-empty device — keeping the rollups consistent with the fact table
  * they summarize.
  *
  * Cost shape at 100 TB: admission rides the (appkey, cuid)/(appkey, did)
  * identity axes the pipeline already shuffles on (one persisted identity
  * pass feeds the zgid axes AND the surrogate device map); each rollup then
  * adds exactly ONE exchange on its own key — a zgid window for the join
  * table, a map-side-combined groupBy for active/duration. The DUPLICATE
  * KEY model itself is append-only, so no merge pass is needed (unlike
  * `Route.sinkUniqueKeyMerge`).
  */
object Dw {

  /** The admitted event_attr corpus with the rollups' shared derived
    * columns (day id, ISO week paired with calendar year — the same
    * pairing route_event_attr's year_week uses — month id, platform code,
    * surrogate device id).
    */
  private def admitted(t: Tables): DataFrame = {
    val (idEnv, uz, dz) = Identity.zgidAxes(t)
    Envelope.attach(t.events)
      .filter(col("dt").isin("evt", "vtl", "mkt", "ss", "se", "abp"))
      .join(uz, Seq("appkey", "cuid"), "left")
      .join(dz, Seq("appkey", "did"), "left")
      .withColumn("zgid",
        when(col("cuid").isNotNull, col("u_zgid"))
          .when(col("did") =!= "", col("d_zgid")))
      .filter(col("zgid").isNotNull && col("did") =!= "")
      .join(Identity.deviceMapFrom(idEnv), Seq("appkey", "did"))
      .join(Route.platformId(t), Seq("pl"), "left")
      .withColumn("platform", coalesce(col("platform_id"), lit(0)))
      .withColumn("begin_day_id", date_format(col("ts"), "yyyyMMdd").cast("int"))
      .withColumn("yearweek",
        (year(col("ts")) * 100 + weekofyear(col("ts"))).cast("int"))
      .withColumn("yearmonth", date_format(col("ts"), "yyyyMM").cast("int"))
  }

  /** dw_user_join — t_user_join (1.sql:396-410): one row per zgid at the
    * user's FIRST admitted event (min (ts, event_id) — the same
    * first-writer rule as every identity operator): surrogate device id,
    * epoch begin_date, day/week/month ids, the deterministic $uuid of that
    * first event, platform. ONE window rank on the zgid axis.
    */
  def userJoin(t: Tables): DataFrame = {
    val w = Window.partitionBy("zgid").orderBy("ts", "event_id")
    admitted(t)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(
        col("zgid").as("zg_id"),
        col("zg_did").as("device_id"),
        unix_timestamp(col("ts")).as("begin_date"),
        col("begin_day_id"),
        md5(concat_ws(":", col("appkey"), col("event_id"), col("dt"))).as("uuid"),
        col("yearweek"), col("yearmonth"), col("platform"))
      .orderBy(col("zg_id"))
  }

  /** dw_user_active — t_user_active (1.sql:414-425): per (zgid, day,
    * platform) activity counts with the week/month rollup keys. A single
    * map-side-combined groupBy — the partial aggregation collapses each
    * task's events before the (zgid, day) exchange.
    */
  def userActive(t: Tables): DataFrame =
    admitted(t)
      .groupBy(col("zgid").as("zg_id"), col("begin_day_id"),
        col("yearweek"), col("yearmonth"), col("platform"))
      .agg(count(lit(1)).cast("int").as("times"))
      .select(col("zg_id"), col("begin_day_id"), col("times"),
        col("yearweek"), col("yearmonth"), col("platform"))
      .orderBy(col("zg_id"), col("begin_day_id"), col("platform"))

  /** dw_user_duration — t_user_duration (1.sql:429-444): per (zgid, day,
    * period) dwell time, where `period` is the hour bucket and duration
    * sums the transfer's guarded $dru (EventAttrTransfer's
    * ensureIntRange(0, 86400000) — out-of-range/unparseable counts 0, the
    * same rule route_event_attr's duration column pins). Same single
    * groupBy shape as the active table.
    */
  def userDuration(t: Tables): DataFrame = {
    val druOk = expr("try_cast(dru AS int)")
    val dur = when(druOk.isNotNull && druOk >= 0 && druOk <= 86400000,
      druOk.cast("bigint")).otherwise(lit(0L))
    admitted(t)
      .withColumn("period", date_format(col("ts"), "HH"))
      .groupBy(col("zgid").as("zg_id"), col("begin_day_id").as("day_id"),
        col("period"), col("yearweek"), col("yearmonth"), col("platform"))
      .agg(sum(dur).as("duration"), count(lit(1)).cast("int").as("times"))
      .select(col("zg_id"), col("day_id"), col("period"), col("duration"),
        col("times"), col("yearweek"), col("yearmonth"), col("platform"))
      .orderBy(col("zg_id"), col("day_id"), col("period"), col("platform"))
  }
}
