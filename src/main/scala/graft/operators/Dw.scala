package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
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

  /** THE shared admitted-fact frame every Dw table derives from: the full
    * event_attr transfer row (`Route.eventAttrWithMeta` — admission, zgid,
    * surrogate ids, uuid, time components) plus the rollups' derived keys,
    * all computed FROM the transfer columns so the rollups and the fact
    * table they summarize structurally cannot drift:
    *  - begin_day_id / yearmonth re-read day_id (yyyyMMdd);
    *  - yearweek collapses the year_week string (yyyy-ww ⇒ yyyyww — the
    *    same calendar-year + ISO-week pairing as year(ts)*100 + week);
    *  - platform is the transfer's coalesced platform_id.
    * ONE fact scan; each rollup then adds exactly its own key exchange.
    */
  private def factWide(t: Tables): DataFrame =
    factWideFrom(t, Identity.zgidAxes(t))

  private def factWideFrom(t: Tables,
      axes: (DataFrame, DataFrame, DataFrame)): DataFrame =
    Route.eventAttrWithMetaFrom(t, axes)
      .withColumn("begin_day_id", col("day_id").cast("int"))
      .withColumn("yearweek",
        regexp_replace(col("year_week"), "-", "").cast("int"))
      .withColumn("yearmonth", substring(col("day_id"), 1, 6).cast("int"))
      .withColumn("platform", col("platform_id"))

  /** The LIGHT admitted frame for the narrow rollups (join/active/
    * duration): the same admission and key columns as the transfer row —
    * begin_date/uuid/day keys pinned to the transfer's own definitions —
    * WITHOUT the enrichment legs (UA/geo/UTM/registry joins) those tables
    * never read. Catalyst cannot eliminate unreferenced left joins, so
    * riding the full transfer build would pay them; the wide frame is for
    * the profile composition (`userAll`), this one is for the rollups.
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
      .withColumn("begin_date", unix_timestamp(col("ts")))
      .withColumn("uuid",
        md5(concat_ws(":", col("appkey"), col("event_id"), col("dt"))))
      .withColumn("begin_day_id", date_format(col("ts"), "yyyyMMdd").cast("int"))
      .withColumn("yearweek",
        (year(col("ts")) * 100 + weekofyear(col("ts"))).cast("int"))
      .withColumn("yearmonth", date_format(col("ts"), "yyyyMM").cast("int"))
  }

  /** dw_user_join — t_user_join (1.sql:396-410): one row per zgid at the
    * user's FIRST admitted event (min (ts, event_id) — the same
    * first-writer rule as every identity operator): surrogate device id,
    * epoch begin_date, day/week/month ids, the deterministic $uuid of that
    * first event, platform. ONE map-side-combined min_by groupBy on the
    * zgid axis — at 100 TB the partial aggregates collapse each task's
    * events before the exchange, where a window rank would shuffle and
    * sort the whole admitted corpus.
    */
  def userJoin(t: Tables): DataFrame =
    joinRowsOf(admitted(t)).orderBy(col("zg_id"))

  /** The unordered t_user_join rows — ONE definition of the rollup over
    * either admission frame (the light one for the standalone table, the
    * shared wide one inside `userAll`): every projected field is the
    * frame's own column at the user's first admitted event (min over the
    * full-precision (ts, event_id) key).
    */
  private def joinRowsOf(wide: DataFrame): DataFrame = {
    val ord = struct(col("ts"), col("event_id"))
    def first(c: org.apache.spark.sql.Column) = min_by(c, ord)
    wide
      .groupBy(col("zgid").as("zg_id"))
      .agg(
        first(col("zg_did")).as("device_id"),
        first(col("begin_date")).as("begin_date"),
        first(col("begin_day_id")).as("begin_day_id"),
        first(col("uuid")).as("uuid"),
        first(col("yearweek")).as("yearweek"),
        first(col("yearmonth")).as("yearmonth"),
        first(col("platform")).as("platform"))
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

  /** dw_user_detail — t_user_detail (1.sql:467-506) / the per-user half of
    * f_user_all (1.sql:588-637): the product's user-profile table. One row
    * per zgid rolling the event_attr fact rows up into first-touch fields
    * (version/channel/website/utm block/referrer — the value AT the user's
    * first event, ties broken by event_id like every identity operator),
    * current (last-touch) fields (app version/channel, geo triple, carrier
    * mccmnc, browser/os with major version as INT per the DDL's column
    * types), visit/duration totals, the registration flag, and the current
    * device's screen + brand/model block resolved through the b_device
    * merge row of the LAST event's device.
    *
    * visit_times counts distinct sessions (zg_sid ≠ -1) — the "visits" a
    * Zhuge profile reports; duration sums the transfer-guarded $dru.
    *
    * Cost shape at 100 TB: ONE groupBy on zgid where every first/last
    * field is a map-side-combined min_by/max_by over the (begin_date,
    * event_id) order key — no window, no second event-axis pass — then a
    * zgid-grain ⋈ device-grain join (both sides post-aggregation small
    * relative to the fact table). The fact scan itself is the shared
    * routeEventAttr build.
    */
  def userDetail(t: Tables): DataFrame =
    detailRows(t).orderBy(col("zg_id"))

  /** The attr1-5 reserved-slot sentinels (one definition — detail, sum and
    * f_user_all all project the SAME columns).
    */
  private def attrCols: Seq[org.apache.spark.sql.Column] = {
    val n = lit("\\N")
    (1 to 5).map(i => n.as(s"attr$i"))
  }

  /** The per-zgid detail AGGREGATE (everything except the current-device
    * block) — `userDetailSum` reads this directly so the sums table never
    * pays the device join it doesn't project.
    */
  private[graft] def detailAgg(t: Tables): DataFrame =
    detailAggOf(eaUnsorted(t))

  /** The event_attr row WITHOUT routeEventAttr's presentation orderBy:
    * EliminateSorts cannot prove the min_by/max_by aggregates above these
    * consumers order-irrelevant, so riding the sorted frame would pay a
    * full-corpus range exchange + sort that feeds straight into a groupBy.
    */
  private def eaUnsorted(t: Tables): DataFrame =
    Route.eventAttrWithMeta(t).drop("ts")

  /** The per-zgid detail aggregate expressions — one list, used by the
    * standalone detail aggregate AND fused with the join-leg aggregates in
    * `userAll` (one groupBy computes both tables' fields).
    */
  private def detailAggExprs: Seq[org.apache.spark.sql.Column] = {
    val ord = struct(col("begin_date"), col("event_id"))
    Seq(
      max_by(col("platform_id"), ord).as("platform"),
      min(col("begin_date")).as("first_visit_time"),
      max(col("begin_date")).as("last_visit_time"),
      count_distinct(when(col("zg_sid") =!= -1L, col("zg_sid")))
        .cast("int").as("visit_times"),
      sum(expr("try_cast(duration AS bigint)")).as("duration"),
      min_by(col("app_version"), ord).as("first_version"),
      min_by(col("channel"), ord).as("first_channel"),
      max_by(col("app_version"), ord).as("current_app_version"),
      max_by(col("channel"), ord).as("current_app_channel"),
      min_by(col("website"), ord).as("first_website"),
      min_by(col("utm_source"), ord).as("utm_source"),
      min_by(col("utm_medium"), ord).as("utm_medium"),
      min_by(col("utm_campaign"), ord).as("utm_campaign"),
      min_by(col("utm_content"), ord).as("utm_content"),
      min_by(col("utm_term"), ord).as("utm_term"),
      min_by(col("referrer_url"), ord).as("first_referrer_url"),
      max_by(col("country"), ord).as("current_country"),
      max_by(col("area"), ord).as("current_area"),
      max_by(col("city"), ord).as("current_city"),
      max_by(col("mccmnc"), ord).as("cur_mccmnc_s"),
      max_by(col("bs"), ord).as("current_bs"),
      max_by(col("bv"), ord).as("cur_bv_s"),
      max_by(col("os"), ord).as("current_os"),
      max_by(col("ov"), ord).as("cur_ov_s"),
      max_by(col("zg_did"), ord).as("cur_did"),
      max(when(col("zg_uid") =!= "\\N", 1).otherwise(0)).as("is_registered"))
  }

  private def detailAggOf(ea: DataFrame): DataFrame = {
    val exprs = detailAggExprs
    ea.groupBy(col("zgid").as("zg_id")).agg(exprs.head, exprs.tail: _*)
      // zg_did is a PER-APP surrogate (dense_rank partitioned by appkey),
      // so the device join must be app-qualified; the zgid string embeds
      // its appkey as the third ':'-segment (z:d:<appkey>:<did>)
      .withColumn("appkey", element_at(split(col("zg_id"), ":"), 3))
  }

  /** The unordered t_user_detail rows — the detail aggregate plus the
    * current-device block; shared by `userDetail` and `userAll`.
    */
  private def detailRows(t: Tables): DataFrame = {
    // ONE zgidAxes call feeds the fact build AND the device-current leg:
    // uz is an eager planCheckpoint (r14), so two calls would materialize
    // it twice (the persisted-cache equal-plan collapse no longer applies)
    val axes = Identity.zgidAxes(t)
    detailFinish(t, detailAggOf(
      Route.eventAttrWithMetaFrom(t, axes).drop("ts")), axes._1)
  }

  /** Attach the current-device block and project the detail row — takes
    * any frame with `detailAgg`'s columns, so the incremental fold
    * finishes through the SAME tail as the full rescan. `extra` columns
    * (the fused join-leg fields in `userAll`) ride through the projection.
    */
  private def detailFinish(t: Tables, agg: DataFrame, idEnv: DataFrame,
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val n = lit("\\N")
    // the current device's b_device merge row (UNIQUE KEY(device_id):
    // latest write wins = max event_id, the arrival order Doris sees) —
    // built inline rather than over routeDeviceRow because that row (like
    // the per-app b_device_{appId} table it mirrors) does not carry the
    // app axis this cross-app join needs. idEnv arrives from the CALLER's
    // zgidAxes call — the same one that fed the aggregate's fact build.
    // latest-write-wins via a map-side-combined max_by groupBy instead of
    // a row_number window (guide §2.3 "aggregate before you shuffle"): the
    // groupBy partially aggregates on the scan side, so the (appkey, did)
    // exchange carries one row per device instead of every pl event, and
    // the Sort the window needed is gone. It also runs BEFORE the device
    // map / platform joins, which now see device-grain rows. Row-identical
    // to the old window: event_id is unique (max_by picks the same row as
    // rn=1 over event_id desc), zg_did is 1:1 with (appkey, did) (the
    // dense surrogate), and the inner device-map join drops the same
    // unmapped devices whether it runs before or after the latest-row cut.
    val latest = Envelope.attach(t.events)
      .filter(col("dt") === "pl" && col("did") =!= "" && col("appkey") =!= "")
      .groupBy(col("appkey"), col("did"))
      .agg(max_by(struct(col("rs"), col("pl"), col("dev_brand"),
        col("dev_model")), col("event_id")).as("cur"))
    val dcur = latest
      .join(Identity.deviceMapFrom(idEnv)
        .select(col("appkey"), col("did"), col("zg_did")), Seq("appkey", "did"))
      .withColumn("pl", col("cur.pl"))
      .join(Route.platformId(t), Seq("pl"), "left")
      .withColumn("rs", col("cur.rs"))
      .withColumn("dev_brand", col("cur.dev_brand"))
      .withColumn("dev_model", col("cur.dev_model"))
      .withColumn("rs_runs", expr("filter(split(rs, '[^0-9]'), x -> x <> '')"))
      .select(col("appkey"), col("zg_did").as("cur_did"),
        when(size(col("rs_runs")) >= 2,
          expr("try_cast(element_at(rs_runs, 1) AS int)")).as("current_l"),
        when(size(col("rs_runs")) >= 2,
          expr("try_cast(element_at(rs_runs, 2) AS int)")).as("current_h"),
        when(coalesce(col("platform_id"), lit(0)) === 2, lit("Apple"))
          .otherwise(when(col("dev_brand").isNull || col("dev_brand") === "", n)
            .otherwise(col("dev_brand"))).as("dev_cur_brand"),
        when(col("dev_model").isNull || col("dev_model") === "", n)
          .otherwise(col("dev_model")).as("dev_cur_model"))

    agg.join(dcur, Seq("appkey", "cur_did"), "left")
      .select(Seq(
        col("zg_id"), col("platform"), col("first_visit_time"),
        col("last_visit_time"), col("visit_times"), col("duration"),
        col("first_version"), col("first_channel"),
        col("current_app_version"), col("current_app_channel"),
        col("first_website"), col("utm_source"), col("utm_medium"),
        col("utm_campaign"), col("utm_content"), col("utm_term"),
        col("first_referrer_url"), col("current_country"),
        col("current_area"), col("current_city"),
        expr("try_cast(cur_mccmnc_s AS int)").as("current_mccmnc"),
        col("current_bs"),
        expr("try_cast(cur_bv_s AS int)").as("current_bv"),
        col("current_os"),
        expr("try_cast(element_at(split(cur_ov_s, '\\\\.'), 1) AS int)")
          .as("current_ov"),
        col("current_l"), col("current_h"),
        coalesce(col("dev_cur_brand"), n).as("current_device_brand"),
        coalesce(col("dev_cur_model"), n).as("current_device_model"),
        col("is_registered")) ++ attrCols ++ extra: _*)
  }

  /** dw_user_anonymous — the b_user_anonymous view (1.sql:645-654):
    * per-zgid real-name rollup over the b_user rows — MAX(user_id) and the
    * 匿名/实名 flag. One map-side-combined groupBy on the user table, which
    * is already zgid-keyed — at scale this is the cheapest query in the
    * warehouse (the view Doris computes on read, materialized).
    */
  def userAnonymous(t: Tables): DataFrame =
    Route.userRowUnsorted(t)
      .groupBy(col("zgid").as("zg_id"))
      .agg(max(expr("try_cast(user_id AS bigint)")).as("user_id"))
      .withColumn("is_anonymous",
        when(col("user_id").isNull, "匿名").otherwise("实名"))
      .orderBy(col("zg_id"))

  /** dw_user_detail_sum — t_user_detail_sum / f_user_detail_sum
    * (1.sql:448-466, 530-546): the sums-only projection of the detail
    * table the reference materializes separately (the ad-audience
    * evaluator reads visit_times/duration from THIS table,
    * OperatorUtil.java:31-43). Same single zgid groupBy underneath — the
    * narrow projection exists so the hot audience lookups never touch the
    * wide profile row.
    */
  def userDetailSum(t: Tables): DataFrame =
    detailAgg(t)
      .select(Seq(col("zg_id"), col("platform"), col("visit_times"),
        col("duration")) ++ attrCols: _*)
      .orderBy(col("zg_id"))

  /** China MCC-MNC -> carrier display name (public ITU/MIIT allocations).
    * The reference's f_user_all carries `current_mccmnc_name` but fills it
    * through an external dim service that is not in the repo — the
    * well-known 460-XX allocation is the public stand-in; 6-digit codes
    * and non-China MCCs resolve to the \\N sentinel.
    */
  val carrierDim: Seq[(Int, String)] = Seq(
    0 -> "中国移动", 2 -> "中国移动", 4 -> "中国移动", 7 -> "中国移动",
    8 -> "中国移动",
    1 -> "中国联通", 6 -> "中国联通", 9 -> "中国联通",
    3 -> "中国电信", 5 -> "中国电信", 11 -> "中国电信")

  private def carrierName(mccmnc: org.apache.spark.sql.Column) = {
    val mnc = mccmnc - 46000
    val cases = carrierDim.foldRight(lit("\\N")) { case ((code, name), other) =>
      when(mnc === code, name).otherwise(other)
    }
    when(mccmnc.isNotNull && mccmnc >= 46000 && mccmnc < 46100, cases)
      .otherwise(lit("\\N"))
  }

  /** dw_user_all — f_user_all (1.sql:590-637): the full user summary the
    * product reads for profiles — the detail row ⋈ the first-visit (join)
    * row, the BIGINT visit/duration totals, and the three display-name
    * columns (carrier from the public MCC-MNC dim above; platform name =
    * the sdk dim's key label; the reference's device-model display dim is
    * an external service, so the model string stands for itself — the
    * same documented boundary as the carrier dim).
    *
    * Cost shape: the fact corpus is scanned and aggregated ONCE — the
    * detail fields and the first-visit (join-table) fields are computed in
    * the SAME zgid groupBy (the join leg's min_by aggregates fused beside
    * the detail ones), so there is no second rollup, no post-rollup join
    * and no cache: one fact pass, one exchange, plus the device-current
    * block and broadcast-free literal CASE dims.
    */
  def userAll(t: Tables): DataFrame = {
    val ordJ = struct(col("ts"), col("event_id"))
    def firstJ(c: org.apache.spark.sql.Column) = min_by(c, ordJ)
    // the t_user_join fields at the user's first admitted event, fused
    // into the detail groupBy (platform collides with the detail
    // aggregate's name — the composition reads the JOIN leg's value, so
    // the detail one is dropped in the final projection)
    val joinExprs = Seq(
      firstJ(col("zg_did")).as("device_id"),
      firstJ(col("begin_date")).as("begin_date"),
      firstJ(col("begin_day_id")).as("begin_day_id"),
      firstJ(col("uuid")).as("uuid"),
      firstJ(col("yearweek")).as("yearweek"),
      firstJ(col("yearmonth")).as("yearmonth"),
      firstJ(col("platform")).as("platform_j"))
    val exprs = detailAggExprs ++ joinExprs
    // one zgidAxes call per face (the detailRows discipline — uz is an
    // eager checkpoint, so a second call would materialize it twice)
    val axes = Identity.zgidAxes(t)
    val fused = factWideFrom(t, axes)
      .groupBy(col("zgid").as("zg_id")).agg(exprs.head, exprs.tail: _*)
      .withColumn("appkey", element_at(split(col("zg_id"), ":"), 3))
    val joinOut = Seq(
      col("device_id"), col("begin_date"), col("begin_day_id"),
      col("uuid"), col("yearweek"), col("yearmonth"), col("platform_j"))
    val detail = detailFinish(t, fused, axes._1, joinOut).drop("platform")
    // the detail-side platform was dropped above, so after the rename
    // col("platform") resolves to the join leg's value — the one the
    // composition and the display-name dim read
    val platformName = Route.platformDim.foldRight(lit("\\N")) {
      case ((name, code), other) =>
        when(col("platform") === code, name).otherwise(other)
    }
    detail
      .withColumnRenamed("platform_j", "platform")
      .select(
        col("zg_id"), col("first_visit_time"), col("last_visit_time"),
        col("first_version"), col("first_channel"),
        col("current_app_version"), col("current_app_channel"),
        col("first_website"), col("utm_source"), col("utm_medium"),
        col("utm_campaign"), col("utm_content"), col("utm_term"),
        col("first_referrer_url"), col("current_country"),
        col("current_area"), col("current_city"), col("current_mccmnc"),
        col("current_bs"), col("current_bv"), col("current_os"),
        col("current_ov"), col("current_l"), col("current_h"),
        col("current_device_brand"), col("current_device_model"),
        col("is_registered"),
        col("device_id"), col("begin_date"), col("begin_day_id"),
        col("uuid"), col("yearweek"), col("yearmonth"), col("platform"),
        col("visit_times").cast("bigint").as("visit_times"),
        col("duration"),
        carrierName(col("current_mccmnc")).as("current_mccmnc_name"),
        col("current_device_model").as("current_device_model_name"),
        platformName.as("platform_name"),
        col("attr1"), col("attr2"), col("attr3"), col("attr4"),
        col("attr5"))
      .orderBy(col("zg_id"))
  }

  // ---- incremental detail maintenance (the production update path) ----

  /** Day boundaries splitting the corpus into three increments — stand-ins
    * for "history so far" + two daily loads.
    */
  val incBoundaries: (String, String) = ("20240111", "20240121")

  /** The row's increment index (0/1/2) by its day column — the same three
    * load slices the folds consume, tagged in ONE pass of the fact frame.
    * Filtering the frame three times would rebuild the whole fact pass per
    * slice (measured 1.6-2× the whole query); the tag makes the slice a
    * grouping key instead, so the per-increment partials come out of a
    * single scan while staying EXACTLY the rows a per-load aggregation
    * would produce (in production each increment is its own physical
    * partition and only the newest one is ever aggregated — the fold
    * merges it into the stored state).
    */
  private def incSliceIdx(dayCol: String,
      toKey: String => Any): org.apache.spark.sql.Column = {
    val (d1, d2) = incBoundaries
    when(col(dayCol) < lit(toKey(d1)), 0)
      .when(col(dayCol) < lit(toKey(d2)), 1).otherwise(2)
  }

  /** dw_user_active_inc — the incremental maintenance path of
    * t_user_active: counts are trivially mergeable partials, so each load
    * aggregates its own slice and the fold re-sums on the table key. On a
    * day-grain key the increments never collide (a day lives in exactly
    * one load) — which is the production point: the table appends, and the
    * same fold would merge a late-arriving partial for an existing day
    * losslessly. Oracle = the SAME SQL as dw_user_active, so the hash
    * match proves fold == full rescan.
    */
  def userActiveInc(t: Tables): DataFrame = {
    val keys = Seq("zg_id", "begin_day_id", "yearweek", "yearmonth", "platform")
    val parts = admitted(t)
      .withColumn("inc_slice", incSliceIdx("begin_day_id", _.toInt))
      .groupBy(col("zgid").as("zg_id"), col("begin_day_id"),
        col("yearweek"), col("yearmonth"), col("platform"), col("inc_slice"))
      .agg(count(lit(1)).as("times_p"))
    parts
      .groupBy(keys.map(col): _*)
      .agg(sum(col("times_p")).cast("int").as("times"))
      .select(col("zg_id"), col("begin_day_id"), col("times"),
        col("yearweek"), col("yearmonth"), col("platform"))
      .orderBy(col("zg_id"), col("begin_day_id"), col("platform"))
  }

  /** dw_user_duration_inc — same fold for t_user_duration: per-slice
    * (duration sum, times count) partials re-summed on the (zgid, day,
    * period) key. Oracle = the SAME SQL as dw_user_duration.
    */
  def userDurationInc(t: Tables): DataFrame = {
    val druOk = expr("try_cast(dru AS int)")
    val dur = when(druOk.isNotNull && druOk >= 0 && druOk <= 86400000,
      druOk.cast("bigint")).otherwise(lit(0L))
    val keys = Seq("zg_id", "day_id", "period", "yearweek", "yearmonth", "platform")
    val parts = admitted(t)
      .withColumn("inc_slice", incSliceIdx("begin_day_id", _.toInt))
      .withColumn("period", date_format(col("ts"), "HH"))
      .groupBy(col("zgid").as("zg_id"), col("begin_day_id").as("day_id"),
        col("period"), col("yearweek"), col("yearmonth"), col("platform"),
        col("inc_slice"))
      .agg(sum(dur).as("dur_p"), count(lit(1)).as("times_p"))
    parts
      .groupBy(keys.map(col): _*)
      .agg(sum(col("dur_p")).as("duration"),
        sum(col("times_p")).cast("int").as("times"))
      .select(col("zg_id"), col("day_id"), col("period"), col("duration"),
        col("times"), col("yearweek"), col("yearmonth"), col("platform"))
      .orderBy(col("zg_id"), col("day_id"), col("period"), col("platform"))
  }

  /** dw_user_detail_sum_inc — the incremental fold of the zgid-grain sums
    * table: unlike the day-grain rollups, users genuinely span increments
    * here, so the merge is the REAL mergeable-partial machinery
    * (detailPartial's session-id sets + sums + max_by order keys) and the
    * hash match against dw_user_detail_sum's own oracle proves it
    * lossless. This is the table the ad-audience evaluator reads — its
    * daily update is exactly this fold.
    */
  def userDetailSumInc(t: Tables): DataFrame = {
    val parts = detailPartial(
      eaUnsorted(t).withColumn("inc_slice", incSliceIdx("day_id", identity)))
    mergePartials(parts)
      .select(Seq(
        col("zg_id"),
        col("l.platform_id").as("platform"),
        size(col("sids")).cast("int").as("visit_times"),
        col("duration")) ++ attrCols: _*)
      .orderBy(col("zg_id"))
  }

  /** Mergeable per-zgid detail state over each event slice (the frame's
    * `inc_slice` tag, when present, keys the per-increment grouping — same
    * partial rows as aggregating each load separately, one scan):
    * first/last touch as (order-key, fields) structs so min_by/max_by
    * re-merge across increments, sessions as an exact id set (the
    * mergeable form of count_distinct; the 100 TB swap is an HLL sketch
    * when per-user session sets stop being small), sums/maxes for the
    * rest.
    */
  private def detailPartial(ea: DataFrame): DataFrame = {
    val ord = struct(col("begin_date"), col("event_id"))
    val keys = col("zgid").as("zg_id") ::
      (if (ea.columns.contains("inc_slice")) List(col("inc_slice")) else Nil)
    ea.groupBy(keys: _*).agg(
      min_by(struct(ord.as("ord"), col("app_version"), col("channel"),
        col("website"), col("utm_source"), col("utm_medium"),
        col("utm_campaign"), col("utm_content"), col("utm_term"),
        col("referrer_url")), ord).as("f"),
      max_by(struct(ord.as("ord"), col("platform_id"), col("app_version"),
        col("channel"), col("country"), col("area"), col("city"),
        col("mccmnc"), col("bs"), col("bv"), col("os"), col("ov"),
        col("zg_did")), ord).as("l"),
      min(col("begin_date")).as("first_visit_time"),
      max(col("begin_date")).as("last_visit_time"),
      collect_set(when(col("zg_sid") =!= -1L, col("zg_sid"))).as("sids"),
      sum(expr("try_cast(duration AS bigint)")).as("duration"),
      max(when(col("zg_uid") =!= "\\N", 1).otherwise(0)).as("is_registered"))
  }

  /** Merge partial states (associative + commutative): min_by/max_by on
    * the carried order keys, set-union for sessions, sum/min/max for the
    * scalars. One groupBy over the per-increment partial rows.
    */
  private def mergePartials(parts: DataFrame): DataFrame =
    parts.groupBy("zg_id").agg(
      min_by(col("f"), col("f.ord")).as("f"),
      max_by(col("l"), col("l.ord")).as("l"),
      min(col("first_visit_time")).as("first_visit_time"),
      max(col("last_visit_time")).as("last_visit_time"),
      array_distinct(flatten(collect_list(col("sids")))).as("sids"),
      sum(col("duration")).as("duration"),
      max(col("is_registered")).as("is_registered"))

  /** dw_user_detail_inc — the INCREMENTAL maintenance path of
    * t_user_detail: at 100 TB the profile table is never rebuilt by
    * rescanning history; each load folds one day's partial state into the
    * stored state (Doris's DUPLICATE KEY + job-side merge). Here the
    * corpus splits into three increments, each collapses to its mergeable
    * partial, the partials fold, and the SAME `detailFinish` tail projects
    * the row — checked against the SAME oracle as `dw_user_detail`, so a
    * hash match PROVES incremental == full rescan on this corpus.
    */
  def userDetailInc(t: Tables): DataFrame = {
    // one zgidAxes call per face (the detailRows discipline)
    val axes = Identity.zgidAxes(t)
    val parts = detailPartial(
      Route.eventAttrWithMetaFrom(t, axes).drop("ts")
        .withColumn("inc_slice", incSliceIdx("day_id", identity)))
    val merged = mergePartials(parts).select(
      col("zg_id"),
      col("l.platform_id").as("platform"),
      col("first_visit_time"), col("last_visit_time"),
      size(col("sids")).cast("int").as("visit_times"),
      col("duration"),
      col("f.app_version").as("first_version"),
      col("f.channel").as("first_channel"),
      col("l.app_version").as("current_app_version"),
      col("l.channel").as("current_app_channel"),
      col("f.website").as("first_website"),
      col("f.utm_source").as("utm_source"),
      col("f.utm_medium").as("utm_medium"),
      col("f.utm_campaign").as("utm_campaign"),
      col("f.utm_content").as("utm_content"),
      col("f.utm_term").as("utm_term"),
      col("f.referrer_url").as("first_referrer_url"),
      col("l.country").as("current_country"),
      col("l.area").as("current_area"),
      col("l.city").as("current_city"),
      col("l.mccmnc").as("cur_mccmnc_s"),
      col("l.bs").as("current_bs"),
      col("l.bv").as("cur_bv_s"),
      col("l.os").as("current_os"),
      col("l.ov").as("cur_ov_s"),
      col("l.zg_did").as("cur_did"),
      col("is_registered"))
      .withColumn("appkey", element_at(split(col("zg_id"), ":"), 3))
    detailFinish(t, merged, axes._1).orderBy(col("zg_id"))
  }
}
