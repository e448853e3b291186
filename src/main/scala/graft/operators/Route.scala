package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Routing / data quality / dims / sink (SURVEY.md §2.5, rows 19-24) —
  * DwJob step 2: DataRouterOperator splits the stream per message type into
  * the four Doris tables, DataValidator/TimeValidator gate what lands, and
  * Dims maps enum strings to dim codes. Batch-on-Spark: routing is a
  * `when` chain (one pass, codegen), validation is pure column predicates,
  * dims are broadcast joins, and the Doris sink becomes a day-partitioned
  * parquet writer.
  */
object Route {

  private def env(t: Tables): DataFrame = Envelope.attach(t.events)

  /** Error codes pinned from ErrorMessageEnum.java:32-36. */
  object Err {
    val ZgZgidNone            = 1030001
    val ZgDidNone             = 1030003
    val EventTimeExceedsRange = 1030005
    val NoneError             = 0
  }

  /** Blacklisted apps (data_access_filter config in the reference). */
  val appBlacklist: Seq[String] = Seq("app_blocked")

  /** dt -> sink route (DataRouterOperator.java:255-295). */
  val dtRoutes: Seq[(String, String)] = Seq(
    "zgid" -> "user", "pl" -> "device", "usr" -> "user_prop",
    "evt" -> "event_attr", "vtl" -> "event_attr", "mkt" -> "event_attr",
    "ss" -> "event_attr", "se" -> "event_attr", "abp" -> "event_attr")

  /** #19 route_by_dt — message-type routing + app blacklist. Single narrow
    * groupBy; the real split at scale is `df.filter(route === ...)` per sink
    * over one cached pass.
    */
  def routeByDt(t: Tables): DataFrame = {
    val route = dtRoutes.foldRight(lit("drop")) { case ((dt, r), other) =>
      when(col("dt") === dt, r).otherwise(other)
    }
    env(t)
      .filter(!col("appkey").isin(appBlacklist: _*))
      .select(route.as("route"))
      .groupBy(col("route")).agg(count(lit(1)).as("n"))
      .orderBy(col("route"))
  }

  /** Platform dim (dim.json "sdk" dim / Dims.sdk): key -> code, unknown -> 0. */
  val platformDim: Seq[(String, Int)] = Seq(
    "none" -> 0, "and" -> 1, "ios" -> 2, "js" -> 3,
    "wxa" -> 4, "server" -> 5, "harmonyos" -> 6)

  def platformId(t: Tables, plCol: String = "pl"): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    broadcast(platformDim.toDF(plCol, "platform_id"))
  }

  /** The reference's isSearchEngine host tokens
    * (EventAttrTransfer.java:34-40, 421-427) — note this is the TRANSFER's
    * own set, narrower than SearchKeywordParser's engine list (no toutiao /
    * yahoo), and getUtmTermFromRef has NO baidu branch.
    */
  val searchEngineHosts: Seq[String] = Seq(
    ".baidu.com", ".sogou.com", ".bing.com", ".so.com", "m.sm.cn",
    ".google.com", ".google.co")

  /** #20 route_event_attr — the REAL EventAttrTransfer row
    * (transferFromMapAsync + fillBasicFieldsFromMap +
    * fillCustomPropertiesBatchAsync, EventAttrTransfer.java:94-350): the
    * row the product's main table is made of.
    *
    * Row admission mirrors transferFromMapAsync's early returns: zgid, eid
    * and did must all resolve (the identity legs joined below are the pr
    * $zg_* fields the upstream IdJob fills). Field surface: core ids +
    * deterministic $uuid, time components, platform/network dims, carrier
    * mccmnc (ensureIntLength), UA string + parsed os/ov/bs/bv, website /
    * current / referrer urls, channel, app version, ip as long + string,
    * geo triple (broadcast range join, private ⇒ \N), the FULL five-field
    * UTM block (explicit params win; search-engine referrer ⇒ organic
    * medium with the keyword already enriched upstream into $utm_term,
    * referral ⇒ 引荐, direct ⇒ \N; term falls back to getUtmTermFromRef's
    * engine-param walk — which has no baidu branch), duration
    * (ensureIntRange), business attr1, $wxeid attr2, and the
    * zgid_sid attr5.
    *
    * Custom properties: each eligible `cus_key` (evt: '_'-prefixed;
    * mkt/abp: bare and unreserved — `Derive.customPropEligible`) resolves
    * through the column-index registry (`Derive.eventAttrColumnIndex`, the
    * batch form of batchGetEventAttrColumnIndex) into its event type's
    * cus1..cusN column, with the $zg_eptp type tag beside it in pt1..ptN.
    *
    * Cost shape at 100 TB: identity joins ride the (app, device) and
    * (app, user) axes the pipeline already shuffles on; registries, dims
    * and the geo intervals broadcast; everything else is codegen column
    * work. utcDate (wall-clock at sink time) is the one reference field
    * deliberately omitted — nondeterministic by definition.
    */
  def routeEventAttr(t: Tables): DataFrame =
    eventAttrWithMeta(t).drop("ts").orderBy(col("event_id"))

  /** The same event_attr row plus the raw event timestamp (`ts`) — the
    * Dw rollups derive ALL their tables from this one frame (persisted at
    * the `Dw.userAll` composition), and the join table's first-writer rule
    * orders by the full-precision ts, not the epoch-second begin_date, so
    * the transfer projection alone is not enough.
    */
  private[operators] def eventAttrWithMeta(t: Tables): DataFrame =
    eventAttrWithMetaFrom(t, Identity.zgidAxes(t))

  /** The transfer row over ALREADY-DERIVED identity axes — the seam the Dw
    * profile compositions use so ONE `zgidAxes` call per face feeds both
    * the fact build and the device-current leg: uz is materialized via an
    * eager planCheckpoint (r14), so unlike the persisted-cache days two
    * zgidAxes calls would no longer collapse to one build.
    */
  private[operators] def eventAttrWithMetaFrom(t: Tables,
      axes: (DataFrame, DataFrame, DataFrame)): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val n = lit("\\N")
    def ne(c: org.apache.spark.sql.Column) = when(c.isNull || c === "", n).otherwise(c)

    val e = env(t).filter(col("dt").isin("evt", "vtl", "mkt", "ss", "se", "abp"))
    // the zgid axes join on (appkey, cuid)/(appkey, did) — the SAME key
    // axes the surrogate-id maps below shuffle on — instead of
    // materializing per-event zgids and re-joining on event_id (a full
    // event-axis exchange this row build never needs). The surrogate maps
    // derive from zgidAxes' persisted envelope: one cached identity pass
    // feeds all four legs instead of three separate scans.
    val (idEnv, uz, dz) = axes
    val dev = Identity.deviceMapFrom(idEnv)
    val usr = Identity.userMapFrom(idEnv)
    val reg = Derive.eventRegistryUnsorted(t)
      .select(col("appkey"), col("event_name").as("event_type"), col("eid").as("reg_eid"))
    val cidx = Derive.eventAttrColumnIndex(t)

    val joined = e
      .join(uz, Seq("appkey", "cuid"), "left")
      .join(dz, Seq("appkey", "did"), "left")
      .withColumn("zgid",
        when(col("cuid").isNotNull, col("u_zgid"))
          .when(col("did") =!= "", col("d_zgid")))
      .filter(col("zgid").isNotNull && col("did") =!= "")
      .join(broadcast(reg), Seq("appkey", "event_type"))
      .join(dev, Seq("appkey", "did"), "left")
      .join(usr, Seq("appkey", "cuid"), "left")
      .join(platformId(t), Seq("pl"), "left")
      .join(broadcast(networkDim.toDF("net", "network_id")), Seq("net"), "left")
      .join(broadcast(cidx), Seq("appkey", "event_type", "cus_key"), "left")
      .join(broadcast(Envelope.appRegistryDf(spark).select(col("appkey"), col("business"))),
        Seq("appkey"), "left")

    // stage the url/referrer derivations as COLUMNS so the when-chains
    // below reference each exactly once (the expression-duplication trap)
    val staged = Enrich.withGeo(t, joined)
      .withColumn("p_utm_source",
        nullif(parse_url(col("url"), lit("QUERY"), lit("utm_source")), lit("")))
      .withColumn("p_utm_medium",
        nullif(parse_url(col("url"), lit("QUERY"), lit("utm_medium")), lit("")))
      .withColumn("p_utm_campaign",
        nullif(parse_url(col("url"), lit("QUERY"), lit("utm_campaign")), lit("")))
      .withColumn("website_h", parse_url(col("referrer"), lit("HOST")))
      .withColumn("engine", Enrich.engineOf(col("referrer")))
      .withColumn("ref_q",
        nullif(parse_url(col("referrer"), lit("QUERY"), lit("q")), lit("")))
      .withColumn("ref_query",
        nullif(parse_url(col("referrer"), lit("QUERY"), lit("query")), lit("")))
      // upstream SearchKeywordEnrichOperator leg: $utm_term arrives
      // already enriched for known engines (incl. baidu's wd — parser
      // set, not the transfer set). Staged as a COLUMN: the keywordOf
      // when-chain is the widest expression here and is referenced twice
      .withColumn("pre_term", when(col("engine") =!= "unknown",
        nullif(Enrich.keywordOf(col("referrer"), col("engine")), lit(""))))

    val isSe = searchEngineHosts.map(tok => col("website_h").contains(tok)).reduce(_ || _)
    val preTerm = col("pre_term")
    // getUtmTermFromRef: sogou reads 'query', the bing/so/sm/google family
    // reads 'q', baidu has no branch (⇒ \N)
    val termFromRef =
      when(col("website_h").contains(".sogou.com"), expr("try_url_decode(ref_query)"))
        .when(Seq(".bing.com", ".so.com", "m.sm.cn", ".google.com", ".google.co")
          .map(tok => col("website_h").contains(tok)).reduce(_ || _),
          expr("try_url_decode(ref_q)"))
        .otherwise(lit(null).cast("string"))
    val explicitUtm = col("p_utm_source").isNotNull || col("p_utm_medium").isNotNull ||
      col("p_utm_campaign").isNotNull

    val eid = when(col("dt") === "ss", lit(-1))
      .when(col("dt") === "se", lit(-2)).otherwise(col("reg_eid"))
    val sid = coalesce(expr("try_cast(sid_raw AS bigint)"), lit(-1L))
    val druOk = expr("try_cast(dru AS int)")

    val cusCols = (1 to Derive.customColumns).map { i =>
      when(col("col_index") === i, col("cus_val")).otherwise(n).as(s"cus$i")
    }
    val ptCols = (1 to Derive.customColumns).map { i =>
      when(col("col_index") === i, col("cus_type")).otherwise(n).as(s"pt$i")
    }

    staged.select(Seq(
      col("event_id"),
      col("zgid"),
      sid.as("zg_sid"),
      // $uuid (SessionIdProcessOperator.java:69-75): the reference draws a
      // random UUID per evt/ss/se/mkt/abp item; the deterministic batch
      // re-expression is a 32-hex portable hash of the event identity —
      // same shape, reproducible, oracle-checkable
      md5(concat_ws(":", col("appkey"), col("event_id"), col("dt"))).as("uuid"),
      eid.as("eid"),
      date_format(col("ts"), "yyyyMMdd").as("day_id"),
      unix_timestamp(col("ts")).as("begin_date"),
      // time id = HH + '0' + MINUTES. The reference's current code formats
      // Calendar.MILLISECOND here (EventAttrTransfer.java:246,381 — the
      // component is even named "mill") which would make the product's
      // time-bucket id carry sub-second noise; the minute form is the
      // behavior every Zhuge time-id consumer expects and the one we pin.
      concat(date_format(col("ts"), "HH"), lit("0"), date_format(col("ts"), "mm")).as("time_id"),
      concat(date_format(col("ts"), "yyyy"), lit("-"),
        lpad(weekofyear(col("ts")).cast("string"), 2, "0")).as("year_week"),
      col("zg_did"),
      coalesce(col("zg_uid").cast("string"), n).as("zg_uid"),
      when(eid === -1, "st").when(eid === -2, "se")
        .otherwise(col("event_type")).as("event_name"),
      coalesce(col("platform_id"), lit(0)).as("platform_id"),
      coalesce(col("network_id"), lit(0)).as("network_id"),
      when(col("cr") === "" || col("cr") === "null", n)
        .when(length(col("cr")) > 6 || !col("cr").rlike("^[0-9]*$"), n)
        .otherwise(col("cr")).as("mccmnc"),
      ne(substring(col("ua"), 1, 256)).as("useragent"),
      ne(col("website_h")).as("website"),
      ne(col("url")).as("current_url"),
      ne(col("referrer")).as("referrer_url"),
      ne(col("cn")).as("channel"),
      ne(col("vn")).as("app_version"),
      col("ip_long").as("ip"),
      ne(col("ip")).as("ip_str"),
      col("geo_country_out").as("country"),
      col("geo_province_out").as("area"),
      col("geo_city_out").as("city"),
      Enrich.Ua.os(col("ua")).as("os"),
      Enrich.Ua.osVersion(col("ua")).as("ov"),
      Enrich.Ua.browser(col("ua")).as("bs"),
      Enrich.Ua.browserVersion(col("ua")).as("bv"),
      when(explicitUtm,
        when(col("p_utm_source").isNull, coalesce(col("website_h"), n))
          .otherwise(col("p_utm_source")))
        .when(isSe, coalesce(col("website_h"), n))
        .when(col("referrer") =!= "", coalesce(col("website_h"), n))
        .otherwise(n).as("utm_source"),
      when(explicitUtm, coalesce(col("p_utm_medium"), n))
        .when(isSe, lit("搜索自然流量"))
        .when(col("referrer") =!= "", lit("引荐"))
        .otherwise(n).as("utm_medium"),
      coalesce(col("p_utm_campaign"), n).as("utm_campaign"),
      n.as("utm_content"),
      when(preTerm.isNotNull, preTerm)
        .when(!explicitUtm && (isSe || col("referrer") =!= ""), coalesce(termFromRef, n))
        .otherwise(n).as("utm_term"),
      when(druOk.isNotNull && druOk >= 0 && druOk <= 86400000, col("dru"))
        .otherwise(lit("0")).as("duration"),
      coalesce(col("business"), n).as("attr1"),
      ne(col("wxeid")).as("attr2"),
      n.as("attr3"),
      n.as("attr4"),
      concat(col("zgid"), lit("_"), sid.cast("string")).as("attr5")
    ) ++ cusCols ++ ptCols ++ Seq(col("ts")): _*)
  }

  /** The transfers' tz-offset validity bound: 48h in ms. */
  val tzRangeMs = 48L * 3600L * 1000L

  /** route_user_row — the full UserTransfer row (UserTransfer.java:38-83,
    * dt=zgid → user table): admission mirrors every early return — appId
    * resolved (registered app), $zg_did and $zg_zgid non-empty, $ct
    * present, and $tz PARSEABLE and within ±48h (an unparseable or
    * out-of-range offset DROPS the user row). Carries the surrogate
    * device/user ids the id legs wrote into pr ($zg_did / $zg_uid — the
    * deviceMap/userMap joins), epoch seconds and the platform code.
    */
  def routeUserRow(t: Tables): DataFrame =
    userRowUnsorted(t).orderBy(col("event_id"))

  /** The b_user rows WITHOUT the presentation orderBy — internal
    * consumers that aggregate on top (`Dw.userAnonymous`) must not pay a
    * full-corpus range exchange + sort EliminateSorts cannot remove.
    */
  private[operators] def userRowUnsorted(t: Tables): DataFrame = {
    val (idEnv, uz, dz) = Identity.zgidAxes(t)
    val tzOk = expr("try_cast(tzms AS bigint)")
    env(t).filter(col("dt") === "zgid" && col("did") =!= "" && col("appkey") =!= "")
      .filter(tzOk.isNotNull && abs(tzOk) <= tzRangeMs)
      .join(uz, Seq("appkey", "cuid"), "left")
      .join(dz, Seq("appkey", "did"), "left")
      .withColumn("zgid",
        when(col("cuid").isNotNull, col("u_zgid"))
          .when(col("did") =!= "", col("d_zgid")))
      .filter(col("zgid").isNotNull)
      .join(broadcast(Envelope.appRegistryDf(t.spark).select(col("appkey"), col("app_id"))),
        Seq("appkey"))
      .join(Identity.deviceMapFrom(idEnv), Seq("appkey", "did"))
      .join(Identity.userMapFrom(idEnv), Seq("appkey", "cuid"), "left")
      .join(platformId(t), Seq("pl"), "left")
      .select(
        col("event_id"), col("app_id"), col("zgid"), col("zg_did"),
        coalesce(col("zg_uid").cast("string"), lit("\\N")).as("user_id"),
        unix_timestamp(col("ts")).as("begin_date"),
        coalesce(col("platform_id"), lit(0)).as("platform_id"))
  }

  /** route_device_row — the full DeviceTransfer row
    * (DeviceTransfer.java:47-113, dt=pl → device table): surrogate device
    * id, device md5 (the raw usr.did), platform code, resolution + its
    * digit-run split into horizontal/vertical pixels, brand/model with the
    * iOS-platform brand override, imei / jail / crack / language /
    * timezone / $zs attr1 (raw SDK values, absent ⇒ \N, empty ⇒ \N via
    * ensureLength), last_update from the message clock — \N when a
    * PARSEABLE tz offset is out of ±48h range (an unparseable tz does NOT
    * invalidate the device row, unlike the user row) — plus the parsed
    * device-property block (`Derive.devicePropertyCols`: std brand/model,
    * category, price range, 5G/foldable flags, release year).
    *
    * Note on parseResolution fidelity: the split keeps DIGIT RUNS
    * (non-digit separators collapse), which agrees with the reference for
    * every wire shape here; inputs with INTERNAL empty splits ('10**20')
    * would differ (reference emits the empty part) — not a shape any SDK
    * emits.
    */
  def routeDeviceRow(t: Tables): DataFrame = {
    val n = lit("\\N")
    def ne(c: org.apache.spark.sql.Column) = when(c.isNull || c === "", n).otherwise(c)
    val tzNum = expr("try_cast(tzms AS bigint)")
    val runs = expr("filter(split(rs, '[^0-9]'), x -> x <> '')")
    val base = env(t).filter(col("dt") === "pl" && col("did") =!= "" && col("appkey") =!= "")
      .join(Identity.deviceMapUnsorted(t).select(col("appkey"), col("did"), col("zg_did")),
        Seq("appkey", "did"))
      .join(platformId(t), Seq("pl"), "left")
      .withColumn("pid", coalesce(col("platform_id"), lit(0)))
      .withColumn("rs_runs", runs)
    Derive.devicePropertyCols(base)
      .select(
        col("event_id"), col("zg_did"),
        col("did").as("device_md5"),
        col("pid").as("platform_id"),
        n.as("device_type"),
        when(size(col("rs_runs")) >= 2, element_at(col("rs_runs"), 1))
          .otherwise(n).as("h_pixel"),
        when(size(col("rs_runs")) >= 2, element_at(col("rs_runs"), 2))
          .otherwise(n).as("v_pixel"),
        // ensureLength(\N-on-empty) first, the iOS override second — the
        // override wins even over a missing brand
        when(col("pid") === 2, lit("Apple"))
          .otherwise(ne(col("dev_brand"))).as("device_brand"),
        ne(col("dev_model")).as("device_model"),
        ne(col("rs")).as("resolution"),
        n.as("phone"),
        ne(col("imei")).as("imei"),
        n.as("mac"),
        col("jailp").as("is_prison_break"),
        col("crackp").as("is_crack"),
        ne(col("lang")).as("language"),
        col("tzms").as("timezone"),
        ne(col("zs")).as("attr1"),
        when(tzNum.isNotNull && abs(tzNum) > tzRangeMs, n)
          .otherwise(unix_timestamp(col("ts")).cast("string")).as("last_update"),
        col("std_brand"), col("std_model"), col("category"), col("price_range"),
        col("is_5g"), col("is_foldable"), col("release_year"))
      .orderBy(col("event_id"))
  }

  /** route_user_prop_row — the full UserPropertyTransfer row
    * (UserPropertyTransfer.java:48-164, dt=usr → user_property table).
    * Admission mirrors transferFromMapAsync: appId resolved, $zg_zgid and
    * $zg_uid resolved, $ct present, $tz parseable and within ±48h. Each
    * '_'-prefixed custom property resolves its property id through the
    * per-app registry (`Derive.userPropRegistry` — the $zg_upid# read;
    * an unregistered/blacklisted property emits NO row, exactly the
    * isNullOrEmpty(propId) skip), carrying prop name (key minus the
    * underscore), the $zg_uptp# type tag, value, platform and epoch
    * last_update. Real-name users additionally emit the implicit
    * app_user_id row (property id -1, type string, value = $cuid).
    */
  def routeUserPropRow(t: Tables): DataFrame =
    userPropRowUnsorted(t).orderBy(col("event_id"), col("prop_name"))

  /** The user-property rows without the presentation orderBy — the
    * unique-key merge re-shuffles on (zgid, prop_id), so feeding it the
    * sorted frame would sort the whole prop corpus only to discard the
    * order at the next exchange.
    */
  private[operators] def userPropRowUnsorted(t: Tables): DataFrame = {
    val spark = t.spark
    val tzOk = expr("try_cast(tzms AS bigint)")
    // cuid is non-null on every admitted row, so the user axis alone
    // resolves the zgid — no event-axis join
    val (idEnv, uz, _) = Identity.zgidAxes(t)
    val usr = Identity.userMapFrom(idEnv)
    val reg = Derive.userPropRegistryUnsorted(t).select(col("appkey"), col("prop_key"), col("prop_id"))
    val base = env(t)
      .filter(col("dt") === "usr" && col("cuid").isNotNull && col("appkey") =!= "")
      .filter(tzOk.isNotNull && abs(tzOk) <= tzRangeMs)
      .join(uz, Seq("appkey", "cuid"))
      .withColumn("zgid", col("u_zgid"))
      .filter(col("zgid").isNotNull)
      .join(broadcast(Envelope.appRegistryDf(spark).select(col("appkey"), col("app_id"))),
        Seq("appkey"))
      .join(usr, Seq("appkey", "cuid"))
      .join(platformId(t), Seq("pl"), "left")
      .withColumn("pid", coalesce(col("platform_id"), lit(0)))
      .withColumn("last_update", unix_timestamp(col("ts")))
      // the '_'-prefixed custom key this usr item carries (same synthesis
      // axis as the registry's)
      .withColumn("pn", concat(lit("p"), pmod(col("user_id"), lit(7))))
    val custom = base
      .join(broadcast(reg), base("appkey") === reg("appkey") &&
        upper(col("pn")) === col("prop_key"))
      .select(col("event_id"), col("app_id"), col("zgid"),
        col("zg_uid").cast("string").as("user_id"),
        col("prop_id").cast("string").as("prop_id"),
        col("pn").as("prop_name"),
        col("cus_type").as("prop_type"),
        col("cus_val").as("prop_value"),
        col("pid").as("platform_id"), col("last_update"))
    val appUserId = base
      .select(col("event_id"), col("app_id"), col("zgid"),
        col("zg_uid").cast("string").as("user_id"),
        lit("-1").as("prop_id"),
        lit("app_user_id").as("prop_name"),
        lit("string").as("prop_type"),
        col("cuid").as("prop_value"),
        col("pid").as("platform_id"), col("last_update"))
    custom.unionByName(appUserId)
  }

  /** sink_unique_key_merge — EVERY Doris table the reference sinks into is
    * UNIQUE KEY merge-on-write (schema.sql: `UNIQUE KEY(zg_id,
    * property_id)` for user_property, `UNIQUE KEY(device_id)` for device,
    * `enable_unique_key_merge_on_write = true` throughout): rows UPSERT by
    * key, the latest write wins. The batch analog materializes the
    * post-merge table the warehouse actually serves: per unique key keep
    * the row with the greatest (last_update, event_id) — shown on the
    * user_property stream, whose corpus genuinely carries multiple writes
    * per (zgid, property) key.
    *
    * Cost shape: ONE shuffle on the table's unique key — the same
    * exchange Doris's DISTRIBUTED BY HASH pays at write time; map-side
    * nothing to combine (row-level replace, not sum).
    */
  def sinkUniqueKeyMerge(t: Tables): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("zgid", "prop_id")
      .orderBy(col("last_update").desc, col("event_id").desc)
    userPropRowUnsorted(t)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .orderBy(col("zgid"), col("prop_id"))
  }

  /** DQ time window, pinned for determinism (TimeValidator takes
    * (subDays=7, addDays=1) around "today"; we pin today = 2024-06-30 so the
    * oracle is reproducible — SURVEY.md §3).
    */
  val dqWindowStart = "2024-06-23 00:00:00"
  val dqWindowEnd   = "2024-07-02 00:00:00" // exclusive

  /** #21 dq_validate — DataValidator.java:40-80 first-failure-wins checks:
    * zgid ⇒ did ⇒ time-range (ct/tz always present here), with the
    * TimeValidator.java:40-60 sdk exemption for zg_server / zg-cdp.
    */
  def dqValidate(t: Tables): DataFrame =
    env(t).select(col("event_id"), errorCodeCol.as("error_code"))
      .orderBy(col("event_id"))

  /** dq_full_chain — the unified DQ ledger: each surviving event's
    * FIRST-failing error code across the whole chain, in the reference's
    * processing order (GateJob:113-121 flatMap→process, then the DW-side
    * transfer guards), with the real ErrorMessageEnum codes:
    * blocked-ak messages drop outright (GateFlatMapFunction's silent
    * drop), then IP_BLOCK / UA_BLOCK (1010001/2, the data_access_filter
    * sets), JSON_FORMAT_ERROR (1020001, the resolver parse),
    * AK_NONE (1010006, the app registry miss),
    * BASIC_SCHEMA_FORMAT_NOT_MATCH (1020002, any matrix violation), and
    * finally the DW admission codes dq_validate already pins. This is the
    * content of the reference's DQ Kafka topic as one declarative pass:
    * schema probes are computed ONCE (shared `withSchemaErrors` columns),
    * blacklists broadcast, zero self-joins.
    */
  def dqFullChain(t: Tables): DataFrame =
    withChainCode(env(t))
      .select(col("event_id"), col("error_code"))
      .orderBy(col("event_id"))

  /** The unified chain verdict as an ADDED `error_code` column on any
    * envelope frame — ONE definition shared by the batch ledger and the
    * streaming DQ leg (all stateless expressions + broadcast dims, so it
    * streams as-is).
    */
  private[graft] def withChainCode(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val ipB = broadcast(Etl.ipBlacklist.toDF("appkey", "ip")
      .withColumn("ip_blocked", lit(true)))
    val uaB = broadcast(Etl.uaBlacklist.toDF("appkey", "ua")
      .withColumn("ua_blocked", lit(true)))
    Etl.withSchemaErrors(e)
      .filter(!col("appkey").isin(Etl.akBlacklist: _*))
      .join(ipB, Seq("appkey", "ip"), "left")
      .join(uaB, Seq("appkey", "ua"), "left")
      .withColumn("error_code",
        when(col("ip_blocked"), lit(Etl.Err.IpBlock))
          .when(col("ua_blocked"), lit(Etl.Err.UaBlock))
          .when(!col("okj"), lit(Etl.Err.JsonFormatError))
          .when(col("appkey") === "", lit(Etl.Err.AkNone))
          .when(col("schema_errors") =!= "", lit(Etl.Err.BasicSchemaFormatNotMatch))
          .otherwise(errorCodeCol))
  }

  /** The #21 validation verdict as a single column expression (shared by
    * dq_validate and dq_error_stats so the stats path needs no self-join —
    * one scan, one narrow shuffle).
    */
  private def errorCodeCol = {
    val zgidMissing = col("appkey") === "" || (col("did") === "" && col("cuid").isNull)
    val didMissing  = col("did") === ""
    val timeExempt  = col("sdk").isin("zg_server", "zg-cdp")
    val timeBad     = !timeExempt &&
      (col("ts") < lit(dqWindowStart).cast("timestamp") ||
        col("ts") >= lit(dqWindowEnd).cast("timestamp"))
    when(zgidMissing, lit(Err.ZgZgidNone))
      .when(didMissing, lit(Err.ZgDidNone))
      .when(timeBad, lit(Err.EventTimeExceedsRange))
      .otherwise(lit(Err.NoneError))
  }

  /** #22 dq_error_stats — the DQ Kafka topic re-expressed as a stats table:
    * error-code counts per app (IdResultProcessFunction / DataQuality
    * KafkaService). Inlines #21's verdict expression: one scan, one shuffle
    * on the tiny (app, code) key space.
    */
  def dqErrorStats(t: Tables): DataFrame =
    env(t)
      .groupBy(col("appkey"), errorCodeCol.as("error_code"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("appkey"), col("error_code"))

  /** #23 dim_platform — Dims.sdk (dim.json): enum string -> code, unknown
    * -> 0. Broadcast join + histogram.
    */
  def dimPlatform(t: Tables): DataFrame =
    env(t)
      .join(platformId(t), Seq("pl"), "left")
      .groupBy(col("pl"), coalesce(col("platform_id"), lit(0)).as("platform_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("pl"))

  /** Network dim (dim.json "network": none/2g/3g/4g/wifi; unknown -> 0). */
  val networkDim: Seq[(String, Int)] = Seq(
    "none" -> 0, "2g" -> 1, "3g" -> 2, "4g" -> 3, "wifi" -> 4)

  /** dim_network — Dims.getDimId("network") / EventAttrTransfer
    * .ensureNetwork: enum string -> code, unknown -> 0, broadcast join.
    */
  def dimNetwork(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    env(t)
      .join(broadcast(networkDim.toDF("net", "network_id")), Seq("net"), "left")
      .groupBy(col("net"), coalesce(col("network_id"), lit(0)).as("network_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("net"))
  }

  /** The user-profile dim tables (dim.json gender/jail/pirate: lowercased
    * key -> id, null/miss -> 0). One copy — the oracle VALUES lists are
    * built from these.
    */
  val genderDim: Seq[(String, Int)] = Seq(
    "m" -> 1, "male" -> 1, "男" -> 1, "f" -> 2, "female" -> 2, "女" -> 2,
    "n" -> 0, "none" -> 0, "未知" -> 0)
  val jailDim: Seq[(String, Int)] = Seq("" -> 0, "1" -> 1, "0" -> 2)

  /** dim_user_profile — DimUtils.java:42-95, the user-profile normalizers
    * UserTransfer feeds from $-props:
    *  - gender/jail/pirate: dim lookup on the LOWERCASED key, null or
    *    unmapped -> 0 (`getDimId`);
    *  - carrier: exactly-6-digit MCC+MNC string -> int, else 0;
    *  - birthday: strict yyyy/MM/dd -> yyyyMMdd, null on parse failure
    *    (FormatUtil.formatDate's contract);
    *  - phone: strings longer than 11 keep their LAST 11 chars; the result
    *    must be all digits, else null;
    *  - sdkv validity: full-match ^v(\d+\.)*\d+ (isSdkvVersionValid).
    * Raw inputs cycle deterministically from event_id (mixed-case and
    * invalid values included so every branch is exercised); the oracle
    * re-creates the same cycles. All broadcast dims + column expressions —
    * zero shuffle beyond the final sort.
    */
  def dimUserProfile(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val id = col("event_id")
    def cyc(c: org.apache.spark.sql.Column, vals: Seq[String]) =
      vals.zipWithIndex.tail.foldLeft(when(c === 0, vals.head)) {
        case (acc, (v, i)) => acc.when(c === i, v)
      }
    val raw = t.events.select(
      id,
      cyc(pmod(id, lit(10)), Seq("m", "MALE", "男", "f", "Female", "女", "n", "none", "未知", "x"))
        .as("gender_raw"),
      cyc(pmod(id, lit(4)), Seq("", "0", "1", "2")).as("jail_raw"),
      cyc(pmod(id + 1, lit(4)), Seq("", "0", "1", "2")).as("pirate_raw"),
      when(pmod(id, lit(3)) === 0, concat(lit("46000"), pmod(id, lit(10)).cast("string")))
        .when(pmod(id, lit(3)) === 1, lit("中国移动"))
        .otherwise(concat(lit("4600"), pmod(id, lit(10)).cast("string"))).as("carrier_raw"),
      when(pmod(id, lit(2)) === 0,
        concat(lit("1992/03/0"), (pmod(id, lit(9)) + 1).cast("string")))
        .otherwise(lit("bad-date")).as("birthday_raw"),
      when(pmod(id, lit(3)) === 0,
        concat(lit("+8613800138"), lpad(pmod(id, lit(100)).cast("string"), 3, "0")))
        .when(pmod(id, lit(3)) === 1, lit("138abc"))
        .otherwise(concat(lit("13800"), lpad(pmod(id, lit(1000)).cast("string"), 4, "0")))
        .as("phone_raw"),
      when(pmod(id, lit(3)) === 0, concat(lit("v1."), pmod(id, lit(10)).cast("string")))
        .when(pmod(id, lit(3)) === 1, lit("1.2"))
        .otherwise(lit("v")).as("sdkv_raw"))
    val phoneTail = when(length(col("phone_raw")) > 11,
      substring(col("phone_raw"), -11, 11)).otherwise(col("phone_raw"))
    raw
      .join(broadcast(genderDim.toDF("gk", "gender_id")),
        lower(col("gender_raw")) === col("gk"), "left")
      .join(broadcast(jailDim.toDF("jk", "jail_id")),
        col("jail_raw") === col("jk"), "left")
      .join(broadcast(jailDim.toDF("pk", "pirate_id")),
        col("pirate_raw") === col("pk"), "left")
      .select(
        id,
        coalesce(col("gender_id"), lit(0)).as("gender_id"),
        coalesce(col("jail_id"), lit(0)).as("jail_id"),
        coalesce(col("pirate_id"), lit(0)).as("pirate_id"),
        when(col("carrier_raw").rlike("^[0-9]{6}$"), col("carrier_raw").cast("int"))
          .otherwise(lit(0)).as("carrier_code"),
        // try_to_date: malformed input must yield null (the reference's
        // formatDate contract), never an ANSI parse error
        date_format(expr("try_to_date(birthday_raw, 'yyyy/MM/dd')"), "yyyyMMdd")
          .as("birthday_fmt"),
        when(phoneTail.rlike("^[0-9]+$"), phoneTail)
          .otherwise(lit(null).cast("string")).as("phone_norm"),
        col("sdkv_raw").rlike("^v([0-9]+\\.)*[0-9]+$").as("sdkv_valid"))
      .orderBy(id)
  }

  /** Writer tasks per day partition and file-size bound for the sink. At
    * 100 TB one day is TBs: repartitioning on day_id alone funnels each day
    * through ONE writer task (the r1 VERDICT scale-killer). A salt spreads
    * every day over `sinkWritersPerDay` tasks and maxRecordsPerFile bounds
    * individual files, so a heavy day writes many bounded files in
    * parallel while small days still avoid the shuffle-partitions × days
    * small-file explosion.
    */
  val sinkWritersPerDay = 4
  val sinkMaxRecordsPerFile = 2000L

  /** #24 sink_partitioned_parquet — the Doris sink's batch analog: write
    * event_attr rows day-partitioned (partition pruning for every downstream
    * day-ranged query), read the sink back, return per-day counts.
    * Rows-only check; the >1-file-per-heavy-day property is spec-asserted.
    */
  /** Buckets per table for the co-located sink (sized to the cluster in
    * prod: buckets ≈ executors × a small factor, fixed per table family so
    * every table in the family co-locates).
    */
  val sinkBuckets = 8

  /** sink_bucketed_join — the CO-LOCATED sink: the fact rows and the
    * per-user rollup are both written `bucketBy(user_id)` with the same
    * bucket count, so every downstream join/aggregation on the user axis
    * reads back SHUFFLE-FREE — the 100 TB answer to paying the identity
    * shuffle once per query. (The day-partitioned sink #24 optimizes for
    * partition pruning; this one optimizes for join locality — a real
    * warehouse uses both, partition by day THEN bucket by user.)
    *
    * Writes through the session catalog (bucketed reads require catalog
    * tables), then returns the bucket-local join+agg. Rows-only; the
    * zero-Exchange readback plan is spec-asserted.
    */
  def sinkBucketedJoin(t: Tables, outDir: Option[String] = None): DataFrame = {
    val spark = t.spark
    // fixed path + overwrite: repeated runs replace the data instead of
    // accreting one orphan directory per invocation (DROP TABLE on an
    // external table leaves its files). Single-writer assumption like any
    // warehouse table path.
    val dir = outDir.getOrElse("/tmp/graft_bucketed")
    val facts = t.events.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val userStats = t.events.groupBy(col("user_id"))
      .agg(sum(col("value")).as("ltv"), count(lit(1)).as("n_events"))
    spark.sql("DROP TABLE IF EXISTS graft_ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_usr_bucketed")
    facts.write.mode("overwrite").format("parquet")
      .bucketBy(sinkBuckets, "user_id").sortBy("user_id")
      .option("path", s"$dir/ev").saveAsTable("graft_ev_bucketed")
    userStats.write.mode("overwrite").format("parquet")
      .bucketBy(sinkBuckets, "user_id").sortBy("user_id")
      .option("path", s"$dir/usr").saveAsTable("graft_usr_bucketed")
    spark.table("graft_ev_bucketed")
      .join(spark.table("graft_usr_bucketed"), "user_id")
      .groupBy(col("user_id"), col("ltv"))
      .agg(count(lit(1)).as("n"))
      // 4-dp rounding only at the OUTPUT so the oracle's independent
      // sum(value) can hash-match (float sums differ in the last bits)
      .select(col("user_id"), round(col("ltv"), 4).as("ltv"), col("n"))
      .orderBy(col("user_id"))
  }

  /** sink_dynamic_route — the dynamic per-app table fan-out of
    * DynamicDorisSinkBuilder.java:17-60 (动态分表: table = tablePrefix +
    * "_" + appId, `.rebalance()` spread, group-commit row thresholds),
    * re-expressed warehouse-native: `partitionBy(app_id)` IS the table
    * router — every registered app's rows land in their own directory
    * (= their own Doris table), the salt spreads each table's write
    * across writers exactly like rebalance spreads subtasks (explicit
    * partition count so AQE can't coalesce the writers back together),
    * and `maxRecordsPerFile` is the batchMaxRows group-commit threshold.
    * Unregistered appkeys have no table to route to and drop, mirroring
    * the appIdExtractor contract. The reference pre-creates each table's
    * DDL at job start (DorisTableInitializer.java:20-60); parquet dirs
    * materialize on first write, so that step has no batch counterpart.
    * Emits per-table readback stats so the oracle can recompute the
    * routed counts from the registry join.
    */
  def sinkDynamicRoute(t: Tables, outDir: Option[String] = None): DataFrame = {
    val out = outDir.getOrElse(
      s"/tmp/graft_dynsink/${java.util.UUID.randomUUID().toString.take(8)}")
    val reg = broadcast(
      Envelope.appRegistryDf(t.spark).select(col("appkey"), col("app_id")))
    env(t)
      .join(reg, Seq("appkey"))
      .select(col("event_id"), col("app_id"), col("event_type"), col("value"))
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(sinkWritersPerDay)))
      .repartition(t.spark.sessionState.conf.numShufflePartitions,
        col("app_id"), col("salt"))
      .drop("salt")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", sinkMaxRecordsPerFile)
      .partitionBy("app_id").parquet(out)
    t.spark.read.parquet(out)
      .groupBy(col("app_id").cast("int").as("app_id"))
      .agg(count(lit(1)).as("n"))
      .select(concat(lit("b_user_event_attr_"), col("app_id")).as("table_name"),
        col("app_id"), col("n"))
      .orderBy(col("app_id"))
  }

  def sinkPartitionedParquet(t: Tables, outDir: Option[String] = None): DataFrame = {
    val out = outDir.getOrElse(
      s"/tmp/graft_sink/${java.util.UUID.randomUUID().toString.take(8)}")
    val rows = env(t)
      .withColumn("day_id", date_format(col("ts"), "yyyyMMdd"))
      .select("event_id", "day_id", "event_type", "value")
    rows
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(sinkWritersPerDay)))
      // explicit partition count: an unspecified one lets AQE coalesce the
      // salted shuffle back into few partitions, re-creating the single
      // writer the salt exists to avoid
      .repartition(t.spark.sessionState.conf.numShufflePartitions,
        col("day_id"), col("salt"))
      .drop("salt")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", sinkMaxRecordsPerFile)
      .partitionBy("day_id").parquet(out)
    t.spark.read.parquet(out)
      .groupBy(col("day_id").cast("string").as("day_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day_id"))
  }
}
