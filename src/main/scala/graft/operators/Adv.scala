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
    // MERGE-pinned (r14): this is an exploding join (every click x every
    // conversion per device before the window filter) — the AQE
    // shuffled-hash conversion regressed it 29 -> 50-60 s at the sf10
    // gate (hash-probing duplicate-heavy keys where the sorted merge
    // streams runs of equal keys); measured both ways at sf10, SMJ wins
    // 35.4 vs 59.8 solo.
    val joined = convs.join(clicks.hint("merge"), Seq("appkey", "did"))
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

  /** company_app (AdvFlatMapFunction.initTable2Company_app:138-172): the
    * live ak → (appId, companyId) registry the AdvJob polls per minute —
    * is_delete/stop/transfer-status filtering is the reference's SQL; here
    * the rows ARE the live set.
    */
  val advCompanyRegistry: Seq[(String, Int, Int)] =
    Seq(("app0", 201, 301), ("app1", 202, 302), ("app2", 203, 303))

  /** business (initTable2Business:188-214): admission is membership of
    * `companyId + "_" + identifier` in the enabled-business set. Company
    * 303's business ("cdp") is deliberately absent, so the company axis
    * visibly rejects app2 — an ak→appId-only gate would admit it.
    */
  val advBusinessSet: Set[String] = Set("301_analytics", "302_marketing")

  /** The business identifier of one appkey (the reference reads it off the
    * app registry the Gate stage already loaded).
    */
  private def businessOf(ak: String): String =
    Envelope.appRegistry.collectFirst { case (k, _, b) if k == ak => b }
      .getOrElse("")

  /** Registered advertising apps (the reference's per-minute MySQL registry
    * poll as a dim): the SINGLE source for the save leg, the attribute leg,
    * and the DuckDB oracle CTEs — key agreement between the legs breaks
    * silently if any copy drifts, so there are no copies. DERIVED through
    * the company/business gate: ak→appId, kept only when the app's
    * company+business pair is enabled (AdvFlatMapFunction's
    * ak2AppIdMap ∘ appId2companyIdMap ∘ businessSet membership).
    */
  val adAppRegistry: Seq[(String, Int)] = advCompanyRegistry.collect {
    case (ak, appId, companyId)
        if advBusinessSet(s"${companyId}_${businessOf(ak)}") => (ak, appId)
  }

  private def advApps(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    broadcast(adAppRegistry.toDF("appkey", "ad_app_id"))
  }

  /** The AdvJob entry gate (AdvFlatMapFunction.java:42-270): events from a
    * company/business-admitted ad app, minus the app's data_access_filter
    * ip/ua blacklist rows (initTable2DataAccessFilter — the same filter
    * table the GateJob reads, re-checked on the adv stream). Every adv leg
    * that keys on the registry enters through this one frame.
    */
  private def advAdmitted(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val ipB = broadcast(Etl.ipBlacklist.toDF("appkey", "ip"))
    val uaB = broadcast(Etl.uaBlacklist.toDF("appkey", "ua"))
    env(t).filter(col("appkey") =!= "")
      .join(advApps(t), Seq("appkey"))
      .join(ipB, Seq("appkey", "ip"), "left_anti")
      .join(uaB, Seq("appkey", "ua"), "left_anti")
  }

  /** adv_admission_stats — the AdvJob gate's verdict histogram per app:
    * NOT_AD_APP (ak not in company_app), BUSINESS_BLOCKED (company's
    * business not enabled), IP_BLOCK / UA_BLOCK (data_access_filter), OK.
    * Makes the company-axis admission itself first-class and
    * oracle-checkable.
    */
  def admissionStats(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val company = broadcast(advCompanyRegistry.toDF("appkey", "ad_app_id", "company_id")
      .withColumn("biz_ok", col("appkey").isin(adAppRegistry.map(_._1): _*)))
    val ipB = broadcast(Etl.ipBlacklist.toDF("appkey", "ip").withColumn("ip_blocked", lit(true)))
    val uaB = broadcast(Etl.uaBlacklist.toDF("appkey", "ua").withColumn("ua_blocked", lit(true)))
    env(t).filter(col("appkey") =!= "")
      .join(company, Seq("appkey"), "left")
      .join(ipB, Seq("appkey", "ip"), "left")
      .join(uaB, Seq("appkey", "ua"), "left")
      .groupBy(col("appkey"),
        when(col("ad_app_id").isNull, "NOT_AD_APP")
          .when(!col("biz_ok"), "BUSINESS_BLOCKED")
          .when(col("ip_blocked"), "IP_BLOCK")
          .when(col("ua_blocked"), "UA_BLOCK")
          .otherwise("OK").as("verdict"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("appkey"), col("verdict"))
  }

  /** Sentinel values third-party ad platforms send instead of real device
    * ids, plus their lowercase MD5s — both excluded from key generation
    * (AdvSaveAppAdDataFlatMapFunction.java:52-63).
    */
  val adIdOriginExclude: Seq[String] = Seq("", "0", "NULL", "null", "(null)")
  val adIdMd5Exclude: Seq[String] = Seq(
    "cfcd208495d565ef66e7dff9f98764da", "6c3e226b4d4795d518ab341b0824ec29",
    "37a6259cc0c1dae299a7866489dff0bd", "d41d8cd98f00b204e9800998ecf8427e",
    "a4d2f177eb466a7d08f8f2b340b77129")

  /** The synthesized raw ad device ids (the adtf payload's muid/oaid with
    * the platforms' sentinel junk) — ONE definition shared by the save
    * (`appAdLatest`), attribute (`attributeEvent`) and ss-match
    * (`ssClickMatch`) legs: the match-key axes of the three legs break
    * silently if any copy drifts, so there are no copies.
    */
  private val muidRawSql =
    """CASE event_id % 13 WHEN 0 THEN '0' WHEN 1 THEN 'NULL' WHEN 2 THEN ''
       WHEN 3 THEN 'cfcd208495d565ef66e7dff9f98764da'
       WHEN 4 THEN md5(concat('m', cast(user_id AS string)))
       ELSE concat('muid-', cast(user_id AS string)) END AS muid_raw"""

  private val oaidRawSql =
    """CASE WHEN event_id % 7 = 0 THEN '(null)'
       ELSE concat('oaid-', cast(user_id AS string)) END AS oaid_raw"""

  /** Device-id normalization for ad match keys
    * (AdvSaveAppAdDataFlatMapFunction.setMuidProcess): sentinels and their
    * MD5s ⇒ no key; 32-char values pass through lowercased; anything else
    * is MD5'd.
    */
  private def normId(c: org.apache.spark.sql.Column) =
    when(c.isin(adIdOriginExclude: _*) || lower(c).isin(adIdMd5Exclude: _*), lit(""))
      .when(length(c) === 32, lower(c))
      .otherwise(md5(c))

  /** adv_app_ad_latest — AdvSaveAppAdDataFlatMapFunction.java:122-313, the
    * landing ad-data save: every adtf click from a REGISTERED advertising
    * app contributes one match key per available device id (muid / oaid,
    * normalized) plus the fuzzy ip+ua key; per key the LATEST click (max
    * click_time, 10-digit second timestamps normalized to ms) wins — the
    * Redis maxCt/data state pair re-expressed as one groupBy-latest. The
    * reference's per-minute MySQL registry poll is the broadcast dim join.
    */
  def appAdLatest(t: Tables): DataFrame =
    appAdLatestUnsorted(t).orderBy(col("match_key"))

  /** The ad state without the presentation orderBy — `attributeEvent`
    * checkpoints this frame and re-joins it by hash, so a range exchange
    * before the checkpoint would be written out and never read.
    */
  private def appAdLatestUnsorted(t: Tables): DataFrame = {
    // the adtf click payload synthesized from click events: raw ids carry
    // the platforms' sentinel junk; click_time mixes second/ms precision
    val clicks = advAdmitted(t)
      .filter(col("event_type") === "click")
      .selectExpr(
        "event_id AS lid", "ad_app_id", "ip", "ua",
        muidRawSql,
        oaidRawSql,
        // 10-digit second timestamps are normalized to ms (java:251-253)
        """CASE WHEN event_id % 2 = 0 THEN (1700000000 + event_id) * 1000
           ELSE 1700000000000 + event_id END AS click_time""")
      .withColumn("ct",
        when(col("click_time") < 10000000000L, col("click_time") * 1000)
          .otherwise(col("click_time")))
    val keys =
      clicks.select(concat(lit("adtfad:"), col("ad_app_id"), lit(":"), normId(col("muid_raw")))
          .as("match_key"), col("lid"), col("ct"),
          normId(col("muid_raw")).as("part"))
        .union(clicks.select(concat(lit("adtfad:"), col("ad_app_id"), lit(":"), normId(col("oaid_raw")))
          .as("match_key"), col("lid"), col("ct"),
          normId(col("oaid_raw")).as("part")))
        .union(clicks.select(concat(lit("adtfad:"), col("ad_app_id"), lit(":"), col("ip"), col("ua"))
          .as("match_key"), col("lid"), col("ct"),
          col("ip").as("part")))
        .filter(col("part") =!= "")
    val latest = Window.partitionBy("match_key").orderBy(col("ct").desc, col("lid").desc)
    keys
      .withColumn("rn", row_number().over(latest)).filter(col("rn") === 1)
      .select(col("match_key"), col("lid"), col("ct"))
  }

  /** adv_attribute_event — the AdvProcessFunction leg: app events from
    * registered advertising apps look up the stored ad state by the SAME
    * match keys the save leg wrote (exact muid first, fuzzy ip+ua second —
    * the reference's key-priority probe) and take that key's latest click.
    * The per-record Redis MGET becomes a join against the `appAdLatest`
    * state frame on match_key — the state is bounded by |ad clicks|, so at
    * scale this is a shuffle join on the key axis, broadcast when the
    * campaign window keeps it small.
    */
  def attributeEvent(t: Tables): DataFrame = {
    // materialize the ad state once: it feeds BOTH key probes below, and an
    // unmaterialized plan would re-run the whole save leg per join branch
    val state = graft.engine.Reliability.planCheckpoint(appAdLatestUnsorted(t))
    // conversion-side events from registered advertising apps, probing with
    // the same synthesized id fields as the save leg
    val probes = advAdmitted(t)
      .filter(col("event_type") === "purchase")
      .selectExpr(
        "event_id", "ad_app_id", "ip", "ua",
        muidRawSql)
      .withColumn("muid", normId(col("muid_raw")))
      .withColumn("muid_key",
        when(col("muid") =!= "",
          concat(lit("adtfad:"), col("ad_app_id"), lit(":"), col("muid"))))
      .withColumn("ipua_key",
        concat(lit("adtfad:"), col("ad_app_id"), lit(":"), col("ip"), col("ua")))
    probes
      .join(state.withColumnsRenamed(Map(
        "match_key" -> "muid_key", "lid" -> "lid_exact", "ct" -> "ct_exact")),
        Seq("muid_key"), "left")
      .join(state.withColumnsRenamed(Map(
        "match_key" -> "ipua_key", "lid" -> "lid_fuzzy", "ct" -> "ct_fuzzy")),
        Seq("ipua_key"), "left")
      .select(
        col("event_id"),
        coalesce(col("lid_exact"), col("lid_fuzzy")).as("matched_lid"),
        when(col("lid_exact").isNotNull, "exact")
          .when(col("lid_fuzzy").isNotNull, "fuzzy")
          .otherwise("none").as("match_type"))
      .orderBy(col("event_id"))
  }

  /** Ad channel name dim (AdvLidAndUserFirstEndFlatMapFunction
    * .getchannelTypeNameStr:585-605): channelType code → platform name,
    * unknown codes → '' (the reference's default branch).
    */
  val adChannelDim: Seq[(String, String)] = Seq(
    "1" -> "百度信息流", "2" -> "巨量引擎", "3" -> "腾讯广告", "4" -> "百度搜索",
    "5" -> "苹果ASA", "9" -> "知乎营销", "10" -> "快手广告", "11" -> "微博-超级粉丝通",
    "12" -> "华为广告", "13" -> "小米营销", "14" -> "VIVO营销平台", "15" -> "OPPO营销平台")

  /** adv_channel_rollup — the first/last-ad-source leg's channel naming
    * (AdvLidAndUserFirstEnd attaches 首次/末次广告来源 user props with the
    * channel NAME, not the code): adtf clicks carry a channelType code;
    * the dim is broadcast config, unknown codes collapse to ''. Per
    * channel: click count + latest click — the rollup the user props are
    * built from.
    */
  def channelRollup(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val dim = broadcast(adChannelDim.toDF("channel_type", "channel_name"))
    advAdmitted(t)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("lid"),
        (col("event_id") % 16).cast("string").as("channel_type"))
      .join(dim, Seq("channel_type"), "left")
      .groupBy(col("channel_type"), coalesce(col("channel_name"), lit("")).as("channel_name"))
      .agg(count(lit(1)).as("n_clicks"), max(col("lid")).as("last_lid"))
      .orderBy(col("channel_type"))
  }

  /** adv_asa_fields — Apple ASA attribution parsing
    * (AdvLidAndUserFirstEndFlatMapFunction.appleASAFeildsMap:929-954 +
    * appleAdDataTransfer:956-1040): iOS clients deliver the ASA payload in
    * two wire formats — the 14.3+ JSON (`{orgId, campaignId, adGroupId,
    * adId|creativeSetId, keywordId}`) and the legacy
    * `iad-org-id=..;iad-campaign-id="..";...` semicolon form, which the
    * reference first converts to the same JSON. Both parse in one codegen
    * pass: `str_to_map` + quote strip for the legacy form, a typed
    * `from_json` for the JSON form; fixed fields lname=苹果ASA, lid=-2,
    * channel_type=5; adId==0 falls back to creativeSetId, absent values
    * surface as "0" (getLongValue's default).
    */
  def asaFields(t: Tables): DataFrame = {
    // synthesized ASA payload per adtf click: %3=0 legacy, %3=1 JSON with
    // adId=0 (creativeSet fallback), %3=2 JSON with a real adId
    val raw = expr(
      """CASE event_id % 3
         WHEN 0 THEN concat('iad-org-id=', cast(user_id AS string),
           ';iad-campaign-id="', cast(event_id % 97 AS string),
           '";iad-adgroup-id=', cast(event_id % 53 AS string),
           ';iad-keyword-id=', cast(event_id % 31 AS string))
         WHEN 1 THEN concat('{"orgId":', cast(user_id AS string),
           ',"campaignId":', cast(event_id % 97 AS string),
           ',"adGroupId":', cast(event_id % 53 AS string),
           ',"adId":0,"creativeSetId":', cast(event_id % 17 AS string),
           ',"keywordId":', cast(event_id % 31 AS string), '}')
         ELSE concat('{"orgId":', cast(user_id AS string),
           ',"campaignId":', cast(event_id % 97 AS string),
           ',"adGroupId":', cast(event_id % 53 AS string),
           ',"adId":', cast(event_id % 17 + 1 AS string),
           ',"keywordId":', cast(event_id % 31 AS string), '}')
         END""")
    def legacyVal(key: String) =
      coalesce(
        expr(s"try_cast(replace(str_to_map(asa_raw, ';', '=')['$key'], '\"', '') AS bigint)"),
        lit(0L))
    val js = expr(
      """from_json(asa_raw,
         'orgId BIGINT, campaignId BIGINT, adGroupId BIGINT, adId BIGINT,
          creativeSetId BIGINT, keywordId BIGINT')""")
    val isLegacy = !col("asa_raw").startsWith("{")
    def pick(legacyKey: String, jsonField: String) =
      when(isLegacy, legacyVal(legacyKey))
        .otherwise(coalesce(col(s"j.$jsonField"), lit(0L))).cast("string")
    advAdmitted(t)
      .filter(col("event_type") === "click")
      .withColumn("asa_raw", raw)
      .withColumn("j", js)
      .select(
        col("event_id"),
        lit("苹果ASA").as("lname"), lit("-2").as("lid"), lit("5").as("channel_type"),
        pick("iad-org-id", "orgId").as("channel_account_id"),
        pick("iad-campaign-id", "campaignId").as("channel_campaign_id"),
        pick("iad-adgroup-id", "adGroupId").as("channel_adgroup_id"),
        when(isLegacy, lit(0L).cast("string"))
          .otherwise(when(coalesce(col("j.adId"), lit(0L)) === 0,
            coalesce(col("j.creativeSetId"), lit(0L)))
            .otherwise(col("j.adId")).cast("string")).as("channel_ad_id"),
        pick("iad-keyword-id", "keywordId").as("channel_keyword_id"))
      .orderBy(col("event_id"))
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

  // ---- ad-audience match conditions (OperatorUtil.compareProValue) ----

  /** The deterministic "now" compareDateValue's relative operator needs
    * (the reference reads System.currentTimeMillis per record;
    * OperatorUtil.java:276) — 2024-02-10T00:00:00Z, just past the
    * synthetic corpus.
    */
  val matchNowMs: Long = 1707523200000L

  /** The ads_link_event condition registry (ads_link.match_json rows, the
    * MySQL table AdvConvertEventFlatMapFunction polls at :513-531) — the
    * SINGLE source for the compiled predicates AND the DuckDB oracle, one
    * rule per operator family so every compareValue branch is exercised:
    * string equal/not-contains/begin-with/regexp/is-not-null, numeric
    * gt/le over a field with injected parse failures, date absolute +
    * relative, and the empty-values null handle.
    */
  val adMatchRules: Seq[graft.functions.MatchRules.MatchRule] = {
    import graft.functions.MatchRules.MatchRule
    Seq(
      MatchRule(1, "purchase", "plan", 1, "equal", Seq("pro")),
      MatchRule(2, "purchase", "plan", 1, "not contains", Seq("o")),
      MatchRule(3, "purchase", "dru", 2, "gt", Seq("1000")),
      MatchRule(4, "click", "cn", 1, "begin with", Seq("huawei")),
      MatchRule(5, "purchase", "ct", 3, "absolute", Seq("2024-01-08", "2024-01-20")),
      MatchRule(6, "click", "ct", 3, "relative", Seq("25")),
      MatchRule(7, "purchase", "vn", 1, "is null", Seq.empty),
      MatchRule(8, "click", "ua", 1, "regexp", Seq("Chrome/1[012][0-9]")),
      MatchRule(9, "purchase", "dru", 2, "le", Seq("2500")),
      MatchRule(10, "click", "plan", 1, "is not null", Seq("x")))
  }

  /** The label -> pr lookup compareProValue does (`_label` custom first,
    * `$label` builtin overriding; OperatorUtil.java:84-92) resolved onto
    * the envelope's pr columns. Labels here never collide across the two
    * prefixes, so the override order is untestable on this corpus (noted,
    * not modeled).
    */
  def matchValue(label: String): org.apache.spark.sql.Column = label match {
    case "plan" => col("pr_plan")                      // pr._plan
    case "cn"   => col("cn")                           // pr.$cn
    case "vn"   => col("vn")                           // pr.$vn
    case "dru"  => col("dru")                          // pr.$dru
    case "cr"   => col("cr")                           // pr.$cr
    case "ua"   => col("ua")                           // pr.$ua
    case "ct"   => col("ts").cast("long").cast("string") // pr.$ct (epoch s)
    case other  => throw new IllegalArgumentException(s"unmapped label: $other")
  }

  /** The per-event-registry-id UTM config (the `utm:<zgEid>` Redis hash
    * AdvAddUtmFlatMapFunction MGETs; java:126-147) — ad-ops configures a
    * UTM block per tracked event; events of that registry id get their
    * five `$utm_*` props OVERWRITTEN. The key carries no app id (global
    * event-registry-id space), mirrored here on the registry's eid.
    */
  val utmConfigRegistry: Seq[(Int, String, String, String, String, String)] = Seq(
    (1, "baidu_sem", "cpc", "q1_launch", "banner_a", "etl tools"),
    (3, "toutiao_feed", "cpm", "brand_2024", "video_b", "spark engine"))

  /** #27f adv_add_utm — AdvAddUtmFlatMapFunction: for admitted evt/abp
    * items with a resolved registry event id, the configured UTM block
    * replaces the event's own `$utm_*` props (the SDK fills those from the
    * landing URL's query params — parsed inline here); events without
    * config keep their own. The config is a broadcast dim; everything
    * else is one scan inside codegen.
    */
  def addUtm(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val cfg = broadcast(utmConfigRegistry
      .toDF("eid", "cfg_source", "cfg_medium", "cfg_campaign", "cfg_content", "cfg_term"))
    def urlParam(p: String) = {
      val v = regexp_extract(col("url"), p + "=([^&#]*)", 1)
      when(col("url").contains(p + "="), v)
    }
    def pick(cfgCol: String, param: String) =
      when(col("hit"), col(cfgCol))
        .otherwise(urlParam(param)).as(param)
    env(t)
      .filter(col("dt").isin("evt", "abp") && col("appkey") =!= "")
      .join(Derive.eventRegistryUnsorted(t).select(col("appkey"),
        col("event_name").as("event_type"), col("eid")),
        Seq("appkey", "event_type"))
      .join(cfg, Seq("eid"), "left")
      .withColumn("hit", col("cfg_source").isNotNull)
      .select(col("event_id"), col("eid"), col("hit").as("utm_hit"),
        pick("cfg_source", "utm_source"),
        pick("cfg_medium", "utm_medium"),
        pick("cfg_campaign", "utm_campaign"),
        pick("cfg_content", "utm_content"),
        pick("cfg_term", "utm_term"))
      .orderBy(col("event_id"))
  }

  /** One configured deep-conversion link (the ads_link_event row:
    * link id, its conversion event set — the reference's `eventIds` CSV —
    * the attribution window, and the optional audience condition;
    * AdvConvertEventFlatMapFunction.java:505-535).
    */
  final case class AdsLink(
      lid: Int, eventIds: Seq[String], windowSec: Long,
      rule: Option[graft.functions.MatchRules.MatchRule])

  /** The configured links — one single-event link WITH an audience
    * condition, one without, and one multi-event (回传事件组) link
    * exercising the completion AND.
    */
  val adsLinkRegistry: Seq[AdsLink] = {
    import graft.functions.MatchRules.MatchRule
    Seq(
      AdsLink(101, Seq("purchase"), 3 * 86400,
        Some(MatchRule(101, "purchase", "dru", 2, "gt", Seq("1000")))),
      AdsLink(102, Seq("signup"), 7 * 86400, None),
      AdsLink(103, Seq("view", "purchase"), 2 * 86400, None))
  }

  /** The click's link id (the lid inside the stored adtf:data message) —
    * synthesized deterministically over the configured links; ONE
    * definition shared by the batch operator and the streaming leg.
    */
  def clickLid: org.apache.spark.sql.Column = {
    val lids = adsLinkRegistry.map(_.lid)
    lids.zipWithIndex.foldRight(lit(lids.head)) { case ((lid, i), other) =>
      when(pmod(col("event_id"), lit(lids.size)) === i, lid).otherwise(other)
    }
  }

  /** A link's compiled audience flag (TRUE for empty match_json — the
    * reference's `flag = true` else-branch); shared batch/stream.
    */
  def linkFlag(l: AdsLink): org.apache.spark.sql.Column = {
    import graft.functions.MatchRules
    l.rule.map(r => MatchRules.condition(matchValue(r.label), r, matchNowMs))
      .getOrElse(lit(true))
  }

  /** #27e adv_deep_convert — the deep-conversion callback decision
    * (AdvConvertEventFlatMapFunction.java:180-300): a conversion fires for
    * ad link L iff
    *   1. the converting user's LAST ad click (the adtf:ct/adtf:data Redis
    *      state) is at or before the event and within L's windowTime —
    *      here an as-of join: clicks and conversions union once, ONE
    *      (ad_app_id, zgid) window carries the latest click's (ct, lid)
    *      forward;
    *   2. the event is in L's configured event set (the lidConvertKey
    *      probe) and L's match_json audience condition holds (compiled
    *      via MatchRules);
    *   3. for multi-event links every event id in the set has a LIVE
    *      status key (adtf:convert:zgEid:lid, TTL = windowTime) — the
    *      reference's status key carries NO user id, so completion is
    *      corpus-global per link; re-expressed as running per-event max-ct
    *      over ONE lid-partitioned window with the TTL as an age bound;
    *   4. only the FIRST such conversion per (event, link, user) is sent
    *      (the ads_frequency_first table).
    *
    * Sequential-state note (documented divergence): in the reference a
    * frequency-blocked repeat conversion skips the status write; this
    * batch form lets every qualifying row refresh the global status, so a
    * repeat conversion can keep a link's completion window alive where
    * the stream would have let it lapse — observable only in the
    * cross-user TTL race the global key design already embodies.
    *
    * Scale note: the lid-partitioned completion window serializes each
    * link's qualifying conversions into one partition — inherent to the
    * reference's corpus-global status key, bounded by |qualifying
    * conversions per link|, and only computed AFTER the window+match
    * filters have cut the corpus down.
    */
  def deepConvert(t: Tables): DataFrame = {
    import graft.functions.MatchRules
    val (_, uz, dz) = Identity.zgidAxes(t)
    val base = advAdmitted(t)
      .filter(col("dt") === "evt")
      .join(uz, Seq("appkey", "cuid"), "left")
      .join(dz, Seq("appkey", "did"), "left")
      .withColumn("zgid",
        when(col("cuid").isNotNull, col("u_zgid"))
          .when(col("did") =!= "", col("d_zgid")))
      .filter(col("zgid").isNotNull)
      .withColumn("ct", unix_timestamp(col("ts")) * 1000)

    // ONE pass over the identity-resolved frame: a kind flag splits the
    // click and conversion roles column-wise instead of a union, so the
    // uz/dz identity joins appear once in the plan, not per branch
    val lidOfClick = clickLid
    val convEvents = adsLinkRegistry.flatMap(_.eventIds).distinct
    val withClick = base
      .filter(col("event_type").isin("click" +: convEvents: _*))
      .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
      .select(Seq(col("ad_app_id"), col("zgid"), col("ct"), col("kind"),
        col("event_id"),
        when(col("kind") === 0, lidOfClick).as("lid"),
        when(col("kind") === 1, col("event_type")).as("event_name")) ++
        adsLinkRegistry.map(l =>
          (col("kind") === 1 && linkFlag(l)).as(s"m_${l.lid}")): _*)
      .transform { u =>
        val wAsof = Window.partitionBy("ad_app_id", "zgid")
          .orderBy("ct", "kind", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("click_ct",
            last(when(col("kind") === 0, col("ct")), ignoreNulls = true).over(wAsof))
          .withColumn("click_lid",
            last(when(col("kind") === 0, col("lid")), ignoreNulls = true).over(wAsof))
      }

    // qualifying rows: configured event + window + audience, per the
    // click's link
    val qualify = adsLinkRegistry.foldRight(lit(false)) { case (l, other) =>
      when(col("click_lid") === l.lid,
        col("event_name").isin(l.eventIds: _*) &&
          col("ct") >= col("click_ct") &&
          (col("ct") - col("click_ct")) <= l.windowSec * 1000L &&
          col(s"m_${l.lid}")).otherwise(other)
    }
    val q = withClick
      .filter(col("kind") === 1 && col("click_ct").isNotNull && qualify)
      .select(col("event_id"), col("click_lid").as("lid"), col("event_name"),
        col("zgid"), col("ct"), col("click_ct"))

    // completion: running per-event last-ct over the link's global axis
    val wLid = Window.partitionBy("lid").orderBy("ct", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLast = convEvents.foldLeft(q) { (df, e) =>
      df.withColumn(s"last_$e",
        max(when(col("event_name") === e, col("ct"))).over(wLid))
    }
    val complete = adsLinkRegistry.foldRight(lit(false)) { case (l, other) =>
      when(col("lid") === l.lid,
        l.eventIds.map(e =>
          col(s"last_$e").isNotNull &&
            (col("ct") - col(s"last_$e")) <= l.windowSec * 1000L)
          .reduce(_ && _)).otherwise(other)
    }
    val wFirst = Window.partitionBy("event_name", "lid", "zgid")
      .orderBy("ct", "event_id")
    withLast.filter(complete)
      .withColumn("rn", row_number().over(wFirst)).filter(col("rn") === 1)
      .select(col("event_id"), col("lid"), col("event_name"), col("zgid"),
        col("ct").as("conv_ct"), col("click_ct"))
      .orderBy(col("event_id"))
  }

  /** #27d adv_convert_match — the audience-condition leg of
    * AdvConvertEventFlatMapFunction (java:226-236): each registered-app
    * conversion event is tested against every ads_link rule for its event
    * name via OperatorUtil.compareProValue, and per link the match volume
    * is reported. The config-sized rule set compiles to literal Catalyst
    * predicates (regexes compiled at plan time, all branches inside
    * whole-stage codegen); ONE event scan computes every rule's flag, an
    * explode of the R-element struct array fans out to (rule x event) and
    * map-side partial aggregation collapses it — at 100 TB the shuffle
    * carries R x |links| partial rows, not events.
    */
  def convertMatch(t: Tables): DataFrame = {
    import graft.functions.MatchRules
    val e = advAdmitted(t).filter(col("dt") === "evt")
    val cells = adMatchRules.map { r =>
      struct(
        lit(r.linkId).as("link_id"),
        lit(r.eventType).as("event_name"),
        (col("event_type") === r.eventType).as("admitted"),
        (col("event_type") === r.eventType &&
          MatchRules.condition(matchValue(r.label), r, matchNowMs)).as("matched"))
    }
    e.select(col("user_id"), explode(array(cells: _*)).as("c"))
      .groupBy(col("c.link_id").as("link_id"), col("c.event_name").as("event_name"))
      .agg(
        sum(when(col("c.admitted"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("c.matched"), 1L).otherwise(0L)).as("n_matched"),
        count_distinct(when(col("c.matched"), col("user_id"))).as("n_users"))
      .orderBy(col("link_id"))
  }

  /** The synthesized ad-touch fields of one click row — the landing URL's
    * parsed param block (lid, lname, channel_type + the five channel ids;
    * ToolUtil.urlParseToMap over $landing_url in
    * AdvLidAndUserFirstEndFlatMapFunction.processWebAndAppleASA:785-787).
    * Zeros/empties appear on purpose: the prop-attach rules gate on them.
    * ONE definition shared by the event-attach leg, the user rollup and
    * (via the mirrored SQL in SparkEntry) the DuckDB oracles.
    */
  private[graft] def touchStruct = struct(
    col("event_id").as("lid"),
    concat(lit("link-"), col("event_id")).as("lname"),
    when(pmod(col("event_id"), lit(16)) === 0, lit(""))
      .otherwise(pmod(col("event_id"), lit(16)).cast("string")).as("ctype"),
    when(pmod(col("event_id"), lit(5)) === 0, lit(""))
      .otherwise(concat(lit("acct-"), pmod(col("event_id"), lit(50)))).as("acct"),
    pmod(col("event_id"), lit(100)).as("camp"),
    pmod(col("event_id"), lit(37)).as("adg"),
    pmod(col("event_id"), lit(23)).as("adid"),
    pmod(col("event_id"), lit(11)).as("kw"))

  /** adv_lid_user_first_end — the EVENT-PROP attach of
    * AdvLidAndUserFirstEndFlatMapFunction (java:166-475): every evt from
    * an ad-registered app reads the user's (appId, zgid) ad state — maxCt
    * plus the latest touch's ad detail — and, when the event is at or
    * after that touch (ct >= maxCt, java:668), carries
    *   - _广告分析链接ID = the latest touch's lid,
    *   - _广告渠道ID/名称 only when channel_type is non-empty (java:540-543),
    *   - _广告账号ID = channelType$accountId when the account is non-empty,
    *   - 计划/组/创意/关键词 ids as channelType$id only when ≠ 0
    *     (java:545-473 — getLongValue's 0 default means "absent"),
    * plus the first/follow ad-source pair the user props carry (the stored
    * "firstLid,firstLname::folLid,folLname" string, java:299-306: the
    * first part never changes; the second is the latest touch IFF its
    * "lid,lname" differs from the first).
    *
    * Batch re-expression: the Redis state read IS the as-of state of the
    * touch stream in event-time order — ONE kind-flagged window over
    * (ad_app_id, zgid) carries the latest and the running-first touch
    * forward (same rewrite as `deepConvert`; the reference's ct >= maxCt
    * guard is exactly what as-of ordering guarantees). Clicks are the
    * touch writers; every other evt row is a receiver. Absent props
    * surface as the \N sentinel, lid as -1.
    *
    * Cost shape at 100 TB: the identity joins ride the key axes, the
    * window is one (ad_app_id, zgid) exchange, the channel dim is a
    * literal CASE — no second event-axis pass, no self-join.
    */
  def lidUserFirstEnd(t: Tables): DataFrame = {
    val n = lit("\\N")
    val (_, uz, dz) = Identity.zgidAxes(t)
    val base = advAdmitted(t)
      .filter(col("dt") === "evt")
      .join(uz, Seq("appkey", "cuid"), "left")
      .join(dz, Seq("appkey", "did"), "left")
      .withColumn("zgid",
        when(col("cuid").isNotNull, col("u_zgid"))
          .when(col("did") =!= "", col("d_zgid")))
      .filter(col("zgid").isNotNull)
      .withColumn("ct", unix_timestamp(col("ts")) * 1000)
      .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
      .withColumn("touch", when(col("kind") === 0, touchStruct))
    val wAsof = Window.partitionBy("ad_app_id", "zgid")
      .orderBy("ct", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = base
      .withColumn("lastT", last(col("touch"), ignoreNulls = true).over(wAsof))
      .withColumn("firstT", first(col("touch"), ignoreNulls = true).over(wAsof))
      .filter(col("kind") === 1)
    val ctype = col("lastT.ctype")
    val channelName = adChannelDim.foldRight(lit("")) { case ((code, name), other) =>
      when(ctype === code, name).otherwise(other)
    }
    def idProp(c: org.apache.spark.sql.Column) =
      when(col("lastT").isNotNull && c =!= 0, concat(ctype, lit("$"), c)).otherwise(n)
    val tKey = concat(col("lastT.lid"), lit(","), col("lastT.lname"))
    val fKey = concat(col("firstT.lid"), lit(","), col("firstT.lname"))
    st.select(
      col("event_id"),
      coalesce(col("lastT.lid"), lit(-1L)).as("lid"),
      when(col("lastT").isNotNull && ctype =!= "", ctype).otherwise(n).as("channel_type"),
      when(col("lastT").isNotNull && ctype =!= "", channelName).otherwise(n).as("channel_name"),
      when(col("lastT").isNotNull && col("lastT.acct") =!= "",
        concat(ctype, lit("$"), col("lastT.acct"))).otherwise(n).as("account_id"),
      idProp(col("lastT.camp")).as("campaign_id"),
      idProp(col("lastT.adg")).as("adgroup_id"),
      idProp(col("lastT.adid")).as("ad_id"),
      idProp(col("lastT.kw")).as("keyword_id"),
      coalesce(col("firstT.lid"), lit(-1L)).as("first_lid"),
      coalesce(col("firstT.lname"), n).as("first_ad_source"),
      when(col("lastT").isNotNull && tKey =!= fKey, col("lastT.lid"))
        .otherwise(lit(-1L)).as("fol_lid"),
      when(col("lastT").isNotNull && tKey =!= fKey, col("lastT.lname"))
        .otherwise(n).as("fol_ad_source"))
      .orderBy(col("event_id"))
  }

  /** adv_user_ad_source — the USER-PROP side of the same operator: the
    * final per-(ad_app_id, zgid) first/follow ad-source state (the
    * _首次广告来源 / _末次广告来源 pair the reference writes into usr items,
    * java:497-510). First = min (ct, event_id) touch, latest = max; the
    * follow pair exists only when the latest touch's "lid,lname" differs
    * from the first (java:299-306). One map-side-combined min_by/max_by
    * groupBy on the (app, zgid) key — the same shape as `Dw.joinRowsOf`.
    */
  def userAdSource(t: Tables): DataFrame = {
    val n = lit("\\N")
    val (_, uz, dz) = Identity.zgidAxes(t)
    val ord = struct(col("ct"), col("event_id"))
    val touches = advAdmitted(t)
      .filter(col("dt") === "evt" && col("event_type") === "click")
      .join(uz, Seq("appkey", "cuid"), "left")
      .join(dz, Seq("appkey", "did"), "left")
      .withColumn("zgid",
        when(col("cuid").isNotNull, col("u_zgid"))
          .when(col("did") =!= "", col("d_zgid")))
      .filter(col("zgid").isNotNull)
      .withColumn("ct", unix_timestamp(col("ts")) * 1000)
      .withColumn("touch", touchStruct)
    touches
      .groupBy(col("ad_app_id"), col("zgid"))
      .agg(
        min_by(col("touch"), ord).as("firstT"),
        max_by(col("touch"), ord).as("lastT"),
        count(lit(1)).as("n_touches"))
      .select(
        col("ad_app_id"), col("zgid"),
        col("firstT.lid").as("first_lid"),
        col("firstT.lname").as("first_ad_source"),
        when(concat(col("lastT.lid"), lit(","), col("lastT.lname")) =!=
            concat(col("firstT.lid"), lit(","), col("firstT.lname")),
          col("lastT.lid")).otherwise(lit(-1L)).as("fol_lid"),
        when(concat(col("lastT.lid"), lit(","), col("lastT.lname")) =!=
            concat(col("firstT.lid"), lit(","), col("firstT.lname")),
          col("lastT.lname")).otherwise(n).as("fol_ad_source"),
        col("n_touches"))
      .orderBy(col("ad_app_id"), col("zgid"))
  }

  /** adv_ss_click_match — processAppSS
    * (AdvLidAndUserFirstEndFlatMapFunction.java:1044-1247), the app-side
    * install-attribution bridge: a session-start from an ad-registered app
    * probes the stored app-click state by device id in PRIORITY order
    * (iOS: idfa; Android: oaid > android_id > imei — collapsed here onto
    * the corpus's muid/oaid axes), falling back to the fuzzy ip+ua key
    * only when no exact id hits; the matched click is then promoted into
    * the user's (appId, zgid) ad state and its keys are DELETED, so every
    * click attributes at most one session-start.
    *
    * Deterministic batch re-expression: the state is `appAdLatest` (the
    * save leg's latest-click-per-key store); each ss takes its
    * highest-priority live key hit; the one-shot delete becomes
    * first-ss-per-click (min (ct, event_id) over the matched lid) — later
    * ss of a consumed click emit no match. Documented divergence: the
    * reference's delete lets a later ss fall through to its
    * NEXT-priority key in a fresh probe; the batch form ranks once, so a
    * losing ss emits 'none' instead of re-probing — observable only when
    * one device carries two different live clicks under different key
    * axes.
    *
    * Cost shape: three hash joins against the checkpointed state (each on
    * the key axis) + one window over matched clicks — partitioned by lid
    * for matches and by a per-row key for non-matches, so the null axis
    * never concentrates.
    */
  def ssClickMatch(t: Tables): DataFrame = {
    val state = graft.engine.Reliability.planCheckpoint(appAdLatestUnsorted(t))
    def keyed(axis: String) = state.select(
      col("match_key").as(s"${axis}_key"),
      col("lid").as(s"lid_$axis"), col("ct").as(s"ct_$axis"))
    val probes = advAdmitted(t)
      .filter(col("dt") === "ss")
      .selectExpr(
        "event_id", "ad_app_id", "ip", "ua", "ts",
        muidRawSql,
        oaidRawSql)
      .withColumn("ct", unix_timestamp(col("ts")) * 1000)
      .withColumn("muid", normId(col("muid_raw")))
      .withColumn("oaid", normId(col("oaid_raw")))
      .withColumn("muid_key", when(col("muid") =!= "",
        concat(lit("adtfad:"), col("ad_app_id"), lit(":"), col("muid"))))
      .withColumn("oaid_key", when(col("oaid") =!= "",
        concat(lit("adtfad:"), col("ad_app_id"), lit(":"), col("oaid"))))
      .withColumn("ipua_key",
        concat(lit("adtfad:"), col("ad_app_id"), lit(":"), col("ip"), col("ua")))
    val hit = probes
      .join(keyed("muid"), Seq("muid_key"), "left")
      .join(keyed("oaid"), Seq("oaid_key"), "left")
      .join(keyed("ipua"), Seq("ipua_key"), "left")
      .withColumn("m_lid", coalesce(col("lid_muid"), col("lid_oaid"), col("lid_ipua")))
      .withColumn("m_ct", coalesce(
        when(col("lid_muid").isNotNull, col("ct_muid")),
        when(col("lid_oaid").isNotNull, col("ct_oaid")),
        col("ct_ipua")))
      .withColumn("m_axis",
        when(col("lid_muid").isNotNull, "muid")
          .when(col("lid_oaid").isNotNull, "oaid")
          .when(col("lid_ipua").isNotNull, "ipua"))
    // one-shot consumption: the click goes to its FIRST matching ss;
    // unmatched rows get a per-row partition key so no null-key skew
    val wClick = Window
      .partitionBy(coalesce(col("m_lid"), -col("event_id")))
      .orderBy(col("ct"), col("event_id"))
    hit
      .withColumn("rn", row_number().over(wClick))
      .select(
        col("event_id"),
        when(col("m_lid").isNotNull && col("rn") === 1, col("m_lid"))
          .otherwise(lit(-1L)).as("matched_lid"),
        when(col("m_lid").isNotNull && col("rn") === 1, col("m_ct"))
          .otherwise(lit(-1L)).as("click_ct"),
        when(col("m_lid").isNotNull && col("rn") === 1, col("m_axis"))
          .otherwise(lit("none")).as("match_axis"))
      .orderBy(col("event_id"))
  }
}
