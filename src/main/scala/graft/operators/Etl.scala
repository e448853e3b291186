package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest / validation / envelope operators (SURVEY.md §2.1, rows 1-4).
  *
  * Each is the Spark-first re-expression of one IdJob step: per-record Java
  * map functions become pure column expressions (zero shuffle, whole-stage
  * codegen), and the per-record MySQL/Redis config lookups become broadcast
  * dim joins. Aggregated outputs shuffle once on low-cardinality keys.
  */
object Etl {

  /** Error codes pinned from ErrorMessageEnum.java (reference file
    * etl-flink-pipeline/.../enums/ErrorMessageEnum.java:15-36).
    */
  object Err {
    val BasicSchemaFormatNotMatch = 1020002 // BASIC_SCHEMA_FORMAT_NOT_MATCH
    val AkNone                    = 1010006 // AK_NONE
    val DidNone                   = 1020004 // DID_NONE
    val IpBlock                   = 1010001 // IP_BLOCK
    val UaBlock                   = 1010002 // UA_BLOCK
    val JsonFormatError           = 1020001 // JSON_FORMAT_ERROR
  }

  /** Per-app gate blacklists (GateFlatMapFunction.java:46-58: the
    * data_access_filter config — exact-match ip and ua sets per app, plus a
    * global blocked-ak list whose messages are dropped outright).
    */
  val ipBlacklist: Seq[(String, String)] = Seq(
    ("app0", "10.1.2.3"),
    ("app1", "192.168.0.5"),
    ("app2", "203.0.2.17"))
  val uaBlacklist: Seq[(String, String)] = Seq(
    ("app1", "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0"))
  val akBlacklist: Seq[String] = Seq("app_blocked")

  /** gate_blacklist — GateFlatMapFunction.java:155-213: blocked ak ⇒ message
    * dropped; ip in the app's blacklist ⇒ IP_BLOCK; else ua in the app's
    * blacklist ⇒ UA_BLOCK; else pass. Blacklists are config-sized ⇒ two
    * broadcast left joins; output is the gate verdict histogram per app.
    */
  def gateBlacklist(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val ipB = broadcast(ipBlacklist.toDF("appkey", "ip").withColumn("ip_blocked", lit(true)))
    val uaB = broadcast(uaBlacklist.toDF("appkey", "ua").withColumn("ua_blocked", lit(true)))
    env(t)
      .filter(!col("appkey").isin(akBlacklist: _*))
      .join(ipB, Seq("appkey", "ip"), "left")
      .join(uaB, Seq("appkey", "ua"), "left")
      .groupBy(
        col("appkey"),
        when(col("ip_blocked"), lit(Err.IpBlock))
          .when(col("ua_blocked"), lit(Err.UaBlock))
          .otherwise(lit(0)).as("error_code"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("appkey"), col("error_code"))
  }

  private def env(t: Tables): DataFrame = Envelope.attach(t.events)

  /** #1 etl_owner_normalize — CheckJsonAndOwnerOperator.java:38-56: the
    * owner whitelist {zg_adp, zg_mkt, zg_cdp} passes through, everything
    * else collapses to 'zg'. Output = mapping histogram (one narrow groupBy).
    */
  def ownerNormalize(t: Tables): DataFrame =
    env(t)
      .withColumn(
        "owner",
        when(col("owner_raw").isin("zg_adp", "zg_mkt", "zg_cdp"), col("owner_raw"))
          .otherwise(lit("zg")))
      .groupBy(col("owner_raw"), col("owner"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("owner_raw"))

  /** #2 etl_json_validate — CheckJsonAndOwnerOperator.java:24-36: JSON parse
    * failure ⇒ result=-1 + BASIC_SCHEMA_FORMAT_NOT_MATCH. Here the payload is
    * `raw_props` (occasionally truncated by the envelope); validity is
    * PARSE-based — `try_parse_json` yields NULL exactly when the payload is
    * unparseable — matching the reference's parseObject try/catch and the
    * oracle's json_valid(), independent of which keys the payload carries
    * (the old `get_json_object(..., '$.k')` probe silently depended on the
    * synthesized payloads always containing "k").
    */
  def jsonValidate(t: Tables): DataFrame = {
    val valid = try_parse_json(col("raw_props")).isNotNull
    env(t).select(
      col("event_id"),
      when(valid, lit(0)).otherwise(lit(-1)).as("result"),
      when(valid, lit(null).cast("int"))
        .otherwise(lit(Err.BasicSchemaFormatNotMatch)).as("error_code")
    ).orderBy(col("event_id"))
  }

  /** The basicSchema.json validation matrix, applied to a PARSED message:
    * each entry is (error tag, SQL predicate over the probe columns below).
    * Mirrors CheckJSONSchemaUtil.checkBasic field-for-field: every root
    * `required` member, debug integer type, pl enum, usr.did minLength 1 /
    * maxLength 100, data[0] pr presence, pr.$sid / pr.$ct number types.
    * Presence checks that the synthesized corpus never violates (ak, sln,
    * owner, sdk, usr, ip, ua, data[0].dt) are still evaluated — the matrix
    * is the contract, the corpus only samples it.
    */
  val schemaMatrix: Seq[(String, String)] = Seq(
    "DATA_NONE"    -> "j_data IS NULL",
    "DATA_DT_NONE" -> "j_data IS NOT NULL AND j_dt0 IS NULL",
    "DATA_PR_NONE" -> "j_data IS NOT NULL AND j_pr IS NULL",
    "SID_TYPE"     -> "j_sid IS NOT NULL AND try_cast(j_sid AS DOUBLE) IS NULL",
    "CT_TYPE"      -> "j_ct IS NOT NULL AND try_cast(j_ct AS DOUBLE) IS NULL",
    "TZ_NONE"      -> "j_tz IS NULL",
    "AK_NONE"      -> "j_ak IS NULL",
    "DEBUG_NONE"   -> "j_debug IS NULL",
    "DEBUG_TYPE"   -> "j_debug IS NOT NULL AND try_cast(j_debug AS BIGINT) IS NULL",
    "SLN_NONE"     -> "j_sln IS NULL",
    "OWNER_NONE"   -> "j_owner IS NULL",
    "PL_ENUM"      -> ("j_pl IS NULL OR j_pl NOT IN " +
      "('none','and','ios','js','wxa','server','harmonyos')"),
    "SDK_NONE"     -> "j_sdk IS NULL",
    "SDKV_NONE"    -> "j_sdkv IS NULL",
    "USR_NONE"     -> "j_usr IS NULL",
    "DID_NONE"     -> "j_did IS NULL OR length(j_did) < 1",
    "DID_LEN"      -> "j_did IS NOT NULL AND length(j_did) > 100",
    "UT_NONE"      -> "j_ut IS NULL",
    "IP_NONE"      -> "j_ip IS NULL",
    "UA_NONE"      -> "j_ua IS NULL")

  /** #3 etl_schema_check — the FULL basicSchema.json field/type matrix
    * (CheckJSONSchemaUtil.checkBasic) over the complete synthesized wire
    * message: unparseable ⇒ the format error alone (the reference's
    * JSONException catch); otherwise every matrix violation collects into
    * a comma-joined error list (the ValidationException message list).
    */
  def schemaCheck(t: Tables): DataFrame =
    withSchemaErrors(env(t))
      .select(
        col("event_id"),
        when(col("schema_errors") =!= "", lit(-1)).otherwise(lit(0)).as("result"),
        col("schema_errors").as("errors"))
      .orderBy(col("event_id"))

  /** The schema validation as ADDED columns (`okj`, `schema_errors`) on an
    * envelope frame — shared by schemaCheck and the unified DQ chain, so
    * the matrix evaluates exactly once per consumer plan.
    */
  private[operators] def withSchemaErrors(e: DataFrame): DataFrame = {
    val probed = e
      .withColumn("okj", expr("try_parse_json(msg) IS NOT NULL"))
      // ONE typed parse serves every probe column — per-field
      // get_json_object calls would each re-parse the multi-KB message
      .withColumn("m", expr(
        "from_json(msg, 'data ARRAY<STRUCT<dt STRING, pr STRUCT<`$sid` STRING, `$ct` STRING>>>, " +
          "tz STRING, ak STRING, debug STRING, sln STRING, owner STRING, pl STRING, " +
          "sdk STRING, sdkv STRING, usr STRUCT<did STRING>, ut STRING, ip STRING, ua STRING')"))
      .withColumns(Map(
        "j_data" -> expr("to_json(m.data)"),
        "j_dt0"  -> expr("m.data[0].dt"),
        "j_pr"   -> expr("to_json(m.data[0].pr)"),
        "j_sid"  -> expr("m.data[0].pr.`$sid`"),
        "j_ct"   -> expr("m.data[0].pr.`$ct`"),
        "j_tz"   -> expr("m.tz"), "j_ak" -> expr("m.ak"),
        "j_debug" -> expr("m.debug"), "j_sln" -> expr("m.sln"),
        "j_owner" -> expr("m.owner"), "j_pl" -> expr("m.pl"),
        "j_sdk"  -> expr("m.sdk"), "j_sdkv" -> expr("m.sdkv"),
        "j_usr"  -> expr("to_json(m.usr)"), "j_did" -> expr("m.usr.did"),
        "j_ut"   -> expr("m.ut"), "j_ip" -> expr("m.ip"), "j_ua" -> expr("m.ua")))
    val errorList = concat_ws(",",
      schemaMatrix.map { case (tag, pred) => expr(s"CASE WHEN $pred THEN '$tag' END") }: _*)
    probed.withColumn("schema_errors",
      when(!col("okj"), lit("BASIC_SCHEMA_FORMAT_NOT_MATCH")).otherwise(errorList))
  }

  /** #4 etl_appid_business — SetAppIdAndBusinessOperator.java: the app
    * registry (MySQL config cache in the reference) is a tiny dim ⇒
    * broadcast left join; unregistered ak ⇒ AK_NONE. Output = per-app
    * histogram so the oracle check covers the full join result.
    */
  def appIdBusiness(t: Tables): DataFrame =
    env(t)
      .join(broadcast(Envelope.appRegistryDf(t.spark)), Seq("appkey"), "left")
      .groupBy(
        col("appkey"),
        col("app_id"),
        col("business"),
        when(col("app_id").isNull, lit(Err.AkNone)).cast("int").as("error_code"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("appkey"))

  /** etl_ts_choose — Dims.timestamp + Dims.newSessionId
    * (common/util/Dims.java:132-150): the server-vs-client timestamp
    * choice (the JS SDK, code 3, trusts the SERVER receive time; native
    * SDKs keep the client event time) and the session-id suffixing rule
    * (session id + the device id formatted to exactly 9 digits —
    * NumberFormat with min=max=9 integer digits, which zero-PADS short ids
    * and TRUNCATES the high-order digits of ids ≥ 1e9, i.e. keeps the last
    * nine: lpad(id mod 1e9)). Synthesized sdk codes / server offsets /
    * device ids cycle from event_id so every branch runs; pure column
    * expressions, zero shuffle.
    */
  def tsChoose(t: Tables): DataFrame = {
    val id = col("event_id")
    val sdkCode = pmod(id, lit(4)) + 1 // 1,2,3,4 — 3 is the JS sdk
    val clientTs = unix_timestamp(col("ts"))
    val serverTs = clientTs + pmod(id, lit(120)) // receive lag
    t.events.select(id, col("ts"))
      .select(
        id,
        sdkCode.cast("int").as("sdk_code"),
        when(sdkCode === 3, serverTs).otherwise(clientTs).as("chosen_ts"),
        concat(lit("s"), pmod(id, lit(100)).cast("string"),
          lpad(pmod(id, lit(1000000000L)).cast("string"), 9, "0")).as("session_id"))
      .orderBy(id)
  }

  /** etl_date_parse — ToolUtil.dateUsStrToTimestamp (ToolUtil.java:45-70),
    * the ASA attribution timestamp parser: strings longer than 17 chars
    * parse as second-precision `yyyy-MM-dd'T'HH:mm:ss'Z'`, shorter ones as
    * minute-precision `yyyy-MM-dd'T'HH:mm'Z'`, both UTC; empty, blank or
    * malformed input yields 0 (the catch clause) — never an error. Output
    * is epoch MILLIS like the reference.
    */
  def dateParse(t: Tables): DataFrame = {
    val id = col("event_id")
    val raw = when(pmod(id, lit(4)) === 0,
        concat(lit("2023-01-0"), (pmod(id, lit(9)) + 1).cast("string"),
          lit("T08:11:2"), pmod(id, lit(6)).cast("string"), lit("Z")))
      .when(pmod(id, lit(4)) === 1,
        concat(lit("2023-01-0"), (pmod(id, lit(9)) + 1).cast("string"),
          lit("T08:1"), pmod(id, lit(6)).cast("string"), lit("Z")))
      .when(pmod(id, lit(4)) === 2, lit(""))
      .otherwise(lit("04/01/2023 08:11"))
    val sec = expr("try_to_timestamp(date_raw, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")")
    val min = expr("try_to_timestamp(date_raw, \"yyyy-MM-dd'T'HH:mm'Z'\")")
    t.events.select(id, raw.as("date_raw"))
      .select(id, col("date_raw"),
        coalesce(
          unix_millis(when(length(col("date_raw")) > 17, sec).otherwise(min)),
          lit(0L)).as("ts_millis"))
      .orderBy(id)
  }

  /** etl_sdkv_compare — Dims.compareVersion + getSdkV
    * (common/util/Dims.java:101-123): element-wise dotted-version
    * comparison with the reference's EXACT loop semantics — iterate over
    * the LEFT version's segments only; if the right runs out first the
    * left wins (+1); the first differing segment decides; equal through
    * the left's length is 0 EVEN IF the right has more segments (the
    * asymmetric quirk: v1.1 vs v1.1.2 compares 0). getSdkV is the numeric
    * value of the text after the 'v' (0.0 when it doesn't parse — more
    * than one dot).
    *
    * The fold is a per-row `aggregate` over the left's indices carrying
    * the first non-zero decision; the oracle reproduces it as a per-index
    * decision list and takes the first non-zero by index. Pure column
    * expressions, zero shuffle.
    */
  def sdkvCompare(t: Tables): DataFrame = {
    val id = col("event_id")
    // even ids: two-segment left versions (v1.X) — these hit the quirk
    // (v1.0 vs v1.0.7 -> 0) and produce a parseable getSdkV number;
    // odd ids: three segments, exercising every decision branch
    val a = when(pmod(id, lit(2)) === 0,
        concat(lit("v1."), pmod(id, lit(3)).cast("string")))
      .otherwise(concat(lit("v1."), pmod(id, lit(3)).cast("string"),
        lit("."), pmod(id, lit(5)).cast("string")))
    val b = when(pmod(id, lit(3)) === 0, lit("v1.0.7"))
      .when(pmod(id, lit(3)) === 1, lit("v1.1"))
      .otherwise(lit("v1.1.2.9"))
    val cmp = expr(
      """aggregate(sequence(0, size(av) - 1), 0,
           (acc, i) -> IF(acc <> 0, acc,
             IF(i >= size(bv), 1,
               IF(cast(av[i] AS int) > cast(bv[i] AS int), 1,
                 IF(cast(av[i] AS int) < cast(bv[i] AS int), -1, 0)))))""")
    t.events
      .select(id, a.as("sdkv_a"), b.as("sdkv_b"))
      .withColumn("av", split(regexp_replace(col("sdkv_a"), "v", ""), "\\."))
      .withColumn("bv", split(regexp_replace(col("sdkv_b"), "v", ""), "\\."))
      .select(id, col("sdkv_a"), col("sdkv_b"),
        cmp.cast("int").as("cmp"),
        coalesce(expr("try_cast(substring(sdkv_a, 2) AS double)"), lit(0.0))
          .as("sdkv_num"))
      .orderBy(id)
  }
}
