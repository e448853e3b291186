package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthesized zg-etl message envelope over the `events` table.
  *
  * The reference consumes a JSON envelope `{owner, ak, pl, sdk, ua, ip,
  * usr:{did,cuid}, data:[{dt, pr}]}` from Kafka (SURVEY.md §1). The driver's
  * testdata has no such stream, so — per SURVEY.md §4 — we derive the
  * envelope fields deterministically from existing `events` columns, with
  * ONE set of SQL snippets that is valid in BOTH Spark SQL and DuckDB.
  * `attach` applies them via `selectExpr`; `oracleRaw` embeds the exact same
  * strings into each oracle query's `WITH raw AS (...)` prelude, so the
  * Spark plan and the oracle can never drift apart.
  *
  * Every snippet is a pure column expression: at 100 TB this is zero-shuffle,
  * fully whole-stage-codegen'd work fused into the parquet scan.
  */
object Envelope {

  /** The synthesized UA corpus (index = event_id % 10): public real-world
    * agent strings covering the reference UA parser's matrix — os families
    * (Windows/Mac/iOS/Android/Linux), desktop + CN-mobile browsers
    * (Chrome/Safari/Firefox/Edge/Opera/MicroMessenger/UCBrowser/QQBrowser),
    * device types (Desktop/Mobile/Tablet) and Android vendor brands.
    */
  val uaSet: Seq[String] = Seq(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.109 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/15E148 MicroMessenger/8.0.47",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    "Mozilla/5.0 (Linux; Android 12; HUAWEI Mate 40) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/118.0.0.0 Mobile Safari/537.36",
    "Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (Linux; U; Android 11; zh-CN; Redmi Note 9 Build/RP1A.200720.011) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/78.0.3904.108 UCBrowser/15.5.8.1258 Mobile Safari/537.36",
    "Mozilla/5.0 (Linux; Android 13; SAMSUNG SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/110.0.5481.154 Mobile Safari/537.36 MQQBrowser/14.2",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0")

  /** name -> SQL expression (shared Spark/DuckDB dialect subset: CASE/WHEN,
    * %, concat, cast(AS string), substr, length). Failure cases (empty ak,
    * empty did, corrupt JSON, non-numeric sid, invalid pl) are injected at
    * fixed prime moduli so validation operators have real work to do.
    */
  val defs: Seq[(String, String)] = Seq(
    // CheckJsonAndOwnerOperator.java:39-52 — raw owner, incl. non-whitelisted.
    "owner_raw" -> ("CASE event_id % 5 WHEN 0 THEN 'zg_adp' WHEN 1 THEN 'zg_mkt' " +
      "WHEN 2 THEN 'zg_cdp' WHEN 3 THEN 'zg_web' ELSE '' END"),
    // SetAppIdAndBusinessOperator.java — app key; empty = unregistered (AK_NONE).
    "appkey" -> ("CASE WHEN event_id % 53 = 0 THEN '' " +
      "ELSE concat('app', cast(user_id % 3 AS string)) END"),
    // basicSchema.json pl enum + one invalid value ('windows').
    "pl" -> ("CASE event_id % 8 WHEN 0 THEN 'and' WHEN 1 THEN 'ios' WHEN 2 THEN 'js' " +
      "WHEN 3 THEN 'wxa' WHEN 4 THEN 'server' WHEN 5 THEN 'harmonyos' " +
      "WHEN 6 THEN 'none' ELSE 'windows' END"),
    "sdk" -> ("CASE user_id % 5 WHEN 0 THEN 'zg_js' WHEN 1 THEN 'zg_and' " +
      "WHEN 2 THEN 'zg_ios' WHEN 3 THEN 'zg_server' ELSE 'zg-cdp' END"),
    // usr.did — device key; sometimes empty (schema minLength violation).
    // user_id % 211 makes distinct users share devices, exercising zgid binding.
    "did" -> ("CASE WHEN event_id % 59 = 0 THEN '' " +
      "ELSE concat('d', cast(user_id % 211 AS string)) END"),
    // usr.cuid — real-name user id; NULL = anonymous event.
    "cuid" -> ("CASE WHEN event_id % 4 = 0 THEN cast(NULL AS string) " +
      "ELSE concat('u', cast(user_id AS string)) END"),
    // data[].dt message type (DataRouterOperator.java:255-295 routing axis).
    "dt" -> ("CASE event_id % 20 WHEN 13 THEN 'se' WHEN 14 THEN 'ss' WHEN 15 THEN 'mkt' " +
      "WHEN 16 THEN 'abp' WHEN 17 THEN 'zgid' WHEN 18 THEN 'usr' WHEN 19 THEN 'pl' " +
      "ELSE 'evt' END"),
    // pr.$sid — numeric-string session id; NULL = absent; one non-numeric
    // case (basicSchema $sid type:number violation / parseSidToLong fallback).
    "sid_raw" -> ("CASE WHEN event_id % 5 = 0 THEN cast(NULL AS string) " +
      "WHEN event_id % 17 = 0 THEN 'notanum' " +
      "ELSE cast(1700000000 + user_id AS string) END"),
    // ip — private ranges (IpEnrichOperator.java:190-230) + public 203.0.x.y.
    "ip" -> ("CASE event_id % 11 WHEN 0 THEN '10.1.2.3' WHEN 1 THEN '192.168.0.5' " +
      "WHEN 2 THEN '172.16.9.8' WHEN 3 THEN '127.0.0.1' " +
      "ELSE concat('203.0.', cast(user_id % 8 AS string), '.', cast(event_id % 250 AS string)) END"),
    // ua — ten fixed real-world agents exercising the UserAgentParser
    // matrix (UserAgentParser.java:65-243): desktop Chrome/Safari/Firefox/
    // Edge/Opera, mobile WeChat/UC/QQ, Android vendor brands, iPad tablet.
    "ua" -> ("CASE event_id % 10 " +
      uaSet.zipWithIndex.map { case (ua, i) => s"WHEN $i THEN '$ua'" }.mkString(" ") +
      " ELSE '' END"),
    // referrer — search engines (SearchKeywordParser.java:38-58 engine set),
    // a plain referral, and direct (empty).
    "referrer" -> ("CASE event_id % 7 " +
      "WHEN 0 THEN 'https://www.baidu.com/s?wd=spark%20etl' " +
      "WHEN 1 THEN 'https://www.google.com/search?q=zhuge+analytics' " +
      "WHEN 2 THEN 'https://www.sogou.com/web?query=graft+engine' " +
      "WHEN 3 THEN 'https://cn.bing.com/search?q=etl' " +
      "WHEN 4 THEN 'https://news.example.com/article/42' " +
      "ELSE '' END"),
    // current page url — with/without utm params (EventAttrTransfer.java:290-330).
    "url" -> ("CASE WHEN event_id % 3 = 0 " +
      "THEN concat('https://shop.example.com/p/', cast(event_id % 97 AS string), " +
      "'?utm_source=wechat&utm_medium=cpc&utm_campaign=spring') " +
      "ELSE concat('https://shop.example.com/p/', cast(event_id % 97 AS string)) END"),
    // pr.$net — network type (dim.json "network" dim keys + one unknown).
    "net" -> ("CASE event_id % 6 WHEN 0 THEN 'none' WHEN 1 THEN '2g' WHEN 2 THEN '3g' " +
      "WHEN 3 THEN '4g' WHEN 4 THEN 'wifi' ELSE '5g' END"),
    // pr payload — occasionally truncated to exercise JSON validation
    // (CheckJsonAndOwnerOperator.java:24-32).
    "raw_props" -> ("CASE WHEN event_id % 31 = 0 THEN substr(props, 1, length(props) - 1) " +
      "ELSE props END")
  )

  /** Spark side: events + envelope columns, all as codegen'd expressions. */
  def attach(events: DataFrame): DataFrame =
    events.selectExpr("*" +: defs.map { case (n, e) => s"$e AS $n" }: _*)

  /** Oracle side: the same snippets as a CTE body. Use as
    * s"WITH ${Envelope.oracleRaw}, ... SELECT ...".
    */
  def oracleRaw: String =
    "raw AS (SELECT events.*, " +
      defs.map { case (n, e) => s"$e AS $n" }.mkString(", ") +
      " FROM events)"

  // ---- app registry dim (SetAppIdAndBusinessOperator's MySQL cache) ----

  val appRegistry: Seq[(String, Int, String)] = Seq(
    ("app0", 101, "analytics"),
    ("app1", 102, "marketing"),
    ("app2", 103, "cdp")
  )

  /** Tiny dim — always broadcast in joins. */
  def appRegistryDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    appRegistry.toDF("appkey", "app_id", "business")
  }

  /** Same registry as a DuckDB VALUES CTE. */
  val appRegistryOracle: String =
    "reg(appkey, app_id, business) AS (VALUES " +
      appRegistry.map { case (k, i, b) => s"('$k', $i, '$b')" }.mkString(", ") + ")"
}
