package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment (SURVEY.md §2.4, rows 15-18) — DwJob step 1.
  *
  * The reference enriches per record: a native IP-range database reader
  * (IpEnrichOperator.java + AwdbReader), a UA-parsing library
  * (UserAgentParser.java), and hand-rolled URL string walking
  * (SearchKeywordParser.java). Spark-first, geo becomes a broadcast range
  * join against an interval dim, and UA/keyword/UTM parsing become
  * regexp/parse_url column expressions — zero shuffle, full codegen, no UDFs.
  */
object Enrich {

  /** NULL sentinel (EventAttrTransfer.NULL_VALUE, SURVEY.md §3). */
  val NullValue = "\\N"

  private def env(t: Tables): DataFrame = Envelope.attach(t.events)

  // ---- #15 ip geo ----

  /** Geo "database": interval dim over the public 203.0.x.0/24 blocks the
    * envelope synthesizes (stand-in for the reference's awdb file). city
    * index = third octet.
    */
  val geoBlocks: Seq[(Int, String, String, String)] = Seq(
    (0, "中国", "北京", "北京"),
    (1, "中国", "上海", "上海"),
    (2, "中国", "广东", "深圳"),
    (3, "中国", "广东", "广州"),
    (4, "美国", "加利福尼亚", "旧金山"),
    (5, "中国", "浙江", "杭州"),
    (6, "中国", "四川", "成都"),
    (7, "德国", "柏林", "柏林")
  )

  private def geoDim(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    geoBlocks.map { case (octet, country, province, city) =>
      val base = 203L * (1L << 24) + octet * 256L
      (base, base + 255L, country, province, city)
    }.toDF("ip_start", "ip_end", "geo_country", "geo_province", "geo_city")
  }

  /** Append (country, province, city) geo columns to any frame with an
    * `ip` column — the #15 range join as a reusable leg (the event_attr
    * row build composes it). Broadcast interval dim, private IP ⇒ \N.
    */
  def withGeo(t: Tables, df: DataFrame): DataFrame = {
    val probed = df
      .withColumn("ip_long", ipToLong(col("ip")))
      .withColumn("is_private", isPrivateIp(col("ip")))
      .join(broadcast(geoDim(t)),
        !col("is_private") && col("ip_long") >= col("ip_start") && col("ip_long") <= col("ip_end"),
        "left")
    def g(c: String) = when(col("is_private"), lit(NullValue))
      .otherwise(coalesce(col(c), lit(NullValue)))
    probed
      .withColumn("geo_country_out", g("geo_country"))
      .withColumn("geo_province_out", g("geo_province"))
      .withColumn("geo_city_out", g("geo_city"))
      .drop("ip_start", "ip_end", "geo_country", "geo_province", "geo_city",
        "is_private")
  }

  /** Private-IP test — exact ranges from IpEnrichOperator.java:190-233:
    * 10/8, 172.16/12, 192.168/16, 127/8, 0/8.
    */
  def isPrivateIp(ip: Column): Column = {
    val o = split(ip, "\\.")
    val first = o.getItem(0).cast("int")
    val second = o.getItem(1).cast("int")
    first === 10 ||
      (first === 172 && second >= 16 && second <= 31) ||
      (first === 192 && second === 168) ||
      first === 127 || first === 0
  }

  def ipToLong(ip: Column): Column = {
    val o = split(ip, "\\.")
    o.getItem(0).cast("long") * 16777216L + o.getItem(1).cast("long") * 65536L +
      o.getItem(2).cast("long") * 256L + o.getItem(3).cast("long")
  }

  /** #15 enrich_ip_geo — IpEnrichOperator.java:140-185: private IP ⇒ geo
    * columns = \N; else interval lookup. The dim is tiny ⇒ broadcast
    * nested-loop range join (each row probes a sorted in-memory interval
    * list — the same shape the awdb reader gives the reference, but
    * distributed for free).
    */
  def ipGeo(t: Tables): DataFrame = {
    val e = env(t).select(col("event_id"), col("ip"))
      .withColumn("ip_long", ipToLong(col("ip")))
      .withColumn("is_private", isPrivateIp(col("ip")))
    e.join(broadcast(geoDim(t)),
        !col("is_private") && col("ip_long") >= col("ip_start") && col("ip_long") <= col("ip_end"),
        "left")
      .select(
        col("event_id"),
        col("ip"),
        when(col("is_private"), lit(NullValue)).otherwise(coalesce(col("geo_country"), lit(NullValue))).as("country"),
        when(col("is_private"), lit(NullValue)).otherwise(coalesce(col("geo_province"), lit(NullValue))).as("province"),
        when(col("is_private"), lit(NullValue)).otherwise(coalesce(col("geo_city"), lit(NullValue))).as("city"))
      .orderBy(col("event_id"))
  }

  // ---- #16 user agent ----

  /** UA parsing as reusable codegen'd column expressions — the Spark-first
    * re-expression of UserAgentParser.java:65-243 (which delegates to a UA
    * library + `inferDeviceType` fallback). Order is load-bearing:
    * iPhone/iPad before Mac (their UAs contain "like Mac OS X"), Android
    * before Linux (Android UAs contain "Linux"), the embedded-browser
    * tokens (WeChat/Edge/UC/QQ/Opera) before Chrome/Safari (their UAs
    * contain both).
    */
  object Ua {
    def os(ua: Column): Column =
      when(ua.contains("iPhone OS") || ua.contains("iPad"), "iOS")
        .when(ua.contains("Android"), "Android")
        .when(ua.contains("HarmonyOS"), "HarmonyOS")
        .when(ua.contains("Windows NT"), "Windows")
        .when(ua.contains("Mac OS X"), "Mac OS X")
        .when(ua.contains("Linux"), "Linux")
        .otherwise("UNKNOWN")

    /** Version string per family; `_` normalized to `.` (Apple UAs). */
    def osVersion(ua: Column): Column =
      when(ua.contains("iPhone OS") || ua.contains("iPad"),
        regexp_replace(regexp_extract(ua, "OS ([0-9_]+)", 1), "_", "."))
        .when(ua.contains("Android"), regexp_extract(ua, "Android ([0-9.]+)", 1))
        .when(ua.contains("HarmonyOS"), regexp_extract(ua, "HarmonyOS ([0-9.]+)", 1))
        .when(ua.contains("Windows NT"), regexp_extract(ua, "Windows NT ([0-9.]+)", 1))
        .when(ua.contains("Mac OS X"),
          regexp_replace(regexp_extract(ua, "Mac OS X ([0-9_.]+)", 1), "_", "."))
        .otherwise(NullValue)

    /** Browser token precedence mirrors the reference library's matcher
      * order: embedded/branded browsers win over their WebKit carriers.
      */
    val browserTokens: Seq[(String, String)] = Seq(
      "MicroMessenger/" -> "MicroMessenger",
      "Edg/"            -> "Edge",
      "UCBrowser/"      -> "UCBrowser",
      "MQQBrowser/"     -> "QQBrowser",
      "OPR/"            -> "Opera",
      "Firefox/"        -> "Firefox",
      "Chrome/"         -> "Chrome")

    def browser(ua: Column): Column =
      browserTokens.foldRight(
        when(ua.contains("Version/") && ua.contains("Safari"), "Safari")
          .otherwise("UNKNOWN")) { case ((tok, name), other) =>
        when(ua.contains(tok), name).otherwise(other)
      }

    /** Major version only (UserAgentParser.java:126-139). */
    def browserVersion(ua: Column): Column =
      browserTokens.foldRight(
        when(ua.contains("Version/"), regexp_extract(ua, "Version/([0-9]+)", 1))
          .otherwise(NullValue)) { case ((tok, _), other) =>
        when(ua.contains(tok), regexp_extract(ua, tok + "([0-9]+)", 1)).otherwise(other)
      }

    /** Device type incl. the inferDeviceType fallback
      * (UserAgentParser.java:207-243): iPad ⇒ Tablet, iPhone ⇒ Mobile,
      * Android w/o "Mobile" token ⇒ Tablet, desktop OSes ⇒ Desktop.
      */
    def deviceType(ua: Column): Column =
      when(ua.contains("iPad"), "Tablet")
        .when(ua.contains("iPhone"), "Mobile")
        .when(ua.contains("Android") && ua.contains("Mobile"), "Mobile")
        .when(ua.contains("Android"), "Tablet")
        .when(ua.contains("HarmonyOS"), "Mobile")
        .when(ua.contains("Windows NT") || ua.contains("Mac OS X") || ua.contains("Linux"),
          "Desktop")
        .otherwise("UNKNOWN")

    /** Android vendor tokens → standardized brand (the UA-visible subset of
      * DevicePropertyParser.java's BRAND_MAPPING).
      */
    val androidBrands: Seq[(String, String)] = Seq(
      "HUAWEI" -> "Huawei", "HONOR" -> "Honor",
      "Redmi" -> "Redmi", "Xiaomi" -> "Xiaomi",
      "OPPO" -> "OPPO", "OnePlus" -> "OnePlus", "realme" -> "Realme",
      "vivo" -> "Vivo", "iQOO" -> "iQOO",
      "SAMSUNG" -> "Samsung", "SM-" -> "Samsung")

    /** Brand = OS manufacturer unless an Android vendor token is present
      * (UserAgentParser.java:150-176: manufacturer of the OS, Apple filled
      * by inferDeviceType for iOS/Mac).
      */
    def deviceBrand(ua: Column): Column = {
      val androidVendor = androidBrands.foldRight(lit("Google")) {
        case ((tok, name), other) => when(ua.contains(tok), name).otherwise(other)
      }
      when(ua.contains("iPhone") || ua.contains("iPad") || ua.contains("Mac OS X"), "Apple")
        .when(ua.contains("Android"), androidVendor)
        .when(ua.contains("Windows NT"), "Microsoft")
        .otherwise(NullValue)
    }
  }

  /** #16 enrich_user_agent — the full UA parse: os + version, browser +
    * major version, device type and brand. Pure regexp/when expressions,
    * zero shuffle, whole-stage codegen.
    */
  def userAgent(t: Tables): DataFrame = {
    val ua = col("ua")
    env(t).select(
      col("event_id"),
      Ua.os(ua).as("os"), Ua.osVersion(ua).as("os_version"),
      Ua.browser(ua).as("browser"), Ua.browserVersion(ua).as("browser_version"),
      Ua.deviceType(ua).as("device_type"), Ua.deviceBrand(ua).as("device_brand"))
      .orderBy(col("event_id"))
  }

  // ---- #17 search keyword ----

  /** Engine patterns + keyword params, pinned from
    * SearchKeywordParser.java:38-55.
    */
  val enginePatterns: Seq[(String, String, Seq[String])] = Seq(
    ("baidu\\.com", "baidu", Seq("wd", "word", "kw")),
    ("google\\.(com|cn|com\\.hk)", "google", Seq("q", "query")),
    ("sogou\\.com", "sogou", Seq("query", "keyword")),
    ("so\\.com", "360", Seq("q")),
    ("bing\\.com", "bing", Seq("q")),
    ("sm\\.cn", "shenma", Seq("q")),
    ("toutiao\\.com", "toutiao", Seq("keyword")),
    ("yahoo\\.com", "yahoo", Seq("p"))
  )

  /** Engine classifier (case-insensitive domain regex, first match wins). */
  def engineOf(url: Column): Column =
    enginePatterns.foldRight(lit("unknown")) { case ((pat, name, _), elseCol) =>
      when(url.rlike("(?i)" + pat), name).otherwise(elseCol)
    }

  /** Keyword for the detected engine: first non-empty of its param names,
    * URL-decoded (SearchKeywordParser.java:107-143 + UrlDecoder).
    */
  def keywordOf(url: Column, engine: Column): Column = {
    val perEngine = enginePatterns.map { case (_, name, params) =>
      val raw = coalesce(
        params.map(p => nullif(parse_url(url, lit("QUERY"), lit(p)), lit(""))) :+
          lit(null).cast("string"): _*)
      (name, raw)
    }
    perEngine.foldRight(lit("")) { case ((name, raw), elseCol) =>
      when(engine === name, coalesce(url_decode(raw), lit(""))).otherwise(elseCol)
    }
  }

  /** #17 enrich_search_keyword — engine detect + keyword param extraction
    * over the referrer; unknown engine ⇒ ("unknown", ""). Histogram output.
    */
  def searchKeyword(t: Tables): DataFrame = {
    val withEngine = env(t).withColumn("engine", engineOf(col("referrer")))
    withEngine
      .withColumn("keyword",
        when(col("engine") === "unknown", lit(""))
          .otherwise(keywordOf(col("referrer"), col("engine"))))
      .groupBy(col("engine"), col("keyword"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("engine"), col("keyword"))
  }

  // ---- baidu encrypted-referrer keyword (BaiduKeywordService) ----

  /** The keyword cache dim — the service's L1/L2 (Caffeine/Redis) cache
    * re-expressed as a joinable table. The L3 leg (the baidu eqid HTTP API)
    * is an external call with non-public credentials; cache misses surface
    * as \N + cache_hit=false, which is exactly what the reference emits
    * when all three levels miss.
    */
  val baiduEqidCache: Seq[(String, String)] =
    (0 until 25).map(i => (s"eq$i", s"kw$i"))

  /** enrich_baidu_eqid — BaiduKeywordService.java: baidu /link redirects
    * hide the search keyword behind an eqid; resolution = extract the eqid
    * param and join the (broadcast) cache dim. Histogram output per
    * (eqid, keyword, hit).
    */
  def baiduEqidKeyword(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val cache = broadcast(baiduEqidCache.toDF("eqid", "bd_keyword"))
    env(t)
      .filter(col("referrer").rlike("(?i)baidu\\.com/link"))
      .withColumn("eqid", parse_url(col("referrer"), lit("QUERY"), lit("eqid")))
      .join(cache, Seq("eqid"), "left")
      .groupBy(col("eqid"),
        coalesce(col("bd_keyword"), lit(NullValue)).as("keyword"),
        col("bd_keyword").isNotNull.as("cache_hit"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("eqid"))
  }

  // ---- #18 utm attribution ----

  /** #18 enrich_utm_attribution — EventAttrTransfer.java:301-338: explicit
    * utm_* params win; otherwise a search-engine referrer attributes as
    * organic search (medium=搜索自然流量, source=referrer host), any other
    * referrer as referral (medium=引荐), no referrer as direct (\N).
    */
  def utmAttribution(t: Tables): DataFrame = {
    val utmSource = nullif(parse_url(col("url"), lit("QUERY"), lit("utm_source")), lit(""))
    val utmMedium = nullif(parse_url(col("url"), lit("QUERY"), lit("utm_medium")), lit(""))
    val host = parse_url(col("referrer"), lit("HOST"))
    val engine = engineOf(col("referrer"))
    env(t)
      .select(
        when(utmSource.isNotNull, utmSource)
          .when(engine =!= "unknown", host)
          .when(col("referrer") =!= "", host)
          .otherwise(NullValue).as("utm_source"),
        when(utmSource.isNotNull, coalesce(utmMedium, lit(NullValue)))
          .when(engine =!= "unknown", lit("搜索自然流量"))
          .when(col("referrer") =!= "", lit("引荐"))
          .otherwise(NullValue).as("utm_medium"))
      .groupBy(col("utm_source"), col("utm_medium"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("utm_source"), col("utm_medium"))
  }

  /** enrich_url_decode — UrlDecoder.java:20-44: UTF-8 percent-decoding with
    * the reference's exact control flow — decode once; if the result still
    * contains '%', decode AGAIN (double-encoded wire values); any decode
    * failure returns the ORIGINAL string untouched (the catch clause). The
    * Spark form: `try_url_decode` per pass + the same %-retry rule; a null
    * from either pass collapses the whole chain back to the input.
    *
    * Input cycles through the wire shapes the reference sees: plain,
    * single-encoded, DOUBLE-encoded, '+'-as-space, and an invalid escape
    * (passthrough). Pure column expressions — zero shuffle; the oracle
    * replays the decode over the bounded escape set with replace chains and
    * an RE2 validity match.
    */
  def urlDecode(t: Tables): DataFrame = {
    val id = col("event_id")
    val raw = when(pmod(id, lit(5)) === 0, lit("https://a.cn/p?q=hello%20world&x=1"))
      .when(pmod(id, lit(5)) === 1, concat(lit("k%253Dv%2526w"), pmod(id, lit(7)).cast("string")))
      .when(pmod(id, lit(5)) === 2, lit("plain/no/escapes"))
      .when(pmod(id, lit(5)) === 3, lit("bad%zzpct"))
      .otherwise(concat(lit("a+b%20c"), pmod(id, lit(3)).cast("string")))
    val d1 = expr("try_url_decode(url_enc)")
    val d2 = expr("try_url_decode(d1)")
    t.events.select(id, raw.as("url_enc"))
      .withColumn("d1", d1)
      .withColumn("decoded",
        when(col("d1").isNull, col("url_enc"))
          .when(col("d1").contains("%"), coalesce(d2, col("url_enc")))
          .otherwise(col("d1")))
      .select(id, col("url_enc"), col("decoded"))
      .orderBy(id)
  }
}
