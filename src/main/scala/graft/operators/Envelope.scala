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
    // a plain referral, an encrypted baidu /link?eqid= redirect (the
    // BaiduKeywordService input shape), and direct (empty).
    "referrer" -> ("CASE event_id % 7 " +
      "WHEN 0 THEN 'https://www.baidu.com/s?wd=spark%20etl' " +
      "WHEN 1 THEN 'https://www.google.com/search?q=zhuge+analytics' " +
      "WHEN 2 THEN 'https://www.sogou.com/web?query=graft+engine' " +
      "WHEN 3 THEN 'https://cn.bing.com/search?q=etl' " +
      "WHEN 4 THEN 'https://news.example.com/article/42' " +
      "WHEN 5 THEN concat('https://www.baidu.com/link?url=xYz&eqid=eq', " +
      "cast(event_id % 50 AS string)) " +
      "ELSE '' END"),
    // raw device brand/model pairs as the SDK reports them — vendor casing,
    // CN aliases, sentinels — for the DevicePropertyParser re-expression.
    "dev_brand" -> ("CASE event_id % 12 WHEN 0 THEN 'huawei' WHEN 1 THEN 'HONOR' " +
      "WHEN 2 THEN 'xiaomi' WHEN 3 THEN '红米' WHEN 4 THEN 'OPPO' WHEN 5 THEN 'vivo' " +
      "WHEN 6 THEN 'iphone' WHEN 7 THEN 'SAMSUNG' WHEN 8 THEN '魅族' " +
      "WHEN 9 THEN '联想' WHEN 10 THEN 'Transsion' ELSE '' END"),
    "dev_model" -> ("CASE event_id % 9 WHEN 0 THEN 'Mate 60 Pro' WHEN 1 THEN 'Nova  12' " +
      "WHEN 2 THEN 'Redmi Note 13' WHEN 3 THEN 'K70 5G' WHEN 4 THEN 'Find X7 Ultra' " +
      "WHEN 5 THEN 'Y100 (2023)' WHEN 6 THEN 'iPhone 15 Pro Max' " +
      "WHEN 7 THEN 'Galaxy Z Fold5' ELSE 'SE 全网通' END"),
    // current page url — with/without utm params (EventAttrTransfer.java:290-330).
    "url" -> ("CASE WHEN event_id % 3 = 0 " +
      "THEN concat('https://shop.example.com/p/', cast(event_id % 97 AS string), " +
      "'?utm_source=wechat&utm_medium=cpc&utm_campaign=spring') " +
      "ELSE concat('https://shop.example.com/p/', cast(event_id % 97 AS string)) END"),
    // pr.$net — network type (dim.json "network" dim keys + one unknown).
    "net" -> ("CASE event_id % 6 WHEN 0 THEN 'none' WHEN 1 THEN '2g' WHEN 2 THEN '3g' " +
      "WHEN 3 THEN '4g' WHEN 4 THEN 'wifi' ELSE '5g' END"),
    // pr custom properties for the virtual-event filters-map semantics
    // (VirtualEventOperator.matchFilters): '_plan' is an UNDERSCORE-prefixed
    // custom key (the filters lookup's pr.get("_"+key) path), 'src' a bare
    // key (the pr.get(key) fallback path).
    "pr_plan" -> "CASE event_id % 3 WHEN 0 THEN 'free' WHEN 1 THEN 'pro' ELSE 'ent' END",
    "pr_src" -> "CASE event_id % 2 WHEN 0 THEN 'web' ELSE 'app' END",
    // pr payload — occasionally truncated to exercise JSON validation
    // (CheckJsonAndOwnerOperator.java:24-32).
    "raw_props" -> ("CASE WHEN event_id % 31 = 0 THEN substr(props, 1, length(props) - 1) " +
      "ELSE props END"),
    // ---- EventAttrTransfer.fillBasicFieldsFromMap inputs (the remaining
    // pr fields of the full event_attr row) ----
    // pr.$cr — carrier mccmnc; ensureIntLength cases: valid 5/6-digit,
    // too long (>6), non-numeric, empty (each -> \N except valid)
    "cr" -> ("CASE event_id % 5 WHEN 0 THEN concat('4600', cast(event_id % 10 AS string)) " +
      "WHEN 1 THEN '46000011' WHEN 2 THEN '46x0' WHEN 3 THEN '' " +
      "ELSE concat('46', cast(event_id % 1000 AS string)) END"),
    // pr.$cn — install channel; empty -> \N
    "cn" -> ("CASE event_id % 4 WHEN 0 THEN 'appstore' WHEN 1 THEN 'huawei_store' " +
      "WHEN 2 THEN '' ELSE 'web_organic' END"),
    // pr.$vn — app version; empty -> \N
    "vn" -> "CASE event_id % 3 WHEN 0 THEN '3.2.1' WHEN 1 THEN '4.0' ELSE '' END",
    // pr.$dru — duration ms; ensureIntRange(0, 86400000) cases: valid,
    // negative, over-range, non-numeric, empty (each non-valid -> '0')
    "dru" -> ("CASE event_id % 5 WHEN 0 THEN cast(event_id % 5000 AS string) " +
      "WHEN 1 THEN '-5' WHEN 2 THEN '90000000' WHEN 3 THEN 'fast' ELSE '' END"),
    // pr.$wxeid — WeChat export id (attr2); empty -> \N
    "wxeid" -> ("CASE WHEN event_id % 6 = 0 THEN concat('wx', cast(event_id % 30 AS string)) " +
      "ELSE '' END"),
    // custom-property VALUE and TYPE tag (pr['$zg_eptp#'+key]) for the
    // column-index fill; the key itself is layer-2 (depends on dt)
    "cus_val" -> "concat('v', cast(event_id % 50 AS string))",
    "cus_type" -> "CASE event_id % 2 WHEN 0 THEN 'string' ELSE 'number' END",
    // ---- UserTransfer / DeviceTransfer inputs ----
    // pr.$tz — timezone OFFSET in ms (the validity axis both transfers
    // gate on): valid, negative-valid, out-of-range (>48h ⇒ user row
    // dropped / device last_update \N), non-numeric (user dropped, device
    // unaffected — DeviceTransfer only range-checks a PARSEABLE tz)
    "tzms" -> ("CASE event_id % 7 WHEN 0 THEN '0' WHEN 1 THEN '-18000000' " +
      "WHEN 2 THEN '200000000' WHEN 3 THEN 'PST' ELSE '28800000' END"),
    // pr.$rs — screen resolution; parseResolution splits on non-digit runs
    "rs" -> ("CASE event_id % 4 WHEN 0 THEN '1080x1920' WHEN 1 THEN '750*1334' " +
      "WHEN 2 THEN '' ELSE 'wide' END"),
    // pr.$imei / $lang / $zs — present, empty (-> \\N via ensureLength) or
    // absent (getStringValue miss -> the \\N sentinel directly)
    "imei" -> ("CASE event_id % 5 WHEN 0 THEN concat('86', cast(event_id % 100000 AS string)) " +
      "WHEN 1 THEN '' ELSE concat(chr(92), 'N') END"),
    "lang" -> ("CASE event_id % 3 WHEN 0 THEN 'zh-CN' WHEN 1 THEN 'en-US' " +
      "ELSE '' END"),
    "zs" -> ("CASE event_id % 4 WHEN 0 THEN 'store_a' WHEN 1 THEN '' " +
      "ELSE concat(chr(92), 'N') END"),
    // pr.$jail / $private — raw SDK flags, absent -> \\N
    "jailp" -> ("CASE event_id % 3 WHEN 0 THEN '1' WHEN 1 THEN '0' " +
      "ELSE concat(chr(92), 'N') END"),
    "crackp" -> ("CASE event_id % 4 WHEN 0 THEN '1' WHEN 1 THEN '0' " +
      "ELSE concat(chr(92), 'N') END")
  )

  /** Layer-2 envelope columns (may reference layer-1 names as columns): the
    * COMPLETE zg wire messages, built as JSON strings with injected
    * violations at fixed prime moduli so the full basicSchema matrix and
    * the MsgResolver gate parse have real work to do. Same single SQL text
    * runs in Spark and DuckDB (no backslash literals — the escape backslash
    * comes from chr(92)).
    */
  val derivedDefs: Seq[(String, String)] = {
    // the inner zg envelope message (basicSchema.json shape):
    // {"data":[{"dt":..,"pr":{"$sid":..,"$ct":..}}],"tz":..,"ak":..,
    //  "debug":..,"sln":..,"owner":..,"pl":..,"sdk":..,"sdkv":..,
    //  "usr":{"did":..,"cuid":..},"ut":..,"ip":..,"ua":..}
    // violations: %47 data missing, %71 item missing pr, %17 $sid string,
    // %19 $ct string, %41 tz missing, %37 debug string, %23 sdkv missing,
    // %101 did overlong (maxLength 100), %29 ut missing, %43 trailing
    // garbage (parse failure). ak=''/did=''/pl='windows' ride the layer-1
    // columns.
    val msgBody =
      // parse-failure injection is a PREFIX: Jackson-based parsers accept
      // trailing garbage after a complete value, DuckDB's json_valid does
      // not — a leading junk char is rejected identically by both
      "concat(CASE WHEN event_id % 43 = 0 THEN 'x' ELSE '' END, '{'," +
        " CASE WHEN event_id % 47 = 0 THEN '' ELSE concat('\"data\":[{\"dt\":\"', dt, '\",'," +
        "   CASE WHEN event_id % 71 = 0 THEN '\"x\":1}],' ELSE concat('\"pr\":{'," +
        "     CASE WHEN sid_raw IS NULL THEN ''" +
        "          WHEN event_id % 17 = 0 THEN concat('\"$sid\":\"', sid_raw, '\",')" +
        "          ELSE concat('\"$sid\":', sid_raw, ',') END," +
        "     '\"$ct\":', CASE WHEN event_id % 19 = 0 THEN '\"late\"'" +
        "                      ELSE cast(1700000000000 + event_id AS string) END," +
        "     '}}],') END) END," +
        " CASE WHEN event_id % 41 = 0 THEN '' ELSE '\"tz\":\"Asia/Shanghai\",' END," +
        " '\"ak\":\"', appkey, '\",'," +
        " '\"debug\":', CASE WHEN event_id % 37 = 0 THEN '\"x\"' ELSE '0' END, ','," +
        " '\"sln\":\"itn\",\"owner\":\"', owner_raw, '\",\"pl\":\"', pl, '\",\"sdk\":\"', sdk, '\",'," +
        " CASE WHEN event_id % 23 = 0 THEN '' ELSE '\"sdkv\":\"3.2.1\",' END," +
        " '\"usr\":{\"did\":\"', CASE WHEN event_id % 101 = 0 THEN repeat('x', 120) ELSE did END, '\"'," +
        " CASE WHEN cuid IS NULL THEN '' ELSE concat(',\"cuid\":\"', cuid, '\"') END, '},'," +
        " CASE WHEN event_id % 29 = 0 THEN '' ELSE '\"ut\":\"0\",' END," +
        " '\"ip\":\"', ip, '\",\"ua\":\"', ua, '\"}')"
    // custom-property KEY per data item (EventAttrTransfer's eligibility
    // axes): evt items carry an UNDERSCORE-prefixed custom key; mkt/abp
    // items carry a bare key, except a cycle of the reserved attr name
    // 'uuid' (mktAttrs/abpAttrs) which must NOT register; other dts carry
    // none (CUSTOM_PROPERTY_DT = {evt, mkt, abp})
    val cusKey =
      "CASE WHEN dt = 'evt' THEN concat('_p', cast(user_id % 7 AS string)) " +
        "WHEN dt IN ('mkt', 'abp') THEN " +
        "(CASE WHEN event_id % 13 = 0 THEN 'uuid' " +
        "ELSE concat('p', cast(user_id % 7 AS string)) END) " +
        "ELSE cast(NULL AS string) END"
    Seq("msg" -> msgBody, "cus_key" -> cusKey)
  }

  /** JSON-string embedding escape, dialect-portable (no backslash literals:
    * the backslash char comes from chr(92)): backslashes doubled first,
    * then quotes escaped.
    */
  private def escJson(x: String): String =
    s"replace(replace($x, chr(92), concat(chr(92), chr(92))), '\"', concat(chr(92), '\"'))"

  /** Public TEST key material for the synthesized encrypted-transport rows
    * (AES-128 key + CBC iv, both exactly 16 UTF-8 bytes per the
    * DecodeService contract). Production deployments RSA-unwrap each
    * message's wrapped key driver-side and set
    * `spark.graft.gate.aesKey`/`aesIv`; the corpus uses one session-wide
    * key so the oracle can replay the DECRYPTED content (it knows the
    * plaintext the generator encrypted — it never needs the cipher).
    */
  val gateAesKey = "GraftGateAesK128"
  val gateAesIv = "GraftGateIv16byt"

  /** The RSA-wrapped-key token carried in TYPE-1 encrypted Args (`key`
    * field): opaque to the resolver — the RSA unwrap is the documented
    * remaining boundary (platform private key), the unwrapped result is
    * the session key above.
    */
  val gateWrappedKeyToken = "UlNBd3JhcHBlZDprZXkraXY="

  /** Public TEST key material for the TYPE-2 (SM2/SM4) rows — minted for
    * this corpus (the SM2 keypair was generated with OpenSSL's SM2 support
    * and is embedded in SmCryptoSpec's cross-implementation vectors; the
    * platform's production key stays out, exactly as with AES/RSA). The
    * SM4 content key's hex IS what the SM2 unwrap yields
    * (MsgResolver.java:117-122: plaintext = "<sm4KeyHex>,<extra>", split
    * on ',', hex-decode the first part).
    */
  val gateSm4KeyHex: String =
    "GraftGateSm4K128".getBytes("UTF-8").map("%02X".format(_)).mkString
  val gateSm2PrivHex = "dd3e3207e12c447bf0f1221bc55178e07cfdb990b5d56de4d2f150c7c9c8717a"

  /** The SM2-wrapped SM4 key carried in type-2 Args (`key` field): the
    * C1C3C2 hex WITHOUT its leading '04' marker, so the resolver's
    * startsWith-'04'-prepend branch (MsgResolver.java:112-114) has real
    * work. Minted ONCE per JVM (deterministic nonce from the plaintext's
    * SM3) on the driver at plan-build time — the generator never pays EC
    * math per row, and the resolver's per-thread unwrap cache pays it once
    * per task thread.
    */
  lazy val gateSm2WrappedKey: String = {
    import graft.functions.SmCrypto
    val plain = s"$gateSm4KeyHex,graft".getBytes("UTF-8")
    val pub = SmCrypto.publicKey(BigInt(gateSm2PrivHex, 16))
    val pubX = BigInt(1, java.util.Arrays.copyOfRange(pub, 1, 33))
    val pubY = BigInt(1, java.util.Arrays.copyOfRange(pub, 33, 65))
    val k = BigInt(1, SmCrypto.sm3(plain ++ "graft-nonce".getBytes("UTF-8")))
    val ct = SmCrypto.sm2Encrypt(pubX, pubY, plain, k)
    ct.map("%02X".format(_)).mkString.drop(2) // strip the leading '04'
  }

  /** Encrypt-row sub-classes inside the %61=5 rows: even event_id ⇒
    * type '2' (SM2-wrapped SM4 key + SM4/ECB payload — resolves natively
    * via graft_sm2_unwrap/graft_sm4_decrypt), odd ⇒ type '1' (RSA/AES —
    * resolves natively via the session AES key); in BOTH types, %3=0
    * carries a TRUNCATED ciphertext so the decrypt-failure verdict has
    * real rows on each branch.
    */
  val gateTypeExpr = "CASE WHEN event_id % 2 = 0 THEN '2' ELSE '1' END"

  /** Layer-3 columns (may reference msg): the outer gate transport message
    * (MsgResolver.java:33-98): {"Ip":<str>,"Now":<num>,"Header":"<json
    * str>","Args":"<json str>"}. Header/Args are JSON-STRING fields whose
    * content is itself JSON, so embedded payloads are escaped with escJson
    * (the Args event payload ends up double-escaped, exactly like the wire
    * format). violations (%61): 0 Ip number, 1 Now string, 2 Header number,
    * 3 Args empty object, 4 compress invalid, 5 encrypt=1 (type 2 =
    * SM2-wrapped-key + SM4 payload, type 1 = RSA-token + AES payload —
    * BOTH resolve natively: the Spark side carries REAL ciphertext, the
    * oracle side the plaintext it was minted from), 6 header without
    * user-agent; %67 trailing garbage.
    *
    * `encEvent` is the engine-specific payload expression for the
    * encrypt=1 rows — hex ciphertext on the Spark side
    * (graft_aes_encrypt), the escaped plaintext on the oracle side
    * (DuckDB cannot decrypt, and never needs to: ciphertext is minted
    * FROM msg, so the decrypted content IS msg). Hex is JSON-safe, so the
    * ciphertext needs no escaping.
    */
  private def gateDefsWith(encEvent: String): Seq[(String, String)] = {
    val headerJson = "concat('{\"user-agent\":\"', ua, '\"}')"
    val argsJson =
      "concat('{\"event\":\"', CASE WHEN event_id % 61 = 5 THEN " + encEvent +
        " ELSE " + escJson("msg") + " END, '\",'," +
        " '\"compress\":\"', CASE WHEN event_id % 61 = 4 THEN '9' ELSE '0' END, '\",'," +
        " '\"encrypt\":\"',  CASE WHEN event_id % 61 = 5 THEN '1' ELSE '0' END, '\"'," +
        " CASE WHEN event_id % 61 = 5 THEN concat(',\"type\":\"', " + gateTypeExpr + "," +
        " '\",\"key\":\"', CASE WHEN event_id % 2 = 0 THEN '" + gateSm2WrappedKey +
        "' ELSE '" + gateWrappedKeyToken + "' END, '\"') ELSE '' END, '}')"
    val gateBody =
      "concat(CASE WHEN event_id % 67 = 0 THEN 'x' ELSE '' END, '{'," +
        " '\"Ip\":', CASE WHEN event_id % 61 = 0 THEN '123' ELSE concat('\"', ip, '\"') END, ','," +
        " '\"Now\":', CASE WHEN event_id % 61 = 1 THEN '\"abc\"'" +
        "                  ELSE cast(1700000000 + event_id AS string) END, ','," +
        " '\"Header\":', CASE WHEN event_id % 61 = 2 THEN '123'" +
        "                     WHEN event_id % 61 = 6 THEN concat('\"', " + escJson("'{\"x\":1}'") + ", '\"')" +
        "                     ELSE concat('\"', " + escJson(headerJson) + ", '\"') END, ','," +
        " '\"Args\":', CASE WHEN event_id % 61 = 3 THEN concat('\"', " + escJson("'{}'") + ", '\"')" +
        "                   ELSE concat('\"', " + escJson(argsJson) + ", '\"') END," +
        " '}')"
    Seq("gate_msg" -> gateBody)
  }

  /** Spark side: REAL hex ciphertext for encrypt rows — SM4 for type-2
    * (even event_id), AES for type-1 (odd) — truncated in the %3=0
    * decrypt-failure class of each branch.
    */
  lazy val gateDefs: Seq[(String, String)] = gateDefsWith(
    s"CASE WHEN event_id % 2 = 0 AND event_id % 3 = 0" +
      s" THEN substr(graft_sm4_encrypt(msg, '$gateSm4KeyHex'), 1, 16)" +
      s" WHEN event_id % 2 = 0 THEN graft_sm4_encrypt(msg, '$gateSm4KeyHex')" +
      s" WHEN event_id % 3 = 0" +
      s" THEN substr(graft_aes_encrypt(msg, '$gateAesKey', '$gateAesIv'), 1, 16)" +
      s" ELSE graft_aes_encrypt(msg, '$gateAesKey', '$gateAesIv') END")

  /** Oracle side: the plaintext the ciphertext was minted from. */
  val gateDefsOracle: Seq[(String, String)] = gateDefsWith(escJson("msg"))

  /** Spark side: events + envelope columns, all as codegen'd expressions
    * (layers 2/3 in follow-up projections so they can reference earlier
    * names).
    */
  def attach(events: DataFrame): DataFrame = {
    // gateDefs mints AES ciphertext via the native codec expression
    graft.functions.CodecExpressions.register(events.sparkSession)
    events
      .selectExpr("*" +: defs.map { case (n, e) => s"$e AS $n" }: _*)
      .selectExpr("*" +: derivedDefs.map { case (n, e) => s"$e AS $n" }: _*)
      .selectExpr("*" +: gateDefs.map { case (n, e) => s"$e AS $n" }: _*)
  }

  /** Oracle side: the same snippets as a three-layer CTE. Use as
    * s"WITH ${Envelope.oracleRaw}, ... SELECT ... FROM raw".
    *
    * `raw` is MATERIALIZED: DuckDB inlines CTEs by default, so an oracle
    * whose downstream chain references `raw` k times re-synthesizes the
    * full ~60-column envelope k times — the deep pipeline oracles expand
    * that multiplicatively (every `ev`/`uz`/`dz` reference re-inlines the
    * whole chain) and the un-capped driver harness OOMs on kernel commit
    * with 32 DuckDB threads. One materialization is O(|events|) and tiny.
    */
  def oracleRaw: String =
    "raw0 AS (SELECT events.*, " +
      defs.map { case (n, e) => s"$e AS $n" }.mkString(", ") +
      " FROM events), raw1 AS (SELECT raw0.*, " +
      derivedDefs.map { case (n, e) => s"$e AS $n" }.mkString(", ") +
      " FROM raw0), raw AS MATERIALIZED (SELECT raw1.*, " +
      gateDefsOracle.map { case (n, e) => s"$e AS $n" }.mkString(", ") +
      " FROM raw1)"

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
