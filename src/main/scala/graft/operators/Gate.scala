package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gate transport envelope (MsgResolver.java:33-98 + DecodeService) — the
  * wire format the GateJob actually receives: an outer JSON message
  * `{Ip: string, Now: number, Header: json-string, Args: json-string}`
  * whose Args carries the (optionally zlib-compressed, optionally
  * encrypted) zg event payload as an escaped JSON string.
  *
  * Spark-first: the per-record try/catch resolver chain becomes a single
  * pass of pure column expressions — parse probes (`try_parse_json`,
  * single-field typed `from_json` to distinguish JSON numbers from
  * strings), first-failure-wins verdict, payload decode. Zero shuffle,
  * whole-stage codegen except the zlib inflate (a native expression).
  *
  * Crypto: MsgResolver's encrypt=1 path (MsgResolver.java:104-135) carries
  * a type discriminator. Type '2' (MsgResolver.java:109-125) resolves
  * NATIVELY: `graft_sm2_unwrap` opens the message's SM2-wrapped key blob
  * with the session SM2 private key (`spark.graft.gate.sm2PrivKey`), the
  * unwrapped "sm4KeyHex,..." splits on ',' and `graft_sm4_decrypt`
  * (SM4/ECB/PKCS5, hutool SmUtil.sm4's default) opens the payload — the
  * full reference chain, on minted TEST keys. Anything else is the
  * RSA/AES branch — an RSA-wrapped "key,iv" blob plus an
  * AES/CBC/PKCS5Padding HEX ciphertext (DecodeService.aesDecode); the AES
  * half resolves natively via `graft_aes_decrypt` with the session data
  * key (`spark.graft.gate.aesKey`/`aesIv` — production RSA-unwraps each
  * message's wrapped key driver-side and sets these; the RSA unwrap
  * itself stays with the platform private key, the one remaining
  * boundary). Decrypt failure on either branch is its own verdict
  * (EVENT_DECRYPT_BAD), mirroring the reference's decrypt
  * ResolveException.
  */
object Gate {

  /** Session conf keys for the post-RSA-unwrap AES data key and the SM2
    * private key; defaults = the synthesized corpus' public test key
    * material.
    */
  val AesKeyConf = "spark.graft.gate.aesKey"
  val AesIvConf = "spark.graft.gate.aesIv"
  val Sm2PrivConf = "spark.graft.gate.sm2PrivKey"

  private def env(t: Tables): DataFrame = Envelope.attach(t.events)

  /** gate_resolve — per-message resolver verdict + the fields a resolved
    * message contributes downstream (ip, st, ua — MsgResolver.java:93-95).
    * Verdicts mirror the reference's ResolveException sites in evaluation
    * order; ip/st/ua are only populated for fully-resolved messages.
    */
  def gateResolve(t: Tables): DataFrame = {
    graft.functions.CodecExpressions.register(t.spark)
    resolveFrom(env(t)).orderBy(col("event_id"))
  }

  /** The resolver chain over any frame carrying (event_id, gate_msg) —
    * shared by the synthesized-corpus operator and literal-message specs.
    * Caller must have registered CodecExpressions on the session.
    *
    * The outer message is parsed exactly TWICE (one string-typed struct for
    * presence/extraction, one double-typed struct whose per-field nulls
    * distinguish JSON numbers from strings) plus the validity probe —
    * parsing each probe separately re-reads the whole multi-KB message per
    * field and showed up as the bench's slowest per-row cost.
    */
  def resolveFrom(df: DataFrame): DataFrame =
    resolveCols(df.select(col("event_id"), col("gate_msg")))
      .select("event_id", "verdict", "ip_out", "st", "ua_out")

  /** Like resolveFrom but PRESERVES the input columns, so a caller filtering
    * on the verdict (the AllJob gate leg) needs no join back — the verdict
    * is just another codegen'd column on the same scan.
    */
  def resolveCols(df: DataFrame): DataFrame = {
    graft.functions.CodecExpressions.register(df.sparkSession)
    val aesKey = df.sparkSession.conf.get(AesKeyConf, Envelope.gateAesKey)
    val aesIv = df.sparkSession.conf.get(AesIvConf, Envelope.gateAesIv)
    val sm2Priv = df.sparkSession.conf.get(Sm2PrivConf, Envelope.gateSm2PrivHex)
    // ONE parse: the outer message lands in a VARIANT; per-field TYPE
    // (string vs number — MsgResolver's ClassCastException sites) comes
    // from schema_of_variant over cheap binary accessors instead of a
    // second and third from_json pass. The message is multi-KB, so each
    // avoided parse is the dominant per-row cost (measured: stats query
    // 8.3 s -> see NOTES; the parse, not the probe logic, is the time).
    val probes = df
      .withColumn("v", expr("try_parse_json(gate_msg)"))
      .selectExpr(
        "*",
        "schema_of_variant(variant_get(v, '$.Ip')) AS ip_t",
        "try_variant_get(v, '$.Ip', 'string') AS ip_s",
        "schema_of_variant(variant_get(v, '$.Now')) AS now_t",
        "try_variant_get(v, '$.Now', 'string') AS now_s",
        "schema_of_variant(variant_get(v, '$.Header')) AS header_t",
        "try_variant_get(v, '$.Header', 'string') AS header_s",
        "schema_of_variant(variant_get(v, '$.Args')) AS args_t",
        "try_variant_get(v, '$.Args', 'string') AS args_s")
    def isNum(t: org.apache.spark.sql.Column) =
      t.isin("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT") ||
        t.startsWith("DECIMAL")
    val fields = probes.selectExpr(
      "*",
      // user-agent defaults to 'DEFAULT' when absent (MsgResolver.java:64-71)
      "coalesce(get_json_object(header_s, \"$['user-agent']\"), 'DEFAULT') AS hdr_ua",
      "get_json_object(args_s, '$.event') AS arg_event",
      "get_json_object(args_s, '$.compress') AS arg_compress",
      "get_json_object(args_s, '$.encrypt') AS arg_encrypt",
      "get_json_object(args_s, '$.type') AS arg_type",
      "get_json_object(args_s, '$.key') AS arg_key")
    // getContent's branch order (MsgResolver.java:104-148): encrypted
    // payloads decrypt and IGNORE compress; only unencrypted ones inflate.
    // The type-2 chain is exactly MsgResolver.java:110-125: SM2-unwrap the
    // message's key blob, split on ',', first part is the SM4 key hex,
    // SM4-decrypt the event (each step NULL-propagating into the
    // EVENT_DECRYPT_BAD verdict).
    val content = when(col("arg_encrypt") === "1" && (col("arg_type") <=> lit("2")),
        expr(s"graft_sm4_decrypt(arg_event, " +
          s"element_at(split(graft_sm2_unwrap(arg_key, '$sm2Priv'), ','), 1))"))
      .when(col("arg_encrypt") === "1",
        expr(s"graft_aes_decrypt(arg_event, '$aesKey', '$aesIv')"))
      .when(col("arg_compress") === "1",
        expr("graft_zlib_inflate(arg_event)")).otherwise(col("arg_event"))
    val argsEmpty =
      col("arg_event").isNull && col("arg_compress").isNull && col("arg_encrypt").isNull
    // null-SAFE type checks: a MISSING field gives variant_get -> NULL and
    // schema_of_variant -> NULL, and a plain =!= comparison with NULL would
    // skip the when-branch and let the message fall through to OK. <=> and
    // the coalesce(false) keep absence on the bad path, matching
    // MsgResolver's missing-field ResolveException and the oracle.
    val verdict =
      when(col("v").isNull, "JSON_BAD")
        .when(!(col("ip_t") <=> lit("STRING")), "IP_BAD")
        .when(!coalesce(isNum(col("now_t")), lit(false)), "NOW_BAD")
        .when(!(col("header_t") <=> lit("STRING")), "HEADER_BAD")
        .when(!(col("args_t") <=> lit("STRING")) || argsEmpty, "ARGS_BAD")
        .when(col("arg_encrypt").isNotNull && !col("arg_encrypt").isin("0", "1"), "ENCRYPT_BAD")
        .when(col("arg_compress").isNotNull && !col("arg_compress").isin("0", "1"), "COMPRESS_BAD")
        // both crypto branches (type '2' = SM2/SM4, else RSA/AES — exactly
        // MsgResolver's `"2".equals(type)` split) resolve in `c`; a NULL
        // there is a decrypt failure on either branch
        .when(col("arg_encrypt") === "1" && col("c").isNull, "EVENT_DECRYPT_BAD")
        .when(expr("try_parse_json(c)").isNull, "EVENT_BAD")
        .otherwise("OK")
    fields
      .withColumn("c", content)
      .withColumn("verdict", verdict)
      .withColumn("ip_out",
        when(col("verdict") === "OK", col("ip_s")).otherwise(Enrich.NullValue))
      .withColumn("st", when(col("verdict") === "OK", col("now_s").cast("bigint")))
      .withColumn("ua_out",
        when(col("verdict") === "OK", col("hdr_ua")).otherwise(Enrich.NullValue))
      .drop("v", "ip_t", "ip_s", "now_t", "now_s", "header_t", "header_s",
        "args_t", "args_s", "hdr_ua", "arg_event", "arg_compress",
        "arg_encrypt", "arg_type", "arg_key", "c")
  }

  /** The gate DECISION chain over a resolved frame (GateFlatMapFunction's
    * drop logic): verdict filter + blocked-ak drop + per-app ip/ua
    * broadcast anti-joins. ONE implementation shared by the batch AllJob
    * and the streaming gate leg — pure column work, batch/stream-agnostic,
    * so the two cannot drift (StreamingSpec count-matches them anyway).
    */
  def passEvents(resolved: DataFrame): DataFrame = {
    val spark = resolved.sparkSession
    import spark.implicits._
    val ipB = broadcast(Etl.ipBlacklist.toDF("appkey", "ip"))
    val uaB = broadcast(Etl.uaBlacklist.toDF("appkey", "ua"))
    resolved
      .filter(col("verdict") === "OK")
      .filter(!col("appkey").isin(Etl.akBlacklist: _*))
      .join(ipB, Seq("appkey", "ip"), "left_anti")
      .join(uaB, Seq("appkey", "ua"), "left_anti")
  }

  /** gate_resolve_stats — verdict histogram (the gate job's DQ view).
    * Aggregates the UNSORTED resolver output: a global sort before a
    * groupBy is pure waste.
    */
  def gateResolveStats(t: Tables): DataFrame = {
    graft.functions.CodecExpressions.register(t.spark)
    resolveFrom(env(t)).groupBy(col("verdict")).agg(count(lit(1)).as("n"))
      .orderBy(col("verdict"))
  }
}
