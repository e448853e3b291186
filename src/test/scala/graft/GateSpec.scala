package graft

import graft.operators.{Envelope, Etl, Gate}
import org.apache.spark.sql.functions._

/** Gate transport envelope (MsgResolver re-expression) on literal wire
  * messages, including the zlib-compressed payload path the DuckDB oracle
  * cannot cover.
  */
class GateSpec extends SparkSpec {

  private def resolveLiteral(msgs: Seq[(Long, String)]) = {
    import spark.implicits._
    graft.functions.CodecExpressions.register(spark)
    val env = msgs.toDF("event_id", "gate_msg")
    Gate.resolveFrom(env).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("verdict"), r.getAs[String]("ip_out"),
          Option(r.getAs[java.lang.Long]("st")), r.getAs[String]("ua_out"))).toMap
  }

  private def deflateB64(s: String): String = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(s.getBytes("UTF-8")); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  private def gate(ip: String, args: String): String = {
    val header = """{\"user-agent\":\"UA-X\"}"""
    s"""{"Ip":"$ip","Now":1700000000,"Header":"$header","Args":"${args
      .replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
  }

  test("gate resolve: happy path, compressed path, and every reject stage") {
    val plain = """{"ak":"app1","data":[{"dt":"evt","pr":{}}]}"""
    val zl = deflateB64(plain)
    val msgs = Seq(
      1L -> gate("1.2.3.4", s"""{"event":"${plain.replace("\"", "\\\"")}","compress":"0"}"""),
      2L -> gate("1.2.3.4", s"""{"event":"$zl","compress":"1"}"""),
      // the reference repairs url-mangled '+' -> ' ' before decode
      3L -> gate("1.2.3.4", s"""{"event":"${zl.replace('+', ' ')}","compress":"1"}"""),
      4L -> "not json at all",
      5L -> s"""{"Ip":5,"Now":1,"Header":"{}","Args":"{\\"event\\":\\"x\\"}"}""",
      6L -> s"""{"Ip":"1.2.3.4","Now":"later","Header":"{}","Args":"{\\"event\\":\\"x\\"}"}""",
      7L -> s"""{"Ip":"1.2.3.4","Now":1,"Header":7,"Args":"{\\"event\\":\\"x\\"}"}""",
      8L -> s"""{"Ip":"1.2.3.4","Now":1,"Header":"{}","Args":"{}"}""",
      9L -> gate("1.2.3.4", s"""{"event":"$zl","compress":"7"}"""),
      // encrypt=1 with no type falls into the RSA/AES branch
      // (MsgResolver's "2".equals(type) split) — a base64 payload is not
      // valid hex ciphertext, so the decrypt verdict fires
      10L -> gate("1.2.3.4", s"""{"event":"$zl","compress":"0","encrypt":"1"}"""),
      11L -> gate("1.2.3.4", s"""{"event":"NOTB64***","compress":"1"}"""),
      12L -> gate("1.2.3.4", s"""{"event":"not json","compress":"0"}"""),
      // the AES transport path: real ciphertext under the session key
      13L -> gate("1.2.3.4",
        s"""{"event":"${aesHex(plain)}","compress":"0","encrypt":"1","type":"1","key":"w"}"""),
      // type 2 with a GARBAGE key blob: the SM2 unwrap fails -> reject
      14L -> gate("1.2.3.4",
        s"""{"event":"${aesHex(plain)}","compress":"0","encrypt":"1","type":"2","key":"w"}"""),
      // truncated ciphertext (not a whole block) must reject, not crash
      15L -> gate("1.2.3.4",
        s"""{"event":"${aesHex(plain).take(16)}","compress":"0","encrypt":"1","type":"1","key":"w"}"""),
      // the SM2/SM4 transport path end-to-end: SM4 ciphertext + the
      // SM2-wrapped key blob (whose leading '04' the generator strips, so
      // this also exercises the prepend branch of MsgResolver.java:112)
      16L -> gate("1.2.3.4",
        s"""{"event":"${sm4Hex(plain)}","compress":"0","encrypt":"1","type":"2","key":"${Envelope.gateSm2WrappedKey}"}"""),
      // truncated SM4 ciphertext rejects on the type-2 branch too
      17L -> gate("1.2.3.4",
        s"""{"event":"${sm4Hex(plain).take(16)}","compress":"0","encrypt":"1","type":"2","key":"${Envelope.gateSm2WrappedKey}"}"""))
    val r = resolveLiteral(msgs)
    assert(r(1L)._1 == "OK" && r(1L)._2 == "1.2.3.4" && r(1L)._3.contains(1700000000L))
    assert(r(1L)._4 == "UA-X")
    assert(r(2L)._1 == "OK", s"zlib path: ${r(2L)}")
    assert(r(3L)._1 == "OK", s"space-mangled zlib path: ${r(3L)}")
    assert(r(4L)._1 == "JSON_BAD")
    assert(r(5L)._1 == "IP_BAD")
    assert(r(6L)._1 == "NOW_BAD")
    assert(r(7L)._1 == "HEADER_BAD")
    assert(r(8L)._1 == "ARGS_BAD")
    assert(r(9L)._1 == "COMPRESS_BAD")
    assert(r(10L)._1 == "EVENT_DECRYPT_BAD")
    assert(r(11L)._1 == "EVENT_BAD") // zlib decode failure = reject, like the reference
    assert(r(12L)._1 == "EVENT_BAD")
    assert(r(13L)._1 == "OK" && r(13L)._2 == "1.2.3.4", s"AES path: ${r(13L)}")
    assert(r(14L)._1 == "EVENT_DECRYPT_BAD")
    assert(r(15L)._1 == "EVENT_DECRYPT_BAD")
    assert(r(16L)._1 == "OK" && r(16L)._2 == "1.2.3.4", s"SM2/SM4 path: ${r(16L)}")
    assert(r(17L)._1 == "EVENT_DECRYPT_BAD")
  }

  /** SM4/ECB/PKCS5 hex encrypt through SmCrypto's primitive (the
    * INDEPENDENT vectors pinning that primitive against OpenSSL live in
    * SmCryptoSpec; this face just frames for the gate wire format).
    */
  private def sm4Hex(plain: String): String =
    graft.functions.SmCrypto.sm4EncryptEcb(
      Envelope.gateSm4KeyHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      plain.getBytes("UTF-8")).map("%02X".format(_)).mkString

  /** Independent AES-CBC/PKCS5 hex encrypt (javax.crypto directly, NOT the
    * graft expression) — the known-vector discipline: the spec's cipher
    * and the engine's decipher are separate implementations.
    */
  private def aesHex(plain: String,
      key: String = Envelope.gateAesKey, iv: String = Envelope.gateAesIv): String = {
    val sk = new javax.crypto.spec.SecretKeySpec(key.getBytes("UTF-8"), "AES")
    val c = javax.crypto.Cipher.getInstance(
      if (iv.nonEmpty) "AES/CBC/PKCS5Padding" else "AES/ECB/PKCS5Padding")
    if (iv.nonEmpty)
      c.init(javax.crypto.Cipher.ENCRYPT_MODE, sk,
        new javax.crypto.spec.IvParameterSpec(iv.getBytes("UTF-8")))
    else c.init(javax.crypto.Cipher.ENCRYPT_MODE, sk)
    c.doFinal(plain.getBytes("UTF-8")).map("%02X".format(_)).mkString
  }

  test("aes codec: round trip, modes, unicode, and every failure -> NULL") {
    import spark.implicits._
    graft.functions.CodecExpressions.register(spark)
    val key = Envelope.gateAesKey
    val iv = Envelope.gateAesIv
    def dec(content: String, k: String = key, i: String = iv): Option[String] = {
      val r = Seq(content).toDF("x")
        .selectExpr(s"graft_aes_decrypt(x, '$k', '$i')").collect()(0)
      Option(r.getString(0))
    }
    val uni = """{"ak":"app1","note":"中文 ünïcode ✓"}"""
    // CBC round trip against the independent cipher, ascii + unicode
    assert(dec(aesHex("hello")) == Some("hello"))
    assert(dec(aesHex(uni)) == Some(uni))
    // lowercase hex decodes too (Integer.parseInt(_, 16) contract)
    assert(dec(aesHex("hello").toLowerCase) == Some("hello"))
    // ECB mode when iv is empty (DecodeService's iv-null branch)
    assert(dec(aesHex("ecb path", iv = ""), i = "") == Some("ecb path"))
    // the engine's own encrypt face round-trips through its decrypt face
    val viaExpr = Seq("self trip").toDF("x")
      .selectExpr(s"graft_aes_decrypt(graft_aes_encrypt(x, '$key', '$iv'), '$key', '$iv')")
      .collect()(0).getString(0)
    assert(viaExpr == "self trip")
    // failures reject as NULL: wrong key, non-hex, odd length, short
    // block, bad padding source
    assert(dec(aesHex("hello"), k = "WrongKey16Bytes!").isEmpty)
    assert(dec("ZZZZ").isEmpty)
    assert(dec(aesHex("hello").drop(1)).isEmpty)  // odd hex length
    assert(dec(aesHex("hello").take(16)).isEmpty) // half a block
    assert(dec("00112233445566778899AABBCCDDEEFF").isEmpty) // garbage block
  }

  test("MISSING fields reject like mistyped ones (null-safe type verdicts)") {
    // absence must not fall through to OK: variant_get on a missing key is
    // NULL, and a non-null-safe comparison would skip every bad branch
    val got = resolveLiteral(Seq(
      1L -> """{"Now":1700000000,"Header":"{}","Args":"{}"}""",          // no Ip
      2L -> """{"Ip":"1.2.3.4","Header":"{}","Args":"{}"}""",            // no Now
      3L -> """{"Ip":"1.2.3.4","Now":1700000000,"Args":"{}"}""",         // no Header
      4L -> """{"Ip":"1.2.3.4","Now":1700000000,"Header":"{}"}""",       // no Args
      5L -> """{"Ip":null,"Now":1700000000,"Header":"{}","Args":"{}"}""" // JSON null Ip
    ))
    assert(got(1L)._1 == "IP_BAD")
    assert(got(2L)._1 == "NOW_BAD")
    assert(got(3L)._1 == "HEADER_BAD")
    assert(got(4L)._1 == "ARGS_BAD")
    assert(got(5L)._1 == "IP_BAD")
  }

  test("header without user-agent falls back to DEFAULT") {
    val plain = """{"a":1}"""
    val m = s"""{"Ip":"9.9.9.9","Now":2,"Header":"{\\"x\\":\\"1\\"}","Args":"{\\"event\\":\\"${plain
      .replace("\"", "\\\\\\\"")}\\"}"}"""
    val r = resolveLiteral(Seq(20L -> m))
    assert(r(20L)._1 == "OK" && r(20L)._4 == "DEFAULT")
  }

  test("synthesized gate corpus: every verdict appears, OK dominates") {
    val counts = Gate.gateResolveStats(t).collect()
      .map(r => r.getAs[String]("verdict") -> r.getAs[Long]("n")).toMap
    for (v <- Seq("OK", "JSON_BAD", "IP_BAD", "NOW_BAD", "HEADER_BAD",
        "ARGS_BAD", "COMPRESS_BAD", "EVENT_DECRYPT_BAD", "EVENT_BAD"))
      assert(counts.contains(v), s"verdict $v never produced; got $counts")
    assert(counts("OK") > counts.values.sum / 2)
  }

  test("full schema matrix flags each synthesized violation class") {
    val errs = Etl.schemaCheck(t).collect()
      .flatMap(_.getAs[String]("errors").split(",")).filter(_.nonEmpty).toSet
    for (tag <- Seq("BASIC_SCHEMA_FORMAT_NOT_MATCH", "DATA_NONE", "DATA_PR_NONE",
        "SID_TYPE", "CT_TYPE", "TZ_NONE", "DEBUG_TYPE", "PL_ENUM", "SDKV_NONE",
        "DID_NONE", "DID_LEN", "UT_NONE"))
      assert(errs.contains(tag), s"violation $tag never flagged; got $errs")
    // presence checks for always-present fields must never fire
    for (tag <- Seq("AK_NONE", "SLN_NONE", "OWNER_NONE", "SDK_NONE", "USR_NONE",
        "IP_NONE", "UA_NONE", "DATA_DT_NONE", "DEBUG_NONE"))
      assert(!errs.contains(tag), s"spurious violation $tag; got $errs")
  }
}
