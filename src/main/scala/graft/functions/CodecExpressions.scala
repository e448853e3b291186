package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Codec expressions for the gate transport payloads (SURVEY.md §2.10).
  *
  * The reference's gate path base64+zlib-decodes compressed event payloads
  * per record (ZlibUtil.decodeAll called from MsgResolver.java:140). Here
  * that is one nullable Catalyst expression: `graft_zlib_inflate(s)` returns
  * the inflated UTF-8 text of the base64-encoded zlib stream in `s` (after
  * the reference's ' '→'+' url-mangling repair), or NULL when the input is
  * not valid base64/zlib — the batch analog of the reference's
  * reject-on-decode-failure. CodegenFallback: the inflater dominates cost,
  * codegen would only inline the call.
  */
object CodecExpressions {

  case class ZlibInflate(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_zlib_inflate"

    override def nullSafeEval(input: Any): Any = {
      try {
        val repaired = input.asInstanceOf[UTF8String].toString.replace(' ', '+')
        val bytes = java.util.Base64.getDecoder.decode(repaired)
        val inflater = new java.util.zip.Inflater()
        inflater.setInput(bytes)
        val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
        val buf = new Array[Byte](4096)
        while (!inflater.finished()) {
          val n = inflater.inflate(buf)
          if (n == 0 && !inflater.finished()) throw new java.util.zip.DataFormatException()
          out.write(buf, 0, n)
        }
        inflater.end()
        UTF8String.fromBytes(out.toByteArray)
      } catch {
        case _: IllegalArgumentException | _: java.util.zip.DataFormatException => null
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The AES transport codec of the reference's encrypted gate path
    * (DecodeService.aesDecode / string2ByteArr contract): ciphertext is a
    * HEX string (not base64 — the wire examples in MsgResolver are hex
    * dumps), the key string's UTF-8 bytes are the AES key (16/24/32 ⇒
    * AES-128/192/256), a non-empty iv selects AES/CBC/PKCS5Padding and an
    * empty iv AES/ECB/PKCS5Padding, plaintext is UTF-8. Shared by the
    * decrypt and encrypt faces so the synthesized corpus and the resolver
    * can never drift on framing.
    */
  private def aesCipher(mode: Int, key: String, iv: String): javax.crypto.Cipher = {
    val sk = new javax.crypto.spec.SecretKeySpec(
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8), "AES")
    if (iv.nonEmpty) {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(mode, sk, new javax.crypto.spec.IvParameterSpec(
        iv.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      c
    } else {
      val c = javax.crypto.Cipher.getInstance("AES/ECB/PKCS5Padding")
      c.init(mode, sk)
      c
    }
  }

  /** Per-row `Cipher.getInstance` pays a JCE provider lookup on every
    * record of a corpus-scale gate scan; the (mode, key, iv) triple is
    * session-conf-constant in practice, so cache the initialized cipher
    * per executor thread and re-init only when the triple changes.
    * (Cipher instances are not thread-safe — hence ThreadLocal, never a
    * shared map.)
    */
  private val cachedCipher =
    new ThreadLocal[(Int, String, String, javax.crypto.Cipher)]

  private def cipherFor(mode: Int, key: String, iv: String): javax.crypto.Cipher = {
    val cached = cachedCipher.get()
    if (cached != null && cached._1 == mode && cached._2 == key && cached._3 == iv)
      cached._4
    else {
      val c = aesCipher(mode, key, iv)
      cachedCipher.set((mode, key, iv, c))
      c
    }
  }

  private def hexToBytes(s: String): Array[Byte] = {
    if (s.length % 2 != 0) throw new IllegalArgumentException("odd hex length")
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(s.charAt(2 * i), 16)
      val lo = Character.digit(s.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0) throw new IllegalArgumentException("bad hex digit")
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }

  private val hexDigits = "0123456789ABCDEF".toCharArray

  private def bytesToHex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    b.foreach { x => sb.append(hexDigits((x >> 4) & 0xf)); sb.append(hexDigits(x & 0xf)) }
    sb.toString
  }

  /** graft_aes_decrypt(hexContent, key, iv) — the encrypted-transport half
    * of the gate resolver (MsgResolver.java:126-135's RSA/AES branch,
    * post key-unwrap): NULL on any failure (bad hex, wrong key size, bad
    * block length, bad padding) — the batch analog of the reference's
    * reject-on-decrypt-failure ResolveException. CodegenFallback: the
    * cipher call dominates cost, codegen would only inline the call.
    */
  case class AesDecrypt(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_aes_decrypt"

    override def nullSafeEval(content: Any, key: Any, iv: Any): Any = {
      try {
        val c = cipherFor(javax.crypto.Cipher.DECRYPT_MODE,
          key.asInstanceOf[UTF8String].toString, iv.asInstanceOf[UTF8String].toString)
        val plain = c.doFinal(hexToBytes(content.asInstanceOf[UTF8String].toString))
        UTF8String.fromBytes(plain)
      } catch {
        case _: Exception => null
      }
    }

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** graft_aes_encrypt(plain, key, iv) — the synthesis face (uppercase hex
    * out), used by the envelope generator to mint the encrypted transport
    * rows the resolver then proves it can open. NULL on failure.
    */
  case class AesEncrypt(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_aes_encrypt"

    override def nullSafeEval(content: Any, key: Any, iv: Any): Any = {
      try {
        val c = cipherFor(javax.crypto.Cipher.ENCRYPT_MODE,
          key.asInstanceOf[UTF8String].toString, iv.asInstanceOf[UTF8String].toString)
        UTF8String.fromString(bytesToHex(c.doFinal(
          content.asInstanceOf[UTF8String].toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      } catch {
        case _: Exception => null
      }
    }

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_zlib_inflate"),
      new ExpressionInfo(classOf[ZlibInflate].getName, "graft_zlib_inflate"),
      (children: Seq[Expression]) => ZlibInflate(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_aes_decrypt"),
      new ExpressionInfo(classOf[AesDecrypt].getName, "graft_aes_decrypt"),
      (children: Seq[Expression]) => AesDecrypt(children(0), children(1), children(2)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_aes_encrypt"),
      new ExpressionInfo(classOf[AesEncrypt].getName, "graft_aes_encrypt"),
      (children: Seq[Expression]) => AesEncrypt(children(0), children(1), children(2)))
  }
}
