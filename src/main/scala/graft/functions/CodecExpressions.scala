package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
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
    * record of a corpus-scale gate scan; the (key, iv) pair is
    * session-conf-constant in practice, so cache the initialized cipher
    * per executor thread and re-init only when the pair changes. One slot
    * PER MODE (the gate plan evaluates the encrypt face and the decrypt
    * face for the same row on the same task thread — a single shared slot
    * would alternate modes every row and never hit), and a thrown doFinal
    * evicts its slot rather than trusting the JCE provider to reset a
    * failed cipher. (Cipher instances are not thread-safe — hence
    * ThreadLocal, never a shared map.)
    */
  private val cachedCipher =
    new ThreadLocal[Array[(String, String, javax.crypto.Cipher)]] {
      // index = Cipher mode constant (ENCRYPT_MODE=1, DECRYPT_MODE=2)
      override def initialValue(): Array[(String, String, javax.crypto.Cipher)] =
        new Array[(String, String, javax.crypto.Cipher)](3)
    }

  /** doFinal through the per-thread per-mode cipher cache; evicts the slot
    * on failure before rethrowing so a poisoned cipher is never reused.
    */
  private def aesDoFinal(mode: Int, key: String, iv: String,
      data: Array[Byte]): Array[Byte] = {
    val slots = cachedCipher.get()
    val cached = slots(mode)
    val c =
      if (cached != null && cached._1 == key && cached._2 == iv) cached._3
      else {
        val fresh = aesCipher(mode, key, iv)
        slots(mode) = (key, iv, fresh)
        fresh
      }
    try c.doFinal(data)
    catch {
      case e: Exception =>
        slots(mode) = null
        throw e
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
        val plain = aesDoFinal(javax.crypto.Cipher.DECRYPT_MODE,
          key.asInstanceOf[UTF8String].toString, iv.asInstanceOf[UTF8String].toString,
          hexToBytes(content.asInstanceOf[UTF8String].toString))
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
        UTF8String.fromString(bytesToHex(aesDoFinal(
          javax.crypto.Cipher.ENCRYPT_MODE,
          key.asInstanceOf[UTF8String].toString, iv.asInstanceOf[UTF8String].toString,
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

  /** graft_sm4_decrypt(hexContent, keyHex) — the symmetric half of the
    * type-2 gate branch (MsgResolver.java:123-125: hutool SmUtil.sm4 =
    * SM4/ECB/PKCS5): ciphertext is a hex string, the key is the HEX of the
    * 16 SM4 key bytes (the format the SM2 unwrap yields — HexUtil.decodeHex
    * in MsgResolver.java:122), plaintext is UTF-8. NULL on any failure
    * (bad hex, bad length, bad padding) = the reject verdict.
    */
  case class Sm4Decrypt(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_sm4_decrypt"

    override def nullSafeEval(content: Any, key: Any): Any = {
      try {
        UTF8String.fromBytes(graft.functions.SmCrypto.sm4DecryptEcb(
          hexToBytes(key.asInstanceOf[UTF8String].toString),
          hexToBytes(content.asInstanceOf[UTF8String].toString)))
      } catch {
        case _: Exception => null
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** graft_sm4_encrypt(plain, keyHex) — the synthesis face (uppercase hex
    * out), used by the envelope generator to mint the type-2 encrypted
    * transport rows. NULL on failure.
    */
  case class Sm4Encrypt(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_sm4_encrypt"

    override def nullSafeEval(content: Any, key: Any): Any = {
      try {
        UTF8String.fromString(bytesToHex(graft.functions.SmCrypto.sm4EncryptEcb(
          hexToBytes(key.asInstanceOf[UTF8String].toString),
          content.asInstanceOf[UTF8String].toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      } catch {
        case _: Exception => null
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** The SM2 key-unwrap result is cached per executor thread: the wrapped
    * key rides every message of a connection in the reference (and is a
    * session constant in the synthesized corpus), so the ~1 ms EC scalar
    * multiplication runs once per task thread per DISTINCT wrapped key —
    * not once per row.
    */
  private val cachedUnwrap = new ThreadLocal[(String, String, Any)]

  /** graft_sm2_unwrap(keyHex, privHex) — the asymmetric half of the type-2
    * gate branch (MsgResolver.java:110-117): hex-decode the BCD ciphertext
    * (prepending the uncompressed-point marker '04' when absent, exactly
    * the reference's startsWith check), SM2-decrypt (C1C3C2) with the
    * private key, return the UTF-8 plaintext (the "sm4KeyHex,..." blob the
    * resolver then splits). NULL on any failure.
    */
  case class Sm2Unwrap(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_sm2_unwrap"

    override def nullSafeEval(key: Any, priv: Any): Any = {
      val keyHex0 = key.asInstanceOf[UTF8String].toString
      val privHex = priv.asInstanceOf[UTF8String].toString
      val cached = cachedUnwrap.get()
      if (cached != null && cached._1 == keyHex0 && cached._2 == privHex) cached._3
      else {
        val result =
          try {
            val keyHex = if (keyHex0.startsWith("04")) keyHex0 else "04" + keyHex0
            UTF8String.fromBytes(graft.functions.SmCrypto.sm2Decrypt(
              BigInt(privHex, 16), hexToBytes(keyHex)))
          } catch {
            case _: Exception => null
          }
        cachedUnwrap.set((keyHex0, privHex, result))
        result
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
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
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sm4_decrypt"),
      new ExpressionInfo(classOf[Sm4Decrypt].getName, "graft_sm4_decrypt"),
      (children: Seq[Expression]) => Sm4Decrypt(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sm4_encrypt"),
      new ExpressionInfo(classOf[Sm4Encrypt].getName, "graft_sm4_encrypt"),
      (children: Seq[Expression]) => Sm4Encrypt(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sm2_unwrap"),
      new ExpressionInfo(classOf[Sm2Unwrap].getName, "graft_sm2_unwrap"),
      (children: Seq[Expression]) => Sm2Unwrap(children(0), children(1)))
  }
}
