package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
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

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_zlib_inflate"),
      new ExpressionInfo(classOf[ZlibInflate].getName, "graft_zlib_inflate"),
      (children: Seq[Expression]) => ZlibInflate(children.head))
  }
}
