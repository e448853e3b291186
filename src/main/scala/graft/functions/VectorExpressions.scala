package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions for the vector/fingerprint hot paths
  * (SURVEY.md §2.8). The composed form (`zip_with` + `aggregate`) allocates
  * an intermediate array per row and interprets two lambdas; these generate
  * a single fused loop inside whole-stage codegen — the (b)-tier of the
  * custom-operator preference order (custom Expression before custom
  * physical operator, UDF never).
  *
  * Summation is strictly left-to-right, bit-for-bit identical to the
  * sequential `aggregate` fold, so swapping implementations can never change
  * oracle-checked results.
  */
object VectorExpressions {

  /** cosine(a, b) over array<double>; 0.0 when either norm is 0. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val d = math.sqrt(nx) * math.sqrt(ny)
      if (d == 0.0) 0.0 else dot / d
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // freshName on every local: two cosine calls in one generated
        // function must not redeclare the same variables (a collision
        // makes janino reject the WHOLE projection → interpreter fallback)
        val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val i = ctx.freshName("i"); val d = ctx.freshName("d")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = $a.getDouble($i); double $yi = $b.getDouble($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |double $d = Math.sqrt($nx) * Math.sqrt($ny);
           |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** hamming(a, b) over two int64 fingerprints (bit_count(a^b), fused). */
  case class HammingDistance(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hamming"

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Register both functions on an existing session (idempotent). Callable
    * directly or via the GraftExtensions `spark.sql.extensions` hook.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (children: Seq[Expression]) => HammingDistance(children(0), children(1)))
  }
}
