package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}
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

  /** graft_lsh_band(v, table, planes) — the whole banded-hyperplane
    * signature of one LSH table as ONE fused codegen'd loop: plane j's
    * projection is Σ_d v[d]·sin(((table·planes+j)·1009+31)·(d+1)), bit j
    * set iff the projection ≥ 0 under Spark's double ordering (NaN counts
    * as largest, matching `when(proj >= 0, …)`), key = Σ set bits as
    * 1L<<j. Bit-for-bit identical to the composed
    * `aggregate(zip_with(v, transform(sin…)))` form it replaces
    * (VectorExpressionsSpec pins the equality): the plane values are the
    * SAME java.lang.Math.sin over the SAME int products, baked once
    * driver-side instead of re-evaluated per row by an interpreted
    * (CodegenFallback) higher-order chain, and the dot accumulates in the
    * same ascending-d order. Degenerate inputs mirror the composed form
    * too: a NULL vector, a vector that is not exactly 64-dim, or any NULL
    * component made every plane's projection NULL there — every bit fell
    * to `otherwise(0)` — so the key is 0, never NULL (nullable = false).
    *
    * `table` and `planes` must be foldable (they are plan-time constants
    * of the banding geometry — lshTables × lshPlanesFor(n)).
    */
  case class LshBandKey(vec: Expression, tableIdx: Expression,
      planesExpr: Expression) extends Expression {

    override def children: Seq[Expression] = Seq(vec, tableIdx, planesExpr)
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_lsh_band"

    private lazy val table: Int = tableIdx.eval(null).asInstanceOf[Int]
    private lazy val planes: Int = planesExpr.eval(null).asInstanceOf[Int]
    // flat [planes × 64], plane-major: the same Math.sin the composed
    // form's `sin` expression evaluates (one JVM), hoisted to the driver
    private lazy val hyper: Array[Double] = {
      val h = new Array[Double](planes * 64)
      var j = 0
      while (j < planes) {
        val p = table * planes + j
        var d = 0
        while (d < 64) {
          h(j * 64 + d) = java.lang.Math.sin(((p * 1009 + 31) * (d + 1)).toDouble)
          d += 1
        }
        j += 1
      }
      h
    }

    /** Shared by eval and the generated code's semantics. */
    private def computeKey(a: ArrayData): Long = {
      if (a.numElements() != 64) return 0L
      var d = 0
      while (d < 64) { if (a.isNullAt(d)) return 0L; d += 1 }
      var key = 0L
      var j = 0
      while (j < planes) {
        var acc = 0.0
        val base = j * 64
        var i = 0
        while (i < 64) { acc += a.getDouble(i) * hyper(base + i); i += 1 }
        if (acc >= 0.0 || java.lang.Double.isNaN(acc)) key |= 1L << j
        j += 1
      }
      key
    }

    override def eval(input: InternalRow): Any = {
      val v = vec.eval(input)
      if (v == null) 0L else computeKey(v.asInstanceOf[ArrayData])
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vEval = vec.genCode(ctx)
      val hRef = ctx.addReferenceObj("lshHyper", hyper, "double[]")
      val a = ctx.freshName("a"); val key = ctx.freshName("key")
      val ok = ctx.freshName("ok"); val d = ctx.freshName("d")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val base = ctx.freshName("base"); val i = ctx.freshName("i")
      val code =
        code"""
          |${vEval.code}
          |long $key = 0L;
          |if (!${vEval.isNull}) {
          |  org.apache.spark.sql.catalyst.util.ArrayData $a = ${vEval.value};
          |  boolean $ok = $a.numElements() == 64;
          |  if ($ok) {
          |    for (int $d = 0; $d < 64; $d++) {
          |      if ($a.isNullAt($d)) { $ok = false; break; }
          |    }
          |  }
          |  if ($ok) {
          |    for (int $j = 0; $j < $planes; $j++) {
          |      double $acc = 0.0;
          |      int $base = $j * 64;
          |      for (int $i = 0; $i < 64; $i++) {
          |        $acc += $a.getDouble($i) * $hRef[$base + $i];
          |      }
          |      if ($acc >= 0.0 || java.lang.Double.isNaN($acc)) $key |= 1L << $j;
          |    }
          |  }
          |}
         """.stripMargin
      ev.copy(code = code + code"\nlong ${ev.value} = $key;",
        isNull = FalseLiteral)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(vec = newChildren(0), tableIdx = newChildren(1),
        planesExpr = newChildren(2))
  }

  /** graft_centroid_best(v, cents, groupSize) — the nearest-centroid
    * argmax over a plan-time centroid matrix, two-stage-routed, as ONE
    * codegen'd expression. Returns struct(p INT, c DOUBLE): p = the
    * winning centroid's POSITION in `cents` (callers map position →
    * centroid id via their own id literal), c = its cosine.
    *
    * The rule (`Sim.centroidGroupSize` picks s; the oracle replays it in
    * SQL):
    *  - centroids live at positions 0..m-1 in ascending-id order, grouped
    *    into runs of `s` consecutive positions; group r's REPRESENTATIVE
    *    is the centroid at position r·s (its lowest-id member);
    *  - stage 1 argmaxes the row's cosine over the representatives
    *    (strictly-greater keeps the FIRST = lowest group on ties);
    *  - stage 2 argmaxes within the winning group's positions
    *    [r·s, min(r·s+s, m)) — same first-kept tie rule, which is the
    *    (ccos desc, cluster asc) order both downstream rank mirrors use.
    *  - s ≥ m collapses the whole thing to the flat argmax (one group,
    *    stage 1 trivially picks it), bit-for-bit the old single-fold
    *    semantics — that is how corpora at or below the two-stage
    *    threshold keep their r12 assignments unchanged.
    *
    * Per-row work is O(g + s) = O(2√m) cosines instead of O(m) — the knob
    * that keeps corpus-derived-k assignment (k = n/targetPop) from
    * re-dominating past n ≈ 10⁶ (NOTES r12 "scale shape beyond sf10"):
    * total assignment work drops from O(n²/targetPop) to
    * O(n^1.5/√targetPop). The routing is IVF-coarse-quantizer-shaped and
    * therefore approximate (a vector may route to a group that does not
    * hold its true nearest centroid) — exactly the documented SemDeDup /
    * IVF trade, deterministic, and mirrored in the DuckDB oracle.
    *
    * Double comparisons use Spark's SQL ordering (SQLOrderingUtil: NaN
    * largest, -0 = 0) so the expression can never diverge from the
    * composed `CASE WHEN graft_cosine(…) > acc.c` fold it replaced or
    * from the oracle's ORDER BY ccos DESC. Cosine accumulation is the
    * exact CosineSim loop. `cents` and `groupSize` must be foldable.
    */
  case class CentroidBest(vec: Expression, cents: Expression,
      groupSize: Expression) extends Expression {

    override def children: Seq[Expression] = Seq(vec, cents, groupSize)
    override def dataType: DataType = StructType(Seq(
      StructField("p", IntegerType, nullable = false),
      StructField("c", DoubleType, nullable = false)))
    override def nullable: Boolean = vec.nullable
    override def prettyName: String = "graft_centroid_best"

    private lazy val matrix: Array[Array[Double]] = {
      val arr = cents.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
    }
    private lazy val s: Int = groupSize.eval(null).asInstanceOf[Int]

    override def eval(input: InternalRow): Any = {
      val v = vec.eval(input)
      if (v == null) return null
      val a = v.asInstanceOf[ArrayData]
      val m = matrix.length
      var grpStart = 0
      if (s < m) {
        grpStart = argmax(a, 0, m, s)
        if (grpStart < 0) return new GenericInternalRow(Array[Any](-1, -1e308))
      }
      val p = argmax(a, grpStart, math.min(grpStart + s, m), 1)
      val c = if (p >= 0) cosine(a, matrix(p)) else -1e308
      new GenericInternalRow(Array[Any](p, c))
    }

    /** The exact CosineSim accumulation (same order, same zero-norm rule). */
    private def cosine(a: ArrayData, c: Array[Double]): Double = {
      val n = math.min(a.numElements(), c.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = a.getDouble(i); val yi = c(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val d = math.sqrt(nx) * math.sqrt(ny)
      if (d == 0.0) 0.0 else dot / d
    }

    private def argmax(a: ArrayData, start: Int, end: Int, step: Int): Int = {
      var bc = -1e308; var bp = -1; var i = start
      while (i < end) {
        val c = cosine(a, matrix(i))
        if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(c, bc) > 0) { bc = c; bp = i }
        i += step
      }
      bp
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vEval = vec.genCode(ctx)
      val mRef = ctx.addReferenceObj("centroids", matrix, "double[][]")
      val cosFn = ctx.freshName("graftCentCosine")
      ctx.addNewFunction(cosFn,
        s"""
           |private double $cosFn(org.apache.spark.sql.catalyst.util.ArrayData a, double[] c) {
           |  int n = Math.min(a.numElements(), c.length);
           |  double dot = 0.0, nx = 0.0, ny = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    double xi = a.getDouble(i); double yi = c[i];
           |    dot += xi * yi; nx += xi * xi; ny += yi * yi;
           |  }
           |  double d = Math.sqrt(nx) * Math.sqrt(ny);
           |  return (d == 0.0) ? 0.0 : dot / d;
           |}
         """.stripMargin)
      val argFn = ctx.freshName("graftCentArgmax")
      ctx.addNewFunction(argFn,
        s"""
           |private int $argFn(org.apache.spark.sql.catalyst.util.ArrayData a,
           |    double[][] m, int start, int end, int step) {
           |  double bc = -1e308; int bp = -1;
           |  for (int i = start; i < end; i += step) {
           |    double c = $cosFn(a, m[i]);
           |    if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(c, bc) > 0) {
           |      bc = c; bp = i;
           |    }
           |  }
           |  return bp;
           |}
         """.stripMargin)
      val m = ctx.freshName("m"); val grpStart = ctx.freshName("grpStart")
      val p = ctx.freshName("p"); val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val code =
        code"""
          |${vEval.code}
          |boolean ${ev.isNull} = ${vEval.isNull};
          |InternalRow ${ev.value} = null;
          |if (!${ev.isNull}) {
          |  double[][] $m = $mRef;
          |  int $grpStart = 0;
          |  int $p = -1;
          |  double $c = -1e308;
          |  if ($s < $m.length) {
          |    $grpStart = $argFn(${vEval.value}, $m, 0, $m.length, $s);
          |  }
          |  if ($grpStart >= 0) {
          |    $p = $argFn(${vEval.value}, $m, $grpStart,
          |      Math.min($grpStart + $s, $m.length), 1);
          |    if ($p >= 0) $c = $cosFn(${vEval.value}, $m[$p]);
          |  }
          |  Object[] $row = new Object[2];
          |  $row[0] = $p; $row[1] = $c;
          |  ${ev.value} =
          |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($row);
          |}
         """.stripMargin
      ev.copy(code = code)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(vec = newChildren(0), cents = newChildren(1),
        groupSize = newChildren(2))
  }

  /** Register the functions on an existing session (idempotent). Callable
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
    reg.registerFunction(
      FunctionIdentifier("graft_lsh_band"),
      new ExpressionInfo(classOf[LshBandKey].getName, "graft_lsh_band"),
      (children: Seq[Expression]) =>
        LshBandKey(children(0), children(1), children(2)))
    reg.registerFunction(
      FunctionIdentifier("graft_centroid_best"),
      new ExpressionInfo(classOf[CentroidBest].getName, "graft_centroid_best"),
      (children: Seq[Expression]) =>
        CentroidBest(children(0), children(1), children(2)))
  }
}
