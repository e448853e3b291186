package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

    // the geometry args are read with eval(null) at plan build — a
    // non-foldable or non-INT argument (possible from raw SQL since the
    // function is session-registered) must fail ANALYSIS with a clear
    // message, not throw an opaque NPE/ClassCastException at execution
    override def checkInputDataTypes(): TypeCheckResult =
      if (!tableIdx.foldable || !planesExpr.foldable)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: table and planes must be foldable (plan-time constants)")
      else if (tableIdx.dataType != IntegerType ||
          planesExpr.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: table and planes must be INT, got " +
            s"(${tableIdx.dataType.simpleString}, ${planesExpr.dataType.simpleString})")
      // a typed NULL constant (CAST(NULL AS INT)) is foldable and INT but
      // would unbox to 0 — planes=0 bands every row to key 0 SILENTLY,
      // the opposite of what this guard exists for
      else if (tableIdx.eval(null) == null || planesExpr.eval(null) == null)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: table and planes must not be NULL")
      else TypeCheckResult.TypeCheckSuccess

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

  /** graft_centroid_best(v, cents, nSupers) — the nearest-centroid
    * argmax over a plan-time centroid matrix, two-stage-routed through
    * VORONOI CELLS of super-centroids, as ONE codegen'd expression.
    * Returns struct(p INT, c DOUBLE): p = the winning centroid's
    * POSITION in `cents` (callers map position → centroid id via their
    * own id literal), c = its cosine.
    *
    * The rule (`Sim.centroidSuperCount` picks g; the oracle replays it
    * in SQL):
    *  - centroids live at positions 0..m-1 in ascending-id order; the
    *    first g positions are the SUPER-centroids;
    *  - each super owns its own cell; every other centroid belongs to
    *    the cell of its nearest super (argmax cosine over the supers in
    *    ascending position, strictly-greater keeps the first — the
    *    (ccos desc, super asc) rank order). Computed ONCE at plan build
    *    from the matrix itself — deterministic, no training;
    *  - stage 1 ranks the g supers by the row's cosine (same first-kept
    *    rule) and keeps the top `nProbes` cells — IVF's nprobe: probing
    *    more than one cell is what keeps boundary vectors from
    *    misrouting, and misroutes CONCENTRATE (single-probe measured
    *    Σpop² at 1.76× flat on the 100× corpus); stage 2 argmaxes over
    *    the UNION of the probed cells' members under the
    *    (ccos desc, position asc) rule all downstream rank mirrors use
    *    (cells partition the centroids, so the union has no duplicate
    *    candidates and any iteration order agrees given the explicit
    *    tie-on-position rule).
    *  - g = 1 collapses the whole thing to the flat argmax (one cell
    *    holding every centroid), bit-for-bit the old single-fold
    *    semantics — that is how corpora at or below the two-stage
    *    threshold keep their r12 assignments unchanged.
    *
    * WHY CELLS, NOT ID-RANGES: ids are semantically arbitrary, so
    * routing through fixed id-blocks of √m centroids concentrates mass
    * on each block's few "attractor" centroids — measured on the 100×
    * corpus it multiplied Σpop² (the within-cluster pair-work proxy) by
    * 4.6× and the hot cluster by 5×, trading the assignment cliff for a
    * pair-work cliff. Voronoi cells of real supers are geometrically
    * coherent (the textbook IVF coarse quantizer, deterministic
    * edition): a vector's routed cell almost always holds its true
    * nearest centroid, so the assignment — and the cluster balance the
    * pair faces inherit — stays near-identical to the flat argmax.
    *
    * Per-row work is g + nProbes·E[|cell|] ≈ O((1+nProbes)·√m) cosines
    * on balanced cells instead of O(m) — total assignment drops from
    * O(n²/targetPop) to O(n^1.5/√targetPop); a degenerate corpus that
    * collapses every centroid into one cell degrades back to the flat
    * cost, never past it. Routing is approximate exactly like
    * production IVF (a vector whose true nearest centroid sits outside
    * every probed cell lands on the probed cells' best) —
    * deterministic, and mirrored in the DuckDB oracle.
    *
    * Double comparisons use Spark's SQL ordering (SQLOrderingUtil: NaN
    * largest, -0 = 0) so the expression can never diverge from the
    * composed `CASE WHEN graft_cosine(…) > acc.c` fold it replaced or
    * from the oracle's ORDER BY ccos DESC. Cosine accumulation is the
    * exact CosineSim loop, shared by the plan-build cell assignment.
    * `cents`, `nSupers` and `nProbes` must be foldable; nProbes is
    * clamped to [1, g].
    */
  case class CentroidBest(vec: Expression, cents: Expression,
      nSupers: Expression, nProbes: Expression) extends Expression {

    override def children: Seq[Expression] = Seq(vec, cents, nSupers, nProbes)
    override def dataType: DataType = StructType(Seq(
      StructField("p", IntegerType, nullable = false),
      StructField("c", DoubleType, nullable = false)))
    override def nullable: Boolean = vec.nullable
    override def prettyName: String = "graft_centroid_best"

    // same analysis-time guard as LshBandKey for the SCALAR args (read
    // with eval(null) at plan build — non-foldable or non-INT must fail
    // analysis, not crash codegen). `cents` is deliberately NOT
    // foldable-checked here: an aliased literal column (the spec's
    // `.withColumn("cents", lit(...))` shape) is an AttributeReference
    // at analysis — never foldable — yet becomes a plan-time constant
    // once projection collapse inlines it; a genuinely non-constant
    // cents gets the clear lazy error below instead.
    override def checkInputDataTypes(): TypeCheckResult =
      if (!nSupers.foldable || !nProbes.foldable)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: nSupers and nProbes must be foldable " +
            "(plan-time constants)")
      else if (nSupers.dataType != IntegerType ||
          nProbes.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: nSupers and nProbes must be INT, got " +
            s"(${nSupers.dataType.simpleString}, ${nProbes.dataType.simpleString})")
      // typed NULL INT constants unbox to 0 (g=0 ⇒ silent flat fallback)
      else if (nSupers.eval(null) == null || nProbes.eval(null) == null)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: nSupers and nProbes must not be NULL")
      else TypeCheckResult.TypeCheckSuccess

    private lazy val matrix: Array[Array[Double]] = {
      val evaluated =
        try cents.eval(null)
        catch { case e: Exception => throw new IllegalArgumentException(
          s"$prettyName: centroids must be a plan-time constant " +
            "array<array<double>> (a literal, or a column that folds to " +
            "one before execution)", e)
        }
      // a NULL constant evaluates without throwing — catch it here, not
      // as a bare NPE on numElements below
      if (evaluated == null) throw new IllegalArgumentException(
        s"$prettyName: centroids must not be NULL")
      val arr = evaluated.asInstanceOf[ArrayData]
      Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
    }
    private lazy val g: Int =
      math.min(nSupers.eval(null).asInstanceOf[Int], math.max(matrix.length, 1))
    private lazy val probes: Int =
      math.max(1, math.min(nProbes.eval(null).asInstanceOf[Int], g))

    /** cell partition as (cellStart, members): members holds centroid
      * positions grouped by cell, ascending position within a cell;
      * cell j's members are members[cellStart(j) until cellStart(j+1)].
      */
    private lazy val cells: (Array[Int], Array[Int]) = {
      val m = matrix.length
      val cellOf = Array.tabulate(m) { p =>
        if (p < g) p // supers own their cell — no cell is ever empty
        else {
          var bc = -1e308; var bp = 0; var j = 0
          while (j < g) {
            val c = cosineArr(matrix(p), matrix(j))
            if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
                .compareDoubles(c, bc) > 0) { bc = c; bp = j }
            j += 1
          }
          bp
        }
      }
      val counts = new Array[Int](g + 1)
      cellOf.foreach(c => counts(c + 1) += 1)
      for (j <- 1 to g) counts(j) += counts(j - 1)
      val start = counts.clone()
      val members = new Array[Int](m)
      val fill = counts.clone()
      var p = 0
      while (p < m) { members(fill(cellOf(p))) = p; fill(cellOf(p)) += 1; p += 1 }
      (start, members)
    }

    /** Driver-side twin of `cosine` for the plan-build cell assignment —
      * same accumulation order, so the oracle's centroid×super rank
      * replays it bit-for-bit.
      */
    private def cosineArr(a: Array[Double], c: Array[Double]): Double = {
      val n = math.min(a.length, c.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = a(i); val yi = c(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val d = math.sqrt(nx) * math.sqrt(ny)
      if (d == 0.0) 0.0 else dot / d
    }

    override def eval(input: InternalRow): Any = {
      val v = vec.eval(input)
      if (v == null) return null
      val a = v.asInstanceOf[ArrayData]
      val m = matrix.length
      val (cellStart, members) = cells
      var p = -1; var c = -1e308
      if (g <= 1 || g >= m) {
        p = argmaxRange(a, 0, m)
      } else {
        // top-`probes` supers by (cos desc, pos asc). Stage-1 cosines are
        // computed ONCE (g evals) and the selection passes read the cache;
        // a super is the only member of its own cell, so stage 2 reuses
        // its cached value too — same numbers, ~1/3 the cosine work of
        // re-deriving them per pass (mirrors the generated probeFn).
        val superCos = Array.tabulate(g)(j => cosine(a, matrix(j)))
        val picked = new Array[Boolean](g)
        var pr = 0
        var bp2 = -1; var bc2 = -1e308
        while (pr < probes) {
          var bc = -1e308; var bs = -1; var j = 0
          while (j < g) {
            if (!picked(j) && org.apache.spark.sql.catalyst.util.SQLOrderingUtil
                .compareDoubles(superCos(j), bc) > 0) { bc = superCos(j); bs = j }
            j += 1
          }
          if (bs >= 0) {
            picked(bs) = true
            var i = cellStart(bs)
            while (i < cellStart(bs + 1)) {
              val cp = members(i)
              val cc = if (cp < g) superCos(cp) else cosine(a, matrix(cp))
              val cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
                .compareDoubles(cc, bc2)
              if (cmp > 0 || (cmp == 0 && (bp2 < 0 || cp < bp2))) {
                bc2 = cc; bp2 = cp
              }
              i += 1
            }
            pr += 1
          } else pr = probes
        }
        p = bp2
      }
      if (p >= 0) c = cosine(a, matrix(p))
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

    private def argmaxRange(a: ArrayData, start: Int, end: Int): Int = {
      var bc = -1e308; var bp = -1; var i = start
      while (i < end) {
        val c = cosine(a, matrix(i))
        if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(c, bc) > 0) { bc = c; bp = i }
        i += 1
      }
      bp
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vEval = vec.genCode(ctx)
      val mRef = ctx.addReferenceObj("centroids", matrix, "double[][]")
      val startRef = ctx.addReferenceObj("cellStart", cells._1, "int[]")
      val membersRef = ctx.addReferenceObj("cellMembers", cells._2, "int[]")
      // addNewFunction returns the name to CALL the helper by — possibly
      // qualified with a nested-class instance when the generated outer
      // class overflows and Spark spills functions into NestedClasses.
      // Using the bare freshName instead would fail Janino compilation on
      // exactly the wide plans this expression exists to speed up (and
      // silently fall back to interpreted execution).
      val cosFnRaw = ctx.freshName("graftCentCosine")
      val cosFn = ctx.addNewFunction(cosFnRaw,
        s"""
           |private double $cosFnRaw(org.apache.spark.sql.catalyst.util.ArrayData a, double[] c) {
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
      val rangeFnRaw = ctx.freshName("graftCentArgmaxRange")
      val rangeFn = ctx.addNewFunction(rangeFnRaw,
        s"""
           |private int $rangeFnRaw(org.apache.spark.sql.catalyst.util.ArrayData a,
           |    double[][] m, int start, int end) {
           |  double bc = -1e308; int bp = -1;
           |  for (int i = start; i < end; i++) {
           |    double c = $cosFn(a, m[i]);
           |    if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(c, bc) > 0) {
           |      bc = c; bp = i;
           |    }
           |  }
           |  return bp;
           |}
         """.stripMargin)
      val probeFnRaw = ctx.freshName("graftCentProbe")
      val probeFn = ctx.addNewFunction(probeFnRaw,
        s"""
           |private int $probeFnRaw(org.apache.spark.sql.catalyst.util.ArrayData a,
           |    double[][] m, int[] cellStart, int[] members, int g, int probes) {
           |  // stage-1 cosines computed ONCE (g evals), not re-derived on
           |  // every selection pass; a super is the only member of its own
           |  // cell, so stage 2 reuses its cached value too
           |  double[] superCos = new double[g];
           |  for (int j = 0; j < g; j++) superCos[j] = $cosFn(a, m[j]);
           |  boolean[] picked = new boolean[g];
           |  int bp2 = -1; double bc2 = -1e308;
           |  for (int pr = 0; pr < probes; pr++) {
           |    double bc = -1e308; int bs = -1;
           |    for (int j = 0; j < g; j++) {
           |      if (!picked[j]
           |          && org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(superCos[j], bc) > 0) {
           |        bc = superCos[j]; bs = j;
           |      }
           |    }
           |    if (bs < 0) break;
           |    picked[bs] = true;
           |    for (int i = cellStart[bs]; i < cellStart[bs + 1]; i++) {
           |      int cp = members[i];
           |      double cc = (cp < g) ? superCos[cp] : $cosFn(a, m[cp]);
           |      int cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(cc, bc2);
           |      if (cmp > 0 || (cmp == 0 && (bp2 < 0 || cp < bp2))) {
           |        bc2 = cc; bp2 = cp;
           |      }
           |    }
           |  }
           |  return bp2;
           |}
         """.stripMargin)
      val m = ctx.freshName("m")
      val p = ctx.freshName("p"); val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val code =
        code"""
          |${vEval.code}
          |boolean ${ev.isNull} = ${vEval.isNull};
          |InternalRow ${ev.value} = null;
          |if (!${ev.isNull}) {
          |  double[][] $m = $mRef;
          |  int $p = -1;
          |  double $c = -1e308;
          |  if ($g <= 1 || $g >= $m.length) {
          |    $p = $rangeFn(${vEval.value}, $m, 0, $m.length);
          |  } else {
          |    $p = $probeFn(${vEval.value}, $m, $startRef, $membersRef, $g, $probes);
          |  }
          |  if ($p >= 0) $c = $cosFn(${vEval.value}, $m[$p]);
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
        nSupers = newChildren(2), nProbes = newChildren(3))
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
        CentroidBest(children(0), children(1), children(2), children(3)))
  }
}
