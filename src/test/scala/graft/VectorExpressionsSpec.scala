package graft

import graft.functions.VectorExpressions
import graft.operators.Sim
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("native cosine matches the higher-order-function fold bit-for-bit") {
    VectorExpressions.register(spark)
    val e = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(
        expr("graft_cosine(a.v, b.v)").as("native"),
        (Sim.dot(col("a.v"), col("b.v")) / (Sim.norm(col("a.v")) * Sim.norm(col("b.v"))))
          .as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("native cosine handles zero vectors and self-similarity") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b")
      .selectExpr("graft_cosine(a, b) AS c").collect().map(_.getDouble(0))
    assert(math.abs(df(0) - 1.0) < 1e-12) // identical vectors
    assert(df(1) == 0.0)                  // zero-norm guard
    assert(math.abs(df(2)) < 1e-12)       // orthogonal
  }

  test("native hamming matches bit_count(xor)") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq((0L, -1L), (5L, 1L), (Long.MinValue, 0L), (123456789L, 987654321L))
      .toDF("a", "b")
      .selectExpr("graft_hamming(a, b) AS h", "CAST(bit_count(a ^ b) AS BIGINT) AS ref")
    assert(df.filter(col("h") =!= col("ref")).count() == 0)
  }

  test("two cosine calls in one projection still COMPILE (freshName locals)") {
    // fixed local names in doGenCode collide when the expression appears
    // twice in one generated function; janino then rejects the whole
    // projection and Spark silently interprets it — compile directly so a
    // regression fails loudly instead of just logging a fallback
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def vec(xs: Double*) = Literal.create(xs.toArray, ArrayType(DoubleType))
    val e1 = VectorExpressions.CosineSim(vec(1.0, 2.0), vec(2.0, 1.0))
    val e2 = VectorExpressions.CosineSim(vec(1.0, 0.0), vec(0.0, 1.0))
    val proj = GenerateUnsafeProjection.generate(Seq(e1, e2)) // throws on janino error
    val row = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(math.abs(row.getDouble(0) - 0.8) < 1e-12)
    assert(row.getDouble(1) == 0.0)
  }

  test("native functions run inside whole-stage codegen") {
    VectorExpressions.register(spark)
    val e = t.embeddings.select(col("embedding").cast("array<double>").as("v"))
      .selectExpr("graft_cosine(v, v) AS c")
    e.collect()
    // no codegen fallback: plan executes with compiled stages
    assert(e.queryExecution.executedPlan.toString.contains("*("))
  }

  /** The r12 composed LSH band key — interpreted higher-order chain —
    * kept here as the bit-identity reference for the native expression.
    */
  private def composedBandKey(v: org.apache.spark.sql.Column, table: Int,
      planes: Int): org.apache.spark.sql.Column =
    (0 until planes).map { j =>
      val p = table * planes + j
      val proj = aggregate(
        zip_with(v, expr(s"transform(sequence(0, 63), d -> sin(($p * 1009 + 31) * (d + 1)))"),
          (x, h) => x * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("native lsh band key matches the composed higher-order form bit-for-bit") {
    VectorExpressions.register(spark)
    val e = t.embeddings.select(col("embedding").cast("array<double>").as("v"))
    for (planes <- Seq(4, 6); table <- 0 until Sim.lshTables) {
      val diff = e.select(
          Sim.lshBandKey(col("v"), table, planes).as("native"),
          composedBandKey(col("v"), table, planes).as("hof"))
        .filter(col("native") =!= col("hof")).count()
      assert(diff == 0, s"band keys diverged at table=$table planes=$planes")
    }
  }

  test("native lsh band key zeroes degenerate vectors like the composed form") {
    VectorExpressions.register(spark)
    import spark.implicits._
    // a non-64-dim vector made every composed projection NULL -> every bit
    // fell to otherwise(0) -> key 0; the native expression must agree
    val df = Seq(Seq(1.0, 2.0, 3.0), (0 until 64).map(d => math.sin(d + 1.0)))
      .toDF("v")
    val rows = df.select(
        Sim.lshBandKey(col("v"), 0, 5).as("native"),
        composedBandKey(col("v"), 0, 5).as("hof"),
        size(col("v")).as("n"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"diverged at dim ${r.getInt(2)}")
    }
    assert(rows.find(_.getInt(2) == 3).get.getLong(0) == 0L)
  }

  test("native centroid argmax (flat, s = m) matches the r12 fold bit-for-bit") {
    VectorExpressions.register(spark)
    val e = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centRows = e.filter(col("vec_id") < 12).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val m = centRows.length
    assert(m == 12)
    val both = e
      .withColumn("cents", typedLit(centRows.map(_._2).toSeq))
      .withColumn("fold", expr(
        s"""aggregate(sequence(0, ${m - 1}),
              struct(CAST(-1 AS INT) AS p, CAST(-1e308 AS DOUBLE) AS c),
              (acc, i) -> CASE WHEN graft_cosine(v, cents[i]) > acc.c
                THEN struct(i AS p, graft_cosine(v, cents[i]) AS c)
                ELSE acc END)"""))
      .withColumn("native", call_function("graft_centroid_best",
        col("v"), col("cents"), lit(1), lit(1)))
    assert(both.filter(col("fold.p") =!= col("native.p")
      || col("fold.c") =!= col("native.c")).count() == 0)
  }

  test("native centroid argmax two-stage: matches the Voronoi-cell " +
      "rank-rank reference and genuinely routes (diverges from flat somewhere)") {
    VectorExpressions.register(spark)
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // splitmix-style pseudo-noise (the SkewSpec rationale: sin-of-linear
    // families collapse to a 2-D span and make every argmax degenerate)
    def noise(i: Long, d: Int): Double = {
      var h = i * 6364136223846793005L + (d + 1) * 1442695040888963407L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 29
      ((h & 0xffff).toDouble / 32768.0) - 1.0
    }
    val nVec = 500; val m = 100
    val rows = (0L until nVec.toLong).map(i =>
      (i, (0 until 8).map(d => noise(i, d))))
    val df = rows.toDF("vec_id", "v")
    val cents = rows.take(m).map(_._2)
    val g = Sim.centroidSuperCount(m)
    assert(g == 10, s"geometry drifted: g=$g")
    val native = df.withColumn("best", call_function("graft_centroid_best",
        col("v"), typedLit(cents), lit(g), lit(Sim.centroidRouteProbes)))
      .select(col("vec_id"), col("best.p").as("p"), col("best.c").as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    // independent reference: cell-assign the centroids against the supers
    // with one rank, route vectors with another, rank the routed cell —
    // pure DataFrame windows, no shared code with the expression
    val centDf = cents.zipWithIndex.map { case (v, pos) => (pos, v) }
      .toDF("pos", "cv")
    val supDf = centDf.filter(col("pos") < g)
      .select(col("pos").as("spos"), col("cv").as("scv"))
    val wc = Window.partitionBy("pos").orderBy(col("scos").desc, col("spos").asc)
    val cellOf = centDf.filter(col("pos") >= g).crossJoin(supDf)
      .withColumn("scos", expr("graft_cosine(cv, scv)"))
      .withColumn("rk", row_number().over(wc)).filter(col("rk") === 1)
      .select(col("pos"), col("spos").as("cell"))
      .unionByName(centDf.filter(col("pos") < g)
        .select(col("pos"), col("pos").as("cell")))
    val cellCent = centDf.join(cellOf, "pos")
    val w1 = Window.partitionBy("vec_id").orderBy(col("rcos").desc, col("spos").asc)
    val g1 = df.crossJoin(supDf)
      .withColumn("rcos", expr("graft_cosine(v, scv)"))
      .withColumn("rk", row_number().over(w1))
      .filter(col("rk") <= Sim.centroidRouteProbes)
      .select(col("vec_id"), col("spos").as("cell"))
    val w2 = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("pos").asc)
    val ref = df.join(g1, "vec_id").join(cellCent, "cell")
      .withColumn("ccos", expr("graft_cosine(v, cv)"))
      .withColumn("rk", row_number().over(w2)).filter(col("rk") === 1)
      .select(col("vec_id"), col("pos"), col("ccos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(native == ref)
    // anti-vacuity 1: the routing is genuinely two-stage — at least one
    // vector lands on a different centroid than the FLAT argmax picks
    // (otherwise this test could not tell the implementations apart)
    val flat = df.withColumn("best", call_function("graft_centroid_best",
        col("v"), typedLit(cents), lit(1), lit(1)))
      .select(col("vec_id"), col("best.p")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val routed = native.map { case (id, p, _) => (id, p) }.toMap
    assert(routed.exists { case (id, p) => flat(id) != p },
      "two-stage never diverged from flat — the routing is vacuous here")
    // anti-vacuity 2: coherent cells keep the routing NEAR the flat truth
    // (the balance property the id-block variant measurably lost)
    val agree = routed.count { case (id, p) => flat(id) == p }
    assert(agree * 10 >= routed.size * 8,
      s"cell routing agrees with flat on only $agree/${routed.size}")
  }

  test("the new native expressions compile in one shared projection " +
      "(freshName locals, addNewFunction helpers)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    def vec64(f: Int => Double) = Literal.create(
      (0 until 64).map(f).toArray, ArrayType(DoubleType))
    val cents = Literal.create(
      Seq((0 until 64).map(d => math.sin(d + 1.0)).toArray,
          (0 until 64).map(d => math.cos(d + 1.0)).toArray),
      ArrayType(ArrayType(DoubleType)))
    val b1 = VectorExpressions.LshBandKey(vec64(d => math.sin(d * 0.3)),
      Literal.create(0, IntegerType), Literal.create(5, IntegerType))
    val b2 = VectorExpressions.LshBandKey(vec64(d => math.cos(d * 0.3)),
      Literal.create(1, IntegerType), Literal.create(5, IntegerType))
    val c1 = VectorExpressions.CentroidBest(vec64(d => math.sin(d + 1.0)),
      cents, Literal.create(2, IntegerType), Literal.create(1, IntegerType))
    val c2 = VectorExpressions.CentroidBest(vec64(d => math.cos(d + 1.0)),
      cents, Literal.create(2, IntegerType), Literal.create(1, IntegerType))
    val proj = GenerateUnsafeProjection.generate(Seq(b1, b2, c1, c2))
    val row = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    // c1's vector IS centroid 0 -> cosine 1, position 0
    assert(row.getStruct(2, 2).getInt(0) == 0)
    assert(math.abs(row.getStruct(2, 2).getDouble(1) - 1.0) < 1e-12)
    assert(row.getStruct(3, 2).getInt(0) == 1)
  }

  test("misuse from raw SQL fails with a clear message, never silently: " +
      "non-foldable / non-INT / typed-NULL geometry args") {
    VectorExpressions.register(spark)
    val e = t.embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    def analysisFails(sqlExpr: String, fragment: String): Unit = {
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        e.selectExpr(sqlExpr).collect()
      }
      assert(err.getMessage.contains(fragment),
        s"expected '$fragment' in: ${err.getMessage.take(300)}")
    }
    // non-foldable plane count (a column) — analysis error, not NPE
    analysisFails("graft_lsh_band(v, 0, CAST(vec_id AS INT))",
      "must be foldable")
    // non-INT planes — analysis error naming the type
    analysisFails("graft_lsh_band(v, 0, CAST(5 AS BIGINT))", "must be INT")
    // typed NULL planes would unbox to 0 ⇒ every key 0 silently
    analysisFails("graft_lsh_band(v, 0, CAST(NULL AS INT))",
      "must not be NULL")
    analysisFails(
      "graft_centroid_best(v, array(array(1.0d)), CAST(NULL AS INT), 1)",
      "must not be NULL")
    // NULL centroid matrix: foldable, so analysis passes — must fail at
    // plan build with the clear message, not a bare NPE on numElements
    val err = intercept[Throwable] {
      e.selectExpr(
        "graft_centroid_best(v, CAST(NULL AS ARRAY<ARRAY<DOUBLE>>), 1, 1)")
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.getMessage != null) &&
      chain(err).exists(t => t.getMessage != null &&
        t.getMessage.contains("centroids must not be NULL")),
      s"expected the clear NULL-centroids message, got: ${err.getMessage}")
  }

  test("lsh band key and centroid argmax execute inside whole-stage codegen") {
    VectorExpressions.register(spark)
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val e = t.embeddings.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("bk", Sim.lshBandKey(col("v"), 0, 5))
      .withColumn("best", call_function("graft_centroid_best", col("v"),
        typedLit(Seq((0 until 64).map(d => math.sin(d + 1.0)))), lit(1), lit(1)))
      .select(col("vec_id"), col("bk"), col("best.p"))
    e.collect()
    val wsc = e.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.toString
    }
    assert(wsc.exists(s => s.contains("graft_lsh_band")),
      "band key fell out of whole-stage codegen")
    assert(wsc.exists(s => s.contains("graft_centroid_best")),
      "centroid argmax fell out of whole-stage codegen")
  }
}
