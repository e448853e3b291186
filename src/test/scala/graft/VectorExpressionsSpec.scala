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
}
