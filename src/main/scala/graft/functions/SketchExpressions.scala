package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** Bloom-filter membership for sketch-gated joins.
  *
  * Spark 4 registers `bloom_filter_agg` publicly but keeps the probe side
  * (`BloomFilterMightContain`, the expression its own runtime row-level
  * filtering uses) out of the function registry — this exposes it as
  * `graft_might_contain(bloom, xxhash64(value))` so a declarative plan can
  * probe a built sketch. Both sides are Spark's own codegen'd
  * implementations; nothing here is interpreted per row.
  */
object SketchExpressions {

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(value[, estimatedItems[, numBits]])")
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children(0), children(1)))
  }
}
