package graft.engine

import graft.functions.VectorExpressions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions` entry point: injects graft's native functions into
  * every session built with this config (spark-submit-friendly; tests and
  * library code can also call VectorExpressions.register directly).
  *
  * Usage: `--conf spark.sql.extensions=graft.engine.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[VectorExpressions.CosineSim].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[VectorExpressions.HammingDistance].getName, "graft_hamming"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.HammingDistance(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        children match {
          case Seq(c)       => new BloomFilterAggregate(c)
          case Seq(c, n)    => new BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
          case _ => throw new IllegalArgumentException(
            "graft_bloom_agg(value[, estimatedItems[, numBits]])")
        }
      }))
  }
}
