package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time named SparkEntry queries (args = sfDir query...). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.engine.GraftSession
      .tune(SparkSession.builder().master("local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeq] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
