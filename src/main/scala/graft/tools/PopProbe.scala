package graft.tools

import graft.operators.Sim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off diagnostic: cluster-population balance under the flat vs
  * two-stage centroid argmax (sum of pop^2 is the pair-work proxy).
  */
object PopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftSession
      .tune(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    val t = graft.sources.Tables(spark, sfDir)
    val e = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val k = Sim.nCentroidsFor(n)
    val centRows = e.filter(col("vec_id") < k).orderBy("vec_id").collect()
      .map(r => r.getSeq[Double](1))
    val m = centRows.length
    def pops(g: Int, probes: Int): Unit = {
      val a = e.withColumn("best", call_function("graft_centroid_best",
          col("v"), typedLit(centRows.toSeq), lit(g), lit(probes)))
        .groupBy(col("best.p")).agg(count(lit(1)).as("pop"))
      val rows = a.orderBy(col("pop").desc).limit(10).collect()
        .map(r => r.getLong(1))
      val stats = a.agg(sum(col("pop") * col("pop")), count(lit(1))).head
      println(s"[pop] g=$g probes=$probes sumPop2=${stats.getLong(0)} nonEmpty=${stats.getLong(1)} top10=${rows.mkString(",")}")
    }
    println(s"[pop] n=$n k=$k m=$m supers=${Sim.centroidSuperCount(m)}")
    pops(1, 1)
    for (pr <- 1 to 4) pops(Sim.centroidSuperCount(m), pr)
    println(s"[pop] registered probes=${Sim.centroidRouteProbes}")
    spark.stop()
  }
}
