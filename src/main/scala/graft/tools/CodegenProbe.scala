package graft.tools

import graft.operators.Sim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 measurement probe (VERDICT r12 #1/#4): isolates the centroid
  * ASSIGNMENT slice from the pair work and prices the three
  * implementations of it at a given scale —
  *   (a) the r12 interpreted `aggregate(...)` flat fold (CodegenFallback),
  *   (b) the native codegen'd flat argmax (graft_centroid_best, g = 1),
  *   (c) the native two-stage argmax (g = ⌈√m⌉ super-centroid cells,
  *       `centroidRouteProbes` probes) the registered faces run —
  * then the two full faces built on it, then sim_ann_lsh with native vs
  * composed (interpreted higher-order) band keys. The assignment probes
  * aggregate `best.p` so column pruning cannot elide the argmax the way a
  * bare count() would.
  *
  * `usage: CodegenProbe <sfDir>` (e.g. /tmp/graft_sf10)
  */
object CodegenProbe {

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
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val m = centRows.length
    val cents = centRows.map(_._2).toSeq
    val g2 = Sim.centroidSuperCount(m)
    println(s"[probe] dir=$sfDir n=$n k=$k m=$m supers=$g2 planes=${Sim.lshPlanesFor(n)}")

    def time(name: String)(f: => Any): Unit = {
      spark.sqlContext.clearCache()
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    def sumP(df: DataFrame): Long =
      df.agg(sum(col("best.p"))).head.getLong(0)

    val withCents = e.withColumn("cents", typedLit(cents))
    time("assign: r12 interpreted flat fold") {
      sumP(withCents.withColumn("best", expr(
        s"""aggregate(sequence(0, ${m - 1}),
              struct(CAST(-1 AS INT) AS p, CAST(-1e308 AS DOUBLE) AS c),
              (acc, i) -> CASE WHEN graft_cosine(v, cents[i]) > acc.c
                THEN struct(i AS p, graft_cosine(v, cents[i]) AS c)
                ELSE acc END)""")))
    }
    time("assign: native flat (g=1)") {
      sumP(e.withColumn("best", call_function("graft_centroid_best",
        col("v"), typedLit(cents), lit(1), lit(1))))
    }
    time("assign: native two-stage (cells)") {
      sumP(e.withColumn("best", call_function("graft_centroid_best",
        col("v"), typedLit(cents), lit(g2), lit(Sim.centroidRouteProbes))))
    }
    time("dedup_semantic (full face)")(Sim.semanticDedup(t).count())
    time("sim_knn_graph (full face)")(Sim.knnGraph(t).count())

    // the r12 composed band key, reconstructed for the before/after
    def composedKey(v: Column, table: Int, planes: Int): Column =
      (0 until planes).map { j =>
        val p = table * planes + j
        val proj = aggregate(
          zip_with(v, expr(s"transform(sequence(0, 63), d -> sin(($p * 1009 + 31) * (d + 1)))"),
            (x, h) => x * h),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    def lshWith(keyFn: (Column, Int, Int) => Column): Long = {
      val planes = Sim.lshPlanesFor(n)
      val eb = e.select(col("vec_id"), col("v"),
        posexplode(array((0 until Sim.lshTables).map(tb =>
          keyFn(col("v"), tb, planes)): _*)).as(Seq("table", "band_key")))
      val pairs = eb.as("a").join(eb.as("b"),
          col("a.table") === col("b.table") && col("a.band_key") === col("b.band_key") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
          expr("graft_cosine(a.v, b.v)").as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id").asc)
      pairs.withColumn("rank", row_number().over(w)).filter(col("rank") === 1).count()
    }
    time("sim_ann_lsh (registered, native)")(Sim.lshTopK(t).count())
    time("sim_ann_lsh (composed r12 keys)")(lshWith(composedKey))
    spark.stop()
  }
}
