package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe corpus generator: writes a `factor`× copy of an existing
  * testdata directory so the heavy queries can be measured at 10× and the
  * scaling exponent recorded (NOTES.md §round-8) — the measured half of
  * the 100 TB design claims.
  *
  * `usage: ScaleGen <inDir> <outDir> <factor>`
  *
  * Scaling is SHARD-style, the shape a genuinely bigger crawl/day has —
  * each copy is an independent population, not a clone set:
  *  - events: ids and users offset per copy (factor× traffic from
  *    factor× users on the same day); envelope violation classes ride
  *    event_id moduli, so each copy carries a statistically similar
  *    class mix (the per-copy id offset shifts which rows land in each
  *    %61/%67 class, so per-class counts drift slightly — fine for a
  *    throughput probe, which measures volume, not exact class counts).
  *  - documents: ids offset; every WORD gets a copy tag (`c<k>` prefix),
  *    so shingles/minhashes/simhashes are disjoint across copies — the
  *    near-dup graph scales factor× without manufacturing cross-copy
  *    clone edges that no real corpus growth would produce.
  *  - embeddings: ids offset; components perturbed by a small
  *    deterministic copy-dependent delta — cluster structure survives,
  *    exact-duplicate vectors across copies do not.
  *  - dimension/fact tables the heavy set does not scale on (TPC-H side)
  *    pass through unchanged.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftSession
      .tune(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      spark.read.parquet(s"$inDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    def shards(df: DataFrame)(shard: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => shard(df, k)).reduce(_ unionByName _)

    val ev = spark.read.parquet(s"$inDir/events.parquet")
    val evB = ev.agg(max(col("event_id"))).collect()(0).getLong(0) + 1
    val evU = ev.agg(max(col("user_id"))).collect()(0).getLong(0) + 1
    shards(ev) { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k.toLong * evB))
        .withColumn("user_id", col("user_id") + lit(k.toLong * evU))
    }.write.mode("overwrite").parquet(s"$outDir/events.parquet")

    val docs = spark.read.parquet(s"$inDir/documents.parquet")
    val docB = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    shards(docs) { (df, k) =>
      val tagged =
        if (k == 0) df
        else df.withColumn("text", expr(
          s"concat_ws(' ', transform(split(text, ' '), w -> concat('c$k', w)))"))
      tagged.withColumn("doc_id", col("doc_id") + lit(k.toLong * docB))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$inDir/embeddings.parquet")
    val embB = emb.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    shards(emb) { (df, k) =>
      val perturbed =
        if (k == 0) df
        else df.withColumn("embedding", expr(
          s"""transform(embedding,
              (x, i) -> x + cast(((vec_id * 31 + i * 7 + $k * 13) % 11 - 5) as float) * 0.002f)"""))
      perturbed.withColumn("vec_id", col("vec_id") + lit(k.toLong * embB))
    }.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    println(s"[scalegen] wrote $outDir at ${factor}x of $inDir")
    spark.stop()
  }
}
