package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for `dedup_groups_inc`'s scale step (r11 verdict #5):
  * is the 2.3× per 10× growth the LINEAR shingle-df passes (structural —
  * prefix completeness needs one common df order over the full corpus),
  * or does the delta-bounded candidate join contribute superlinearly?
  *
  * Design: hold the BASE at the big corpus's own base portion and swap
  * the delta between (a) the big corpus's 20% delta (the standard probe)
  * and (b) a 10×-smaller delta borrowed from the small corpus, re-id'd
  * above 9·maxBig so the shared `incIsDelta` id-range rule classifies
  * exactly those docs as the delta (9·maxBig > 0.8·(9·maxBig + maxSmall)
  * for any smaller corpus). If (b) ≈ (a), the delta-bounded half is minor
  * and the step is the linear passes; if (b) ≪ (a), the candidate join
  * contributes and needs bounding.
  *
  * `usage: IncProbe <bigDir> <smallDir>` (e.g. /tmp/graft_sf10 /tmp/graft_sf1)
  */
object IncProbe {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: IncProbe <bigDir> <smallDir>")
      sys.exit(2)
    }
    val Array(bigDir, smallDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftSession
      .tune(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = spark.read.parquet(s"$bigDir/documents.parquet")
    val maxBig = big.agg(max(col("doc_id"))).head.getLong(0)
    val small = spark.read.parquet(s"$smallDir/documents.parquet")
    val maxSmall = small.agg(max(col("doc_id"))).head.getLong(0)
    val bigBase = big.filter(!Dedup.incIsDelta(col("doc_id"), lit(maxBig)))
    val smallDelta = small
      .filter(Dedup.incIsDelta(col("doc_id"), lit(maxSmall)))
      .withColumn("doc_id", col("doc_id") + lit(9L * maxBig))

    def run(label: String, docs: org.apache.spark.sql.DataFrame): Unit = {
      val t2 = new graft.sources.Tables(spark, bigDir) {
        override def documents: org.apache.spark.sql.DataFrame = docs
      }
      // pre-build the nightly base artifact OUTSIDE the timed region —
      // the Bench discipline: the registered face prices the FOLD
      Dedup.baseDupGroupsDir(t2)
      val t0 = System.nanoTime()
      val n = Dedup.dupGroupsInc(t2).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[incprobe] $label%-28s $sec%8.3f s  ($n rows)")
      spark.sqlContext.clearCache()
    }

    // the same base both times; only the delta size changes
    run("big-base + big-delta", big)
    run("big-base + small-delta", bigBase.unionByName(smallDelta))
  }
}
