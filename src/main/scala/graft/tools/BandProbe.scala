package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the band-bucket occupancy cap (r12 verdict #2):
  * measures `bandedNearCandidates` capped vs uncapped on a synthetic HOT
  * corpus — n fingerprints that all share one primary band value (the
  * adversarial shape: one bucket of population n) with the remaining 45
  * bits drawn from a deterministic hash (so sub-bands split it evenly).
  *
  * Uniform corpus growth keeps every bucket cold until n ≈ 32k·cap
  * (≈1.7·10⁷ docs — past any ScaleGen size this container holds), so the
  * cap's effect cannot be observed on the scaled testdata; this probe IS
  * the measurement: the uncapped wall must step ~4× per 2× (quadratic,
  * n²/2 in-bucket pairs), the capped wall ~2× per 2× (linear,
  * 4·n·pop/2^subBits refined pairs).
  *
  * `usage: BandProbe [sizes...]` (default 10000 20000 40000; the capped
  * rule additionally runs at 10× the largest size to show the linear tier
  * keeps scaling where the uncapped one could not even materialize its
  * n²/2 rows).
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(10000, 20000, 40000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftSession
      .tune(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // band 0 (bits 0-14) pinned to one value ⇒ one bucket of population n;
    // bits 15-59 from xxhash64(doc_id) ⇒ bands 1-3 and the sub-bands of
    // band 0's complement split evenly (cold everywhere else)
    def hotCorpus(n: Int) = spark.range(n.toLong).toDF("doc_id")
      .withColumn("fp",
        lit(0x1234L).bitwiseOR(
          shiftleft(shiftrightunsigned(xxhash64(col("doc_id")), 19), 15)))

    def time(n: Int, cap: Int): (Double, Long) = {
      val df = hotCorpus(n)
      val t0 = System.nanoTime()
      val cnt = Dedup.bandedNearCandidates(df, "fp", 60, cap).count()
      ((System.nanoTime() - t0) / 1e9, cnt)
    }
    // warm the session so the smallest size doesn't price codegen compile
    time(1000, Dedup.bandBucketCap)

    for (n <- sizes) {
      val (wc, cc) = time(n, Dedup.bandBucketCap)
      val (wu, cu) = time(n, Int.MaxValue)
      println(f"[band] n=$n%7d  capped ${wc}%8.2f s (${cc}%12d pairs)  " +
        f"uncapped ${wu}%8.2f s (${cu}%12d pairs)")
    }
    val big = sizes.max * 10
    val (wb, cb) = time(big, Dedup.bandBucketCap)
    println(f"[band] n=$big%7d  capped ${wb}%8.2f s (${cb}%12d pairs)  " +
      "uncapped (skipped: n^2/2 rows)")
    spark.stop()
  }
}
