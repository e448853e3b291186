package graft

import graft.engine.Reliability
import org.apache.spark.sql.functions._

class ReliabilitySpec extends SparkSpec {

  test("planCheckpoint is local by default, reliable when the knob is set") {
    import spark.implicits._
    val df = (1 to 100).toDF("x").withColumn("y", col("x") * 2)

    // default: executor-local, nothing written anywhere
    val localOut = Reliability.planCheckpoint(df)
    assert(localOut.collect().map(_.getInt(0)).sum == 5050)

    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    spark.conf.set(Reliability.ConfKey, dir.toString)
    try {
      val reliableOut = Reliability.planCheckpoint(df)
      // identical data either way
      assert(reliableOut.collect().map(_.getInt(0)).sum == 5050)
      // the reliable path actually wrote checkpoint files to the knob's dir
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      assert(walk(dir.toFile).nonEmpty, "no reliable checkpoint files written")
      // and the plan is truncated like the local form (a scan, not the
      // original project)
      assert(reliableOut.queryExecution.optimizedPlan.collectLeaves().nonEmpty)
    } finally {
      spark.conf.unset(Reliability.ConfKey)
    }
  }

  test("dedup_groups is unchanged under the reliable-checkpoint knob") {
    // the IN-PLAN closure (dupGroupsUnsorted), not the registered face:
    // the registered face serves from the session-memoized artifact, so a
    // second call would reuse stored rows and never exercise the knob
    val base = operators.Dedup.dupGroupsUnsorted(t).collect().map(_.toSeq).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_groups")
    spark.conf.set(Reliability.ConfKey, dir.toString)
    try {
      val reliable = operators.Dedup.dupGroupsUnsorted(t).collect().map(_.toSeq).toSet
      assert(reliable == base)
    } finally {
      spark.conf.unset(Reliability.ConfKey)
    }
  }
}
