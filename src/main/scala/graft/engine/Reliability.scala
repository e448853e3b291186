package graft.engine

import org.apache.spark.sql.DataFrame

/** Plan-truncation checkpoint with a production-reliability knob.
  *
  * The iterative / branch-reusing operators (dedup_groups' label
  * propagation, the ad-state handoff, AllJob's gate handoff) must TRUNCATE
  * the logical plan: without a checkpoint, iterative self-joins nest the
  * upstream plan exponentially and each reading branch re-executes it.
  * `localCheckpoint(eager = true)` does that at zero I/O cost, but the
  * materialized partitions live only on executor block stores — on a real
  * cluster, one lost executor loses partitions that can never be recomputed
  * (the lineage was cut), killing a 100 TB job mid-iteration.
  *
  * Production runs set `spark.graft.checkpointDir` to a reliable location
  * (HDFS / object store); every truncation site then takes a RELIABLE
  * `checkpoint` instead. Bench and local runs leave the conf unset and keep
  * the zero-I/O local form.
  */
object Reliability {

  /** Session conf key: reliable checkpoint directory; empty/unset = local. */
  val ConfKey = "spark.graft.checkpointDir"

  /** Truncate `df`'s plan: reliable `checkpoint` when the knob is set,
    * `localCheckpoint` otherwise. Both eager — callers depend on the
    * materialize-now semantics (loop counters, branch reuse).
    */
  def planCheckpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.trim.nonEmpty) match {
      case Some(dir) =>
        // always honor the CURRENT knob value: a pre-existing checkpoint
        // dir (set earlier by this helper or by unrelated code) must not
        // silently redirect "reliable" checkpoints elsewhere
        if (!spark.sparkContext.getCheckpointDir.exists(_.startsWith(dir)))
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }
}
