package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time named SparkEntry queries (args = sfDir query...).
  * Reports wall seconds AND summed executor run/CPU time per query: wall
  * clock at local[32]/sf0.1 hides duplicated work behind idle-core
  * parallelism and swings ±50% across sessions (JIT/GC state), while the
  * summed task metrics are stable and measure the WORK a change removes —
  * the quantity that survives to full-utilization clusters and the
  * driver's lower-core-count bench runs.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.GraftSession
      .tune(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            runMs.addAndGet(m.executorRunTime)
            cpuNs.addAndGet(m.executorCpuTime)
          }
        }
      })
    args.tail.foreach { name =>
      val r0 = runMs.get(); val c0 = cpuNs.get()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; poll until the counters are
      // stable (two consecutive 100 ms reads unchanged, 3 s cap) instead of
      // one fixed sleep — under load task-end events could land after a
      // fixed window and bleed into the next query's delta, and these
      // numbers drive optimization decisions
      var stable = 0; var last = (-1L, -1L); var waited = 0
      while (stable < 2 && waited < 3000) {
        Thread.sleep(100); waited += 100
        val cur = (runMs.get(), cpuNs.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      val run = (runMs.get() - r0) / 1e3
      val cpu = (cpuNs.get() - c0) / 1e9
      println(f"[timeq] $name%-28s $wall%8.3f s  run=$run%8.1f s  cpu=$cpu%8.1f s  ($n rows)")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
