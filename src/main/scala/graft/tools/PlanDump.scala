package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` for named SparkEntry queries
  * to one file per query (args = sfDir outDir query... | "all"). The files
  * are the plan evidence committed under plans/<round>/ — Exchange count,
  * join strategy, PushedFilters/ReadSchema, WholeStageCodegen spans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // --final: execute each query first and dump the FINAL adaptive plan
    // (AQE join selection — broadcast and shuffled-hash conversion — is
    // runtime-only in this engine, so the initial plan shows the SMJ
    // skeleton, not the joins that actually ran)
    val (flags, positional) = args.partition(_.startsWith("--"))
    val runFinal = flags.contains("--final")
    val sfDir = positional(0)
    val outDir = positional(1)
    val names =
      if (positional.length > 2 && positional(2) == "all")
        graft.SparkEntry.queries.keys.toSeq.sorted
      else positional.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.engine.GraftSession
      .tune(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    var nFailed = 0
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // collect(), not a noop write: the write wraps df in a NEW
        // QueryExecution, leaving df.queryExecution (the one printed
        // below) unexecuted — collect() finalizes the same instance the
        // explain reads (the PlanAuditSpec.finalPlan contract)
        if (runFinal) df.collect()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.txt"), plan.getBytes("UTF-8"))
        println(s"[plandump] $name ok")
      } catch {
        case t: Throwable =>
          nFailed += 1
          println(s"[plandump] $name FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      spark.sqlContext.clearCache()
    }
    spark.stop()
    // a scripted plan-evidence run must not exit 0 with an incomplete
    // plans/<round>/ directory — fail loudly when any dump failed
    if (nFailed > 0) {
      println(s"[plandump] $nFailed of ${names.size} dumps FAILED")
      sys.exit(1)
    }
  }
}
