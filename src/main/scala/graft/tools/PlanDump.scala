package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` for named SparkEntry queries
  * to one file per query (args = sfDir outDir query... | "all"). The files
  * are the plan evidence committed under plans/<round>/ — Exchange count,
  * join strategy, PushedFilters/ReadSchema, WholeStageCodegen spans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names =
      if (args.length > 2 && args(2) == "all")
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.engine.GraftSession
      .tune(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.txt"), plan.getBytes("UTF-8"))
        println(s"[plandump] $name ok")
      } catch {
        case t: Throwable =>
          println(s"[plandump] $name FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
