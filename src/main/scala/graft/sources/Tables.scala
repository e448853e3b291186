package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated star schema (TESTDATA.md).
  *
  * Keeps every read a plain parquet scan so Catalyst can push filters and
  * prune columns at the source (SURVEY.md §5).
  */
case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts arrives as nanos-since-epoch (see GraftSession nanosAsLong);
    * integer-truncate to micros so it is a proper timestamp column again.
    */
  def events: DataFrame = {
    val raw = t("events")
    import org.apache.spark.sql.functions._
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
