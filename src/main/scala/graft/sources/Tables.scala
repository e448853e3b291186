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
  /** events.ts normalized to a session-zoned TimestampType regardless of how
    * the generator wrote it. Observed physical forms across driver rounds:
    * TIMESTAMP(NANOS) (arrives as a raw long under GraftSession's
    * nanosAsLong conf), TIMESTAMP(MICROS) without UTC adjustment (arrives
    * as TIMESTAMP_NTZ), and a plain instant timestamp. A long's precision
    * is detected by magnitude (ns/us/ms/s are 3 decimal orders apart —
    * unambiguous for any date between 1973 and 5000); an NTZ column is
    * reinterpreted as UTC wall-clock, which is exactly what the generator
    * wrote and what the DuckDB oracle reads.
    */
  def events: DataFrame = {
    val raw = t("events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(Tables.epochMicros(col("ts"))))
      case TimestampNTZType =>
        // session tz is UTC (GraftSession.tune), so this cast re-labels the
        // same wall-clock instant rather than shifting it
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Normalize an epoch long of unknown precision (s / ms / us / ns) to
    * microseconds. The four precisions sit 3 decimal orders apart, so for
    * any instant between 1973-03 and far future the magnitude identifies
    * the unit: ns >= 1e17, us >= 1e14, ms >= 1e11, else seconds.
    */
  def epochMicros(c: Column): Column =
    // integral `div`, not Column./ — double division is inexact at 1e18
    when(c >= 100000000000000000L, call_function("div", c, lit(1000L)))
      .when(c >= 100000000000000L, c)
      .when(c >= 100000000000L, c * 1000L)
      .otherwise(c * 1000000L)
}
