package graft

import graft.operators.{Dw, Route}
import org.apache.spark.sql.functions._

/** DW user rollup tables (t_user_join / t_user_active / t_user_duration):
  * consistency with the event_attr fact table they summarize, plus the
  * rollup invariants.
  */
class DwSpec extends SparkSpec {

  private lazy val factCount = Route.routeEventAttr(t).count()

  test("user_active times roll up to exactly the event_attr row count") {
    val total = Dw.userActive(t).agg(sum(col("times"))).head().getLong(0)
    assert(total == factCount, s"$total active vs $factCount fact rows")
  }

  test("user_duration times roll up to the same total and never negative") {
    val d = Dw.userDuration(t)
    assert(d.agg(sum(col("times"))).head().getLong(0) == factCount)
    assert(d.filter(col("duration") < 0).count() == 0)
    // period is an hour bucket
    assert(d.filter(!col("period").rlike("^([01][0-9]|2[0-3])$")).count() == 0)
  }

  test("user_join has one row per zgid, matching the active table's users") {
    val j = Dw.userJoin(t)
    assert(j.groupBy("zg_id").count().filter(col("count") > 1).count() == 0)
    val activeUsers = Dw.userActive(t).select("zg_id").distinct().count()
    assert(j.count() == activeUsers)
  }

  test("user_join begin_date is the user's earliest active day") {
    val j = Dw.userJoin(t).select(col("zg_id"), col("begin_day_id"))
    val firstActive = Dw.userActive(t).groupBy("zg_id")
      .agg(min(col("begin_day_id")).as("min_day"))
    val bad = j.join(firstActive, "zg_id")
      .filter(col("begin_day_id") =!= col("min_day"))
    assert(bad.count() == 0)
  }

  test("rollup key columns are consistent day derivations") {
    val bad = Dw.userActive(t).filter(
      col("yearmonth") =!= (col("begin_day_id") / lit(100)).cast("int"))
    assert(bad.count() == 0)
  }
}
