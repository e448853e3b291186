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

  test("user_detail: one row per zgid, covering exactly the fact table's users") {
    val d = Dw.userDetail(t)
    assert(d.groupBy("zg_id").count().filter(col("count") > 1).count() == 0)
    val factUsers = Route.routeEventAttr(t).select(col("zgid")).distinct()
    assert(d.count() == factUsers.count())
  }

  test("user_detail first/last ordering and totals are coherent") {
    val d = Dw.userDetail(t)
    assert(d.filter(col("first_visit_time") > col("last_visit_time")).count() == 0)
    assert(d.filter(col("duration") < 0).count() == 0)
    assert(d.filter(!col("is_registered").isin(0, 1)).count() == 0)
    // single-EVENT users' first and current fields coincide (same-second
    // multi-event users may legitimately differ — ties break on event_id)
    val singles = Route.routeEventAttr(t).groupBy(col("zgid").as("zg_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") === 1).select("zg_id")
    val bad = d.join(singles, "zg_id")
      .filter(col("first_version") =!= col("current_app_version") ||
        col("first_channel") =!= col("current_app_channel"))
    assert(bad.count() == 0)
  }

  test("user_detail registration flag matches the fact table's zg_uid presence") {
    val reg = Route.routeEventAttr(t).groupBy(col("zgid").as("zg_id"))
      .agg(max(when(col("zg_uid") =!= "\\N", 1).otherwise(0)).as("expect"))
    val bad = Dw.userDetail(t).join(reg, "zg_id")
      .filter(col("is_registered") =!= col("expect"))
    assert(bad.count() == 0)
  }

  test("user_detail device block honors the \\N sentinel discipline") {
    // sentinel columns are never SQL-null and never empty; screen fields
    // fill in pairs (both sides of one >=2-digit-run resolution split)
    val d = Dw.userDetail(t)
    for (c <- Seq("current_device_brand", "current_device_model")) {
      assert(d.filter(col(c).isNull || col(c) === "").count() == 0, c)
    }
    assert(d.filter(col("current_l").isNotNull =!= col("current_h").isNotNull).count() == 0)
  }

  test("user_anonymous flag agrees with the rolled-up user_id") {
    val a = Dw.userAnonymous(t)
    assert(a.filter(col("user_id").isNull && col("is_anonymous") =!= "匿名").count() == 0)
    assert(a.filter(col("user_id").isNotNull && col("is_anonymous") =!= "实名").count() == 0)
    // exactly the b_user table's users
    val users = Route.routeUserRow(t).select(col("zgid")).distinct().count()
    assert(a.count() == users)
  }
}
