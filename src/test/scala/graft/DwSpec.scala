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

  test("incremental detail fold equals the full rescan, with real increments") {
    // every slice must contribute rows, or the merge proves nothing
    val ea = Route.routeEventAttr(t)
    val (d1, d2) = Dw.incBoundaries
    assert(ea.filter(col("day_id") < d1).count() > 0)
    assert(ea.filter(col("day_id") >= d1 && col("day_id") < d2).count() > 0)
    assert(ea.filter(col("day_id") >= d2).count() > 0)
    // and some zgid must span slices (the merge path with 2+ partials)
    val spans = ea.select(col("zgid"),
      (col("day_id") < d1).as("a"), (col("day_id") >= d2).as("b"))
      .groupBy("zgid").agg(max(col("a")).as("a"), max(col("b")).as("b"))
      .filter(col("a") && col("b")).count()
    assert(spans > 0, "no user spans increments — merge untested")
    val full = Dw.userDetail(t).collect().map(_.toSeq)
    val inc = Dw.userDetailInc(t).collect().map(_.toSeq)
    assert(inc.length == full.length)
    inc.zip(full).foreach { case (i, f) => assert(i == f) }
  }

  test("incremental rollup folds equal their full rescans") {
    // day-grain rollups: fold == full (append-shaped merge)
    val act = Dw.userActive(t).collect().map(_.toSeq)
    val actInc = Dw.userActiveInc(t).collect().map(_.toSeq)
    assert(act.length == actInc.length && act.zip(actInc).forall { case (a, b) => a == b })
    val dur = Dw.userDuration(t).collect().map(_.toSeq)
    val durInc = Dw.userDurationInc(t).collect().map(_.toSeq)
    assert(dur.length == durInc.length && dur.zip(durInc).forall { case (a, b) => a == b })
    // zgid-grain sums: users span increments (asserted by the detail-inc
    // test above), so this fold exercises the REAL multi-partial merge
    val sums = Dw.userDetailSum(t).collect().map(_.toSeq)
    val sumsInc = Dw.userDetailSumInc(t).collect().map(_.toSeq)
    assert(sums.length == sumsInc.length &&
      sums.zip(sumsInc).forall { case (a, b) => a == b })
  }

  test("user_detail_sum is exactly the sums projection of user_detail") {
    val d = Dw.userDetail(t)
      .select("zg_id", "platform", "visit_times", "duration",
        "attr1", "attr2", "attr3", "attr4", "attr5")
    val s = Dw.userDetailSum(t)
    assert(s.columns.toSeq == d.columns.toSeq)
    assert(s.exceptAll(d).isEmpty && d.exceptAll(s).isEmpty)
  }

  test("user_all composes detail and join rows per zgid with name dims") {
    val all = Dw.userAll(t)
    val detail = Dw.userDetail(t)
    assert(all.count() == detail.count())
    // every detail zgid appears once; the join row attaches (same corpus)
    assert(all.filter(col("uuid").isNull).count() == 0)
    // names resolve per the dims: platform_name is a sdk dim key,
    // carrier only for 5-digit China codes, model name = model string
    val pnames = graft.operators.Route.platformDim.map(_._1).toSet + "\\N"
    assert(all.collect().forall(r => pnames.contains(r.getAs[String]("platform_name"))))
    val badCarrier = all.filter(
      (col("current_mccmnc").isNull ||
        col("current_mccmnc") < 46000 || col("current_mccmnc") >= 46100) &&
        col("current_mccmnc_name") =!= "\\N")
    assert(badCarrier.count() == 0)
    assert(all.filter(col("current_device_model_name") =!=
      col("current_device_model")).count() == 0)
    // the mobile/unicom/telecom split follows the shared dim
    val dim = Dw.carrierDim.toMap
    all.select("current_mccmnc", "current_mccmnc_name").collect().foreach { r =>
      if (!r.isNullAt(0)) {
        val v = r.getInt(0)
        if (v >= 46000 && v < 46100)
          assert(r.getString(1) == dim.getOrElse(v - 46000, "\\N"))
      }
    }
  }
}
