package graft

import graft.operators.{Analytics, TrainData}

class AnalyticsSpec extends SparkSpec {

  test("q1 aggregates every flag/status combination with consistent counts") {
    val rows = Analytics.q1PricingAgg(t).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = t.lineitem
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "1998-09-02")
      .count()
    assert(total == expected)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q3 returns at most 10 rows sorted by revenue desc") {
    val rows = Analytics.q3TopkJoin(t).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("funnel stages are monotonically non-increasing") {
    val r = Analytics.qWindowFunnel(t).collect()(0)
    val (v, c, p) =
      (r.getAs[Long]("n_view"), r.getAs[Long]("n_click_after_view"), r.getAs[Long]("n_purchase_after_click"))
    assert(v >= c && c >= p)
    assert(v > 0)
  }

  test("retention cohort sizes sum to the distinct user count") {
    val rows = Analytics.qRetention(t).collect()
    val totalCohort = rows.map(_.getAs[Long]("cohort_size")).sum
    val users = t.events.select("user_id").distinct().count()
    assert(totalCohort == users)
    rows.foreach(r => assert(r.getAs[Long]("retained_7d") <= r.getAs[Long]("cohort_size")))
  }

  test("daily counts cover all events") {
    val n = Analytics.qEventCountsDaily(t)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(n == t.events.count())
  }

  test("approx distinct users within 5% of exact") {
    val exact = Analytics.qDistinctUsers(t).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    Analytics.qDistinctUsersApprox(t).collect().foreach { r =>
      val e = exact(r.getAs[String]("event_type")).toDouble
      val a = r.getAs[Long]("n_users_approx").toDouble
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("user ltv only counts purchases") {
    import org.apache.spark.sql.functions._
    val ltv = Analytics.qUserLtv(t).agg(round(sum("ltv"), 2)).collect()(0).getDouble(0)
    val direct = t.events.filter(col("event_type") === "purchase")
      .agg(round(sum("value"), 2)).collect()(0).getDouble(0)
    assert(math.abs(ltv - direct) < 0.05)
  }

  test("asof join picks the latest click at or before each purchase") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ts0 = 1700000000L
    def ev(id: Long, u: Long, sec: Long, tpe: String) = (id, sec * 1000000L, u, tpe, 1.0, "{}")
    val evDf = Seq(
      ev(1, 1, ts0 + 10, "click"),
      ev(2, 1, ts0 + 20, "click"),
      ev(3, 1, ts0 + 25, "purchase"), // -> click 2, gap 5
      ev(4, 1, ts0 + 5, "purchase"),  // before any click -> null
      ev(5, 2, ts0 + 30, "purchase"), // user 2 has no clicks -> null
      ev(6, 3, ts0 + 40, "view")      // not click/purchase -> absent
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(ts)"))
    val t2 = new graft.sources.Tables(spark, sf) { override def events = evDf }
    val got = Analytics.asofJoin(t2).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Any]("asof_click_id")), Option(r.getAs[Any]("gap_sec")))).toMap
    assert(got.keySet == Set(3L, 4L, 5L))
    assert(got(3L) == ((Some(2L), Some(5L))))
    assert(got(4L) == ((None, None)))
    assert(got(5L) == ((None, None)))
  }

  test("stratified sample is deterministic and tracks configured rates") {
    import org.apache.spark.sql.functions._
    val a = TrainData.sampleStratified(t).collect().map(_.getAs[Long]("event_id"))
    val b = TrainData.sampleStratified(t).collect().map(_.getAs[Long]("event_id"))
    assert(a.sameElements(b), "sample not reproducible")
    val stats = TrainData.sampleStratifiedStats(t).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))).toMap
    val rates = TrainData.sampleRates.toMap
    stats.foreach { case (tpe, (total, kept)) =>
      val rate = rates(tpe)
      if (rate == 1.0) assert(kept == total, s"$tpe must keep everything")
      else {
        // deterministic hash ~ uniform: realized fraction within ±5pp + small-n slack
        val realized = kept.toDouble / total
        assert(math.abs(realized - rate) < 0.05 + 2.0 / math.sqrt(total.toDouble),
          s"$tpe realized $realized vs rate $rate")
      }
    }
  }
}
