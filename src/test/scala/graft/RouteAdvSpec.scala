package graft

import graft.operators.{Adv, Envelope, Route}
import org.apache.spark.sql.functions._

class RouteAdvSpec extends SparkSpec {

  test("unified DQ chain emits known codes with gate-stage precedence") {
    import graft.operators.Etl
    val rows = Route.dqFullChain(t).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Int]("error_code")).toMap
    val known = Set(0, Etl.Err.IpBlock, Etl.Err.UaBlock, Etl.Err.JsonFormatError,
      Etl.Err.AkNone, Etl.Err.BasicSchemaFormatNotMatch,
      Route.Err.ZgZgidNone, Route.Err.ZgDidNone, Route.Err.EventTimeExceedsRange)
    assert(rows.values.toSet.subsetOf(known))
    // at least the gate, schema and dw stages all fire on this corpus
    assert(rows.values.toSet.intersect(Set(Etl.Err.IpBlock,
      Etl.Err.JsonFormatError, Etl.Err.AkNone)).nonEmpty)
    assert(rows.values.exists(_ == Etl.Err.BasicSchemaFormatNotMatch))
    assert(rows.values.exists(_ == Route.Err.EventTimeExceedsRange))
    assert(rows.values.exists(_ == 0))
    // stage shadowing: an empty did is a schema violation FIRST, so the
    // dw-side ZG_DID_NONE can never surface in the unified ledger — every
    // did='' event of a registered app reads an earlier-stage code
    assert(!rows.values.exists(_ == Route.Err.ZgDidNone))
    // blacklist outranks everything: a blacklisted-ip event of a registered
    // app always reads IP_BLOCK even if its message is also schema-broken
    val env = Envelope.attach(t.events)
      .select("event_id", "appkey", "ip").collect()
    val blocked = graft.operators.Etl.ipBlacklist.toSet
    env.filter(r => blocked.contains((r.getAs[String]("appkey"), r.getAs[String]("ip"))))
      .foreach { r =>
        assert(rows(r.getAs[Long]("event_id")) == Etl.Err.IpBlock, s"$r")
      }
  }

  test("routing covers every event and only known sinks") {
    val rows = Route.routeByDt(t).collect()
    val routes = rows.map(_.getAs[String]("route")).toSet
    assert(routes.subsetOf(Set("user", "device", "user_prop", "event_attr", "drop")))
    assert(rows.map(_.getAs[Long]("n")).sum == t.events.count())
  }

  test("event_attr time components are internally consistent") {
    val rows = Route.routeEventAttr(t).limit(100).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("day_id").length == 8)
      assert(r.getAs[String]("time_id").length == 5)
      assert(r.getAs[String]("year_week").matches("\\d{4}-\\d{2}"))
      assert(r.getAs[Int]("platform_id") >= 0 && r.getAs[Int]("platform_id") <= 6)
    }
  }

  test("custom props land in their registry column index with the type tag beside") {
    import graft.operators.Derive
    val k = Derive.customColumns
    val env = Envelope.attach(t.events)
      .select("event_id", "appkey", "event_type", "cus_key", "cus_val", "cus_type")
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    val cidx = Derive.eventAttrColumnIndex(t).collect()
      .map(r => (r.getAs[String]("appkey"), r.getAs[String]("event_type"),
        r.getAs[String]("cus_key")) -> r.getAs[Int]("col_index")).toMap
    val rows = Route.routeEventAttr(t).collect()
    assert(rows.nonEmpty)
    var filled = 0
    rows.foreach { r =>
      val e = env(r.getAs[Long]("event_id"))
      val expect = Option(e.getAs[String]("cus_key")).flatMap(ck =>
        cidx.get((e.getAs[String]("appkey"), e.getAs[String]("event_type"), ck)))
      (1 to k).foreach { i =>
        val cus = r.getAs[String](s"cus$i")
        val pt = r.getAs[String](s"pt$i")
        if (expect.contains(i)) {
          assert(cus == e.getAs[String]("cus_val"), s"cus$i of ${e}")
          assert(pt == e.getAs[String]("cus_type"), s"pt$i of ${e}")
          filled += 1
        } else {
          assert(cus == "\\N" && pt == "\\N", s"stray cus$i/pt$i in $r")
        }
      }
    }
    assert(filled > 0, "no custom property ever materialized")
    // the synthetic corpus registers more keys than the column budget, so
    // the 1..customColumns bound is genuinely exercised (over-budget keys
    // fill nothing) and the budget's last column is actually allocated
    assert(cidx.values.max == k)
    // reserved mkt/abp attr names never register
    assert(!cidx.keys.exists(_._3 == "uuid"))
  }

  test("event_attr row: uuid is 32-hex deterministic, ss/se take sentinel eids") {
    val rows = Route.routeEventAttr(t).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("uuid").matches("[0-9a-f]{32}"))
      val name = r.getAs[String]("event_name")
      val eid = r.getAs[Int]("eid")
      if (eid == -1) assert(name == "st")
      else if (eid == -2) assert(name == "se")
      else assert(eid >= 1)
      // attr5 composes the zgid and session id
      assert(r.getAs[String]("attr5") ==
        r.getAs[String]("zgid") + "_" + r.getAs[Long]("zg_sid"))
    }
    // deterministic: two builds agree row-for-row
    val again = Route.routeEventAttr(t).collect()
    assert(rows.map(_.getAs[String]("uuid")).toSeq ==
      again.map(_.getAs[String]("uuid")).toSeq)
    assert(rows.exists(_.getAs[Int]("eid") == -1) &&
      rows.exists(_.getAs[Int]("eid") == -2), "no ss/se sentinel rows")
  }

  test("unique-key merge keeps exactly the latest write per key") {
    val merged = Route.sinkUniqueKeyMerge(t).collect()
    val keys = merged.map(r => (r.getAs[String]("zgid"), r.getAs[String]("prop_id")))
    assert(keys.distinct.length == keys.length, "duplicate unique keys survived")
    val all = Route.routeUserPropRow(t).collect()
    val latest = all
      .groupBy(r => (r.getAs[String]("zgid"), r.getAs[String]("prop_id")))
      .view.mapValues(_.maxBy(r =>
        (r.getAs[Long]("last_update"), r.getAs[Long]("event_id")))).toMap
    assert(merged.length == latest.size)
    merged.foreach { r =>
      val k = (r.getAs[String]("zgid"), r.getAs[String]("prop_id"))
      assert(r.getAs[Long]("event_id") == latest(k).getAs[Long]("event_id"),
        s"key $k kept a stale write")
    }
    // the corpus genuinely upserts: multiple writes per key pre-merge
    assert(all.length > merged.length)
  }

  test("lid attach: as-of touch state, channel-prop gates, first/follow pair") {
    val rows = Adv.lidUserFirstEnd(t).collect()
    assert(rows.nonEmpty)
    val n = "\\N"
    // events before any touch carry the -1/\N sentinels
    val untouched = rows.filter(_.getAs[Long]("lid") == -1L)
    assert(untouched.forall { r =>
      r.getAs[String]("channel_type") == n &&
        r.getAs[String]("account_id") == n &&
        r.getAs[Long]("first_lid") == -1L
    })
    val touched = rows.filter(_.getAs[Long]("lid") != -1L)
    assert(touched.nonEmpty)
    touched.foreach { r =>
      val lid = r.getAs[Long]("lid")
      // the channel-type gate: code 0 synthesizes the empty string, which
      // must suppress the type/name props but NOT the $-prefixed ids
      if (lid % 16 == 0) {
        assert(r.getAs[String]("channel_type") == n)
        assert(r.getAs[String]("channel_name") == n)
        if (lid % 100 != 0)
          assert(r.getAs[String]("campaign_id") == "$" + (lid % 100))
      } else if (r.getAs[String]("channel_type") != n) {
        assert(r.getAs[String]("channel_type") == (lid % 16).toString)
      }
      // the zero gate: a 0 id means absent (getLongValue's default)
      if (lid % 100 == 0) assert(r.getAs[String]("campaign_id") == n)
      if (lid % 11 == 0) assert(r.getAs[String]("keyword_id") == n)
      // follow exists only when the latest touch differs from the first
      if (r.getAs[Long]("fol_lid") != -1L) {
        assert(r.getAs[Long]("fol_lid") == lid)
        assert(r.getAs[Long]("first_lid") != lid)
      }
    }
    // the user rollup agrees with the reference's update rule: single-touch
    // users never carry a follow pair, multi-touch users always do (every
    // synthesized touch key is distinct)
    val us = Adv.userAdSource(t).collect()
    us.foreach { r =>
      if (r.getAs[Long]("n_touches") == 1L)
        assert(r.getAs[Long]("fol_lid") == -1L)
      else
        assert(r.getAs[Long]("fol_lid") != -1L &&
          r.getAs[Long]("fol_lid") != r.getAs[Long]("first_lid"))
    }
    assert(us.exists(_.getAs[Long]("n_touches") > 1L))
  }

  test("ss click match: priority axes fire and every click attributes once") {
    val rows = Adv.ssClickMatch(t).collect()
    assert(rows.nonEmpty)
    val matched = rows.filter(_.getAs[Long]("matched_lid") != -1L)
    assert(matched.nonEmpty, "no session-start ever matched a click")
    // one-shot consumption: a click id appears at most once
    val lids = matched.map(_.getAs[Long]("matched_lid"))
    assert(lids.distinct.length == lids.length, "a click attributed twice")
    // the exact axes must fire; the fuzzy ip+ua key only collides by
    // coincidence on this corpus (ip/ua derive from event_id, not the
    // device), so its PATH is pinned by the oracle, not by volume here
    val axes = matched.map(_.getAs[String]("match_axis")).toSet
    assert(axes.contains("muid") || axes.contains("oaid"), s"no exact hit: $axes")
    assert(axes.subsetOf(Set("muid", "oaid", "ipua")))
    // unmatched rows carry the full sentinel triple
    rows.filter(_.getAs[Long]("matched_lid") == -1L).foreach { r =>
      assert(r.getAs[Long]("click_ct") == -1L)
      assert(r.getAs[String]("match_axis") == "none")
    }
  }

  test("bucketed sink reads back with a zero-exchange join and aggregation") {
    val out = Route.sinkBucketedJoin(t)
    assert(out.count() > 0)
    // with broadcast disabled, the bucketed tables must join AND aggregate
    // on user_id without ANY Exchange — the co-location contract
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_ev_bucketed")
        .join(spark.table("graft_usr_bucketed"), "user_id")
        .groupBy("user_id").count()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed readback shuffled:\n$p")
      // and the result is the same rows a shuffled join would produce
      assert(j.count() == t.events.select("user_id").distinct().count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("dq validation: exempt sdks never fail on time") {
    val env = Envelope.attach(t.events).select("event_id", "sdk")
    val joined = Route.dqValidate(t).join(env, "event_id")
    val badExempt = joined.filter(
      col("sdk").isin("zg_server", "zg-cdp") &&
        col("error_code") === Route.Err.EventTimeExceedsRange)
    assert(badExempt.count() == 0)
    // the pinned window makes most in-range events fail (events span a year)
    assert(joined.filter(col("error_code") === Route.Err.NoneError).count() > 0)
  }

  test("partitioned sink roundtrips all event_attr rows") {
    val back = Route.sinkPartitionedParquet(t)
    assert(back.agg(sum("n")).collect()(0).getLong(0) == t.events.count())
  }

  test("dynamic sink routes each registered app into its own table dir") {
    val out = java.nio.file.Files.createTempDirectory("graft_dynsink_spec").toString
    val stats = Route.sinkDynamicRoute(t, Some(out)).collect()
    // one directory (= one dynamic Doris table) per registered app seen
    val appDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("app_id=")).map(_.getName).toSet
    assert(appDirs == stats.map(r => s"app_id=${r.getAs[Int]("app_id")}").toSet)
    assert(stats.forall(_.getAs[String]("table_name").startsWith("b_user_event_attr_")))
    // routed rows = envelope rows of registered apps; unregistered drop
    val reg = Envelope.appRegistryDf(spark).select("appkey")
    val expected = Envelope.attach(t.events).join(reg, "appkey").count()
    assert(stats.map(_.getAs[Long]("n")).sum == expected)
    assert(expected < t.events.count(), "corpus has no unregistered appkey rows")
  }

  test("salted sink spreads a heavy day over multiple bounded files") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink_spec").toString
    Route.sinkPartitionedParquet(t, Some(out)).collect()
    val dayDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("day_id="))
    assert(dayDirs.nonEmpty)
    val maxFiles = dayDirs.map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxFiles > 1, "one day still funnels through a single writer")
  }

  test("click attribution: every attributed click precedes its conversion") {
    val env = Envelope.attach(t.events).select(col("event_id"), col("ts"))
    val attributed = Adv.clickJoin(t)
      .join(env.withColumnRenamed("event_id", "conv_id").withColumnRenamed("ts", "conv_ts"), "conv_id")
      .join(env.withColumnRenamed("event_id", "click_id").withColumnRenamed("ts", "click_ts"), "click_id")
    assert(attributed.filter(col("click_ts") > col("conv_ts")).count() == 0)
    // one attribution per conversion
    val n = attributed.count()
    assert(attributed.select("conv_id").distinct().count() == n)
  }

  test("first/last touch covers every user exactly once") {
    val rows = Adv.firstLastTouch(t)
    assert(rows.count() == t.events.select("user_id").distinct().count())
    assert(rows.filter(col("first_source").isNull || col("last_source").isNull).count() == 0)
  }

  test("conversions dedup to one row per user-day") {
    val rows = Adv.conversion(t).collect()
    val keys = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[String]("conv_day")))
    assert(keys.distinct.length == keys.length)
    assert(rows.map(_.getAs[Long]("n_raw")).sum ==
      t.events.filter(col("event_type") === "purchase").count())
  }

  test("asa fields: legacy and JSON wire formats land in the same field set") {
    val rows = Adv.asaFields(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(r.getAs[String]("lname") == "苹果ASA" && r.getAs[String]("lid") == "-2"
        && r.getAs[String]("channel_type") == "5")
      assert(r.getAs[String]("channel_campaign_id") == (id % 97).toString)
      assert(r.getAs[String]("channel_adgroup_id") == (id % 53).toString)
      assert(r.getAs[String]("channel_keyword_id") == (id % 31).toString)
      // adId fallback: legacy has none -> "0"; JSON adId=0 -> creativeSetId
      (id % 3) match {
        case 0 => assert(r.getAs[String]("channel_ad_id") == "0")
        case 1 => assert(r.getAs[String]("channel_ad_id") == (id % 17).toString)
        case _ => assert(r.getAs[String]("channel_ad_id") == (id % 17 + 1).toString)
      }
    }
  }

  test("channel rollup names registered codes and blanks unknown ones") {
    val rows = Adv.channelRollup(t).collect()
    val dim = Adv.adChannelDim.toMap
    rows.foreach { r =>
      val (code, name) = (r.getAs[String]("channel_type"), r.getAs[String]("channel_name"))
      assert(name == dim.getOrElse(code, ""), s"code $code mapped to '$name'")
      assert(r.getAs[Long]("n_clicks") > 0)
    }
    // codes 0/6/7/8 exist in the synthesized corpus but not the dim
    assert(rows.exists(_.getAs[String]("channel_name") == ""))
  }

  test("adv admission: business gate rejects app2, blacklists drop rows") {
    // the derived registry keeps only company/business-admitted apps
    assert(Adv.adAppRegistry.map(_._1).toSet == Set("app0", "app1"))
    assert(Adv.advCompanyRegistry.exists(_._1 == "app2"),
      "app2 must be a registered company app — rejected by the business gate, not absent")
    val stats = Adv.admissionStats(t).collect()
    def n(ak: String, verdict: String): Long = stats
      .filter(r => r.getAs[String]("appkey") == ak && r.getAs[String]("verdict") == verdict)
      .map(_.getAs[Long]("n")).sum
    // app2 traffic exists and every row of it is BUSINESS_BLOCKED
    assert(n("app2", "BUSINESS_BLOCKED") > 0)
    assert(stats.filter(_.getAs[String]("appkey") == "app2")
      .forall(_.getAs[String]("verdict") == "BUSINESS_BLOCKED"))
    // the per-app blacklists fire on the adv stream too
    assert(n("app0", "IP_BLOCK") > 0 && n("app1", "UA_BLOCK") > 0)
    // and the admitted legs genuinely exclude those rows: a blacklisted
    // (app, ip) pair never contributes a fuzzy match key to ITS app's
    // ad state (the filter is per-app, so other apps may still carry it)
    val appIdOf = Adv.adAppRegistry.toMap
    val keys = Adv.appAdLatest(t).collect().map(_.getAs[String]("match_key"))
    graft.operators.Etl.ipBlacklist.foreach { case (ak, ip) =>
      appIdOf.get(ak).foreach { adId =>
        assert(!keys.exists(k => k.startsWith(s"adtfad:$adId:$ip")),
          s"blacklisted ($ak, $ip) leaked into the ad state")
      }
    }
  }

  test("user-profile normalizers follow the reference's DimUtils contracts") {
    val rows = graft.operators.Route.dimUserProfile(t).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      // gender: mixed-case keys lowercase into the dim; 'x' (id%10==9) misses -> 0
      val expectedGender = (id % 10) match {
        case 0 | 1 | 2 => 1
        case 3 | 4 | 5 => 2
        case _         => 0
      }
      assert(r.getAs[Int]("gender_id") == expectedGender, s"gender of $id")
      // jail: ''->0, '0'->2, '1'->1, '2' unmapped->0
      val expectedJail = (id % 4) match {
        case 1 => 2; case 2 => 1; case _ => 0
      }
      assert(r.getAs[Int]("jail_id") == expectedJail, s"jail of $id")
      // carrier: only the exactly-6-digit form yields a code
      val carrier = r.getAs[Int]("carrier_code")
      if (id % 3 == 0) assert(carrier == 460000 + (id % 10).toInt)
      else assert(carrier == 0)
      // birthday: valid yyyy/MM/dd reformats, 'bad-date' -> null
      val bday = r.getAs[String]("birthday_fmt")
      if (id % 2 == 0) assert(bday == f"1992030${id % 9 + 1}%d")
      else assert(bday == null)
      // phone: 14-char form keeps last 11 digits; letters -> null; short digits pass
      val phone = r.getAs[String]("phone_norm")
      (id % 3) match {
        case 0 => assert(phone != null && phone.length == 11 && phone.startsWith("13800138"))
        case 1 => assert(phone == null)
        case _ => assert(phone != null && phone.length == 9)
      }
      // sdkv: full-match only ('1.2' lacks the v prefix, bare 'v' no digits)
      assert(r.getAs[Boolean]("sdkv_valid") == (id % 3 == 0), s"sdkv of $id")
    }
  }
}
