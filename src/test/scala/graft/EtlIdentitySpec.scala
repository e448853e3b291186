package graft

import graft.operators.{Envelope, Etl, Identity}
import org.apache.spark.sql.functions._

class EtlIdentitySpec extends SparkSpec {

  test("owner normalization collapses everything outside the whitelist to zg") {
    val rows = Etl.ownerNormalize(t).collect()
    val owners = rows.map(_.getAs[String]("owner")).toSet
    assert(owners.subsetOf(Set("zg", "zg_adp", "zg_mkt", "zg_cdp")))
    // zg_web and '' both collapse to zg
    assert(rows.filter(_.getAs[String]("owner") == "zg").map(_.getAs[String]("owner_raw")).toSet
      == Set("zg_web", ""))
  }

  test("json validation flags exactly the truncated payloads") {
    val rows = Etl.jsonValidate(t).collect()
    val bad = rows.filter(_.getAs[Int]("result") == -1)
    assert(bad.nonEmpty)
    assert(bad.forall(_.getAs[Int]("error_code") == Etl.Err.BasicSchemaFormatNotMatch))
    assert(bad.forall(_.getAs[Long]("event_id") % 31 == 0))
    assert(bad.length == rows.count(_.getAs[Long]("event_id") % 31 == 0))
  }

  test("schema check error lists are consistent with result") {
    val rows = Etl.schemaCheck(t).collect()
    rows.foreach { r =>
      val ok = r.getAs[Int]("result") == 0
      assert(ok == r.getAs[String]("errors").isEmpty)
    }
  }

  test("app registry join resolves every non-empty appkey") {
    val rows = Etl.appIdBusiness(t).collect()
    rows.foreach { r =>
      if (r.getAs[String]("appkey").nonEmpty) assert(!r.isNullAt(r.fieldIndex("app_id")))
      else assert(r.getAs[Int]("error_code") == Etl.Err.AkNone)
    }
  }

  test("gate: blocked ips/uas flagged per app, blocked aks dropped") {
    val rows = Etl.gateBlacklist(t).collect()
    // blacklisted app never appears
    assert(!rows.exists(r => Etl.akBlacklist.contains(r.getAs[String]("appkey"))))
    // app0's blocked ip (10.1.2.3) exists in traffic => IP_BLOCK rows
    val app0Blocked = rows.filter(r =>
      r.getAs[String]("appkey") == "app0" && r.getAs[Int]("error_code") == Etl.Err.IpBlock)
    assert(app0Blocked.nonEmpty && app0Blocked.head.getAs[Long]("n") > 0)
    // ua block only ever fires for apps with a ua blacklist entry
    rows.filter(_.getAs[Int]("error_code") == Etl.Err.UaBlock)
      .foreach(r => assert(Etl.uaBlacklist.exists(_._1 == r.getAs[String]("appkey"))))
  }

  test("device map assigns dense contiguous surrogate ids per app") {
    val byApp = Identity.deviceMap(t).collect().groupBy(_.getAs[String]("appkey"))
    byApp.values.foreach { rows =>
      val ids = rows.map(_.getAs[Int]("zg_did")).sorted
      assert(ids.head == 1 && ids.last == ids.length) // dense 1..n
      assert(ids.distinct.length == ids.length)       // unique per device
    }
  }

  test("zgid: anonymous events share the zgid of their device's first user") {
    val env = Envelope.attach(t.events)
    val zg = Identity.zgidResolution(t)
    val joined = env.join(zg, "event_id").cache()
    // real-name events always resolve
    assert(joined.filter(col("cuid").isNotNull && col("zgid").isNull).count() == 0)
    // no device + anonymous -> null zgid
    assert(joined.filter(col("cuid").isNull && col("did") === "" && col("zgid").isNotNull).count() == 0)
    // a device's anonymous and real-name traffic agree when one user owns it
    val perDevice = joined.filter(col("did") =!= "" && col("zgid").isNotNull)
      .groupBy("appkey", "did").agg(countDistinct("zgid").as("nz"))
    assert(perDevice.count() > 0)
    joined.unpersist()
  }

  test("sessionize: session event counts cover all events, gaps respected") {
    val sess = Identity.sessionize(t).collect()
    assert(sess.map(_.getAs[Long]("n_events")).sum == t.events.count())
    // every session's span is consistent
    sess.foreach { r =>
      assert(r.getAs[String]("start_ts") <= r.getAs[String]("end_ts"))
    }
  }

  test("archive dedup keeps exactly one latest mapping per device") {
    val rows = Identity.archiveDedup(t).collect()
    val keys = rows.map(r => (r.getAs[String]("appkey"), r.getAs[String]("did")))
    assert(keys.distinct.length == keys.length)
  }

  test("archive route: five ArchiveType legs, keys unique, axes consistent") {
    val rows = Identity.archiveRoute(t).collect()
    val byType = rows.groupBy(_.getAs[Int]("archive_type"))
    assert(byType.keySet == Set(1, 2, 3, 4, 5))
    assert(byType(1).head.getAs[String]("type_name") == "DEVICE")
    assert(byType(5).head.getAs[String]("type_name") == "ZGID_USER")
    // every leg is single-valued per (app, key) — the routed tables are maps
    byType.values.foreach { leg =>
      val keys = leg.map(r => (r.getAs[Int]("app_id"), r.getAs[String]("map_key")))
      assert(keys.distinct.length == keys.length)
    }
    // DEVICE_ZGID keys are exactly the DEVICE values (same surrogate axis)
    def pairs(tp: Int, f: org.apache.spark.sql.Row => String) =
      byType(tp).map(r => (r.getAs[Int]("app_id"), f(r))).toSet
    assert(pairs(3, _.getAs[String]("map_key")) == pairs(1, _.getAs[String]("map_value")))
    // ZGID_USER inverts a subset of USER_ZGID's bindings
    val uz = byType(4).map(r => (r.getAs[Int]("app_id"),
      r.getAs[String]("map_key"), r.getAs[String]("map_value"))).toSet
    byType(5).foreach { r =>
      assert(uz.contains((r.getAs[Int]("app_id"),
        r.getAs[String]("map_value"), r.getAs[String]("map_key"))))
    }
  }

  test("incremental assignment never renumbers history and continues above it") {
    val rows = Identity.incrementalAssign(t).collect()
    val keys = rows.map(r => (r.getAs[String]("appkey"), r.getAs[String]("did")))
    assert(keys.distinct.length == keys.length, "a key got two ids")
    val byApp = rows.groupBy(_.getAs[String]("appkey"))
    byApp.foreach { case (_, rs) =>
      val old = rs.filter(!_.getAs[Boolean]("is_new")).map(_.getAs[Int]("zg_did")).sorted
      val neu = rs.filter(_.getAs[Boolean]("is_new")).map(_.getAs[Int]("zg_did")).sorted
      // existing ids are the original dense 1..n (unchanged by the new batch)
      assert(old.sameElements(1 to old.length), s"history renumbered: ${old.take(5).toSeq}")
      // new ids continue contiguously above the existing maximum
      assert(neu.sameElements(old.length + 1 to old.length + neu.length),
        s"new ids not contiguous above max: ${neu.take(5).toSeq}")
    }
    // both sides of the cutoff are non-trivial on the test corpus
    assert(rows.exists(_.getAs[Boolean]("is_new")) &&
      rows.exists(!_.getAs[Boolean]("is_new")))
  }
}
