package graft

import graft.functions.MatchRules
import graft.functions.MatchRules.MatchRule
import graft.operators.Adv
import org.apache.spark.sql.functions._

/** OperatorUtil.compareProValue semantics (OperatorUtil.java:22-335)
  * against a hand-built truth table, plus the adv_convert_match rollup's
  * internal consistency.
  */
class MatchRulesSpec extends SparkSpec {

  private val nowMs = Adv.matchNowMs

  /** Evaluate one compiled condition against a literal value. */
  private def eval(v: String, r: MatchRule): Boolean = {
    import spark.implicits._
    Seq(Option(v)).toDF("v")
      .select(MatchRules.condition(col("v"), r, nowMs).as("m"))
      .collect()(0).getAs[Boolean]("m")
  }

  test("string operators follow compareStringValue") {
    def r(op: String, t: String) = MatchRule(0, "e", "l", 1, op, Seq(t))
    assert(eval("pro", r("equal", "pro")))
    assert(!eval("pro", r("equal", "free")))
    assert(eval("pro", r("not equal", "free")))
    assert(eval("huawei_store", r("begin with", "huawei")))
    assert(!eval("huawei_store", r("not begin with", "huawei")))
    assert(eval("huawei_store", r("end with", "store")))
    assert(eval("free", r("not contains", "o")))
    assert(!eval("pro", r("not contains", "o")))
    // regexp is Matcher.find, not full-match (OperatorUtil.java:332-335)
    assert(eval("Mozilla Chrome/120.0", r("regexp", "Chrome/1[012][0-9]")))
    assert(!eval("Mozilla Chrome/120.0", r("not regexp", "Chrome/1[012][0-9]")))
    // is not null inside the non-empty branch is unconditionally true
    assert(eval("x", r("is not null", "anything")))
    // unknown operator -> false
    assert(!eval("x", r("frobnicate", "x")))
  }

  test("numeric operators parse as Long and fail closed") {
    def r(op: String, t: String) = MatchRule(0, "e", "l", 2, op, Seq(t))
    assert(eval("2000", r("gt", "1000")))
    assert(!eval("500", r("gt", "1000")))
    assert(eval("-5", r("le", "2500")))
    assert(eval("1000", r("equal", "1000")))
    assert(eval("999", r("not equal", "1000")))
    assert(eval("999", r("lt", "1000")))
    assert(eval("1000", r("ge", "1000")))
    // parseLong failures -> false, never a throw (OperatorUtil.java:254-258)
    assert(!eval("fast", r("gt", "0")))
    assert(!eval("12.5", r("gt", "0")))
    assert(!eval("null", r("gt", "0")))
    assert(!eval("NULL", r("gt", "0")))
    // unparseable TARGET -> false for every value
    assert(!eval("5", r("gt", "ten")))
  }

  test("date operators: absolute is UTC+8 day bounds, relative is now-N days") {
    // 2024-01-08T00:00+08:00 = 1704643200s; 2024-01-20T00:00+08:00 = 1705680000s
    val abs = MatchRule(0, "e", "l", 3, "absolute", Seq("2024-01-08", "2024-01-20"))
    assert(MatchRules.dayStartMs8("2024-01-08") == 1704643200000L)
    assert(eval("1704643200", abs))          // exactly the start bound
    assert(eval("1705680000", abs))          // exactly the end bound (inclusive)
    assert(!eval("1705680001", abs))
    assert(!eval("1704643199", abs))
    // relative 25 days of 2024-02-10T00:00Z -> >= 2024-01-16T00:00Z (1705363200)
    val rel = MatchRule(0, "e", "l", 3, "relative", Seq("25"))
    assert(eval("1705363200", rel))
    assert(!eval("1705363199", rel))
    assert(!eval("fast", rel))
    // a malformed absolute rule (missing the end date) fails closed
    // instead of throwing at plan time
    val lame = MatchRule(0, "e", "l", 3, "absolute", Seq("2024-01-08"))
    assert(!eval("1704643200", lame))
    assert(MatchRules.conditionSql("v", lame, nowMs).contains("FALSE"))
  }

  test("empty value or empty values -> handleNullValue") {
    val isNull = MatchRule(0, "e", "l", 1, "is null", Seq.empty)
    val isNotNull = MatchRule(0, "e", "l", 1, "is not null", Seq.empty)
    assert(eval("", isNull))
    assert(eval(null, isNull))
    assert(eval("null", isNull))   // "null".equalsIgnoreCase
    assert(eval("NULL", isNull))
    assert(!eval("x", isNull))
    assert(eval("x", isNotNull))
    assert(!eval("", isNotNull))
    // non-null operator with empty value -> false
    assert(!eval("", MatchRule(0, "e", "l", 1, "equal", Seq("x"))))
    // empty values with a non-null operator -> false even for present value
    assert(!eval("x", MatchRule(0, "e", "l", 1, "equal", Seq.empty)))
  }

  test("deep-convert decisions respect link config, window and first-only send") {
    val byLid = Adv.adsLinkRegistry.map(l => l.lid -> l).toMap
    val rows = Adv.deepConvert(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val link = byLid(r.getAs[Int]("lid"))
      assert(link.eventIds.contains(r.getAs[String]("event_name")), s"unconfigured event: $r")
      val convCt = r.getAs[Long]("conv_ct")
      val clickCt = r.getAs[Long]("click_ct")
      assert(convCt >= clickCt, s"conversion precedes click: $r")
      assert(convCt - clickCt <= link.windowSec * 1000L, s"outside window: $r")
    }
    // first-only: one send per (event, link, user)
    val keys = rows.map(r => (r.getAs[String]("event_name"), r.getAs[Int]("lid"),
      r.getAs[String]("zgid")))
    assert(keys.distinct.length == keys.length)
    // only configured links ever fire; the widened AdvJob admission
    // (blacklist anti-joins) prunes the tiny sf0.001 corpus below full
    // link coverage, so the all-links-fire guarantee is pinned at sf0.01
    val fired = rows.map(_.getAs[Int]("lid")).toSet
    assert(fired.subsetOf(Adv.adsLinkRegistry.map(_.lid).toSet) && fired.size >= 2)
    val fired01 = Adv.deepConvert(graft.sources.Tables(spark, "/root/testdata/sf0.01"))
      .select("lid").distinct().collect().map(_.getInt(0)).toSet
    assert(fired01 == Adv.adsLinkRegistry.map(_.lid).toSet,
      s"not every configured link fires at sf0.01: $fired01")
    // the audience-gated link only sends rule-passing conversions: its rule
    // is dru > 1000, so no sent purchase on link 101 carries a small dru
    val env101 = graft.operators.Envelope.attach(t.events)
      .select(col("event_id"), col("dru")).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("dru")).toMap
    rows.filter(_.getAs[Int]("lid") == 101).foreach { r =>
      val dru = env101(r.getAs[Long]("event_id"))
      assert(dru.toLongOption.exists(_ > 1000L), s"rule-failing send on 101: dru=$dru")
    }
  }

  test("configured UTM overwrites the URL-parsed block, others keep their own") {
    val cfg = Adv.utmConfigRegistry.map(c => c._1 -> c).toMap
    val rows = Adv.addUtm(t).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Boolean]("utm_hit")))
    assert(rows.exists(!_.getAs[Boolean]("utm_hit")))
    rows.foreach { r =>
      if (r.getAs[Boolean]("utm_hit")) {
        val c = cfg(r.getAs[Int]("eid"))
        assert(r.getAs[String]("utm_source") == c._2 &&
          r.getAs[String]("utm_medium") == c._3 &&
          r.getAs[String]("utm_term") == c._6, s"config not applied: $r")
      } else {
        // un-hit events carry the landing URL's own params (or nothing)
        val s = r.getAs[String]("utm_source")
        assert(s == null || s == "wechat", s"unexpected url param: $r")
        assert(r.getAs[String]("utm_term") == null)
      }
    }
  }

  test("adv_convert_match rolls up every rule and bounds hold") {
    val rows = Adv.convertMatch(t).collect()
    assert(rows.length == Adv.adMatchRules.length)
    assert(rows.map(_.getAs[Int]("link_id")).toSeq ==
      Adv.adMatchRules.map(_.linkId).sorted)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val m = r.getAs[Long]("n_matched")
      assert(m >= 0 && m <= n, s"match count out of bounds: $r")
      assert(r.getAs[Long]("n_users") <= m, s"more users than matches: $r")
    }
    // every admitted event name has a nonzero pool on this corpus
    assert(rows.forall(_.getAs[Long]("n_events") > 0))
    // at least one rule discriminates (matches strictly between 0 and all)
    assert(rows.exists(r =>
      r.getAs[Long]("n_matched") > 0 &&
        r.getAs[Long]("n_matched") < r.getAs[Long]("n_events")))
  }
}
