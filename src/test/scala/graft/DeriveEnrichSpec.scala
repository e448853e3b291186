package graft

import graft.operators.{Derive, Enrich}
import org.apache.spark.sql.functions._

class DeriveEnrichSpec extends SparkSpec {

  test("virtual property rules evaluate for every event") {
    val rows = Derive.virtualProperty(t)
    assert(rows.count() == t.events.count())
    val bad = rows.filter(
      !col("vp_value_bucket").isin("high", "mid", "low") ||
        !col("vp_is_purchase").isin(0, 1))
    assert(bad.count() == 0)
  }

  test("virtual events match filters per-key, with every matchFilters branch live") {
    val matches = Derive.virtualEvent(t).collect()
      .groupBy(_.getAs[String]("virtual_name")).view.mapValues(_.length).toMap
    val env = graft.operators.Envelope.attach(t.events)
      .filter(col("dt").isin("evt", "abp"))
    def n(c: org.apache.spark.sql.Column): Long = env.filter(c).count()
    // single-key filter on the underscore custom prop
    assert(matches.getOrElse("pro_purchase", 0) ==
      n(col("event_type") === "purchase" && col("pr_plan") === "pro"))
    // two-key filter: both must hold (per-key AND)
    assert(matches.getOrElse("ent_web_purchase", 0) ==
      n(col("event_type") === "purchase" && col("pr_plan") === "ent" &&
        col("pr_src") === "web"))
    // unparseable filters -> match-all (the reference's catch branch)
    assert(matches.getOrElse("purchase_all", 0) == n(col("event_type") === "purchase"))
    // null filters and empty-object filters -> match-all
    assert(matches.getOrElse("any_click", 0) == n(col("event_type") === "click"))
    assert(matches.getOrElse("page_view_vtl", 0) == n(col("event_type") === "view"))
    // a filter key absent from pr can never match
    assert(!matches.contains("never_matches"))
    // JSON-number prop compares in canonical string form; corrupt payloads
    // yield a null lookup (never equal)
    assert(matches.getOrElse("k7_error", 0) ==
      n(col("event_type") === "error" &&
        get_json_object(col("raw_props"), "$.k") === "7"))
    // filters discriminate: the filtered rule fires on a strict subset
    assert(matches("pro_purchase") < matches("purchase_all"))
  }

  test("corrupt json payloads yield null device props") {
    val rows = Derive.deviceProps(t)
    val nulls = rows.filter(col("prop_k").isNull).count()
    assert(nulls == t.events.filter(col("event_id") % 31 === 0).count())
  }

  test("event registry ids are dense per app") {
    val byApp = Derive.eventRegistry(t).collect().groupBy(_.getAs[String]("appkey"))
    byApp.values.foreach { rows =>
      val eids = rows.map(_.getAs[Int]("eid")).sorted
      assert(eids.head == 1 && eids.last == eids.length)
    }
  }

  test("private ips never resolve to a geo location") {
    val rows = Enrich.ipGeo(t)
    val leaked = rows.filter(
      (col("ip").startsWith("10.") || col("ip").startsWith("192.168.") ||
        col("ip").startsWith("172.16.") || col("ip").startsWith("127.")) &&
        col("country") =!= Enrich.NullValue)
    assert(leaked.count() == 0)
    // all public 203.0.x.y ips resolve
    val unresolved = rows.filter(col("ip").startsWith("203.") && col("country") === Enrich.NullValue)
    assert(unresolved.count() == 0)
  }

  test("ua parse recovers os/browser/device across the full matrix") {
    val rows = Enrich.userAgent(t)
      .select("os", "os_version", "browser", "browser_version", "device_type", "device_brand")
      .distinct().collect()
    val combos = rows.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getString(3), r.getString(4), r.getString(5))).toSet
    assert(combos == Set(
      ("Windows", "10.0", "Chrome", "120", "Desktop", "Microsoft"),
      ("Mac OS X", "10.15.7", "Safari", "17", "Desktop", "Apple"),
      ("Linux", Enrich.NullValue, "Firefox", "121", "Desktop", Enrich.NullValue),
      ("iOS", "17.1", "MicroMessenger", "8", "Mobile", "Apple"),
      ("Windows", "10.0", "Edge", "120", "Desktop", "Microsoft"),
      ("Android", "12", "Chrome", "118", "Mobile", "Huawei"),
      ("iOS", "16.6", "Safari", "16", "Tablet", "Apple"),
      ("Android", "11", "UCBrowser", "15", "Mobile", "Redmi"),
      ("Android", "13", "QQBrowser", "14", "Mobile", "Samsung"),
      ("Windows", "10.0", "Opera", "105", "Desktop", "Microsoft")))
  }

  test("search keyword extraction decodes url-encoded terms") {
    val rows = Enrich.searchKeyword(t).collect()
      .map(r => (r.getAs[String]("engine"), r.getAs[String]("keyword"))).toSet
    assert(rows.contains(("baidu", "spark etl")))      // %20 decoded
    assert(rows.contains(("google", "zhuge analytics"))) // + decoded
    assert(rows.contains(("unknown", "")))
  }

  test("utm attribution: explicit utm wins, search referrer is organic") {
    val rows = Enrich.utmAttribution(t).collect()
      .map(r => (r.getAs[String]("utm_source"), r.getAs[String]("utm_medium"))).toMap
    assert(rows.contains("wechat") && rows("wechat") == "cpc")
    assert(rows.get("www.baidu.com").contains("搜索自然流量"))
    assert(rows.get("news.example.com").contains("引荐"))
    assert(rows.get(Enrich.NullValue).contains(Enrich.NullValue))
  }

  test("url decode: single, double, plus, and invalid-passthrough semantics") {
    val got = Enrich.urlDecode(t).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("decoded")).toMap
    got.foreach { case (id, decoded) =>
      (id % 5) match {
        case 0 => assert(decoded == "https://a.cn/p?q=hello world&x=1")
        case 1 => assert(decoded == s"k=v&w${id % 7}", s"double decode of $id")
        case 2 => assert(decoded == "plain/no/escapes")
        case 3 => assert(decoded == "bad%zzpct", "invalid escape must pass through")
        case _ => assert(decoded == s"a b c${id % 3}", "+ must decode to space")
      }
    }
  }

  test("timestamp choice: js sdk takes server time, session id pads did to 9") {
    import graft.operators.Etl
    val clientSec = t.events
      .select(col("event_id"), unix_timestamp(col("ts")).as("sec")).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("sec")).toMap
    val rows = Etl.tsChoose(t).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(r.getAs[Int]("sdk_code") == (id % 4 + 1).toInt)
      // the JS sdk (code 3) takes the server receive time (client + lag);
      // every other sdk keeps the client event time untouched
      val expectedTs =
        if (id % 4 + 1 == 3) clientSec(id) + id % 120 else clientSec(id)
      assert(r.getAs[Long]("chosen_ts") == expectedTs, s"chosen_ts of $id")
      val sid = r.getAs[String]("session_id")
      // suffix is exactly 9 zero-padded digits after the session prefix
      assert(sid == s"s${id % 100}" + f"${id % 100000}%09d")
    }
    val byCode = rows.groupBy(_.getAs[Int]("sdk_code"))
    assert(byCode.keySet == Set(1, 2, 3, 4))
  }

  test("version compare follows the reference loop, including the asymmetric quirk") {
    import graft.operators.Etl
    val rows = Etl.sdkvCompare(t).collect()
    def ref(a: String, b: String): Int = {
      // transliteration of Dims.compareVersion for the spec's oracle
      val av = a.replace("v", "").split("\\.")
      val bv = b.replace("v", "").split("\\.")
      av.indices.foreach { i =>
        if (bv.length < i + 1) return 1
        val (x, y) = (av(i).toInt, bv(i).toInt)
        if (x != y) return if (x > y) 1 else -1
      }
      0
    }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("sdkv_a"), r.getAs[String]("sdkv_b"))
      assert(r.getAs[Int]("cmp") == ref(a, b), s"cmp($a, $b)")
      // getSdkV: one-dot versions parse, two-dot versions fall to 0.0
      val num = r.getAs[Double]("sdkv_num")
      if (a.count(_ == '.') == 1) assert(num == a.drop(1).toDouble)
      else assert(num == 0.0)
    }
    // the quirk case is present: equal prefix with a LONGER right side -> 0
    assert(rows.exists(r => r.getAs[String]("sdkv_a") == "v1.0" &&
      r.getAs[String]("sdkv_b") == "v1.0.7" && r.getAs[Int]("cmp") == 0))
  }
}
