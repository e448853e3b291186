package graft

import graft.sources.RawEnvelope
import org.apache.spark.sql.functions._

class RawEnvelopeSpec extends SparkSpec {

  private val good =
    """{"owner":"zg_mkt","ak":"app1","debug":0,"sln":"s","pl":"and","sdk":"zg_and",
      |"sdkv":"v1.2.3","tz":"+8","ut":"u","ip":"203.0.1.2","ua":"Mozilla/5.0",
      |"usr":{"did":"d-77","cuid":"u-42"},
      |"data":[{"dt":"evt","pr":{"$eid":"buy","$ct":"1700000000","_price":"9.9"}},
      |        {"dt":"usr","pr":{"$av":"1"}}]}""".stripMargin.replaceAll("\n", "")

  private val badOwner = good.replace("zg_mkt", "whatever")
  private val malformed = """{"owner":"zg","ak":"""
  private val noData = """{"owner":"zg","ak":"app0"}"""

  private def df(rows: String*) = {
    import spark.implicits._
    rows.toDF("raw")
  }

  test("valid envelope flattens to one row per data item") {
    val out = RawEnvelope.parse(df(good)).collect()
    assert(out.length == 2)
    val evt = out.find(_.getAs[String]("dt") == "evt").get
    assert(evt.getAs[String]("owner") == "zg_mkt")
    assert(evt.getAs[String]("appkey") == "app1")
    assert(evt.getAs[String]("did") == "d-77")
    val pr = evt.getAs[Map[String, String]]("pr")
    assert(pr("$eid") == "buy")
    assert(pr("_price") == "9.9")
    assert(evt.getAs[Int]("item_idx") == 0)
    assert(out.find(_.getAs[String]("dt") == "usr").get.getAs[Int]("item_idx") == 1)
  }

  test("non-whitelisted owner collapses to zg (operator #1 semantics)") {
    val out = RawEnvelope.parse(df(badOwner)).collect()
    assert(out.nonEmpty && out.forall(_.getAs[String]("owner") == "zg"))
  }

  test("malformed and data-less json route to rejects with the schema error") {
    assert(RawEnvelope.parse(df(malformed, noData)).count() == 0)
    val rej = RawEnvelope.rejects(df(malformed, noData, good)).collect()
    assert(rej.length == 2)
    rej.foreach { r =>
      assert(r.getAs[Int]("result") == -1)
      assert(r.getAs[Int]("error_code") == 1020002)
    }
  }

  test("custom-prop classification follows the evt/mkt-abp rules") {
    val mkt = good.replace("\"dt\":\"evt\"", "\"dt\":\"mkt\"")
      .replace("\"$eid\":\"buy\"", "\"$eid\":\"buy\",\"channel\":\"wx\",\"eid\":\"x\"")
    val rows = RawEnvelope.customProps(RawEnvelope.parse(df(good, mkt))).collect()
    def customs(dt: String) = rows.filter(r =>
      r.getAs[String]("dt") == dt && r.getAs[Boolean]("is_custom"))
      .map(_.getAs[String]("prop_key")).toSet
    assert(customs("evt") == Set("_price"))          // _-prefixed only
    // mkt: anything not $-prefixed and not reserved, including _-keys
    // (EventAttrTransfer.java:175-178)
    assert(customs("mkt") == Set("channel", "_price"))
    assert(customs("usr").isEmpty)                   // other dts never custom
  }

  test("kafka source factory wires the parse chain (connector absent here)") {
    // the spark-sql-kafka connector jar is not shipped in this environment;
    // the factory must fail at source resolution, not in our parse chain
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      RawEnvelope.kafka(spark, "localhost:9092", "zg-events")
    }
    assert(e.getMessage.contains("kafka"))
  }
}
