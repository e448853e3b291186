package graft

import graft.operators.{Envelope, Pipeline}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  lazy val rows = Pipeline.eventAttr(t).cache()

  test("entry contract: pipeline produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("covers exactly the event_attr-routed message types") {
    val expected = Envelope.attach(t.events)
      .filter(col("dt").isin("evt", "vtl", "mkt", "ss", "se", "abp")).count()
    assert(rows.count() == expected)
  }

  test("registered-app real-name events always carry a resolved zgid") {
    val env = Envelope.attach(t.events).select(col("event_id"), col("appkey"), col("cuid"))
    val joined = rows.join(env, "event_id")
    val missing = joined.filter(
      col("appkey") =!= "" && col("cuid").isNotNull && col("zgid") === "\\N")
    assert(missing.count() == 0)
    // unregistered apps get the sentinel, never a fabricated id
    val fabricated = joined.filter(col("appkey") === "" && col("zgid") =!= "\\N")
    assert(fabricated.count() == 0)
  }

  test("time components and session ids are well-formed") {
    rows.limit(200).collect().foreach { r =>
      assert(r.getAs[String]("day_id").matches("\\d{8}"))
      assert(r.getAs[Long]("begin_date") > 0)
      val sid = r.getAs[Long]("zg_sid")
      assert(sid == -1L || sid >= 1700000000L)
    }
  }
}
