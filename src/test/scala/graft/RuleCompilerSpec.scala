package graft

import graft.functions.{RuleCompiler, SqlRules}
import org.apache.spark.sql.functions._

class RuleCompilerSpec extends SparkSpec {

  private def eval(rule: String, data: (Double, String)*): Array[Any] = {
    import spark.implicits._
    data.toSeq.toDF("value", "event_type")
      .select(RuleCompiler.compile(rule).as("r")).collect().map(_.get(0))
  }

  private def evalSql(rule: String, data: (Double, String)*): Array[Any] = {
    import spark.implicits._
    data.toSeq.toDF("value", "event_type")
      .select(SqlRules.compile(rule, spark).as("r")).collect().map(_.get(0))
  }

  test("sql rules: the reference's own documented examples compile and run") {
    // SqlToJsonExpressionConverter.java:632-653 example set
    assert(evalSql(
      "CASE WHEN event.value > 1000 THEN 'high' ELSE 'low' END",
      (1500.0, "x"), (10.0, "x")).sameElements(Array("high", "low")))
    assert(evalSql(
      """CASE WHEN event.value > 1000 AND event.event_type = 'purchase' THEN 'bulk_discount'
              WHEN event.value > 1000 THEN 'price_discount' ELSE 'no_discount' END""",
      (1500.0, "purchase"), (1500.0, "view"), (5.0, "purchase"))
      .sameElements(Array("bulk_discount", "price_discount", "no_discount")))
    assert(evalSql("NULLIF(event.event_type, '')", (0.0, ""), (0.0, "a"))
      .sameElements(Array(null, "a")))
    assert(evalSql("CONCAT(UPPER(event.event_type), '-', LEN(event.event_type))",
      (0.0, "ab"))(0) == "AB-2")
  }

  test("sql rules: qualified field names resolve through the default resolver") {
    assert(evalSql("user.value + event.value", (2.0, "x"))(0) == 4.0)
  }

  test("sql rules: aggregates and unsupported constructs are rejected clearly") {
    val agg = intercept[IllegalArgumentException] {
      SqlRules.compile("SUM(event.value)", spark)
    }
    assert(agg.getMessage.contains("unsupported function"))
    val sub = intercept[IllegalArgumentException] {
      SqlRules.compile("event.value IN (1, 2, 3)", spark)
    }
    assert(sub.getMessage.contains("unsupported SQL construct"))
  }

  test("sql rules: literal-position constraints match the JSON-tree compiler") {
    val e = intercept[IllegalArgumentException] {
      SqlRules.compile("ROUND(event.value, event.value)", spark)
    }
    assert(e.getMessage.contains("constant"))
  }

  test("sql rule and json tree compile to identical results") {
    // the same bucket rule in both admin formats must agree row-for-row
    val sqlForm = "CASE WHEN event.value >= 100 THEN 'high' WHEN event.value >= 10 THEN 'mid' ELSE 'low' END"
    val data = Seq((150.0, "a"), (50.0, "b"), (1.0, "c"))
    assert(evalSql(sqlForm, data: _*)
      .sameElements(eval(graft.operators.Derive.ruleTrees.head._2, data: _*)))
  }

  test("substring supports the reference's 2-parameter to-end-of-string form") {
    // VirtualAttributeExpressionEvaluator executeFunction: 2 params ->
    // str.substring(start-1), i.e. from position to end
    val rule =
      """{"type":"function","function":"substring","parameters":[
        {"type":"field","field":"event_type"},
        {"type":"constant","value":3,"dataType":"number"}]}"""
    assert(eval(rule, (0.0, "purchase"))(0) == "rchase")
  }

  test("non-constant parameter where a literal is required fails clearly") {
    val rule =
      """{"type":"function","function":"round","parameters":[
        {"type":"field","field":"value"},
        {"type":"field","field":"value"}]}"""
    val e = intercept[IllegalArgumentException] {
      RuleCompiler.compile(rule)
    }
    assert(e.getMessage.contains("constant parameter"))
  }

  test("simple condition node compiles to when/otherwise") {
    val rule =
      """{"type":"condition",
        "condition":{"type":"operation","operator":"greater_than","operands":[
          {"type":"field","field":"value"},{"type":"constant","value":50,"dataType":"number"}]},
        "trueValue":{"type":"constant","value":"big","dataType":"string"},
        "falseValue":{"type":"constant","value":"small","dataType":"string"}}"""
    assert(eval(rule, (60.0, "a"), (40.0, "b")).toSeq == Seq("big", "small"))
  }

  test("arithmetic, logical and string functions match the evaluator's semantics") {
    // (value * 2 + 1) on 10.0 -> 21.0
    val arith =
      """{"type":"operation","operator":"add","operands":[
        {"type":"operation","operator":"multiply","operands":[
          {"type":"field","field":"value"},{"type":"constant","value":2,"dataType":"number"}]},
        {"type":"constant","value":1,"dataType":"number"}]}"""
    assert(eval(arith, (10.0, "x"))(0) == 21.0)
    val logical =
      """{"type":"operation","operator":"and","operands":[
        {"type":"operation","operator":"greater_than","operands":[
          {"type":"field","field":"value"},{"type":"constant","value":5,"dataType":"number"}]},
        {"type":"operation","operator":"not_equals","operands":[
          {"type":"field","field":"event_type"},{"type":"constant","value":"x","dataType":"string"}]}]}"""
    assert(eval(logical, (10.0, "y"))(0) == true)
    assert(eval(logical, (10.0, "x"))(0) == false)
    val str =
      """{"type":"function","function":"substring","parameters":[
        {"type":"function","function":"upper","parameters":[{"type":"field","field":"event_type"}]},
        {"type":"constant","value":1,"dataType":"number"},
        {"type":"constant","value":3,"dataType":"number"}]}"""
    assert(eval(str, (0.0, "purchase"))(0) == "PUR")
  }

  test("coalesce/nullif/get_json_string compile") {
    import spark.implicits._
    val df = Seq(("""{"k": 7}""", "a")).toDF("js", "et")
    val rule =
      """{"type":"function","function":"coalesce","parameters":[
        {"type":"function","function":"nullif","parameters":[
          {"type":"field","field":"et"},{"type":"constant","value":"a","dataType":"string"}]},
        {"type":"function","function":"get_json_string","parameters":[
          {"type":"field","field":"js"},{"type":"constant","value":"k","dataType":"string"}]}]}"""
    assert(df.select(RuleCompiler.compile(rule)).collect()(0).getString(0) == "7")
  }

  test("unsupported nodes fail loudly") {
    intercept[IllegalArgumentException] {
      RuleCompiler.compile("""{"type":"operation","operator":"xor","operands":[]}""")
    }
    intercept[IllegalArgumentException] {
      RuleCompiler.compile("""{"type":"mystery"}""")
    }
  }
}
