package graft

import graft.functions.RuleCompiler
import org.apache.spark.sql.functions._

class RuleCompilerSpec extends SparkSpec {

  private def eval(rule: String, data: (Double, String)*): Array[Any] = {
    import spark.implicits._
    data.toSeq.toDF("value", "event_type")
      .select(RuleCompiler.compile(rule).as("r")).collect().map(_.get(0))
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
