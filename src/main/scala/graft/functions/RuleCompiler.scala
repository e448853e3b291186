package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Compiler for zg-etl's virtual-attribute rule trees
  * (SqlToJsonExpressionConverter.java / VirtualAttributeExpressionEvaluator
  * .java:773-826): the admin UI stores rules as JSON expression trees with
  * node types {field, constant, operation, function, condition}; the
  * reference interprets them per record in Java. Here the SAME tree compiles
  * once into a Catalyst Column — the rule executes inside whole-stage
  * codegen with zero per-record interpretation, and Catalyst is free to
  * constant-fold and push it down.
  *
  * `fieldResolver` maps the rule's field names (pr keys in the reference) to
  * columns of the hosting DataFrame.
  */
object RuleCompiler {

  private val mapper = new ObjectMapper()

  def compile(ruleJson: String, fieldResolver: String => Column = col): Column =
    node(mapper.readTree(ruleJson), fieldResolver)

  private def node(n: JsonNode, f: String => Column): Column =
    n.get("type").asText() match {
      case "field" => f(n.get("field").asText())

      case "constant" =>
        val v = n.get("value")
        n.path("dataType").asText("string") match {
          case "number"  => if (v.isInt) lit(v.asInt()) else lit(v.asDouble())
          case "boolean" => lit(v.asBoolean())
          case "date"    => lit(java.sql.Timestamp.valueOf(
            java.time.LocalDateTime.parse(v.asText())))
          case _         => lit(v.asText())
        }

      case "operation" =>
        val ops = n.get("operands").elements().asScala.map(node(_, f)).toSeq
        n.get("operator").asText() match {
          case "add"           => ops.reduce(_ + _)
          case "subtract"      => ops.reduce(_ - _)
          case "multiply"      => ops.reduce(_ * _)
          case "divide"        => ops.reduce(_ / _)
          case "modulo"        => ops.reduce(_ % _)
          case "equals"        => ops(0) === ops(1)
          case "not_equals"    => ops(0) =!= ops(1)
          case "greater_than"  => ops(0) > ops(1)
          case "less_than"     => ops(0) < ops(1)
          case "greater_equal" => ops(0) >= ops(1)
          case "less_equal"    => ops(0) <= ops(1)
          case "and"           => ops.reduce(_ && _)
          case "or"            => ops.reduce(_ || _)
          case "not"           => !ops(0)
          case o => throw new IllegalArgumentException(s"unsupported operator: $o")
        }

      case "function" =>
        val ps = Option(n.get("parameters"))
          .map(_.elements().asScala.map(node(_, f)).toSeq).getOrElse(Seq.empty)
        val fnName = n.get("function").asText()
        // functions whose Nth parameter must be a literal in the rule tree
        // (Spark needs the value at plan time); a field/expression node there
        // is rejected with a CLEAR error instead of an NPE/ClassCastException
        def constParam(i: Int): JsonNode = {
          val p = n.get("parameters").get(i)
          if (p == null || p.get("type") == null || p.get("type").asText() != "constant")
            throw new IllegalArgumentException(
              s"unsupported rule: function '$fnName' requires a constant parameter at position $i " +
                s"(got ${Option(p).flatMap(x => Option(x.get("type"))).map(_.asText()).getOrElse("nothing")})")
          p.get("value")
        }
        fnName match {
          case "upper"         => upper(ps(0))
          case "lower"         => lower(ps(0))
          case "length"        => length(ps(0))
          case "concat"        => concat(ps: _*)
          // reference VirtualAttributeExpressionEvaluator executeFunction:
          // 2-param form is substring(start-1) to end of string
          case "substring"     =>
            if (ps.length >= 3) substr(ps(0), ps(1), ps(2)) else substr(ps(0), ps(1))
          case "abs"           => abs(ps(0))
          case "round"         =>
            if (ps.length > 1) round(ps(0), constParam(1).asInt()) else round(ps(0))
          case "ceil"          => ceil(ps(0))
          case "floor"         => floor(ps(0))
          case "coalesce"      => coalesce(ps: _*)
          case "nullif"        => nullif(ps(0), ps(1))
          case "date_format"   => date_format(ps(0), constParam(1).asText())
          case "from_unixtime" => from_unixtime(ps(0))
          case "date_diff"     => datediff(ps(0), ps(1))
          case "get_json_string" =>
            get_json_object(ps(0), "$." + constParam(1).asText())
          case fn => throw new IllegalArgumentException(s"unsupported function: $fn")
        }

      case "condition" =>
        if (n.has("condition")) {
          when(node(n.get("condition"), f), node(n.get("trueValue"), f))
            .otherwise(node(n.get("falseValue"), f))
        } else {
          val cases = n.get("conditions").elements().asScala.toSeq
          val chained = cases.foldLeft(Option.empty[Column]) { (acc, c) =>
            val cond = node(c.get("condition"), f)
            val value = node(c.get("value"), f)
            Some(acc.fold(when(cond, value))(_.when(cond, value)))
          }.get
          if (n.has("defaultValue")) chained.otherwise(node(n.get("defaultValue"), f))
          else chained
        }

      case t => throw new IllegalArgumentException(s"unsupported node type: $t")
    }
}
