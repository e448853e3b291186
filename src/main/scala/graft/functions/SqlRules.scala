package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Decimal, DecimalType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiler for zg-etl's SQL-string virtual-attribute rules
  * (SqlToJsonExpressionConverter.java:14-129 + the rule-language grammar it
  * tokenizes at :129-520): admins write rules as restricted SQL expressions
  * (`CASE WHEN event.price > 1000 THEN 'high' ELSE 'low' END`); the
  * reference hand-parses them into its JSON expression trees and interprets
  * those per record.
  *
  * Spark-first: the hand-rolled tokenizer/parser is replaced by Spark's own
  * SQL expression parser, and the interpreted tree by a compiled Catalyst
  * `Column` — the rule runs inside whole-stage codegen like every other
  * expression. The conversion walks the PARSED tree and rebuilds it through
  * the public `functions._`/`Column` algebra, accepting exactly the
  * reference grammar (arithmetic, comparison, AND/OR/NOT, CASE WHEN, and
  * the non-aggregate FUNCTION_MAP whitelist) — anything outside it
  * (aggregates, subqueries, window functions, joins-in-expression) is
  * rejected with a clear error, same as the reference's parser, instead of
  * silently widening the rule language.
  *
  * Field references may be qualified (`event.price`, `user.created_at`) —
  * `fieldResolver` receives the full dotted name and maps it onto the
  * hosting frame's columns (default: drop the qualifier).
  */
object SqlRules {

  /** FUNCTION_MAP (SqlToJsonExpressionConverter.java:47-95) — canonical
    * names after the reference's synonym folding (len→length,
    * substr→substring, now→current_timestamp, datediff→date_diff).
    */
  val allowedFunctions: Set[String] = Set(
    "upper", "lower", "length", "concat", "substring", "abs", "round",
    "ceil", "floor", "coalesce", "nullif", "date_format", "from_unixtime",
    "date_diff", "get_json_string", "current_timestamp")

  private val synonyms: Map[String, String] = Map(
    "len" -> "length", "substr" -> "substring", "now" -> "current_timestamp",
    "datediff" -> "date_diff")

  private def defaultResolver(name: String): Column =
    col(name.split('.').last)

  def compile(sql: String, spark: SparkSession,
              fieldResolver: String => Column = defaultResolver): Column =
    build(spark.sessionState.sqlParser.parseExpression(sql), fieldResolver)

  private def build(e: Expression, f: String => Column): Column = e match {
    case a: UnresolvedAttribute => f(a.name)

    case Literal(null, NullType)           => lit(null)
    case Literal(u: UTF8String, StringType) => lit(u.toString)
    case Literal(d: Decimal, _: DecimalType) => lit(d.toJavaBigDecimal)
    case Literal(v, _)                     => lit(v)

    case Add(l, r, _)      => build(l, f) + build(r, f)
    case Subtract(l, r, _) => build(l, f) - build(r, f)
    case Multiply(l, r, _) => build(l, f) * build(r, f)
    case Divide(l, r, _)   => build(l, f) / build(r, f)
    case Remainder(l, r, _) => build(l, f) % build(r, f)

    case EqualTo(l, r)            => build(l, f) === build(r, f)
    case Not(EqualTo(l, r))       => build(l, f) =!= build(r, f)
    case GreaterThan(l, r)        => build(l, f) > build(r, f)
    case LessThan(l, r)           => build(l, f) < build(r, f)
    case GreaterThanOrEqual(l, r) => build(l, f) >= build(r, f)
    case LessThanOrEqual(l, r)    => build(l, f) <= build(r, f)

    case And(l, r) => build(l, f) && build(r, f)
    case Or(l, r)  => build(l, f) || build(r, f)
    case Not(c)    => !build(c, f)

    case CaseWhen(branches, elseValue) =>
      val chained = branches.foldLeft(Option.empty[Column]) { case (acc, (c, v)) =>
        val cond = build(c, f)
        val value = build(v, f)
        Some(acc.fold(when(cond, value))(_.when(cond, value)))
      }.get
      elseValue.fold(chained)(ev => chained.otherwise(build(ev, f)))

    case fn: UnresolvedFunction =>
      val raw = fn.nameParts.last.toLowerCase
      val name = synonyms.getOrElse(raw, raw)
      if (!allowedFunctions.contains(name))
        throw new IllegalArgumentException(
          s"unsupported function in rule: $raw (allowed: ${allowedFunctions.toSeq.sorted.mkString(", ")})")
      val ps = fn.arguments.map(build(_, f))
      name match {
        case "upper"     => upper(ps(0))
        case "lower"     => lower(ps(0))
        case "length"    => length(ps(0))
        case "concat"    => concat(ps: _*)
        // reference 2-param form runs to end of string (RuleCompiler keeps
        // the same convention for the JSON tree path)
        case "substring" =>
          if (ps.length >= 3) substr(ps(0), ps(1), ps(2)) else substr(ps(0), ps(1))
        case "abs"       => abs(ps(0))
        case "round"     => if (ps.length > 1) round(ps(0), constInt(fn, 1)) else round(ps(0))
        case "ceil"      => ceil(ps(0))
        case "floor"     => floor(ps(0))
        case "coalesce"  => coalesce(ps: _*)
        case "nullif"    => nullif(ps(0), ps(1))
        case "date_format"       => date_format(ps(0), constString(fn, 1))
        case "from_unixtime"     => from_unixtime(ps(0))
        case "date_diff"         => datediff(ps(0), ps(1))
        case "get_json_string"   => get_json_object(ps(0), "$." + constString(fn, 1))
        case "current_timestamp" => current_timestamp()
      }

    case other =>
      throw new IllegalArgumentException(
        s"unsupported SQL construct in rule: ${other.getClass.getSimpleName} (${other.sql})")
  }

  /** Functions whose Nth argument must be a literal at plan time. */
  private def constLit(fn: UnresolvedFunction, i: Int): Any = fn.arguments(i) match {
    case Literal(u: UTF8String, StringType) => u.toString
    case Literal(v, _) => v
    case other => throw new IllegalArgumentException(
      s"function '${fn.nameParts.last}' requires a constant at position $i (got ${other.sql})")
  }

  private def constString(fn: UnresolvedFunction, i: Int): String =
    constLit(fn, i).toString

  private def constInt(fn: UnresolvedFunction, i: Int): Int =
    constLit(fn, i) match {
      case n: Int => n
      case n: Long => n.toInt
      case o => throw new IllegalArgumentException(
        s"function '${fn.nameParts.last}' requires an integer constant at position $i (got $o)")
    }
}
