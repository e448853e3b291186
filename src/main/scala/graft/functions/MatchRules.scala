package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for zg-etl's ad-audience match conditions
  * (OperatorUtil.compareProValue / compareValue,
  * etl-flink-pipeline/.../util/OperatorUtil.java:22-335): each
  * `ads_link_event` row carries a flat `match_json`
  * `{propCategory, label, type, operator, values}`; the reference
  * interprets it per record inside AdvConvertEventFlatMapFunction
  * (AdvConvertEventFlatMapFunction.java:226-236) to decide whether a
  * conversion event's property satisfies the link's audience condition.
  *
  * Spark-first: the rule set is config-sized (a MySQL table the reference
  * polls), so each condition compiles ONCE into a Catalyst `Column`
  * predicate — regexes compile at plan time, comparisons run inside
  * whole-stage codegen, and the same rule list generates the independent
  * DuckDB oracle SQL via [[conditionSql]].
  *
  * Fidelity notes (OperatorUtil.java semantics, 2-arg compareValue with
  * usePatternMatch=true — the pipeline's variant):
  *  - value present AND values non-empty -> dispatch on `type`
  *    (1=string, 2=numeric, 3=date); otherwise handleNullValue
  *    (`is null` / `is not null`, anything else false).
  *  - string (type 1): equal / not equal / contains / not contains /
  *    begin with / end with / not begin with / not end with /
  *    regexp / not regexp (Matcher.find semantics = `rlike`) /
  *    `is not null` -> true; unknown operator -> false.
  *  - numeric (type 2): both sides Long.parseLong; "null" (any case),
  *    empty or unparseable on EITHER side -> false (never a throw);
  *    gt / equal / lt / ge / le / not equal.
  *  - date (type 3): value is epoch SECONDS; `relative` = within the last
  *    N days of "now" (the reference uses System.currentTimeMillis — here
  *    `nowMs` is an explicit parameter so plans are deterministic);
  *    `absolute` = between start-of-day(values[0]) and
  *    start-of-day(values[1]) at UTC+8 (the reference's ZoneOffset 8).
  *    Unparseable value -> false.
  *  - Divergence (documented): Long.parseLong rejects surrounding
  *    whitespace where both SQL engines trim it — no rule value in this
  *    repo carries whitespace.
  */
object MatchRules {

  /** One ads_link_event audience condition (ads_link.match_json +
    * the link's event name). `label` resolves against the event's pr map
    * exactly as the reference does: `_label` (custom) first, `$label`
    * (builtin) overriding.
    */
  final case class MatchRule(
      linkId: Int, eventType: String, label: String,
      typ: Int, op: String, values: Seq[String])

  private val dayMs = 24L * 60 * 60 * 1000

  /** Long.parseLong's accepted shape (optional sign + digits), bounded to
    * 18 digits so the guarded cast can never overflow — identical guard on
    * both engines. Known divergence from Java: an IN-RANGE 19-digit value
    * (1e18..Long.MaxValue) parses in the reference but is rejected (rule
    * false) here and in the oracle alike; no property in this corpus, and
    * no epoch timestamp or realistic numeric prop, reaches 19 digits.
    */
  private val longRe = "^[+-]?[0-9]{1,18}$"
  private val longReSql = "[+-]?[0-9]{1,18}"

  private def tryLong(c: Column): Column =
    when(c.rlike(longRe), c.cast("long"))

  private def tryLongSql(v: String): String =
    s"(CASE WHEN regexp_full_match($v, '$longReSql') THEN CAST($v AS BIGINT) END)"

  /** Start-of-day epoch ms at UTC+8 — compareDateValue's
    * `LocalDate.parse(...).atStartOfDay(ZoneOffset.ofHours(8))`.
    */
  def dayStartMs8(date: String): Long =
    java.time.LocalDate.parse(date)
      .atStartOfDay(java.time.ZoneOffset.ofHours(8)).toInstant.toEpochMilli

  /** Compile one condition into a Boolean Column over `value` (the
    * resolved property value; SQL NULL and '' both mean "absent", matching
    * the reference's empty-string default).
    */
  def condition(value: Column, r: MatchRule, nowMs: Long): Column = {
    val hasValue = value.isNotNull && value =!= ""
    val nullish = !hasValue || lower(value) === "null"

    val nullHandle: Column = r.op match {
      case "is null"     => nullish
      case "is not null" => !nullish
      case _             => lit(false)
    }

    if (r.values.isEmpty) return nullHandle

    val t0 = r.values.head
    val dispatch: Column = r.typ match {
      case 1 =>
        r.op match {
          case "equal"          => value === t0
          case "not equal"      => value =!= t0
          case "contains"       => value.contains(t0)
          case "not contains"   => !value.contains(t0)
          case "begin with"     => value.startsWith(t0)
          case "not begin with" => !value.startsWith(t0)
          case "end with"       => value.endsWith(t0)
          case "not end with"   => !value.endsWith(t0)
          case "regexp"         => value.rlike(t0)
          case "not regexp"     => !value.rlike(t0)
          case "is not null"    => lit(true)
          case _                => lit(false)
        }
      case 2 =>
        t0.toLongOption match {
          case None => lit(false)
          case Some(target) =>
            val ev = tryLong(value)
            val cmp = r.op match {
              case "gt"        => ev > target
              case "equal"     => ev === target
              case "lt"        => ev < target
              case "ge"        => ev >= target
              case "le"        => ev <= target
              case "not equal" => ev =!= target
              case _           => lit(false)
            }
            !nullish && ev.isNotNull && cmp
        }
      case 3 =>
        val ms = tryLong(value) * 1000L
        val cmp = r.op match {
          case "relative" =>
            t0.toLongOption match {
              case Some(days) => ms >= (nowMs - days * dayMs)
              case None       => lit(false)
            }
          case "absolute" if r.values.sizeIs >= 2 =>
            ms >= dayStartMs8(r.values(0)) && ms <= dayStartMs8(r.values(1))
          case _ => lit(false)
        }
        !nullish && ms.isNotNull && cmp
      case _ => lit(false)
    }

    when(hasValue, dispatch).otherwise(nullHandle)
  }

  /** The same condition as DuckDB SQL over `v` (a SQL expression string) —
    * generated from the SAME rule object so the oracle can never drift
    * from the compiled predicate.
    */
  def conditionSql(v: String, r: MatchRule, nowMs: Long): String = {
    val hasValue = s"($v IS NOT NULL AND $v <> '')"
    val nullish = s"(NOT $hasValue OR lower($v) = 'null')"

    val nullHandle = r.op match {
      case "is null"     => nullish
      case "is not null" => s"(NOT $nullish)"
      case _             => "FALSE"
    }

    if (r.values.isEmpty) return nullHandle

    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val t0 = r.values.head
    val dispatch: String = r.typ match {
      case 1 =>
        r.op match {
          case "equal"          => s"($v = ${q(t0)})"
          case "not equal"      => s"($v <> ${q(t0)})"
          case "contains"       => s"contains($v, ${q(t0)})"
          case "not contains"   => s"(NOT contains($v, ${q(t0)}))"
          case "begin with"     => s"starts_with($v, ${q(t0)})"
          case "not begin with" => s"(NOT starts_with($v, ${q(t0)}))"
          case "end with"       => s"ends_with($v, ${q(t0)})"
          case "not end with"   => s"(NOT ends_with($v, ${q(t0)}))"
          case "regexp"         => s"regexp_matches($v, ${q(t0)})"
          case "not regexp"     => s"(NOT regexp_matches($v, ${q(t0)}))"
          case "is not null"    => "TRUE"
          case _                => "FALSE"
        }
      case 2 =>
        t0.toLongOption match {
          case None => "FALSE"
          case Some(target) =>
            val ev = tryLongSql(v)
            val cmp = r.op match {
              case "gt"        => s"$ev > $target"
              case "equal"     => s"$ev = $target"
              case "lt"        => s"$ev < $target"
              case "ge"        => s"$ev >= $target"
              case "le"        => s"$ev <= $target"
              case "not equal" => s"$ev <> $target"
              case _           => "FALSE"
            }
            s"((NOT $nullish) AND $ev IS NOT NULL AND $cmp)"
        }
      case 3 =>
        val ms = s"(${tryLongSql(v)} * 1000)"
        val cmp = r.op match {
          case "relative" =>
            t0.toLongOption match {
              case Some(days) => s"$ms >= ${nowMs - days * dayMs}"
              case None       => "FALSE"
            }
          case "absolute" if r.values.sizeIs >= 2 =>
            s"($ms >= ${dayStartMs8(r.values(0))} AND $ms <= ${dayStartMs8(r.values(1))})"
          case _ => "FALSE"
        }
        s"((NOT $nullish) AND $ms IS NOT NULL AND $cmp)"
      case _ => "FALSE"
    }

    s"(CASE WHEN $hasValue THEN $dispatch ELSE $nullHandle END)"
  }
}
