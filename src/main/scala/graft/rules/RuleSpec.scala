package graft.rules

import org.apache.spark.sql.Column

/** Declarative rule model — the Spark-native analogue of wary's
  * `#[derive(Wary)]` attribute grammar (registry:
  * reference wary/src/options/mod.rs:8-63). A `WarySpec` is compiled by
  * [[graft.compile.RuleCompiler]] into pure Catalyst `Column` expressions;
  * there is no per-row interpretation at runtime.
  */
sealed trait VRule

object VRule {
  /** AsSlice non-empty; `not` ⇒ must be empty/None.
    * (reference: options/rule/required.rs:111-143) */
  final case class Required(not: Boolean = false) extends VRule

  /** PartialEq against a literal (options/rule/equals.rs:128-170). */
  final case class Equals(other: Any, not: Boolean = false) extends VRule

  /** Partial-order bounds; unordered (NaN) ⇒ error
    * (options/rule/range.rs:133-158). */
  final case class Range(
      min: Option[Any] = None,
      max: Option[Any] = None,
      exclusiveMin: Boolean = false,
      exclusiveMax: Boolean = false
  ) extends VRule

  sealed trait LengthUnit
  object LengthUnit {
    /** element count for arrays, BYTES for strings (wary/src/lib.rs:403-410) */
    case object Default extends LengthUnit
    case object Bytes extends LengthUnit
    case object Chars extends LengthUnit
    case object CodeUnits extends LengthUnit
    case object Graphemes extends LengthUnit
  }

  /** Length within bounds in the chosen unit
    * (options/rule/length.rs:218-243,314-381). */
  final case class Length(
      unit: LengthUnit = LengthUnit.Default,
      min: Long = 0L,
      max: Long = Long.MaxValue,
      exclusiveMin: Boolean = false,
      exclusiveMax: Boolean = false
  ) extends VRule

  /** Substring test; `not` reports byte position of the match
    * (options/rule/contains.rs:328-373). */
  final case class ContainsStr(needle: String, not: Boolean = false)
      extends VRule

  /** Contiguous-subsequence (inOrder) or element-subset (anyOrder) test on
    * arrays (options/rule/contains.rs:203-326). */
  final case class ContainsSlice(
      needle: Seq[Any],
      anyOrder: Boolean = false,
      not: Boolean = false
  ) extends VRule

  final case class PrefixStr(value: String, not: Boolean = false) extends VRule
  final case class PrefixSlice(value: Seq[Any], not: Boolean = false)
      extends VRule
  final case class SuffixStr(value: String, not: Boolean = false) extends VRule
  final case class SuffixSlice(value: Seq[Any], not: Boolean = false)
      extends VRule

  /** Every char alphanumeric (options/rule/alphanumeric.rs:79-111). */
  final case class Alphanumeric(ascii: Boolean = false) extends VRule

  /** Whole string is ASCII (options/rule/ascii.rs:66-81). */
  case object AsciiRule extends VRule

  /** Every char lowercase-or-whitespace; reports char position
    * (options/lowercase.rs:99-137). */
  final case class Lowercase(ascii: Boolean = false) extends VRule
  final case class Uppercase(ascii: Boolean = false) extends VRule

  /** Java-dialect regex `rlike` (options/rule/regex.rs:88-106; dialect
    * caveat documented in SURVEY.md §7.4). */
  final case class Regex(pattern: String) extends VRule

  /** IP address parse; mode ∈ ip|ipv4|ipv6 (options/rule/addr.rs). */
  final case class Addr(mode: String = "ip") extends VRule

  case object CreditCard extends VRule
  case object Email extends VRule
  case object Url extends VRule
  case object Uuid extends VRule
  case object Semver extends VRule

  /** Timestamp bounds. NOTE inverted codes kept for parity: below-min ⇒
    * `too_new`, above-max ⇒ `too_old` (options/rule/time.rs:132-193). */
  final case class Time(
      min: Option[java.sql.Timestamp] = None,
      max: Option[java.sql.Timestamp] = None,
      exclusiveMin: Boolean = false,
      exclusiveMax: Boolean = false
  ) extends VRule

  /** User predicate (pass=true), like wary `func`/`custom` rules
    * (wary_derive/src/wary/validate.rs:199-220). */
  final case class Func(
      code: String,
      message: String,
      pred: Column => Column
  ) extends VRule

  /** Short-circuit group: only the first failing rule reports
    * (validate.rs:234-253). */
  final case class And(rules: Seq[VRule]) extends VRule

  /** First success wins; on total failure only the LAST branch's errors
    * surface (validate.rs:255-292). */
  final case class Or(rules: Seq[VRule]) extends VRule

  /** Apply nested rules to each array element; error paths gain the element
    * index (validate.rs:186-197). */
  final case class Inner(rules: Seq[VRule]) extends VRule

  /** Recurse into a nested struct's own spec (validate.rs:294-298). */
  final case class Dive(spec: WarySpec) extends VRule
}

/** Pure value rewrites (no failure mode) — wary transformers
  * (registry: options/mod.rs:48-63). */
sealed trait TRule

object TRule {
  final case class Lower(ascii: Boolean = false) extends TRule
  final case class Upper(ascii: Boolean = false) extends TRule
  final case class Trim(ascii: Boolean = false) extends TRule
  final case class Inner(transforms: Seq[TRule]) extends TRule
  final case class Dive(spec: WarySpec) extends TRule
  final case class Func(f: Column => Column) extends TRule
}

/** Rules + transforms for one field. `rename` mirrors serde renames in
  * error paths (wary_derive/src/util.rs:352-358); `transparent` suppresses
  * the field's path segment (`#[wary(transparent)]`,
  * wary_derive/src/wary/emit.rs:355-358). */
final case class FieldSpec(
    name: String,
    rules: Seq[VRule] = Nil,
    transforms: Seq[TRule] = Nil,
    rename: Option[String] = None,
    transparent: Boolean = false
) {
  def pathName: String = rename.getOrElse(name)
}

/** The full per-record spec — analogue of one `#[derive(Wary)]` struct. */
final case class WarySpec(fields: Seq[FieldSpec])
