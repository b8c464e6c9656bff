package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the rule semantics Spark's built-ins
  * can't express exactly (SURVEY.md §7.3). All generate a static call into
  * a pure Scala object, so they stay inside whole-stage codegen (no UDF
  * serialization, no interpreted fallback).
  */

/** Index (in Unicode scalar values) of the first char violating the given
  * character-class `mode`, or -1 if the string passes.
  * Modes: lower, lower_ascii, upper, upper_ascii, alnum, alnum_ascii.
  */
case class FirstBadChar(child: Expression, mode: String)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"first_bad_char_$mode"
  override protected def nullSafeEval(input: Any): Any =
    WaryChar.dispatchFirstBad(mode, input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"""graft.exprs.WaryChar.dispatchFirstBad("$mode", $c.toString())"""
    )
  override protected def withNewChildInternal(c: Expression): FirstBadChar =
    copy(child = c)
}

/** Error code from a parser-backed validator ("" = valid).
  * Kinds: ip, ipv4, ipv6, uuid, semver, credit_card, email, url.
  */
case class ValidatorCode(child: Expression, kind: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"validate_$kind"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Validators.check(kind, input.asInstanceOf[UTF8String].toString)
    )
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c =>
        s"""UTF8String.fromString(graft.exprs.Validators.check("$kind", $c.toString()))"""
    )
  override protected def withNewChildInternal(c: Expression): ValidatorCode =
    copy(child = c)
}

/** serde_json-style string escaping shared by the compile-time literal
  * path (RuleCompiler.jsonStr) and the runtime column path ([[JsonQuote]])
  * so the whole report escapes ONE way, byte-matching serde_json: quote,
  * backslash, \b \t \n \f \r, and LOWERCASE \u00xx for remaining control
  * chars. (Jackson/to_json emits uppercase hex — that's why the report
  * builder does not use to_json.)
  */
object JsonEscape {
  def quote(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'            => sb.append("\\\"")
        case '\\'           => sb.append("\\\\")
        case '\b'           => sb.append("\\b")
        case '\t'           => sb.append("\\t")
        case '\n'           => sb.append("\\n")
        case '\f'           => sb.append("\\f")
        case '\r'           => sb.append("\\r")
        case c if c < 0x20  => sb.append(f"\\u${c.toInt}%04x")
        case c              => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }
}

/** JSON string literal (with quotes) of a string column — serde_json
  * escaping semantics, codegen'd static call.
  */
case class JsonQuote(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "json_quote"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      JsonEscape.quote(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"UTF8String.fromString(graft.exprs.JsonEscape.quote($c.toString()))")
  override protected def withNewChildInternal(c: Expression): JsonQuote =
    copy(child = c)
}

/** Grapheme-cluster count (wary length(graphemes)). */
case class GraphemeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "grapheme_count"
  override protected def nullSafeEval(input: Any): Any =
    WaryChar.graphemeCount(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.WaryChar.graphemeCount($c.toString())")
  override protected def withNewChildInternal(c: Expression): GraphemeCount =
    copy(child = c)
}

/** Raw microseconds of a TIMESTAMP_NTZ column, read WITHOUT any timezone
  * conversion — internally an NTZ value already IS a long of micros, so
  * this is an identity reinterpretation. Spark's own `unix_micros` only
  * accepts TIMESTAMP, and routing NTZ through `cast("timestamp")` converts
  * via the session timezone, which is non-injective around DST transitions
  * (distinct NTZ values can collide or shift). Used by the native forward
  * as-of to negate NTZ timestamps losslessly.
  */
case class NtzMicros(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ntz_micros"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.TimestampNTZType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ntz_micros requires timestamp_ntz input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): NtzMicros =
    copy(child = c)
}

/** UTF-16 code-unit count (wary length(code_units)). */
case class Utf16Count(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "utf16_count"
  override protected def nullSafeEval(input: Any): Any =
    WaryChar.utf16Count(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.WaryChar.utf16Count($c.toString())")
  override protected def withNewChildInternal(c: Expression): Utf16Count =
    copy(child = c)
}

/** Exact Rust-semantics trim (Unicode White_Space incl. NBSP/U+0085 —
  * Spark's trim() strips 0x20 only).
  */
case class WaryTrim(child: Expression, ascii: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (ascii) "wary_trim_ascii" else "wary_trim"
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(if (ascii) WaryChar.trimAscii(s) else WaryChar.trim(s))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (ascii) "trimAscii" else "trim"
    defineCodeGen(
      ctx,
      ev,
      c => s"UTF8String.fromString(graft.exprs.WaryChar.$fn($c.toString()))"
    )
  }
  override protected def withNewChildInternal(c: Expression): WaryTrim =
    copy(child = c)
}

/** Column-level entry points. */
object functions {
  private def col(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(c)

  def first_bad_char(c: Column, mode: String): Column =
    col(FirstBadChar(expr(c), mode))
  def validator_code(c: Column, kind: String): Column =
    col(ValidatorCode(expr(c), kind))
  def grapheme_count(c: Column): Column = col(GraphemeCount(expr(c)))
  def utf16_count(c: Column): Column = col(Utf16Count(expr(c)))
  def wary_trim(c: Column): Column = col(WaryTrim(expr(c), ascii = false))
  def wary_trim_ascii(c: Column): Column = col(WaryTrim(expr(c), ascii = true))

  /** Rust-regex dialect → Java pattern (compile-time literal rewrite). */
  def rustRegexToJava(pattern: String): String = RegexDialect.toJava(pattern)

  /** JSON string literal of a string column (serde_json escaping). */
  def json_quote(c: Column): Column = col(JsonQuote(expr(c)))
}
