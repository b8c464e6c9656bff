package graft.rules

import java.nio.charset.StandardCharsets

import scala.util.Random

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.compile.WaryGate
import graft.rules.VRule._

/** Property-based differential test: RANDOM specs × RANDOM values, the
  * compiled Catalyst gate vs an independent in-memory interpreter of
  * wary's rule semantics (written from the reference's behavior —
  * required.rs/length.rs/contains.rs/prefix.rs/suffix.rs/equals.rs/
  * lowercase.rs/uppercase.rs/alphanumeric.rs/ascii.rs/and.rs/or.rs and
  * the derive's accumulate-all ordering, validate.rs). Catches rule
  * interactions (null hoisting, accumulation order, and/or nesting)
  * beyond what per-rule goldens cover.
  */
/** Encoder-friendly fixtures (top-level: inner case classes of a test
  * class capture the outer pointer and break Spark encoders).
  */
object GatePropFixtures {
  final case class VS(v: Option[String])
  final case class ERow(id: Int, tag: Option[String],
      va: Option[VS], vb: Option[VS])
}

class GatePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ----------------------------------------------------- oracle (plain JVM)

  private def utf8Len(s: String): Int =
    s.getBytes(StandardCharsets.UTF_8).length

  private def bytePos(s: String, charIdx: Int): Int =
    utf8Len(s.substring(0, charIdx))

  /** First codepoint index failing `ok`, or -1 (Rust chars() positions). */
  private def firstBad(s: String, ok: Int => Boolean): Int = {
    var i = 0; var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      if (!ok(cp)) return i
      i += 1; j += Character.charCount(cp)
    }
    -1
  }

  private def isWs(cp: Int) = graft.exprs.WaryChar.isWhitespace(cp)

  /** (code, message) list for one rule on a non-null string value. */
  private def evalRule(v: String, rule: VRule): Seq[(String, String)] =
    rule match {
      case Required(false) =>
        if (utf8Len(v) == 0) Seq("cannot_be_empty" -> "value should not be empty")
        else Nil
      case Required(true) =>
        if (utf8Len(v) > 0) Seq("should_be_empty" -> "value should be empty")
        else Nil
      case Length(LengthUnit.Default | LengthUnit.Bytes, min, max, exMin, exMax) =>
        val len = utf8Len(v).toLong
        if (len < min || (len == min && exMin)) {
          val w = if (exMin) "more than" else "at least"
          Seq("too_short" -> s"expected length of $w $min, found $len")
        } else if (len > max || (len == max && exMax)) {
          val w = if (exMax) "less than" else "at most"
          Seq("too_long" -> s"expected length of $w $max, found $len")
        } else Nil
      case Length(LengthUnit.Chars, min, max, exMin, exMax) =>
        val len = v.codePointCount(0, v.length).toLong
        if (len < min || (len == min && exMin)) {
          val w = if (exMin) "more than" else "at least"
          Seq("too_short" -> s"expected length of $w $min, found $len")
        } else if (len > max || (len == max && exMax)) {
          val w = if (exMax) "less than" else "at most"
          Seq("too_long" -> s"expected length of $w $max, found $len")
        } else Nil
      case Equals(other: String, false) =>
        if (v != other) Seq("should_equal" -> s"""expected to equal "$other"""")
        else Nil
      case Equals(other: String, true) =>
        if (v == other) Seq("should_not_equal" -> s"""expected to not equal "$other"""")
        else Nil
      case ContainsStr(n, false) =>
        if (!v.contains(n)) Seq("should_contain" -> s"expected to contain $n")
        else Nil
      case ContainsStr(n, true) =>
        val i = v.indexOf(n)
        if (i >= 0)
          Seq("should_not_contain" ->
            s"found unexpected value at position ${bytePos(v, i)}: $n")
        else Nil
      case PrefixStr(p, false) =>
        if (!v.startsWith(p)) Seq("should_start_with" -> s"expected to start with $p")
        else Nil
      case PrefixStr(p, true) =>
        if (v.startsWith(p))
          Seq("should_not_start_with" -> s"expected to not start with $p")
        else Nil
      case SuffixStr(x, false) =>
        if (!v.endsWith(x)) Seq("should_end_with" -> s"expected to end with $x")
        else Nil
      case SuffixStr(x, true) =>
        if (v.endsWith(x))
          Seq("should_not_end_with" -> s"expected to not end with $x")
        else Nil
      case AsciiRule =>
        if (v.exists(_ > 127)) Seq("ascii" -> "expected ASCII") else Nil
      case Alphanumeric(false) =>
        if (firstBad(v, graft.exprs.WaryChar.isAlphanumeric) >= 0)
          Seq("alphanumeric" -> "value should be alphanumeric")
        else Nil
      case Lowercase(false) =>
        val i = firstBad(v, cp => graft.exprs.WaryChar.isLowercase(cp) || isWs(cp))
        if (i >= 0) Seq("lowercase" -> s"expected lowercase character at position $i")
        else Nil
      case Uppercase(false) =>
        val i = firstBad(v, cp => graft.exprs.WaryChar.isUppercase(cp) || isWs(cp))
        if (i >= 0) Seq("uppercase" -> s"expected uppercase character at position $i")
        else Nil
      case And(rs) =>
        // first failing rule only (and.rs)
        rs.iterator.map(evalRule(v, _)).find(_.nonEmpty).getOrElse(Nil)
      case Or(rs) =>
        // first success wins; on total failure, LAST branch reports (or.rs)
        val evals = rs.map(evalRule(v, _))
        if (evals.exists(_.isEmpty)) Nil else evals.last
      case r => throw new IllegalArgumentException(s"oracle: $r")
    }

  /** Whole-field oracle incl. Option hoisting (validate.rs:300-327). */
  private def evalField(v: Option[String], rules: Seq[VRule]): Seq[(String, String)] =
    v match {
      case None =>
        if (rules.exists { case Required(false) => true; case _ => false })
          Seq("cannot_be_empty" -> "value should not be empty")
        else Nil
      case Some(s) => rules.flatMap(evalRule(s, _))
    }

  // ------------------------------------------------------------ generators

  private def genLeaf(rnd: Random): VRule = rnd.nextInt(11) match {
    case 0 => Required(not = rnd.nextBoolean())
    case 1 =>
      val a = rnd.nextInt(6); val b = a + rnd.nextInt(8)
      Length(if (rnd.nextBoolean()) LengthUnit.Bytes else LengthUnit.Chars,
        a, b, rnd.nextBoolean(), rnd.nextBoolean())
    case 2 => Equals(genNeedle(rnd), not = rnd.nextBoolean())
    case 3 => ContainsStr(genNeedle(rnd), not = rnd.nextBoolean())
    case 4 => PrefixStr(genNeedle(rnd), not = rnd.nextBoolean())
    case 5 => SuffixStr(genNeedle(rnd), not = rnd.nextBoolean())
    case 6 => AsciiRule
    case 7 => Alphanumeric()
    case 8 => Lowercase()
    case 9 => Uppercase()
    case _ => Required()
  }

  private def genRule(rnd: Random, depth: Int): VRule =
    if (depth > 0 && rnd.nextInt(4) == 0) {
      val n = 1 + rnd.nextInt(3)
      val rs = Seq.fill(n)(genRule(rnd, depth - 1))
      if (rnd.nextBoolean()) And(rs) else Or(rs)
    } else genLeaf(rnd)

  private val needles = Vector("a", "ab", "é", "HELLO", "x y", "0", "ß")
  private def genNeedle(rnd: Random) = needles(rnd.nextInt(needles.size))

  private val pool: Vector[Option[String]] = Vector(
    None, Some(""), Some("a"), Some("ab"), Some("hello world"),
    Some("HELLO"), Some("Hello World"), Some("héllo"), Some("é"),
    Some("ß"), Some("abc123"), Some("ABC123"), Some("  spaced  "),
    Some("x y z"), Some("0"), Some("😊"), Some("aé😊b"),
    Some("tab\there"), Some("ΔΥΣΣΕΎΣ"), Some("ὀδυσσεύς"))

  // ----------------------------------------------------------------- test

  // ------------------------------------------------ transform oracle

  /** Exact Unicode White_Space trim, both ends (lib.rs trim semantics). */
  private def trimUnicode(s: String): String = {
    var start = 0
    while (start < s.length && isWs(s.codePointAt(start)))
      start += Character.charCount(s.codePointAt(start))
    var end = s.length
    var done = false
    while (end > start && !done) {
      val cp = s.codePointBefore(end)
      if (isWs(cp)) end -= Character.charCount(cp) else done = true
    }
    s.substring(start, end)
  }

  /** JVM oracle for one transform (ROOT-locale case mapping matches Rust
    * to_lowercase/to_uppercase incl. Final_Sigma/İ/ß — TransformGoldenSpec
    * pins the parity; this relies on it).
    */
  private def applyT(s: String, t: TRule): String = t match {
    case TRule.Trim(false)  => trimUnicode(s)
    case TRule.Lower(false) => s.toLowerCase(java.util.Locale.ROOT)
    case TRule.Upper(false) => s.toUpperCase(java.util.Locale.ROOT)
    case x => throw new IllegalArgumentException(s"oracle transform: $x")
  }

  private def genTransforms(rnd: Random): Seq[TRule] =
    Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(3) match {
      case 0 => TRule.Trim()
      case 1 => TRule.Lower()
      case _ => TRule.Upper()
    })

  test("compiled gate == in-memory wary interpreter on random specs " +
    "(40 seeds x 20 values)") {
    for (seed <- 1 to 40) {
      val rnd = new Random(seed)
      val rules = Seq.fill(1 + rnd.nextInt(4))(genRule(rnd, 2))
      val spec = WarySpec(Seq(FieldSpec("v", rules = rules)))
      val df = pool.toDF("v")
      val got = WaryGate(df, spec)
        .select("v", "errors")
        .collect()
        .map { r =>
          Option(r.getString(0)) ->
            r.getSeq[Row](1).map(e => (e.getString(1), e.getString(2)))
        }
        .toMap
      pool.foreach { v =>
        val expect = evalField(v, rules)
        assert(got(v) == expect,
          s"seed=$seed value=$v\nrules=$rules\n got=${got(v)}\n exp=$expect")
      }
    }
  }

  test("gated transform chains == in-memory interpreter on random specs " +
    "(30 seeds): transform fires iff the row validates") {
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 30) {
      val rnd = new Random(1000 + seed)
      val rules = Seq.fill(1 + rnd.nextInt(3))(genRule(rnd, 1))
      val transforms = genTransforms(rnd)
      val spec =
        WarySpec(Seq(FieldSpec("v", rules = rules, transforms = transforms)))
      val df = pool.toDF("v").withColumn("orig", col("v"))
      val got = WaryGate(df, spec)
        .select("orig", "v")
        .collect()
        .map(r => Option(r.getString(0)) -> Option(r.getString(1)))
        .toMap
      pool.foreach { v =>
        val errs = evalField(v, rules)
        val expect = v.map(s =>
          if (errs.isEmpty) transforms.foldLeft(s)(applyT) else s)
        assert(got(v) == expect,
          s"seed=$seed v=$v\nrules=$rules\ntransforms=$transforms\n" +
            s" got=${got(v)}\n exp=$expect")
      }
    }
  }

  test("EnumGate == in-memory interpreter on random variant specs " +
    "(30 seeds): match-arm gating + unknown-tag flagging") {
    import graft.compile.EnumGate
    import GatePropFixtures.{ERow, VS}
    for (seed <- 1 to 30) {
      val rnd = new Random(2000 + seed)
      val rulesA = Seq.fill(1 + rnd.nextInt(3))(genRule(rnd, 1))
      val rulesB = Seq.fill(1 + rnd.nextInt(3))(genRule(rnd, 1))
      val variants = Seq(
        EnumGate.Variant("a", "va", WarySpec(Seq(FieldSpec("v", rules = rulesA)))),
        EnumGate.Variant("b", "vb", WarySpec(Seq(FieldSpec("v", rules = rulesB)))))
      val tags = Vector(Some("a"), Some("b"), Some("zzz"), None)
      val rows = (0 until 24).map { i =>
        def mv() =
          if (rnd.nextInt(5) == 0) None
          else Some(VS(pool(rnd.nextInt(pool.size))))
        ERow(i, tags(rnd.nextInt(tags.size)), mv(), mv())
      }
      val df = rows.toDS().toDF()
      val out = df
        .withColumn("errors", EnumGate.errorsColumn(df, "tag", variants))
        .select("id", "errors")
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[Row](1).map(e => (e.getString(1), e.getString(2))))
        .toMap
      rows.foreach { row =>
        val expect = row.tag match {
          case Some("a") => evalField(row.va.flatMap(_.v), rulesA)
          case Some("b") => evalField(row.vb.flatMap(_.v), rulesB)
          case Some(t)   => Seq("unknown_variant" -> s"unknown enum variant: $t")
          case None => Seq("unknown_variant" -> "unknown enum variant: null")
        }
        assert(out(row.id) == expect,
          s"seed=$seed row=$row\nrulesA=$rulesA\nrulesB=$rulesB\n" +
            s" got=${out(row.id)}\n exp=$expect")
      }
    }
  }
}
