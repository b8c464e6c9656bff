package graft.rules

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.compile.WaryGate
import graft.rules.VRule._

/** Golden replay of the reference transformer corpus + the kitchen-sink
  * end-to-end gate (examples/kitchen_sink/src/main.rs:49-93).
  */
class TransformGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def transformed(df: DataFrame, ts: TRule*): String = {
    val gated = WaryGate(df, WarySpec(Seq(FieldSpec("v", transforms = ts))))
    gated.select("v").collect().head.getString(0)
  }
  private def str(s: String): DataFrame = Seq(Option(s)).toDF("v")

  test("trim strips Unicode whitespace incl. NBSP (trim.rs:48-81)") {
    assert(transformed(str(" hello "), TRule.Trim()) == "hello")
    assert(transformed(str(" hello "), TRule.Trim(ascii = true)) == "hello")
    // NBSP (U+00A0) is Unicode White_Space but not ASCII whitespace
    assert(transformed(str(" hello "), TRule.Trim()) == "hello")
    assert(transformed(str(" hello "), TRule.Trim(ascii = true)) ==
      " hello ")
    // vertical tab 0x0B: Unicode WS but NOT Rust ascii-whitespace
    assert(transformed(str("hi"), TRule.Trim()) == "hi")
    assert(transformed(str("hi"), TRule.Trim(ascii = true)) ==
      "hi")
  }

  test("lowercase transformer unicode + ascii (lowercase.rs:184-197)") {
    assert(transformed(str("ὈΔΥΣΣΕΎΣ HELLO"), TRule.Lower()) ==
      "ὀδυσσεύς hello")
    assert(transformed(str("ßeLLO"), TRule.Lower(ascii = true)) == "ßello")
  }

  test("uppercase transformer unicode + ascii (uppercase.rs:185-198)") {
    assert(transformed(str("ὀδυσσεύς hello"), TRule.Upper()) ==
      "ὈΔΥΣΣΕΎΣ HELLO")
    assert(transformed(str("ὀδυσσεύς hello"), TRule.Upper(ascii = true)) ==
      "ὀδυσσεύς HELLO")
  }

  test("full-Unicode casing parity: final sigma, İ, ß, locale pinning") {
    // Verdict per corner case (probed on this Spark/JDK; Spark's
    // lower()/upper() match Rust to_lowercase/to_uppercase exactly):
    //  - Final_Sigma contextual rule: trailing Σ lowers to ς, medial to σ
    val sigma = new String(
      Array(0x0394, 0x03A5, 0x03A3, 0x03A3, 0x0395, 0x038E, 0x03A3)
        .flatMap(Character.toChars))
    val sigmaLower = new String(
      Array(0x03B4, 0x03C5, 0x03C3, 0x03C3, 0x03B5, 0x03CD, 0x03C2)
        .flatMap(Character.toChars))
    assert(transformed(str(sigma), TRule.Lower()) == sigmaLower)
    //  - İ (U+0130) lowers to i + COMBINING DOT ABOVE (SpecialCasing,
    //    Locale.ROOT semantics — NOT the Turkish dotless 'i')
    assert(transformed(str("İ"), TRule.Lower()) == "i̇")
    //  - ß (U+00DF) uppercases to "SS" (full case mapping, 1 -> 2 chars)
    assert(transformed(str("ß"), TRule.Upper()) == "SS")
    //  - locale-leak guard: plain ASCII I/i must map the ROOT way (a
    //    Turkish default locale would produce ı/İ)
    assert(transformed(str("TITLE"), TRule.Lower()) == "title")
    assert(transformed(str("title"), TRule.Upper()) == "TITLE")
    //  - ascii variants leave ALL of the above untouched
    assert(transformed(str("İß" + sigma.take(1)),
      TRule.Lower(ascii = true)) == "İß" + sigma.take(1))
  }

  test("inner(lowercase) over array (transformer/inner.rs:6-21)") {
    val df = Seq(Seq("Hello", "World")).toDF("v")
    val gated = WaryGate(
      df,
      WarySpec(Seq(FieldSpec("v",
        transforms = Seq(TRule.Inner(Seq(TRule.Lower()))))))
    )
    assert(gated.select("v").collect().head.getSeq[String](0) ==
      Seq("hello", "world"))
  }

  test("null text: transforms are skipped (Option semantics)") {
    val gated = WaryGate(
      Seq(Option.empty[String]).toDF("v"),
      WarySpec(Seq(FieldSpec("v", transforms = Seq(TRule.Lower()))))
    )
    assert(gated.select("v").collect().head.isNullAt(0))
  }

  test("kitchen sink: validate gate blocks transforms on invalid rows") {
    // User{username: length(3..=16) + lowercase transform}
    val spec = WarySpec(Seq(
      FieldSpec("username",
        rules = Seq(Length(min = 3, max = 16)),
        transforms = Seq(TRule.Lower()),
        rename = Some("userName"))
    ))
    val ok = WaryGate(Seq("GABEN").toDF("username"), spec)
    assert(ok.select("username").collect().head.getString(0) == "gaben")
    assert(ok.selectExpr("size(errors)").collect().head.getInt(0) == 0)

    val bad = WaryGate(Seq("ab").toDF("username"), spec)
    // invalid → original value kept, error path uses serde rename
    assert(bad.select("username").collect().head.getString(0) == "ab")
    val err = bad.selectExpr("errors[0].path", "errors[0].code")
      .collect().head
    assert(err.getSeq[String](0) == Seq("userName"))
    assert(err.getString(1) == "too_short")
  }

  test("kitchen sink: nested posts validate + trim via inner(dive)") {
    val postSpec = WarySpec(Seq(
      FieldSpec("title", rules = Seq(Length(min = 1, max = 128)),
        transforms = Seq(TRule.Trim())),
      FieldSpec("content", rules = Seq(Length(min = 1, max = 1024)),
        transforms = Seq(TRule.Trim())),
      FieldSpec("likes",
        rules = Seq(Or(Seq(Equals(-5L), Range(min = Some(0L))))))
    ))
    val df = Seq(
      ("GABEN", Seq(("Half-Life 3", "  It's coming soon.        \n\n", -5L)))
    ).toDF("username", "posts")
      .selectExpr("username",
        "transform(posts, p -> struct(p._1 as title, p._2 as content, p._3 as likes)) as posts")
    val spec = WarySpec(Seq(
      FieldSpec("username", rules = Seq(Length(min = 3, max = 16)),
        transforms = Seq(TRule.Lower())),
      FieldSpec("posts",
        rules = Seq(Inner(Seq(Dive(postSpec))), Length(min = 1)),
        transforms = Seq(TRule.Inner(Seq(TRule.Dive(postSpec)))))
    ))
    val out = WaryGate(df, spec)
    assert(out.selectExpr("size(errors)").collect().head.getInt(0) == 0)
    assert(out.selectExpr("posts[0].content").collect().head.getString(0) ==
      "It's coming soon.")
    // likes = -7 → or() fails, reports last branch (range → too_small)
    val bad = df.selectExpr("username",
      "transform(posts, p -> struct(p.title, p.content, -7L as likes)) as posts")
    val badOut = WaryGate(bad, spec)
    val pairs = badOut
      .selectExpr("errors[0].path", "errors[0].code").collect().head
    assert(pairs.getSeq[String](0) == Seq("posts", "0", "likes"))
    assert(pairs.getString(1) == "too_small")
    // gate: invalid row keeps untrimmed content
    assert(badOut.selectExpr("posts[0].content").collect().head.getString(0)
      .startsWith("  It's"))
  }
}
