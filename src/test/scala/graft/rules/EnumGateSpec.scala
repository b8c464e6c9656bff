package graft.rules

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.compile.EnumGate
import graft.rules.VRule._

/** Enum (sum-type) validation mirroring the reference's "Basic enum
  * example" (README.md:66-99): Person = Child { name: Name, age: u8 <= 17 }
  * | Adult { name: Name, age: 18..=100 }, where Name is a tuple struct
  * whose inner value is alphanumeric + length(chars, 5..=20) +
  * equals(not, "john"), transformed with lowercase(ascii). Columnar
  * encoding: tag + one nullable struct column per variant.
  */
case class EgName(value: String)
case class EgVariant(name: EgName, age: Int)
case class EgPerson(tag: String, child: EgVariant, adult: EgVariant)

class EnumGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Name's inner value is a TUPLE field: rename "0" so error paths carry
  // the index (serialized as a JSON number, like the reference's
  // Elem::Index)
  private val nameSpec = WarySpec(Seq(FieldSpec(
    "value",
    rules = Seq(Alphanumeric(), Length(LengthUnit.Chars, 5, 20),
      Equals("john", not = true)),
    transforms = Seq(TRule.Lower(ascii = true)),
    rename = Some("0"))))

  private def variantSpec(minAge: Option[Int], maxAge: Option[Int]) =
    WarySpec(Seq(
      FieldSpec("name", rules = Seq(Dive(nameSpec)),
        transforms = Seq(TRule.Dive(nameSpec))),
      FieldSpec("age",
        rules = Seq(Range(min = minAge, max = maxAge)))))

  private val variants = Seq(
    EnumGate.Variant("child", "child", variantSpec(None, Some(17))),
    EnumGate.Variant("adult", "adult", variantSpec(Some(18), Some(100))))

  private def run(p: EgPerson) = {
    val out = EnumGate(Seq(p).toDF(), "tag", variants).collect().head
    val errs = out.getSeq[Row](out.fieldIndex("errors"))
      .map(e => (e.getSeq[String](0), e.getString(1)))
    (errs, out)
  }

  private val okName = EgName("ALICE")

  test("active variant's rules fire; inactive variant is ignored") {
    // child valid even though the adult column holds an invalid payload
    val (errs, row) = run(EgPerson("child",
      EgVariant(okName, 10), EgVariant(EgName("john"), 5)))
    assert(errs.isEmpty)
    // gated transform applied to the ACTIVE variant only (ascii lowercase)
    assert(row.getAs[Row]("child").getAs[Row]("name").getString(0) == "alice")
    assert(row.getAs[Row]("adult").getAs[Row]("name").getString(0) == "john")
  }

  test("per-variant range bounds (README Person: <=17 vs 18..=100)") {
    val (tooOld, _) = run(EgPerson("child",
      EgVariant(okName, 20), EgVariant(okName, 20)))
    assert(tooOld == Seq((Seq("age"), "too_large")))
    val (tooYoung, _) = run(EgPerson("adult",
      EgVariant(okName, 50), EgVariant(okName, 10)))
    assert(tooYoung == Seq((Seq("age"), "too_small")))
  }

  test("dive into the tuple struct: indexed path + equals(not)") {
    // "john" is 4 chars: BOTH too_short and should_not_equal accumulate,
    // in rule order (wary reports all failures, no cross-rule short-circuit)
    val (errs, _) = run(EgPerson("adult",
      EgVariant(okName, 10), EgVariant(EgName("john"), 30)))
    assert(errs == Seq(
      (Seq("name", "0"), "too_short"),
      (Seq("name", "0"), "should_not_equal")))
    val (short, _) = run(EgPerson("adult",
      EgVariant(okName, 10), EgVariant(EgName("ab"), 30)))
    assert(short == Seq((Seq("name", "0"), "too_short")))
  }

  test("unknown or NULL tag is flagged, never silently valid") {
    val (errs, _) = run(EgPerson("Adult", // case mismatch = unknown
      EgVariant(okName, 10), EgVariant(okName, 30)))
    assert(errs == Seq((Seq.empty, "unknown_variant")))
    val (nullTag, _) = run(EgPerson(null,
      EgVariant(okName, 10), EgVariant(okName, 30)))
    assert(nullTag == Seq((Seq.empty, "unknown_variant")))
  }

  test("invalid rows keep original values (gate blocks transforms)") {
    val (errs, row) = run(EgPerson("child",
      EgVariant(EgName("ALICE"), 99), EgVariant(okName, 30)))
    assert(errs.nonEmpty)
    assert(row.getAs[Row]("child").getAs[Row]("name").getString(0) == "ALICE")
  }
}
