package graft.rules

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.compile.WaryGate
import graft.rules.VRule._

/** The serving-path report serialization (reference: axum example returns
  * the Report as JSON, error/mod.rs:294-328 — a sequence of objects with
  * path/code/message fields).
  */
class ReportJsonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reportJson serializes the errors array with path/code/message") {
    val spec = WarySpec(Seq(
      FieldSpec("v", rules = Seq(Required(), Length(min = 3, max = 16)))))
    val out = WaryGate
      .reportJson(Seq(Option("ab"), Option("valid one"), None).toDF("v"), spec)
      .select("v", "report")
      .collect()
      .map(r => Option(r.getString(0)) -> r.getString(1))
      .toMap
    assert(out(Some("ab")) ==
      """[{"path":["v"],"code":"too_short","message":"expected length of at least 3, found 2"}]""")
    assert(out(Some("valid one")) == "[]")
    assert(out(None) ==
      """[{"path":["v"],"code":"cannot_be_empty","message":"value should not be empty"}]""")
  }
}
