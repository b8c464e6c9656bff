package graft.rules

import org.apache.spark.sql.functions.octet_length
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.compile.WaryGate
import graft.rules.VRule._

/** The serving-path report serialization (reference: the axum example
  * returns the Report as JSON — examples/axum/src/main.rs:36-62). Each
  * error serializes as `{path, code, message, detail}`
  * (error/mod.rs:289-328): path is an array whose index segments are JSON
  * NUMBERS (path.rs Elem untagged Key|Index), `detail` is the untagged
  * serialization of the error-enum variant (struct variants → objects,
  * unit variants → null).
  */
case class RjPost(title: String, content: String, likes: Int)
case class RjUser(
    username: String,
    password: String,
    email: String,
    posts: Seq[RjPost])

class ReportJsonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reportJson serializes path/code/message/detail") {
    val spec = WarySpec(Seq(
      FieldSpec("v", rules = Seq(Required(), Length(min = 3, max = 16)))))
    val out = WaryGate
      .reportJson(Seq(Option("ab"), Option("valid one"), None).toDF("v"), spec)
      .select("v", "report")
      .collect()
      .map(r => Option(r.getString(0)) -> r.getString(1))
      .toMap
    assert(out(Some("ab")) ==
      """[{"path":["v"],"code":"too_short","message":"expected length of at least 3, found 2","detail":{"min":3,"actual":2,"exclusive":false}}]""")
    assert(out(Some("valid one")) == "[]")
    assert(out(None) ==
      """[{"path":["v"],"code":"cannot_be_empty","message":"value should not be empty","detail":null}]""")
  }

  test("kitchen-sink report: rename, custom, email, inner(dive) with " +
    "numeric index path (examples/kitchen_sink/src/main.rs:49-93)") {
    val pwMsg = "Password too weak."
    val postSpec = WarySpec(Seq(
      FieldSpec("title", rules = Seq(Length(min = 1, max = 128)),
        transforms = Seq(TRule.Trim())),
      FieldSpec("content", rules = Seq(Length(min = 1, max = 1024)),
        transforms = Seq(TRule.Trim())),
      FieldSpec("likes",
        rules = Seq(Or(Seq(Equals(-5), Range(min = Some(0))))))
    ))
    val userSpec = WarySpec(Seq(
      FieldSpec("username", rules = Seq(Length(min = 3, max = 16)),
        transforms = Seq(TRule.Lower()), rename = Some("userName")),
      FieldSpec("password",
        rules = Seq(Func("password_too_weak", pwMsg, octet_length(_) >= 12))),
      FieldSpec("email", rules = Seq(Email)),
      FieldSpec("posts",
        rules = Seq(Inner(Seq(Dive(postSpec))), Length(min = 1)))
    ))
    val df = Seq(
      RjUser("ab", "weak", "nope", Seq(RjPost("ok", "fine", -3)))).toDF()
    val report = WaryGate.reportJson(df, userSpec)
      .select("report").collect().head.getString(0)
    assert(report ==
      """[{"path":["userName"],"code":"too_short","message":"expected length of at least 3, found 2","detail":{"min":3,"actual":2,"exclusive":false}},""" +
      s"""{"path":["password"],"code":"password_too_weak","message":"$pwMsg","detail":{"code":"password_too_weak","message":"$pwMsg"}},""" +
      """{"path":["email"],"code":"missing_separator","message":"missing separator","detail":null},""" +
      """{"path":["posts",0,"likes"],"code":"too_small","message":"value is too small","detail":null}]""")
  }

  test("report JSON-escapes quotes and control chars in dynamic strings") {
    val spec = WarySpec(Seq(
      FieldSpec("v", rules = Seq(ContainsStr("a\"b\n", not = true)))))
    val report = WaryGate
      .reportJson(Seq("xa\"b\ny").toDF("v"), spec)
      .select("report").collect().head.getString(0)
    assert(report ==
      """[{"path":["v"],"code":"should_not_contain","message":"found unexpected value at position 1: a\"b\n","detail":{"position":1,"value":"a\"b\n"}}]""")
  }
}
