package graft

import graft.transform.Template

class TemplateSpec extends SparkSuite {
  import spark.implicits._

  private def rec = Seq(("group_1", 1500L, "v")).toDF("__METADATA__group_id", "idx", "x")

  private def render(tpl: String): String =
    rec.select(Template.compile(tpl).as("out")).as[String].head()

  test("plain text passes through; {{ }} untouched (reference compiler_test)") {
    assert(render("file:///out/part.json") == "file:///out/part.json")
    assert(render("keep {{ .this }} alone") == "keep {{ .this }} alone")
  }

  test("field interpolation — RFC 007 grouped-destination example") {
    assert(render("file:///out/file_[[ .__METADATA__group_id ]].json")
      == "file:///out/file_group_1.json")
  }

  test("mul/div batch-step split — OSS sink legacy batch (ext/oss/sink.go:52-58)") {
    assert(render("f_[[ mul (div .idx 1000) 1000 ]].json") == "f_1000.json")
  }

  test("string functions") {
    assert(render("[[ upper .__METADATA__group_id ]]") == "GROUP_1")
    assert(render("[[ lower \"ABC\" ]]") == "abc")
    assert(render("[[ add .idx 1 ]]|[[ sub .idx 500 ]]|[[ mod .idx 7 ]]") == "1501|1000|2")
  }

  test("isDynamic detects [[ ]] sections") {
    assert(Template.isDynamic("a_[[ .x ]]"))
    assert(!Template.isDynamic("static.json"))
  }

  test("driver-side render against a value map (compiler.Compile path)") {
    val vals = Map[String, Any]("name" -> "ab", "n" -> 7L, "score" -> 0.5)
    assert(Template.render("hello [[ upper .name ]]-[[ add .n 1 ]]", vals)
      == "hello AB-8")
    assert(Template.render("v=[[ .score ]]", vals) == "v=0.5")
    // Go text/template renders missing fields as <no value>
    assert(Template.render("[[ .missing ]]", vals) == "<no value>")
    assert(Template.render("[[ printf \"%s_%d\" .name .n ]]", vals) == "ab_7")
    assert(Template.render("static {{ untouched }}", vals) == "static {{ untouched }}")
  }
}
