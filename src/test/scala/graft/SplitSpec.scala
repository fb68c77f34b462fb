package graft

import org.apache.spark.sql.functions._

import graft.ops.Split

class SplitSpec extends SparkSuite {
  import spark.implicits._

  test("assignSplit: proportions track fractions; assignment is id-stable") {
    val df = spark.range(20000).toDF("id")
    val out = Split.assignSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, counts)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.01, counts)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.01, counts)
    // growing the corpus must NOT move an existing id's split — no
    // train/test leakage across corpus versions
    val small = Split.assignSplit(spark.range(5000).toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    val bigMap = out.as[(Long, String)].collect().toMap
    small.foreach { case (id, s) =>
      assert(bigMap(id) == s, s"id $id moved from $s to ${bigMap(id)}")
    }
  }

  test("splitColumn equals a hand-rendered SQL CASE; thresholds are the documented hex") {
    // the DuckDB-dialect twin (Split.splitSql) is pinned by the q137
    // oracle hash-match; here the Column form is pinned against the
    // same CASE logic in Spark dialect
    val df = spark.range(2000).toDF("id")
    val viaCol = Split.assignSplit(df, "id",
      Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    val viaSql = df.selectExpr("id",
      """CASE WHEN substring(md5(cast(cast(id AS string) AS binary)), 1, 8) < '80000000' THEN 'a'
        |     WHEN substring(md5(cast(cast(id AS string) AS binary)), 1, 8) < 'c0000000' THEN 'b'
        |     ELSE 'c' END AS split""".stripMargin.replaceAll("\n\\s*", " "))
    assert(viaCol.exceptAll(viaSql).count() == 0L)
    assert(viaSql.exceptAll(viaCol).count() == 0L)
    // the DuckDB twin renders the SAME thresholds
    val sql = Split.splitSql("id", Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    assert(sql.contains("'80000000'") && sql.contains("'c0000000'"), sql)
  }

  test("assignSplit guards: bad fractions fail fast") {
    val df = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] {
      Split.assignSplit(df, "id", Seq("only" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Split.assignSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4)) // sums to 0.9
    }
    intercept[IllegalArgumentException] {
      Split.assignSplit(df, "id", Seq("a" -> 0.5, "a" -> 0.5)) // dup name
    }
  }
}
