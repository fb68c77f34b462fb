package graft

import graft.functions.GoFloatString

class GoFloatStringSpec extends SparkSuite {
  import spark.implicits._

  test("formats like the reference CSV writer (json2csv.go:125-134)") {
    GoFloatString.register(spark)
    val df = Seq(34.0, 34.5, -2.0, 0.1, 1.0e7, 123.456).toDF("d")
      .selectExpr("go_float_str(d) AS s")
    val out = df.as[String].collect().toSeq
    assert(out == Seq("34", "34.5", "-2", "0.1", "10000000", "123.456"))
  }

  test("runs inside whole-stage codegen (no fallback)") {
    GoFloatString.register(spark)
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("go_float_str(l_quantity) AS q")
    val plan = df.queryExecution.executedPlan.toString
    // '*' marks a WholeStageCodegen stage in the executed-plan string
    assert(plan.contains("*(1) Project [go_float_str"), plan)
    assert(df.count() > 0)
  }

  test("shortest round-trip digits survive the plain-form expansion") {
    // values whose Double.toString uses an exponent: the expansion must
    // keep the shortest round-trip digits (Go strconv parity), not the
    // exact binary expansion
    assert(GoFloatString.format(123456789.1) == "123456789.1")
    assert(GoFloatString.format(2.5e-8) == "0.000000025")
    assert(GoFloatString.format(-123456789.1) == "-123456789.1")
    assert(GoFloatString.format(1.0e16) == "10000000000000000")
    // 'X.0E-n' mantissas: toPlainString keeps the mantissa digit count
    // ('1.0E-4' -> '0.00010'); trailing fractional zeros must be trimmed
    assert(GoFloatString.format(1e-4) == "0.0001")
    assert(GoFloatString.format(5e-7) == "0.0000005")
    assert(GoFloatString.format(1e-7) == "0.0000001")
    assert(GoFloatString.format(-1e-4) == "-0.0001")
    // round-trip property on awkward doubles
    Seq(0.1 + 0.2, 1.0 / 3.0, 1e-7, 9.999999999999999e22).foreach { d =>
      assert(java.lang.Double.parseDouble(GoFloatString.format(d)) == d, d.toString)
    }
  }

  test("null-safe") {
    GoFloatString.register(spark)
    val out = spark.sql("SELECT go_float_str(CAST(NULL AS DOUBLE)) AS s")
      .collect().head
    assert(out.isNullAt(0))
  }
}
