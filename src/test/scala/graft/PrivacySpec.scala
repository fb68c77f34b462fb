package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy

class PrivacySpec extends SparkSuite {
  import spark.implicits._

  test("kAnonymityAudit classifies k, l and k+l violations") {
    // group (30, "m"): 3 rows, 3 distinct salaries → passes k=3, l=3
    // group (30, "f"): 2 rows → k violation (and 2 distinct < 3 → k+l)
    // group (40, "m"): 3 rows but one distinct salary → l violation
    val df = Seq(
      (30, "m", 100.0), (30, "m", 200.0), (30, "m", 300.0),
      (30, "f", 100.0), (30, "f", 150.0),
      (40, "m", 500.0), (40, "m", 500.0), (40, "m", 500.0))
      .toDF("age", "sex", "salary")
    val out = Privacy.kAnonymityAudit(df, Seq(col("age"), col("sex")),
        col("salary"), k = 3L, l = 3L)
      .orderBy("age", "sex")
      .select("age", "sex", "n_rows", "n_sensitive", "violation")
      .as[(Int, String, Long, Long, String)].collect().toSeq
    assert(out == Seq((30, "f", 2L, 2L, "k+l"), (40, "m", 3L, 1L, "l")),
      s"got $out")
  }

  test("an empty audit certifies the contract") {
    val df = Seq((1, 10.0), (1, 20.0), (2, 30.0), (2, 40.0))
      .toDF("zip", "salary")
    assert(Privacy.kAnonymityAudit(df, Seq(col("zip")), col("salary"),
      k = 2L, l = 2L).isEmpty)
  }
}
