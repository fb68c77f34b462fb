package graft

import org.apache.spark.sql.functions._
import graft.ops.Percentiles

/** Bit-parity of the distributed exact-percentile selection against
  * Spark's builtin single-reducer `percentile` — including its
  * interpolation shortcuts — over adversarial distributions: heavy
  * ties, skewed groups, singleton groups, constants, negatives, and
  * fractions at 0/1.
  */
class PercentilesSpec extends SparkSuite {
  import spark.implicits._

  private val fracs = Seq(0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0)

  private def check(df: org.apache.spark.sql.DataFrame,
      group: Seq[String], vcol: String, accuracy: Int = 1000): Unit = {
    val fr = fracs.map(f => s"${f}d").mkString("array(", ", ", ")")
    val builtin =
      if (group.nonEmpty)
        df.groupBy(group.map(col): _*)
          .agg(expr(s"percentile(cast($vcol as double), $fr)").as("exp"))
      else df.agg(expr(s"percentile(cast($vcol as double), $fr)").as("exp"))
    val ours = Percentiles.exact(df, group, vcol, fracs, accuracy)
    val joined =
      if (group.nonEmpty) ours.join(builtin, group)
      else ours.crossJoin(builtin)
    val rows = joined.select(col("pcts"), col("exp")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = r.getSeq[Double](0); val exp = r.getSeq[Double](1)
      assert(got.size == exp.size)
      got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
        // bit-identical, not approximately equal: the op replicates
        // Percentile.getPercentile branch-for-branch
        assert(java.lang.Double.doubleToLongBits(g) ==
          java.lang.Double.doubleToLongBits(e),
          s"fraction ${fracs(i)}: got $g, builtin $e")
      }
    }
  }

  test("global percentiles match the builtin bit-for-bit (uniform doubles)") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(_ => rnd.nextDouble() * 1e6 - 5e5).toDF("v")
    check(df, Nil, "v")
  }

  test("grouped percentiles: skewed group sizes, ties, negatives") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 8000).map { i =>
      val g = if (i % 100 == 0) "tiny" else if (i % 3 == 0) "mid" else "big"
      // heavy ties: values quantized to 100 distinct levels
      (g, math.floor(rnd.nextDouble() * 100) - 50)
    }
    check(rows.toDF("g", "v"), Seq("g"), "v")
  }

  test("edge groups: singleton, pair, constant column") {
    val df = Seq(("one", 42.0), ("two", 1.0), ("two", 2.0),
      ("const", 7.0), ("const", 7.0), ("const", 7.0)).toDF("g", "v")
    check(df, Seq("g"), "v", accuracy = 100)
  }

  test("integral positions and duplicate boundary values interpolate like the builtin") {
    // n = 5 → positions 0,1,2,3,4 are integral at 0/0.25/0.5/0.75/1;
    // duplicated middle exercises the lowerKey==higherKey shortcut
    val df = Seq(1.0, 2.0, 2.0, 2.0, 9.0).toDF("v")
    check(df, Nil, "v", accuracy = 100)
  }

  test("nulls are ignored like the builtin") {
    val df = Seq(Some(1.0), None, Some(3.0), None, Some(2.0)).toDF("v")
    check(df, Nil, "v", accuracy = 100)
  }

  test("n reports the non-null count") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val n = Percentiles.exact(df, Nil, "v", Seq(0.5), 100)
      .select("n").as[Long].head()
    assert(n == 2L)
  }
}
