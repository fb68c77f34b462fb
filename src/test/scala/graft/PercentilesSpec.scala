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

  test("exactTenths: integer interpolation matches hand computation") {
    // n = 4, p90: P = 9·3 = 27 → lower rank 2 (0-based, value 30),
    // d = 7 → ((10−7)·30 + 7·40)/10 = 37.0;
    // p50: P = 5·3 = 15 → lower 1, d = 5 → (5·20 + 5·30)/10 = 25.0
    val df = Seq(10.0, 20.0, 30.0, 40.0).toDF("v")
    val out = Percentiles.exactTenths(df, Nil, "v", Seq(0.5, 0.9), 100)
      .select("pcts").as[Seq[Double]].head()
    assert(out == Seq(25.0, 37.0), s"got $out")
    // singleton and exact-position cases take the vlo shortcut
    val one = Percentiles.exactTenths(Seq(5.0).toDF("v"), Nil, "v",
      Seq(0.5, 0.9), 100).select("pcts").as[Seq[Double]].head()
    assert(one == Seq(5.0, 5.0), s"got $one")
    // n = 11 → P = 9·10 = 90, d = 0 → exact rank pick, no interpolation
    val eleven = (1 to 11).map(_.toDouble).toDF("v")
    val ex = Percentiles.exactTenths(eleven, Nil, "v", Seq(0.9), 100)
      .select("pcts").as[Seq[Double]].head()
    assert(ex == Seq(10.0), s"got $ex")
  }

  test("exactTenths: giant integer magnitudes stay exact (the q163 regime)") {
    // microsecond-scale integers where ROUND(x, 6) would itself
    // diverge across engines — the integer device must reproduce the
    // exact rational N/10 as its nearest double
    val vs = Seq(1234567890123.0, 2345678901234.0, 3456789012345.0,
      4567890123456.0, 5678901234567.0, 6789012345678.0)
    val out = Percentiles.exactTenths(vs.toDF("v"), Nil, "v",
      Seq(0.5, 0.9), 100).select("pcts").as[Seq[Double]].head()
    // p50: P = 5·5 = 25, lower = 2, d = 5 → (5·v3 + 5·v4)/10
    val p50 = (5L * 3456789012345L + 5L * 4567890123456L).toDouble / 10.0
    // p90: P = 9·5 = 45, lower = 4, d = 5 → (5·v5 + 5·v6)/10
    val p90 = (5L * 5678901234567L + 5L * 6789012345678L).toDouble / 10.0
    assert(java.lang.Double.doubleToLongBits(out(0)) ==
      java.lang.Double.doubleToLongBits(p50), s"p50 ${out(0)} vs $p50")
    assert(java.lang.Double.doubleToLongBits(out(1)) ==
      java.lang.Double.doubleToLongBits(p90), s"p90 ${out(1)} vs $p90")
  }

  test("exactTenths rejects non-tenth fractions") {
    val df = Seq(1.0, 2.0).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Percentiles.exactTenths(df, Nil, "v", Seq(0.25), 100)
    }
    assert(e.getMessage.contains("multiples of 0.1"), e.getMessage)
  }

  test("exactTenths fails loudly on non-integral values (no silent truncation)") {
    // the integer interpolation casts picked values to long; a caller
    // passing fractional doubles must get an error, not a silently
    // truncated quantile
    val df = Seq(1.5, 2.5, 3.5, 4.5).toDF("v")
    val e = intercept[Exception] {
      Percentiles.exactTenths(df, Nil, "v", Seq(0.5), 100)
        .select("pcts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("INTEGER-valued")),
      s"expected the integral-precondition raise, got: ${messages(e)}")
  }
}
