package graft

import org.apache.spark.sql.functions._
import graft.ops.{Events, Ordinal}

class OrdinalSpec extends SparkSuite {
  import spark.implicits._

  test("perfect concordance gives tau_b = gamma = somers_d = 1") {
    val df = Seq((1, 10), (2, 20), (3, 30), (4, 40)).toDF("x", "y")
    val r = Ordinal.association(df, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("tau_b") == 1.0)
    assert(r.getAs[Double]("gamma") == 1.0)
    assert(r.getAs[Double]("somers_d") == 1.0)
  }

  test("balanced 2x2 grid: C = D = 1, all statistics zero") {
    val df = Seq((1, 1), (1, 2), (2, 1), (2, 2)).toDF("x", "y")
    val r = Ordinal.association(df, col("x"), col("y")).head()
    // pairs with distinct x: (1,1)-(2,2) concordant, (1,2)-(2,1)
    // discordant, two tied on y
    assert(r.getDecimal(1).longValueExact() == 1L)
    assert(r.getDecimal(2).longValueExact() == 1L)
    assert(r.getAs[Double]("tau_b") == 0.0)
    assert(r.getAs[Double]("gamma") == 0.0)
    assert(r.getAs[Double]("somers_d") == 0.0)
  }

  test("hand-computed tau_b with ties matches the marginal formula") {
    // x: 1,1,2,2,3  y: 1,2,2,3,3 — enumerating cross-x cell pairs:
    // C=6, D=0, two tied-on-y pairs; dn0=n(n−1)=20, dn1=4, dn2=4 →
    // tau_b = 2·6/√(16·16) = 0.75, gamma = 1, somers_d = 12/16 = 0.75
    val df = Seq((1, 1), (1, 2), (2, 2), (2, 3), (3, 3)).toDF("x", "y")
    val r = Ordinal.association(df, col("x"), col("y")).head()
    assert(r.getDecimal(1).longValueExact() == 6L)
    assert(r.getDecimal(2).longValueExact() == 0L)
    assert(r.getAs[Double]("tau_b") == 0.75)
    assert(r.getAs[Double]("gamma") == 1.0)
    assert(r.getAs[Double]("somers_d") == 0.75)
  }

  test("NULL levels are excluded") {
    val df = Seq((Some(1), Some(10)), (Some(2), None), (None, Some(5)),
      (Some(2), Some(20))).toDF("x", "y")
    val r = Ordinal.association(df, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 2)
    assert(r.getAs[Double]("tau_b") == 1.0)
  }

  test("degenerate inputs yield NULL statistics, not a crash") {
    // constant x: every pair is tied on x → dn0 = dn1, C = D = 0 —
    // tau_b and somers_d divide by zero unguarded, gamma is 0/0.
    // The guards map all three to NULL (the Robust-family convention)
    // instead of an ANSI ArithmeticException / NaN divergence.
    val cx = Seq((1, 10), (1, 20), (1, 30)).toDF("x", "y")
    val r1 = Ordinal.association(cx, col("x"), col("y")).head()
    assert(r1.getAs[Long]("n") == 3)
    assert(r1.isNullAt(r1.fieldIndex("tau_b")))
    assert(r1.isNullAt(r1.fieldIndex("gamma")))
    assert(r1.isNullAt(r1.fieldIndex("somers_d")))
    // constant y with varying x: somers_d's denominator dn0 − dn1 is
    // fine but C + D = 0 and dn0 = dn2 → gamma and tau_b NULL,
    // somers_d a defined 0
    val cy = Seq((1, 5), (2, 5), (3, 5)).toDF("x", "y")
    val r2 = Ordinal.association(cy, col("x"), col("y")).head()
    assert(r2.isNullAt(r2.fieldIndex("tau_b")))
    assert(r2.isNullAt(r2.fieldIndex("gamma")))
    assert(r2.getAs[Double]("somers_d") == 0.0)
  }

  test("association matches a brute-force pair enumeration, 15 random corpora") {
    val rnd = new scala.util.Random(7)
    (1 to 15).foreach { _ =>
      val n = 5 + rnd.nextInt(25)
      val data = Seq.fill(n)((rnd.nextInt(4), rnd.nextInt(3)))
      // brute force over all unordered pairs
      var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
      for (i <- data.indices; j <- i + 1 until data.length) {
        val ((xa, ya), (xb, yb)) = (data(i), data(j))
        if (xa != xb && ya != yb) {
          if ((xa < xb) == (ya < yb)) c += 1 else d += 1
        } else if (xa == xb && ya != yb) tx += 1
        else if (xa != xb && ya == yb) ty += 1
        // pairs tied on both count in n1 AND n2
      }
      val tiedBoth = (for (i <- data.indices; j <- i + 1 until data.length)
        yield (data(i), data(j))).count { case (a, b) => a._1 == b._1 && a._2 == b._2 }
      val n0 = n.toLong * (n - 1) / 2
      val n1 = tx + tiedBoth; val n2 = ty + tiedBoth
      val r = Ordinal.association(data.toDF("x", "y"), col("x"), col("y"))
        .head()
      assert(r.getDecimal(1).longValueExact() == c, s"C mismatch on $data")
      assert(r.getDecimal(2).longValueExact() == d, s"D mismatch on $data")
      if (n0 > n1 && n0 > n2) {
        // op divides doubled units, brute divides plain — trees differ
        // by one ulp at most, so compare with a 1e-6 tolerance
        val tauB = (c - d).toDouble /
          math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
        assert(math.abs(r.getAs[Double]("tau_b") - tauB) < 1e-6,
          s"tau mismatch on $data: got ${r.getAs[Double]("tau_b")} want $tauB")
      }
    }
  }

  test("markov transition matrix counts and half-up probabilities") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "b"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("ts", timestamp_seconds(col("ts")))
      .withColumn("event_id", monotonically_increasing_id())
    val m = Events.transitionMatrix(df, "user_id", "ts", "event_type", "event_id")
      .orderBy("prev_type", "next_type").collect()
    val asMap = m.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    assert(asMap(("a", "b")) == (2L, 1.0))     // a always → b
    assert(asMap(("b", "a")) == (1L, 0.5))
    assert(asMap(("b", "b")) == (1L, 0.5))
    assert(!asMap.contains(("a", "a")))
  }

  test("stationary distribution of a two-state flip chain is uniform") {
    val trans = Seq(("a", "b", 5L), ("b", "a", 5L))
      .toDF("prev_type", "next_type", "n_steps")
    val pi = Events.stationaryDistribution(trans).orderBy("state").collect()
    assert(pi.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(pi.forall(r => math.abs(r.getDouble(1) - 0.5) < 1e-9))
  }

  test("absorbing state takes all the mass under stochastic completion") {
    // a → b always, b has no outgoing steps → b self-loops → π = (0, 1)
    val trans = Seq(("a", "b", 3L)).toDF("prev_type", "next_type", "n_steps")
    val pi = Events.stationaryDistribution(trans, roundOutput = false)
      .orderBy("state").collect()
    val m = pi.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("b") > 0.999999 && m("a") < 1e-6)
  }
}
