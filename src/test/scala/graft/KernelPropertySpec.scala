package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextKernels

/** Seeded randomized properties of the compiled kernels — driver-side
  * (no Spark jobs), 200 cases each, fixed seed so failures reproduce.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val words = Vector("the", "cat", "sat", "on", "mat", "dog",
    "big", "data", "spark", "row", "scan", "fast", "a", "z")
  private def randText(): String =
    Seq.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" ")
  private def u(s: String) = UTF8String.fromString(s)

  test("charEntropy: bounded by ln(#distinct), permutation-invariant, 200 cases") {
    (1 to 200).foreach { _ =>
      val s = randText()
      val h = TextKernels.charEntropy(u(s))
      val distinct = s.toSet.size
      assert(h >= 0.0, s"negative entropy for '$s'")
      // round-6 ladder can exceed the true bound by at most 1e-6·…
      assert(h <= math.log(distinct) + 1e-4, s"H=$h > ln($distinct) for '$s'")
      // per-character counting cannot see order
      val shuffled = new String(rnd.shuffle(s.toList).toArray)
      assert(TextKernels.charEntropy(u(shuffled)) == h, s"'$s' vs '$shuffled'")
    }
  }

  test("wordHits: additive over concatenation with a space, 200 cases") {
    (1 to 200).foreach { _ =>
      val a = randText(); val b = randText()
      val w = words(rnd.nextInt(words.size))
      val ha = TextKernels.wordHits(u(a), u(w))
      val hb = TextKernels.wordHits(u(b), u(w))
      val hc = TextKernels.wordHits(u(a + " " + b), u(w))
      assert(hc == ha + hb, s"'$a' + '$b' word '$w': $hc != $ha + $hb")
    }
  }

  test("shingleMinhash: appending text only lowers signature elements, 200 cases") {
    (1 to 200).foreach { _ =>
      val a = Seq.fill(5 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")
      val b = randText()
      val sa = TextKernels.shingleMinhash(u(a), 3, 16)
      val sc = TextKernels.shingleMinhash(u(a + " " + b), 3, 16)
      // concat's shingle set is a superset of a's (a's runs survive
      // intact), and min over a superset cannot increase
      (0 until 16).foreach { i =>
        assert(sc.getLong(i) <= sa.getLong(i),
          s"family $i rose after append: '$a' + '$b'")
      }
    }
  }

  test("simhash/fingerprint: deterministic; fingerprint is order-sensitive") {
    (1 to 200).foreach { _ =>
      val s = randText()
      assert(TextKernels.simhash(u(s)) == TextKernels.simhash(u(s)))
    }
    // token order must change the rolling-hash fingerprint
    val a = "alpha beta gamma delta"
    val b = "delta gamma beta alpha"
    val fa = spark_fingerprint(a); val fb = spark_fingerprint(b)
    assert(fa != fb)
  }

  // fingerprint lives in TextOps as a Column formula; evaluate it via a
  // tiny local session-free path: reuse the shared test session
  private def spark_fingerprint(s: String): Long = {
    val sp = SparkSuite.spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    Seq(s).toDF("t").select(graft.ops.TextOps.fingerprint(col("t"))).as[Long].head()
  }
}
