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

  private def md5p15(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(15)

  private def bruteWinnow(text: String, k: Int, w: Int): Seq[(Long, String)] = {
    val cps = text.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Seq.empty
    val hs = (0 until m).map(i => md5p15(new String(cps, i, k)))
    (0 until math.max(1, m - w + 1)).map { s =>
      val sel = (s until math.min(s + w, m)).minBy(i => (hs(i), i))
      ((sel + 1).toLong, hs(sel))
    }.distinct
  }

  private def kernelWinnow(text: String, k: Int, w: Int): Seq[(Long, String)] = {
    val arr = TextKernels.winnow(u(text), k, w)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getLong(0), r.getUTF8String(1).toString)
    }
  }

  test("winnow: deque kernel == brute-force windows on random docs, 200 cases") {
    (1 to 200).foreach { _ =>
      val s = randText()
      val k = 2 + rnd.nextInt(8)
      val w = 1 + rnd.nextInt(8)
      val got = kernelWinnow(s, k, w)
      val exp = bruteWinnow(s, k, w)
      assert(got == exp, s"k=$k w=$w '$s'\ngot $got\nexp $exp")
    }
  }

  test("winnow: coverage guarantee and position density, 200 cases") {
    (1 to 200).foreach { _ =>
      val s = randText()
      val (k, w) = (4, 5)
      val fps = kernelWinnow(s, k, w)
      val m = s.codePointCount(0, s.length) - k + 1
      if (m >= 1) {
        assert(fps.nonEmpty, s"non-empty doc must fingerprint: '$s'")
        // winnowing guarantee: consecutive selections are < w apart,
        // so no gap of w grams goes unrepresented
        fps.map(_._1).sliding(2).foreach {
          case Seq(a, b) => assert(b - a <= w, s"gap ${b - a} > $w in '$s'")
          case _ =>
        }
        // strictly increasing positions within [1, m]
        assert(fps.map(_._1) == fps.map(_._1).sorted.distinct)
        assert(fps.head._1 >= 1 && fps.last._1 <= m)
      } else assert(fps.isEmpty)
    }
  }

  test("winnow: non-ASCII positions are code points, surrogate-safe") {
    // U+1D11E (musical G clef) is a surrogate PAIR in UTF-16: code
    // point positions must still advance by one per character
    val s = "ab𝄞cd𝄞ef"
    val got = kernelWinnow(s, 3, 2)
    val exp = bruteWinnow(s, 3, 2)
    assert(got == exp, s"got $got\nexp $exp")
    assert(got.last._1 <= s.codePointCount(0, s.length) - 3 + 1)
  }
}
