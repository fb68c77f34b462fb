package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression rendering a double exactly as jq 1.6
  * prints JSON numbers (the reference pipes records through the jq
  * binary, ext/jq/connector.go:101-127; its number text is jvp_dtoa's
  * Gay-shortest digits laid out by g_fmt).
  *
  * The round-16 compiled render reconstructed the four g_fmt print
  * forms from Java's `Double.toString` digits as a ~5-regexp Column
  * pipeline, but RAISED wherever JDK 17's pre-Ryu print emits
  * non-minimal digits (JDK-4511638, fixed in 19: 4.9E-324 for jq's
  * 5e-324) — a data-dependent availability hazard at volume. This
  * kernel computes the true Gay-shortest digit string itself and is
  * TOTAL over all doubles: NaN renders jq's "null", ±infinite clamps
  * to the extreme finite double's print (both byte-pinned against the
  * real binary — round-17 directive 1). −0.0 renders "-0",
  * jq's actual output; it is unreachable from stored columns
  * (UnsafeRow normalizes on write) but reachable from expression
  * intermediates like `-1 * 0`.
  *
  * As a codegen'd `UnaryExpression` the whole render is one static
  * Java call inside whole-stage codegen — the TextExprs pattern —
  * replacing the interpreted regexp pipeline (also a per-row perf
  * fix: see the `render` bench entry).
  */
case class JqNumberString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_jq_num"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(JqNumberString.render(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.JqNumberString.render($c))")

  override protected def withNewChildInternal(newChild: Expression): JqNumberString =
    copy(child = newChild)
}

object JqNumberString {

  /** 10^F correctly rounded (parse-exact), F ∈ [−342, 309] — the
    * spacing-pruning comparisons only; out-of-range clamps to 0/∞. */
  private val POW10: Array[Double] = {
    val t = new Array[Double](652)
    var i = 0
    while (i < t.length) {
      t(i) = java.lang.Double.parseDouble("1E" + (i - 342)); i += 1
    }
    t
  }
  private def pow10(f: Int): Double =
    if (f < -342) 0.0
    else if (f > 309) java.lang.Double.POSITIVE_INFINITY
    else POW10(f + 342)

  /** 5^n as BigInteger, n ∈ [0, 360] — the exact-comparison helper. */
  private val POW5: Array[java.math.BigInteger] = {
    val t = new Array[java.math.BigInteger](361)
    t(0) = java.math.BigInteger.ONE
    val five = java.math.BigInteger.valueOf(5)
    var i = 1
    while (i < t.length) { t(i) = t(i - 1).multiply(five); i += 1 }
    t
  }

  /** Exact sign of a − midpoint(q, q+1)·10^F for a > 0: doubling both
    * sides, compare 2a = M·2^(E+1) (from a's own bits) against
    * 2·mid = (2q+1)·10^F = (2q+1)·2^F·5^F — denominators clear into
    * one ≤~1100-bit BigInteger compare, no decimal expansion of the
    * double. */
  private def cmpMid(a: Double, q: Long, f: Int): Int = {
    val bits = java.lang.Double.doubleToLongBits(a)
    val be = ((bits >> 52) & 0x7ffL).toInt
    val m = if (be == 0) bits & 0xfffffffffffffL
      else (bits & 0xfffffffffffffL) | (1L << 52)
    val e = if (be == 0) -1074 else be - 1075 // a = m·2^e exactly
    val h = 2 * q + 1 // ≤ ~2e17, no overflow for 17-digit q
    var lhs = java.math.BigInteger.valueOf(m)
    var rhs = java.math.BigInteger.valueOf(h)
    if (f >= 0) rhs = rhs.multiply(POW5(f))
    else lhs = lhs.multiply(POW5(-f))
    val p2 = (e + 1) - f
    if (p2 >= 0) lhs = lhs.shiftLeft(p2) else rhs = rhs.shiftLeft(-p2)
    lhs.compareTo(rhs)
  }

  /** jq 1.6's number text — TOTAL over ALL doubles (round-17 VERDICT
    * directive 1). NaN prints "null" and ±infinite clamps to the
    * extreme finite double's print (jq's jvp_dtoa/jv_dump path;
    * verified against the real binary: `nan | tojson` → "null",
    * `infinite` → 1.7976931348623157e+308, `0 - infinite` → the same
    * with a leading '-'). NaN/Inf ARE storable in parquet double
    * columns, so the old raise here was the render's last
    * data-dependent availability hazard at volume. */
  def render(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "null"
    if (d == java.lang.Double.POSITIVE_INFINITY)
      return "1.7976931348623157e+308"
    if (d == java.lang.Double.NEGATIVE_INFINITY)
      return "-1.7976931348623157e+308"
    // jq prints −0.0 as "-0" (g_fmt keeps the sign; the long branch
    // below would say "0")
    if (d == 0.0d)
      return if (java.lang.Double.doubleToRawLongBits(d) != 0L) "-0" else "0"
    // exact-integer fast path: |d| ≤ 2^53 integral prints its own long
    // digits (≤16 digits, ≤15 trailing zeros → always jq-plain)
    if (d == Math.floor(d) && Math.abs(d) <= 9.007199254740992e15)
      return java.lang.Long.toString(d.toLong)
    val a = Math.abs(d)
    // digits g + decpt (value = 0.g × 10^decpt) from EITHER Java print
    // form: scientific "m.mmmE±x" has decpt = exp+1; plain "iii.fff"
    // derives decpt from the integer-part length minus the leading
    // zeros Java writes below 1 ("0.001234" → g="1234", decpt=−2).
    val s = java.lang.Double.toString(a)
    val ei = s.indexOf('E')
    val mant = if (ei < 0) s else s.substring(0, ei)
    val dot = mant.indexOf('.')
    val raw = new java.lang.StringBuilder(mant.length - 1)
    var i = 0
    while (i < mant.length) {
      if (mant.charAt(i) != '.') raw.append(mant.charAt(i)); i += 1
    }
    var lead = 0
    while (lead < raw.length - 1 && raw.charAt(lead) == '0') lead += 1
    var end = raw.length
    while (end > lead + 1 && raw.charAt(end - 1) == '0') end -= 1
    val g0 = raw.substring(lead, end)
    val decpt0 =
      if (ei >= 0) java.lang.Integer.parseInt(s.substring(ei + 1)) + 1
      else dot - lead
    // Minimize to Gay's shortest round-trip digits. Java's print may
    // carry EXTRA digits (JDK-4511638; and e.g. 9.99999999999999987E17
    // whose shortest is "1e+18" — two digits fewer, with a carry).
    // Descend the digit count: at k digits the decimals nearest the
    // value are {prefix_k(g0)−1, prefix_k(g0), prefix_k(g0)+1} (the ±1
    // absorbs the carry Java's own rounding to len(g0) digits may
    // hold — prefixes always come from the ORIGINAL digit string); a
    // k-digit round-tripper exists iff one of those round-trips, and
    // once NO candidate at some k round-trips, none exists at any
    // smaller k either (a shorter decimal is also a k-digit decimal).
    // Among round-trippers at the minimal k, jq emits the one nearest
    // the value (exact BigDecimal distance, computed only on a 2+-way
    // level — both sides are exact decimals), ties to the even
    // mantissa (Gay's mode-0 rule; an exact tie needs the double to
    // BE the midpoint, unreached in practice).
    // start at the FULL length: Java's digits are guaranteed to
    // round-trip but not to be the correctly-rounded nearest — the
    // last digit can sit one off Gay's choice (observed ~1e-5 of
    // random doubles: Java "…769046E25" where jq prints "…769047"),
    // so level nD re-selects among {G0−1, G0, G0+1} too.
    //
    // Spacing pruning: the set of decimals that round-trip to d is an
    // interval of width w ≤ ulp(a) around a, so when the k-digit grid
    // spacing 10^(decpt0−k) exceeds ulp(a), AT MOST ONE candidate can
    // round-trip — the full-length level then needs no parses at all
    // (g0 is that one), and lower levels can stop at the first hit
    // with no nearest-selection. Only when the grid is finer than an
    // ulp (the tie-prone lengths) does the exact-distance selection
    // run.
    val u = Math.ulp(a)
    var g = g0
    var decpt = decpt0
    var k = g0.length
    var descending = true
    while (descending) {
      val spacing = pow10(decpt0 - k)
      val unique = spacing > u * 1.0000000001
      var chosen = -1L
      if (unique && k == g0.length) {
        chosen = java.lang.Long.parseLong(g0) // its own print round-trips
      } else {
        val prefix = java.lang.Long.parseLong(g0.substring(0, k))
        def rt(q: Long): Boolean = q >= 1 &&
          java.lang.Double.parseDouble(q.toString + "E" + (decpt0 - k)) == a
        if (unique) {
          // test nearest-first; at most one can hit
          if (rt(prefix)) chosen = prefix
          else if (rt(prefix + 1)) chosen = prefix + 1
          else if (rt(prefix - 1)) chosen = prefix - 1
        } else {
          // the round-trip set is an interval, so hits are a
          // contiguous run [qlo..qhi]; walk the run choosing the side
          // of each exact midpoint a falls on (ties — a IS the
          // midpoint — go to the even mantissa, Gay's mode-0 rule)
          val h0 = rt(prefix - 1)
          val h1 = k == g0.length || rt(prefix) // g0's own print round-trips
          val h2 = rt(prefix + 1)
          if (h0 || h1 || h2) {
            var qlo = if (h0) prefix - 1 else if (h1) prefix else prefix + 1
            var qhi = if (h2) prefix + 1 else if (h1) prefix else prefix - 1
            while (qlo < qhi) {
              val s = cmpMid(a, qlo, decpt0 - k)
              if (s < 0) qhi = qlo
              else if (s > 0) qlo += 1
              else { if ((qlo & 1L) != 0L) qlo += 1; qhi = qlo }
            }
            chosen = qlo
          }
        }
      }
      if (chosen < 0L) descending = false
      else {
        val ds = java.lang.Long.toString(chosen)
        decpt = decpt0 - k + ds.length // a carry (99→100) shifts decpt up
        var dEnd = ds.length
        while (dEnd > 1 && ds.charAt(dEnd - 1) == '0') dEnd -= 1
        g = ds.substring(0, dEnd)
        k -= 1
        descending = k >= 1
      }
    }
    // the four g_fmt output forms (branch structure verified against
    // the real binary, see JqSpec's pinned corpus)
    val nD = g.length
    val sb = new java.lang.StringBuilder(26)
    if (d < 0) sb.append('-')
    if (decpt <= -4 || decpt > nD + 15) {
      // scientific m[.mmm]e±XX — lowercase e, explicit sign, ≥2
      // exponent digits ("1e-07", "1e+16", "1.5e+300")
      sb.append(g.charAt(0))
      if (nD > 1) { sb.append('.'); sb.append(g, 1, nD) }
      sb.append('e')
      val e = decpt - 1
      sb.append(if (e < 0) '-' else '+')
      val ae = Math.abs(e)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (decpt <= 0) {
      sb.append("0.")
      var z = decpt
      while (z < 0) { sb.append('0'); z += 1 }
      sb.append(g)
    } else if (decpt >= nD) {
      // plain integer, at most 15 pad zeros by the first rule
      sb.append(g)
      var z = nD
      while (z < decpt) { sb.append('0'); z += 1 }
    } else {
      sb.append(g, 0, decpt); sb.append('.'); sb.append(g, decpt, nD)
    }
    sb.toString
  }

  /** Register as SQL function `graft_jq_num` (argument cast to double
    * at build, like go_float_str). */
  private[functions] val builders
      : Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_jq_num" -> (exprs =>
      JqNumberString(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.DoubleType))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}
