package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-proof rounding devices for oracle-checked outputs.
  *
  * `ROUND(double, 6)` of a ratio of exact decimals is the one
  * construct that has flipped between engine BUILDS even when every
  * value sat hundreds of thousands of ulps from a rounding boundary
  * (q271, round-12 driver gate): DuckDB rounds doubles via double
  * arithmetic (`std::round(x * 10^d) / 10^d` — the scale multiply
  * itself re-rounds), Spark via the double's exact decimal expansion
  * (BigDecimal HALF_UP), and the divergence window grows with |x|
  * (the product's ulp approaches the half-boundary spacing as the
  * rounded value grows past ~10³). The representation both engines
  * agree on at every magnitude is half-up INTEGER division in micro
  * units: Spark computes it with an exact pmod (a bare
  * (38,0)/(38,0) divide rounds at scale 6 and can itself flip a
  * floor on a near-integer quotient), DuckDB mirrors with HUGEINT
  * `//`. See also Robust.brownForsythe (the q249 precedent) and
  * Profile.effectiveSampleSize (the q271 conversion).
  *
  * NEGATIVE numerators are NOT supported by [[halfUpDiv]] /
  * [[round6Ratio]]: the pmod form floors (rounds toward −∞) while
  * DuckDB `//` truncates (toward 0) — they disagree below zero. For
  * a signed difference of two ratios, subtract two non-negative
  * micro results instead (TimeSeries.meanShiftDaily's `shift`).
  */
object Parity {

  /** ⌊(2a + b) / 2b⌋ = round-half-up(a/b) for NON-NEGATIVE integral
    * decimals, exact at DECIMAL(38,0). Budget: 2a + b < 10³⁸. */
  def halfUpDiv(a: Column, b: Column): Column = {
    val x = a * lit(2) + b; val y = b * lit(2)
    ((x - pmod(x, y)) / y).cast("decimal(38,0)")
  }

  private val Mil = lit(1000000L).cast("decimal(7,0)")

  /** `num/den` in half-up micro units (a BIGINT-valued decimal —
    * keep it integral when composing further; cast to double only at
    * the very end). `num` may carry a fractional scale ≤ 6 (num·10⁶
    * must be integral: decimal sums of round-6/cents values qualify);
    * `den` must be a positive integer. Budget: num < 5·10²⁴. */
  def microRatio(num: Column, den: Column): Column =
    halfUpDiv((num.cast("decimal(31,6)") * Mil).cast("decimal(38,0)"),
      den.cast("decimal(38,0)"))

  /** Engine-proof `round(num/den, 6)` as a double: micro-unit
    * half-up integer division, then the one exact cast + /1e6.
    * Oracle twin: `CAST((2 * CAST(a AS HUGEINT) * 1000000 +
    * CAST(b AS HUGEINT)) // (2 * CAST(b AS HUGEINT)) AS DOUBLE) /
    * 1e6` (pre-scale a fractional numerator to micro first). */
  def round6Ratio(num: Column, den: Column): Column =
    microRatio(num, den).cast("double") / lit(1e6)
}
