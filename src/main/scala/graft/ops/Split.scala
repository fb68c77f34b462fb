package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment — the dataset-split
  * step of a training pipeline as PURE HASH ARITHMETIC: a row's split
  * follows from its id alone (md5-prefix against cumulative
  * thresholds, the [[TextOps.mixtureSample]] device), so assignment is
  * reproducible across engines, reruns and cluster sizes, rows never
  * leak between splits when the corpus grows (an id keeps its split
  * forever), and no RNG state exists anywhere in the plan.
  */
object Split {

  private[ops] def thresholdHex(cum: Double): String =
    if (cum >= 1.0) "g" // sorts above every 8-hex-digit prefix
    else if (cum <= 0.0) ""
    else f"${(cum * 4294967296d).toLong}%08x"

  /** The split column for `idCol` under `fractions` (name → fraction,
    * in order; must sum to 1 within 1e-9). Map-only, codegen'd.
    */
  def splitColumn(idCol: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.size >= 2, "assignSplit needs at least 2 splits")
    require(fractions.map(_._1).distinct.size == fractions.size,
      "split names must be distinct")
    require(fractions.forall(_._2 > 0), "split fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val h = substring(md5(idCol.cast("string").cast("binary")), 1, 8)
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    // the last split is the catch-all — no threshold comparison, so
    // float accumulation can never orphan a row
    fractions.init.zip(cums.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), cum), acc) =>
      when(h < lit(thresholdHex(cum)), name).otherwise(acc)
    }
  }

  /** DuckDB SQL text of [[splitColumn]] for oracle replay. */
  def splitSql(idExpr: String, fractions: Seq[(String, Double)]): String = {
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    val h = s"substr(md5(CAST($idExpr AS VARCHAR)), 1, 8)"
    val cases = fractions.init.zip(cums.init).map { case ((name, _), cum) =>
      s"WHEN $h < '${thresholdHex(cum)}' THEN '$name'"
    }.mkString(" ")
    s"(CASE $cases ELSE '${fractions.last._1}' END)"
  }

  def assignSplit(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), fractions))
}
