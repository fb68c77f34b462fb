package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage-side counterpart of the ANN
  * operators: at 100 TB of float32 vectors, symmetric max-abs int8
  * cuts the footprint 4× (and IVF/LSH candidate scans read a quarter
  * of the bytes) at a bounded recall cost; the scale rides along per
  * vector so similarity scoring dequantizes on the fly.
  */
object Quantize {

  /** Packed production form: (id, scale float, qvec array<tinyint>)
    * where `x ≈ q * scale`, q ∈ [-127, 127]. Zero vectors quantize to
    * zeros with scale 0.
    */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val amax = aggregate(v, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))
    df.select(col(idCol),
      (amax / 127d).cast("float").as("scale"),
      when(amax === 0d, transform(v, _ => lit(0).cast("byte")))
        .otherwise(transform(v,
          x => round(x.cast("double") * 127d / amax).cast("byte")))
        .as("qvec"))
  }

  /** Approximate cosine over packed int8 vectors: integer dot product
    * scaled back by the two vectors' scales. The int multiply-add path
    * is the cheap inner loop a 100 TB scan wants.
    */
  def cosineInt8(qvecA: Column, scaleA: Column, qvecB: Column, scaleB: Column): Column = {
    val dot = aggregate(zip_with(qvecA, qvecB, (a, b) => a.cast("int") * b.cast("int")),
      lit(0L), (acc, x) => acc + x)
    val na = aggregate(transform(qvecA, a => a.cast("int") * a.cast("int")),
      lit(0L), (acc, x) => acc + x)
    val nb = aggregate(transform(qvecB, b => b.cast("int") * b.cast("int")),
      lit(0L), (acc, x) => acc + x)
    (dot.cast("double") * scaleA * scaleB) /
      (sqrt(na.cast("double")) * scaleA * sqrt(nb.cast("double")) * scaleB)
  }

  /** Oracle surface: one row per (vector, position) with the quantized
    * level as BIGINT — scalar rows hash engine-identically, unlike
    * nested arrays. `i` is 1-based to match SQL ordinality.
    */
  def int8Rows(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x0")))
      .withColumn("x", col("x0").cast("double"))
    val w = Window.partitionBy(idCol)
    exploded
      .withColumn("amax", max(abs(col("x"))).over(w))
      .select(col(idCol),
        (col("pos") + 1).cast("long").as("i"),
        when(col("amax") === 0d, lit(0L))
          .otherwise(round(col("x") * 127d / col("amax")).cast("long")).as("q"))
  }
}
