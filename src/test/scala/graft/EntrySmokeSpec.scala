package graft

/** Smoke: every declared query runs on sf0.001 and yields a schema with
  * at least one column; oracle coverage keys are a subset of queries.
  */
class EntrySmokeSpec extends SparkSuite {

  test("oracle keys ⊆ query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query has an oracle (the full-coverage invariant)") {
    val uncovered = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(uncovered.isEmpty,
      s"queries without an oracle (would downgrade the correctness gate): $uncovered")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // The q271 lesson (round-13 verdict): the driver's DuckDB gate
  // fetches/hashes a query-result DECIMAL differently from the
  // parquet decimal128 it reads back from Verify's output, so a
  // decimal-typed FINAL column can hash-mismatch with identical
  // values. Final outputs must stay inside the driver-proven type
  // set; decimals/floats are fine INSIDE a plan but must be cast
  // (long/double) before emission.
  test("no DecimalType/FloatType in any final output schema") {
    import org.apache.spark.sql.types._
    def banned(dt: DataType): Boolean = dt match {
      case _: DecimalType | FloatType => true
      case ArrayType(e, _)            => banned(e)
      case MapType(k, v, _)           => banned(k) || banned(v)
      case StructType(fs)             => fs.exists(f => banned(f.dataType))
      case _                          => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sfDir).schema.fields
          .filter(f => banned(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    assert(offenders.isEmpty,
      s"decimal/float final output columns (cast to long/double before " +
        s"emission — the driver's hash treats decimals inconsistently): " +
        offenders.mkString(", "))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
