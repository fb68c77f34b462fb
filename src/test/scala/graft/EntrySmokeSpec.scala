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

  // The q271 lesson (round-13 verdict), tightened from a blacklist to
  // a WHITELIST (round-14 verdict directive 3): the driver's DuckDB
  // gate fetches/hashes a query-result DECIMAL differently from the
  // parquet decimal128 it reads back from Verify's output, so a
  // decimal-typed FINAL column can hash-mismatch with identical
  // values. Rather than ban the two types that have already burned us
  // (decimal, float), final outputs must stay INSIDE the positive
  // driver-proven set — {string, long, int, short, byte, double,
  // boolean, date, timestamp} and arrays/structs thereof. Anything
  // else (BinaryType, TimestampNTZType, MapType, CalendarInterval, …)
  // is unproven against the driver's hasher and fails this test until
  // a green round proves it. Decimals/floats remain fine INSIDE a
  // plan; cast (long/double) before emission.
  test("every final output column type is in the driver-proven whitelist") {
    import org.apache.spark.sql.types._
    def proven(dt: DataType): Boolean = dt match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
           DoubleType | BooleanType | DateType | TimestampType => true
      case ArrayType(e, _) => proven(e)
      case StructType(fs)  => fs.forall(f => proven(f.dataType))
      case _               => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sfDir).schema.fields
          .filterNot(f => proven(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    assert(offenders.isEmpty,
      s"final output columns outside the driver-proven type whitelist " +
        s"{string,long,int,short,byte,double,boolean,date,timestamp," +
        s"array/struct thereof}: " + offenders.mkString(", "))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
