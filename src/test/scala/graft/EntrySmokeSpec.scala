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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
