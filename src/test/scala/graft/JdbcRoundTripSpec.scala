package graft

import graft.pipeline.Pipeline

/** Live JDBC end-to-end through an embedded Derby database — the first
  * round where the PSQL/JDBC registry paths move real bytes through a
  * real SQL engine instead of an injected transport (ref
  * ext/postgresql/source.go:34-148, sink.go:35-191). The COPY-shaped
  * PgSink path keeps its injected `PgClientFactory` (PostgreSQL's COPY
  * wire protocol has no embedded stand-in); this covers the plain-DSN
  * fallback sink and the query/table source against a live driver.
  */
class JdbcRoundTripSpec extends SparkSuite {
  import spark.implicits._

  // one in-memory database per JVM run; `create=true` is idempotent
  private val db = s"memory:graftjdbc${System.nanoTime()}"
  private val url = s"jdbc:derby:$db;create=true"

  test("JDBC sink appends via Spark's writer; source reads table and pushdown query back") {
    val df = Seq((1, "ada"), (2, "grace"), (3, "edsger")).toDF("id", "name")
    // sink fallback path: no injected PSQL client → df.write.jdbc append
    // (creates the table on first write)
    Pipeline.sink(df, "PSQL", Pipeline.Spec(
      from = "FILE", to = Seq("PSQL"),
      env = Map("JDBC__URL" -> url, "JDBC__TABLE" -> "people")))
    // source: whole table
    val back = Pipeline.source(spark, Pipeline.Spec(
      from = "JDBC", to = Nil,
      env = Map("JDBC__URL" -> url, "JDBC__TABLE" -> "people")))
    assert(back.select("id", "name").as[(Int, String)].collect().toSet ==
      Set((1, "ada"), (2, "grace"), (3, "edsger")))
    // source: server-side query (the reference's PSQL__QUERY mode)
    val q = Pipeline.source(spark, Pipeline.Spec(
      from = "JDBC", to = Nil,
      env = Map("JDBC__URL" -> url,
        // Spark's JDBC writer creates columns with QUOTED identifiers
        // ("id", "name"), so the server-side query must quote them too
        // (Derby, like PG, is case-sensitive for quoted names)
        "JDBC__QUERY" -> "SELECT \"name\" FROM people WHERE \"id\" >= 2")))
    assert(q.as[String].collect().toSet == Set("grace", "edsger"))
    // second sink call APPENDS (reference sink semantics), not replaces
    Pipeline.sink(Seq((4, "barbara")).toDF("id", "name"), "PSQL",
      Pipeline.Spec(from = "FILE", to = Seq("PSQL"),
        env = Map("JDBC__URL" -> url, "JDBC__TABLE" -> "people")))
    val n = Pipeline.source(spark, Pipeline.Spec(
      from = "JDBC", to = Nil,
      env = Map("JDBC__URL" -> url, "JDBC__TABLE" -> "people"))).count()
    assert(n == 4)
  }

  test("JDBC source surfaces driver errors (bad table) rather than returning empty") {
    val e = intercept[Exception] {
      Pipeline.source(spark, Pipeline.Spec(
        from = "JDBC", to = Nil,
        env = Map("JDBC__URL" -> url, "JDBC__TABLE" -> "no_such_table")))
        .collect()
    }
    assert(e.getMessage != null)
  }
}
