package graft

import graft.transform.SqlScript

class SqlScriptSpec extends SparkSuite {

  test("comment removal protects string literals") {
    val sql = "SELECT 'a--b' AS x -- trailing\n/* block */ FROM t"
    val out = SqlScript.removeComments(sql)
    assert(out.contains("'a--b'"))
    assert(!out.contains("trailing"))
    assert(!out.contains("block"))
  }

  test("statement split respects quoted semicolons") {
    val stmts = SqlScript.splitStatements("SELECT 'a;b' AS x; SELECT 2")
    assert(stmts.size == 2)
    assert(stmts.head.contains("'a;b'"))
  }

  test("statement split honors backslash-escaped quotes (parity with removeComments)") {
    val stmts = SqlScript.splitStatements("""SELECT 'it\'s; done' AS x; SELECT 2""")
    assert(stmts.size == 2, stmts)
    assert(stmts.head.contains("""'it\'s; done'"""))
  }

  test("classification: headers, variables, drops, payload") {
    val s = SqlScript.parse(
      """SET spark.sql.shuffle.partitions=8;
        |@v := SELECT 1 AS one;
        |DROP TABLE IF EXISTS tmp_x;
        |SELECT * FROM v;""".stripMargin)
    assert(s.headers.size == 1)
    assert(s.variables == Seq("v" -> "SELECT 1 AS one"))
    assert(s.drops.size == 1)
    assert(s.statements.size == 1)
  }

  test("isDDL") {
    assert(SqlScript.isDDL("CREATE TABLE t (x INT)"))
    assert(SqlScript.isDDL("insert into t values (1)"))
    assert(!SqlScript.isDDL("SELECT 1"))
  }

  test("run executes headers then variables then payload") {
    val out = SqlScript.run(spark,
      """SET spark.sql.cbo.enabled=false;
        |@nums := SELECT explode(sequence(1, 5)) AS n;
        |SELECT sum(n) AS total FROM nums;""".stripMargin)
    assert(out.get.collect().head.getLong(0) == 15L)
    assert(spark.conf.get("spark.sql.cbo.enabled") == "false")
  }

  test("dry run explains instead of executing") {
    val out = SqlScript.run(spark, "SELECT 1 AS one;", dryRun = true)
    val plan = out.get.collect().map(_.getString(0)).mkString
    assert(plan.toLowerCase.contains("plan"))
  }
}
