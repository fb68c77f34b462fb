package graft.transform

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-statement SQL script front door (reference
  * internal/ext/helper/query.go:26-233 — header/variable/UDF/DROP
  * splitting, comment removal, string-literal protection, DDL detection).
  *
  * Our SQL entry point is `spark.sql`; scripts are split into statements
  * and classified, then executed sequentially:
  *   - `SET k=v;` headers → `spark.conf.set` (the reference ships them as
  *     query headers to MC);
  *   - `@var := SELECT ...;` variable declarations → temp view `var`
  *     (MC script-mode variables become named subplans);
  *   - `DROP ...;` statements run first (query.go:171-191 semantics);
  *   - remaining payload statements run in order; the LAST one's result
  *     is returned.
  */
object SqlScript {

  case class Script(
      headers: Seq[String], // SET ...
      variables: Seq[(String, String)], // @v := SELECT ...
      drops: Seq[String],
      statements: Seq[String])

  /** Remove `--` line comments and `/* */` block comments, protecting
    * string literals (query.go:120-168 equivalent).
    */
  def removeComments(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr: Char = 0
    while (i < sql.length) {
      val c = sql(i)
      if (inStr != 0) {
        sb += c
        if (c == '\\' && i + 1 < sql.length) { sb += sql(i + 1); i += 1 }
        else if (c == inStr) inStr = 0
        i += 1
      } else if (c == '\'' || c == '"') { inStr = c; sb += c; i += 1 }
      else if (c == '-' && i + 1 < sql.length && sql(i + 1) == '-') {
        while (i < sql.length && sql(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < sql.length && sql(i + 1) == '*') {
        i += 2
        while (i + 1 < sql.length && !(sql(i) == '*' && sql(i + 1) == '/')) i += 1
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Split on `;` outside string literals. Mirrors [[removeComments]]'
    * escape handling: a backslash inside a literal escapes the next
    * character, so `'it\'s; done'` stays one statement.
    */
  def splitStatements(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr: Char = 0
    var i = 0
    while (i < sql.length) {
      val c = sql(i)
      if (inStr != 0) {
        sb += c
        if (c == '\\' && i + 1 < sql.length) { sb += sql(i + 1); i += 1 }
        else if (c == inStr) inStr = 0
      } else if (c == '\'' || c == '"') { inStr = c; sb += c }
      else if (c == ';') { out += sb.toString; sb.clear() }
      else sb += c
      i += 1
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val setRe = "(?is)^\\s*set\\s+([\\w.]+)\\s*=\\s*(.+)$".r
  private val varRe = "(?is)^\\s*@([\\w]+)\\s*:=\\s*(.+)$".r
  private val dropRe = "(?is)^\\s*drop\\s+.*".r
  private val ddlRe = "(?is)^\\s*(create|alter|drop|truncate|insert|merge)\\b.*".r

  def isDDL(stmt: String): Boolean = ddlRe.pattern.matcher(stmt).matches()

  def parse(sql: String): Script = {
    val stmts = splitStatements(removeComments(sql))
    val headers = stmts.filter(s => setRe.pattern.matcher(s).matches())
    val vars = stmts.collect { case varRe(name, body) => name -> body.trim }
    val drops = stmts.filter(s =>
      dropRe.pattern.matcher(s).matches() && !setRe.pattern.matcher(s).matches())
    val payload = stmts.filterNot(s =>
      setRe.pattern.matcher(s).matches() ||
        varRe.pattern.matcher(s).matches() ||
        dropRe.pattern.matcher(s).matches())
    Script(headers, vars, drops, payload)
  }

  /** Execute a script; returns the last payload statement's DataFrame.
    * `dryRun=true` runs EXPLAIN instead of executing side-effecting
    * statements (reference ext/maxcompute/source.go:249-288).
    */
  def run(spark: SparkSession, sql: String, dryRun: Boolean = false): Option[DataFrame] = {
    val script = parse(sql)
    script.headers.foreach { h =>
      val setRe(k, v) = h: @unchecked
      spark.conf.set(k, v.trim.stripPrefix("'").stripSuffix("'"))
    }
    script.variables.foreach { case (name, body) =>
      spark.sql(body).createOrReplaceTempView(name)
    }
    if (!dryRun) script.drops.foreach(spark.sql(_))
    var last: Option[DataFrame] = None
    script.statements.foreach { s =>
      if (dryRun) last = Some(spark.sql(s"EXPLAIN $s"))
      else last = Some(spark.sql(s))
    }
    last
  }
}
