package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Go-template (`[[ ... ]]`) interpolation compiled to a Spark Column.
  *
  * The reference renders sink-config strings per record with Go
  * `text/template`, delims `[[ ]]`, sprig functions plus `uuid`, `now`,
  * `tojson` (internal/ext/compiler/compiler.go:14-39, RFC 005). Our
  * Spark-first equivalent compiles the template ONCE into a `Column`
  * expression (codegen'd, vectorized) instead of rendering per record on
  * the driver.
  *
  * Supported subset (covers every template in the reference README/RFCs):
  *   - literal text (emitted verbatim; `{{ }}` passes through untouched)
  *   - `[[ .field ]]` and nested `[[ .a.b ]]` field references
  *   - functions: `upper X`, `lower X`, `trim X`, `uuid`, `now`,
  *     `tojson X`, `div A B` (integer), `mul A B`, `add A B`, `sub A B`,
  *     `mod A B`, `printf "%s..." args...` (s/d verbs)
  *   - parenthesized calls: `[[ mul (div .__METADATA__record_index 1000) 1000 ]]`
  *     (the OSS sink's legacy batch-step split, ext/oss/sink.go:52-58)
  *   - string and integer literals
  */
object Template {

  sealed trait Ast
  case class Field(path: Seq[String]) extends Ast
  case class StrLit(v: String) extends Ast
  case class NumLit(v: Long) extends Ast
  case class Call(fn: String, args: Seq[Ast]) extends Ast

  /** Compile a template string into a single string-typed Column. */
  def compile(template: String): Column = {
    val parts = split2(template)
    val cols = parts.map {
      case Left(text) => lit(text)
      case Right(expr) => toCol(parseExpr(expr)).cast("string")
    }
    if (cols.isEmpty) lit("")
    else if (cols.size == 1) cols.head
    else concat(cols: _*)
  }

  /** Does the template contain any dynamic `[[ ]]` section? */
  def isDynamic(template: String): Boolean = template.contains("[[")

  /** Driver-side render against a plain value map — the reference's
    * `compiler.Compile(template, model.ToMap(record))` path
    * (internal/ext/compiler/compiler.go:42-55), used where the rendered
    * string is control-plane (a SQL text in the MC pre-query loop, an
    * email subject), not a per-record column. Missing fields render as
    * Go text/template's `<no value>`.
    */
  def render(template: String, values: Map[String, Any]): String =
    split2(template).map {
      case Left(text) => text
      case Right(e) => show(eval(parseExpr(e), values))
    }.mkString

  private def lookup(path: Seq[String], values: Map[String, Any]): Any =
    path.foldLeft[Any](values) {
      case (m: Map[_, _], k) =>
        m.asInstanceOf[Map[String, Any]].getOrElse(k, null)
      case (_, _) => null
    }

  private def asLong(v: Any): Long = v match {
    case n: Number => n.longValue
    case s: String => s.toLong
    case null => sys.error("numeric template arg is missing")
    case other => other.toString.toLong
  }

  private[transform] def show(v: Any): String = v match {
    case null => "<no value>"
    case d: Double => graft.functions.GoFloatString.format(d)
    case f: Float => graft.functions.GoFloatString.format(f.toDouble)
    case other => other.toString
  }

  private def eval(ast: Ast, values: Map[String, Any]): Any = ast match {
    case Field(p) => lookup(p, values)
    case StrLit(v) => v
    case NumLit(v) => v
    case Call(fn, args) =>
      val a = args.map(x => eval(x, values))
      fn match {
        case "upper" => show(a.head).toUpperCase
        case "lower" => show(a.head).toLowerCase
        case "trim" => show(a.head).trim
        case "uuid" | "uuidv4" => java.util.UUID.randomUUID.toString
        case "now" => java.time.Instant.now
        case "tojson" | "toJson" => toJsonString(a.head)
        case "div" => math.floorDiv(asLong(a(0)), asLong(a(1)))
        case "mul" => asLong(a(0)) * asLong(a(1))
        case "add" => asLong(a(0)) + asLong(a(1))
        case "sub" => asLong(a(0)) - asLong(a(1))
        case "mod" => asLong(a(0)) % asLong(a(1))
        case "printf" =>
          args.head match {
            case StrLit(fmt) =>
              String.format(fmt.replace("%d", "%s"),
                a.tail.map(show): _*)
            case _ => throw new IllegalArgumentException("printf needs literal format")
          }
        case other => throw new IllegalArgumentException(s"unsupported template function: $other")
      }
  }

  private def toJsonString(v: Any): String = v match {
    case null => "null"
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    case n: Number => show(n)
    case b: Boolean => b.toString
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => toJsonString(k) + ":" + toJsonString(x) }
        .mkString("{", ",", "}")
    case it: Iterable[_] => it.map(toJsonString).mkString("[", ",", "]")
    case other => toJsonString(other.toString)
  }

  // --- parsing ---------------------------------------------------------

  /** Split into literal (Left) and expression (Right) chunks. */
  private def split2(t: String): Seq[Either[String, String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Either[String, String]]
    var i = 0
    val sb = new StringBuilder
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == '[' && t(i + 1) == '[') {
        if (sb.nonEmpty) { out += Left(sb.toString); sb.clear() }
        val end = t.indexOf("]]", i + 2)
        require(end >= 0, s"unterminated [[ in template: $t")
        out += Right(t.substring(i + 2, end).trim)
        i = end + 2
      } else { sb += t(i); i += 1 }
    }
    if (sb.nonEmpty) out += Left(sb.toString)
    out.toSeq
  }

  private def tokenize(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += "("; i += 1
        case ')' => out += ")"; i += 1
        case '"' =>
          val end = s.indexOf('"', i + 1)
          require(end >= 0, s"unterminated string in template expr: $s")
          out += s.substring(i, end + 1)
          i = end + 1
        case _ =>
          val start = i
          while (i < s.length && !s(i).isWhitespace && s(i) != '(' && s(i) != ')') i += 1
          out += s.substring(start, i)
      }
    }
    out.toList
  }

  private[transform] def parseExpr(s: String): Ast = {
    val (ast, rest) = parseSeq(tokenize(s))
    require(rest.isEmpty, s"trailing tokens in template expr: $s")
    ast
  }

  /** Parse a function-call sequence `fn arg1 arg2 ...` or a single atom. */
  private def parseSeq(toks: List[String]): (Ast, List[String]) = {
    require(toks.nonEmpty, "empty template expr")
    val head = toks.head
    if (head.startsWith(".") || head.startsWith("\"") || head.forall(c => c.isDigit || c == '-')) {
      // single atom (possibly followed by nothing at this level)
      val (a, rest) = parseAtom(toks)
      (a, rest)
    } else {
      // function call: name then args until ')' or end
      var rest = toks.tail
      val args = scala.collection.mutable.ListBuffer.empty[Ast]
      while (rest.nonEmpty && rest.head != ")") {
        val (a, r) = parseAtom(rest)
        args += a
        rest = r
      }
      (Call(head, args.toList), rest)
    }
  }

  private def parseAtom(toks: List[String]): (Ast, List[String]) = toks match {
    case "(" :: rest =>
      val (a, r) = parseSeq(rest)
      require(r.nonEmpty && r.head == ")", "unbalanced ( in template expr")
      (a, r.tail)
    case t :: rest if t.startsWith(".") =>
      (Field(t.drop(1).split('.').toSeq.filter(_.nonEmpty)), rest)
    case t :: rest if t.startsWith("\"") =>
      (StrLit(t.substring(1, t.length - 1)), rest)
    case t :: rest if t.nonEmpty && t.forall(c => c.isDigit || c == '-') =>
      (NumLit(t.toLong), rest)
    case t :: rest => // zero-arg function used as atom (uuid / now)
      (Call(t, Nil), rest)
    case Nil => throw new IllegalArgumentException("empty atom")
  }

  // --- compile to Column ----------------------------------------------

  def fieldCol(path: Seq[String]): Column =
    path.tail.foldLeft(col(s"`${path.head}`"))((c, f) => c.getField(f))

  private def toCol(ast: Ast): Column = ast match {
    case Field(p) => fieldCol(p)
    case StrLit(v) => lit(v)
    case NumLit(v) => lit(v)
    case Call(fn, args) =>
      val a = args.map(toCol)
      fn match {
        case "upper" => upper(a.head)
        case "lower" => lower(a.head)
        case "trim" => trim(a.head)
        case "uuid" | "uuidv4" => expr("uuid()")
        case "now" => current_timestamp()
        case "tojson" | "toJson" => to_json(a.head)
        case "div" => floor(a(0).cast("double") / a(1).cast("double")).cast("long")
        case "mul" => a(0).cast("long") * a(1).cast("long")
        case "add" => a(0).cast("long") + a(1).cast("long")
        case "sub" => a(0).cast("long") - a(1).cast("long")
        case "mod" => a(0).cast("long") % a(1).cast("long")
        case "printf" =>
          args.head match {
            case StrLit(fmt) => format_string(fmt.replace("%d", "%s"), a.tail: _*)
            case _ => throw new IllegalArgumentException("printf needs literal format")
          }
        case other => throw new IllegalArgumentException(s"unsupported template function: $other")
      }
  }
}
