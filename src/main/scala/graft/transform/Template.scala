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
  *   - pipelines `[[ .f | default "x" | upper ]]` (piped value appended
  *     as the LAST argument, text/template semantics)
  *   - parenthesized calls: `[[ mul (div .__METADATA__record_index 1000) 1000 ]]`
  *     (the OSS sink's legacy batch-step split, ext/oss/sink.go:52-58)
  *   - string and integer literals
  *   - ~80 functions mirroring the sprig TxtFuncMap the reference
  *     registers (compiler.go:30-39): case/trim/prefix/suffix string
  *     ops, `default`/`empty`/`coalesce`/`ternary`, base64 + digests,
  *     regex (`regexMatch`/`regexFind`/`regexReplaceAll`/`regexSplit`),
  *     list ops (`list`/`splitList`/`join`/`first`/`rest`/`uniq`/
  *     `compact`/`append`/`has`/`without`/`until`/`seq`), integer and
  *     float arithmetic, Go-layout `date`/`toDate`/`dateModify`, plus
  *     `uuid`, `now`, `tojson`, `printf`, `env`.
  *
  * Every function exists in BOTH forms: compiled to a Column here and
  * mirrored in the driver-side [[render]] (`eval` below); TemplateSpec
  * pins parity between the two.
  */
object Template {

  sealed trait Ast
  case class Field(path: Seq[String]) extends Ast
  case class StrLit(v: String) extends Ast
  case class NumLit(v: Long) extends Ast
  case class Call(fn: String, args: Seq[Ast]) extends Ast

  /** Compile a template string into a single string-typed Column.
    * Sections with no record-field references and no per-row
    * nondeterminism constant-fold through the DRIVER evaluator — which
    * both collapses them to literals in the plan and makes every
    * driver-complete function (semver, adler32sum, …) available on the
    * Column path with zero divergence.
    */
  def compile(template: String): Column = {
    val parts = split2(template)
    val cols = parts.map {
      case Left(text) => lit(text)
      case Right(expr) =>
        val ast = parseExpr(expr)
        if (isConstant(ast)) lit(show(eval(ast, Map.empty)))
        else goStringCol(toCol(ast), ast)
    }
    if (cols.isEmpty) lit("")
    else if (cols.size == 1) cols.head
    else concat(cols: _*)
  }

  /** Per-row functions must not fold to one driver value. */
  private val perRowFns = Set("uuid", "uuidv4", "now")

  private def isConstant(ast: Ast): Boolean = ast match {
    case Field(_) => false
    case StrLit(_) | NumLit(_) => true
    case Call(fn, args) => !perRowFns(fn) && args.forall(isConstant)
  }

  /** Calls statically known to yield a list / a list of lists / a dict
    * — rendered Go-fmt style (`[a b]`, `map[k:v]`, key-sorted) so the
    * Column path prints what the driver `show` prints. Scalar sections
    * keep the plain string cast.
    */
  private val listFns = Set("list", "splitList", "sortAlpha", "uniq",
    "compact", "without", "append", "prepend", "rest", "initial",
    "until", "untilStep", "regexSplit", "keys", "values",
    "pluck", "slice", "regexFindAll") // NOT `seq` — sprig's seq yields a plain string
  private val dictFns = Set("dict", "merge", "mergeOverwrite", "pick",
    "omit", "set", "unset", "urlParse", "split", "splitn")

  private def goStringCol(c: Column, ast: Ast): Column = ast match {
    case Call("chunk", _) => // list of lists
      concat(lit("["), array_join(
        transform(c, inner => concat(lit("["),
          array_join(inner.cast("array<string>"), " "), lit("]"))), " "),
        lit("]"))
    case Call(fn, _) if listFns(fn) =>
      concat(lit("["), array_join(c.cast("array<string>"), " "), lit("]"))
    case Call(fn, _) if dictFns(fn) =>
      concat(lit("map["), array_join(
        transform(sort_array(map_entries(c)), e => concat_ws(":",
          e.getField("key").cast("string"), e.getField("value").cast("string"))),
        " "), lit("]"))
    case _ => c.cast("string")
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
    case m: Map[_, _] => // Go fmt prints maps key-sorted
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"$k:${show(x)}" }.mkString("map[", " ", "]")
    case it: Iterable[_] => it.map(show).mkString("[", " ", "]") // Go fmt.Sprint
    case arr: Array[_] => arr.map(show).mkString("[", " ", "]")
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
        case "mul" => a.map(asLong).reduce(_ * _)
        case "add" => a.map(asLong).reduce(_ + _)
        case "sub" => a.map(asLong).reduce(_ - _)
        case "mod" => asLong(a(0)) % asLong(a(1))
        case "add1" => asLong(a.head) + 1
        case "printf" =>
          args.head match {
            case StrLit(fmt) =>
              String.format(fmt.replace("%d", "%s"),
                a.tail.map(show): _*)
            case _ => throw new IllegalArgumentException("printf needs literal format")
          }

        // sprig subset — driver mirror of the Column forms below
        case "default" => if (isEmptyVal(a(1))) a(0) else a(1)
        case "coalesce" => a.find(v => !isEmptyVal(v)).orNull
        case "replace" => show(a(2)).replace(show(a(0)), show(a(1)))
        case "trunc" =>
          val n = asLong(a(0)).toInt
          val s = show(a(1))
          if (n >= 0) s.take(n) else s.takeRight(-n)
        case "substr" =>
          val s = show(a(2))
          s.substring(math.min(asLong(a(0)).toInt, s.length),
            math.min(asLong(a(1)).toInt, s.length))
        case "repeat" => show(a(1)) * asLong(a(0)).toInt
        case "title" => show(a.head).split(' ').map(w =>
          if (w.isEmpty) w else w.head.toUpper +: w.tail).mkString(" ")
        case "trimAll" =>
          val cut = show(a(0)).toSet
          show(a(1)).dropWhile(cut).reverse.dropWhile(cut).reverse
        case "trimPrefix" => show(a(1)).stripPrefix(show(a(0)))
        case "trimSuffix" => show(a(1)).stripSuffix(show(a(0)))
        case "contains" => show(a(1)).contains(show(a(0)))
        case "hasPrefix" => show(a(1)).startsWith(show(a(0)))
        case "hasSuffix" => show(a(1)).endsWith(show(a(0)))
        case "quote" => "\"" + show(a.head) + "\""
        case "squote" => "'" + show(a.head) + "'"
        case "b64enc" =>
          java.util.Base64.getEncoder.encodeToString(show(a.head).getBytes("UTF-8"))
        case "b64dec" =>
          new String(java.util.Base64.getDecoder.decode(show(a.head)), "UTF-8")
        case "sha256sum" => hexDigest("SHA-256", show(a.head))
        case "md5sum" => hexDigest("MD5", show(a.head))
        case "ternary" => if (truthy(a(2))) a(0) else a(1)
        case "max" => a.map(asLong).max
        case "min" => a.map(asLong).min
        case "ceil" => math.ceil(show(a.head).toDouble).toLong
        case "floor" => math.floor(show(a.head).toDouble).toLong
        case "round" => math.round(show(a.head).toDouble)
        case "nospace" => show(a.head).replaceAll("\\s", "")
        case "snakecase" => show(a.head)
          .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
          .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
          .replaceAll("[-\\s]+", "_").toLowerCase
        case "kebabcase" => show(a.head)
          .replaceAll("([A-Z]+)([A-Z][a-z])", "$1-$2")
          .replaceAll("([a-z0-9])([A-Z])", "$1-$2")
          .replaceAll("[_\\s]+", "-").toLowerCase
        case "abbrev" =>
          val n = asLong(a(0)).toInt
          val s = show(a(1))
          if (s.length <= n) s else s.take(n - 3) + "..."
        case "date" =>
          val fmt = new java.text.SimpleDateFormat(goLayoutToJava(show(a(0))))
          fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
          fmt.format(java.util.Date.from(toInstant(a(1))))
        case "toDate" =>
          val fmt = new java.text.SimpleDateFormat(goLayoutToJava(show(a(0))))
          fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
          fmt.parse(show(a(1))).toInstant
        case "dateModify" | "date_modify" =>
          toInstant(a(1)).plusSeconds(goDurationSeconds(show(a(0))))
        case "unixEpoch" => toInstant(a.head).getEpochSecond

        // type tests / conversions
        case "empty" => isEmptyVal(a.head)
        case "atoi" | "int" | "int64" => asLong(a.head)
        case "float64" => asDouble(a.head)
        case "toString" => show(a.head)

        // float math (sprig's *f family is variadic, reduced left)
        case "addf" => a.map(asDouble).reduce(_ + _)
        case "subf" => a.map(asDouble).reduce(_ - _)
        case "mulf" => a.map(asDouble).reduce(_ * _)
        case "divf" => a.map(asDouble).reduce(_ / _)
        case "maxf" => a.map(asDouble).max
        case "minf" => a.map(asDouble).min

        // lists
        case "list" => a
        case "splitList" =>
          show(a(1)).split(java.util.regex.Pattern.quote(show(a(0))), -1).toSeq
        case "join" => asSeq(a(1)).map(show).mkString(show(a(0)))
        case "sortAlpha" => asSeq(a.head).map(show).sorted
        case "reverse" => a.head match {
          case it: Iterable[_] => it.toSeq.reverse
          case s => show(s).reverse
        }
        case "uniq" => asSeq(a.head).distinct
        case "compact" => asSeq(a.head).filterNot(isEmptyVal)
        case "first" => asSeq(a.head).headOption.orNull
        case "last" => asSeq(a.head).lastOption.orNull
        case "rest" => asSeq(a.head).drop(1)
        case "initial" => asSeq(a.head).dropRight(1)
        case "append" => asSeq(a(0)) :+ a(1)
        case "prepend" => a(1) +: asSeq(a(0))
        case "concat" => a.flatMap(asSeq)
        case "has" => asSeq(a(1)).exists(x => show(x) == show(a(0)))
        case "without" =>
          asSeq(a(0)).filterNot(x => a.tail.exists(v => show(v) == show(x)))
        case "until" => (0L until asLong(a.head)).toSeq
        case "untilStep" =>
          (asLong(a(0)) until asLong(a(1)) by asLong(a(2))).toSeq
        case "seq" => (a.map(asLong) match {
          case Seq(e) => 1L to e
          case Seq(s, e) => s to e
          case Seq(s, st, e) => s to e by st // shell seq FIRST INCR LAST
        }).mkString(" ")

        // strings (round 4 additions)
        case "plural" => if (asLong(a(2)) == 1) a(0) else a(1)
        case "indent" => show(a(1)).split("\n", -1)
          .map((" " * asLong(a(0)).toInt) + _).mkString("\n")
        case "nindent" => "\n" + show(a(1)).split("\n", -1)
          .map((" " * asLong(a(0)).toInt) + _).mkString("\n")
        case "cat" => a.map(show).mkString(" ")
        case "camelcase" => show(a.head).split("[-_\\s]+")
          .map(w => if (w.isEmpty) w else w.head.toUpper +: w.tail.toLowerCase)
          .mkString
        case "initials" => show(a.head).split("\\s+")
          .collect { case w if w.nonEmpty => w.head }.mkString
        case "regexMatch" =>
          java.util.regex.Pattern.compile(show(a(0))).matcher(show(a(1))).find()
        case "regexFind" =>
          val m = java.util.regex.Pattern.compile(show(a(0))).matcher(show(a(1)))
          if (m.find()) m.group() else ""
        case "regexReplaceAll" =>
          show(a(1)).replaceAll(show(a(0)), goReplToJava(show(a(2))))
        case "regexSplit" =>
          show(a(1)).split(show(a(0)), asLong(a(2)).toInt).toSeq
        case "sha1sum" => hexDigest("SHA-1", show(a.head))
        case "sha512sum" => hexDigest("SHA-512", show(a.head))
        case "env" => sys.env.getOrElse(show(a.head), "")
        case "adler32sum" =>
          val ad = new java.util.zip.Adler32()
          ad.update(show(a.head).getBytes("UTF-8"))
          ad.getValue.toString
        case "deepCopy" => a.head // values here are immutable
        case "semver" =>
          val v = Semver.parse(show(a.head))
          Map("Major" -> v.major, "Minor" -> v.minor, "Patch" -> v.patch,
            "Prerelease" -> v.pre.mkString("."), "Metadata" -> v.meta,
            "Original" -> show(a.head))
        case "semverCompare" => Semver.matches(show(a(0)), show(a(1)))

        // --- dict family (sprig dict.go) -------------------------------
        case "dict" =>
          require(a.size % 2 == 0, "dict needs an even number of args")
          a.grouped(2).map { case Seq(k, v) => show(k) -> v }.toMap
        case "get" => asMap(a(0)).getOrElse(show(a(1)), "")
        case "set" => asMap(a(0)) + (show(a(1)) -> a(2))
        case "unset" => asMap(a(0)) - show(a(1))
        case "hasKey" => asMap(a(0)).contains(show(a(1)))
        case "keys" => a.flatMap(m => asMap(m).keys.toSeq)
        case "values" => a.flatMap(m => asMap(m).values.toSeq)
        case "pluck" =>
          val k = show(a.head)
          a.tail.flatMap(m => asMap(m).get(k))
        case "merge" =>
          // dst (first arg) wins on conflicts, like sprig's mergo call
          a.map(asMap).reverse.reduce(_ ++ _)
        case "mergeOverwrite" =>
          // later srcs win, sprig's mergo WithOverride
          a.map(asMap).reduce(_ ++ _)
        case "pick" =>
          val ks = a.tail.map(show).toSet
          asMap(a.head).filter { case (k, _) => ks(k) }
        case "omit" =>
          val ks = a.tail.map(show).toSet
          asMap(a.head).filter { case (k, _) => !ks(k) }
        case "dig" =>
          // dig k1 … kn default dict (sprig dict.go): walk nested maps
          require(a.size >= 3, "dig needs keys, a default, and a dict")
          val keys = a.dropRight(2).map(show)
          keys.foldLeft[Option[Any]](Some(asMap(a.last))) {
            case (Some(m: Map[_, _]), k) =>
              m.asInstanceOf[Map[String, Any]].get(k)
            case _ => None
          }.getOrElse(a(a.size - 2))
        // sprig defines all/any via empty(), not Go truthiness: any
        // non-empty string is true (sprig defaults.go)
        case "all" => a.forall(x => !isEmptyVal(x))
        case "any" => a.exists(x => !isEmptyVal(x))
        case "fromJson" => jsonParse(show(a.head))
        case "toPrettyJson" => toPrettyJsonString(a.head, "")
        case "b32enc" => new org.apache.commons.codec.binary.Base32()
          .encodeToString(show(a.head).getBytes("UTF-8"))
        case "b32dec" => new String(new org.apache.commons.codec.binary.Base32()
          .decode(show(a.head)), "UTF-8")

        case "chunk" =>
          val n = asLong(a(0)).toInt
          asSeq(a(1)).grouped(n).toSeq
        case "slice" => a match {
          case Seq(l) => asSeq(l)
          case Seq(l, from) => asSeq(l).drop(asLong(from).toInt)
          case Seq(l, from, to) =>
            asSeq(l).slice(asLong(from).toInt, asLong(to).toInt)
          case _ => throw new IllegalArgumentException("slice takes 1-3 args")
        }
        case "swapcase" => show(a.head).map(c =>
          if (c.isUpper) c.toLower else if (c.isLower) c.toUpper else c)
        case "untitle" => show(a.head).split(" ", -1).map(w =>
          if (w.isEmpty) w else s"${w.head.toLower}${w.tail}").mkString(" ")

        // --- round-8 breadth: date zones/durations, path, regex,
        // wrap, flow control (sprig strings.go/date.go/paths.go) -----
        case "dateInZone" =>
          val fmt = new java.text.SimpleDateFormat(goLayoutToJava(show(a(0))))
          fmt.setTimeZone(java.util.TimeZone.getTimeZone(show(a(2))))
          fmt.format(java.util.Date.from(toInstant(a(1))))
        case "htmlDate" =>
          val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
          fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
          fmt.format(java.util.Date.from(toInstant(a.head)))
        case "htmlDateInZone" =>
          val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
          fmt.setTimeZone(java.util.TimeZone.getTimeZone(show(a(1))))
          fmt.format(java.util.Date.from(toInstant(a.head)))
        case "duration" => goDurationString(asLong(a.head))
        case "durationRound" =>
          // largest non-zero unit only (sprig date.go: y/mo/d/h/m/s)
          val secs = a.head match {
            case n: Long => n
            case n: Int => n.toLong
            case s => goDurationSeconds(show(s))
          }
          val abs = math.abs(secs); val sign = if (secs < 0) "-" else ""
          if (abs >= 365L * 86400) s"$sign${abs / (365L * 86400)}y"
          else if (abs >= 30L * 86400) s"$sign${abs / (30L * 86400)}mo"
          else if (abs >= 86400) s"$sign${abs / 86400}d"
          else if (abs >= 3600) s"$sign${abs / 3600}h"
          else if (abs >= 60) s"$sign${abs / 60}m"
          else s"$sign${abs}s"
        case "base" | "osBase" => pathBase(show(a.head))
        case "dir" | "osDir" => pathDir(show(a.head))
        case "ext" | "osExt" =>
          val b = pathBase(show(a.head))
          val d = b.lastIndexOf('.')
          if (d < 0) "" else b.substring(d)
        case "clean" | "osClean" => pathClean(show(a.head))
        case "isAbs" | "osIsAbs" => show(a.head).startsWith("/")
        case "regexFindAll" =>
          val m = java.util.regex.Pattern.compile(show(a(0))).matcher(show(a(1)))
          val n = asLong(a(2)).toInt
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find() && (n < 0 || out.size < n)) out += m.group()
          out.toSeq
        case "regexReplaceAllLiteral" =>
          show(a(1)).replaceAll(show(a(0)),
            java.util.regex.Matcher.quoteReplacement(show(a(2))))
        case "regexQuoteMeta" => show(a.head)
          .replaceAll("([\\\\.+*?()|\\[\\]{}^$])", "\\\\$1")
        case "wrap" => wordWrap(show(a(1)), asLong(a(0)).toInt, "\n")
        case "wrapWith" => wordWrap(show(a(2)), asLong(a(0)).toInt, show(a(1)))
        case "toDecimal" =>
          try java.lang.Long.parseLong(show(a.head), 8)
          catch { case _: NumberFormatException => 0L }
        case "required" =>
          if (isEmptyVal(a(1)))
            throw new IllegalArgumentException(show(a(0)))
          else a(1)
        case "fail" => throw new IllegalArgumentException(show(a.head))
        case "urlJoin" =>
          val m = asMap(a.head)
          def part(k: String) = m.get(k).map(show).filter(_.nonEmpty)
          val auth = part("host").map(h =>
            part("userinfo").map(_ + "@").getOrElse("") + h)
          part("scheme").map(_ + "://").getOrElse("") +
            auth.getOrElse("") + part("path").getOrElse("") +
            part("query").map("?" + _).getOrElse("") +
            part("fragment").map("#" + _).getOrElse("")
        case "split" =>
          show(a(1)).split(java.util.regex.Pattern.quote(show(a(0))), -1)
            .zipWithIndex.map { case (s, i) => s"_$i" -> (s: Any) }.toMap
        case "splitn" =>
          show(a(2)).split(java.util.regex.Pattern.quote(show(a(0))),
            asLong(a(1)).toInt)
            .zipWithIndex.map { case (s, i) => s"_$i" -> (s: Any) }.toMap
        case "len" => a.head match {
          case null => 0L // not the length of the "<no value>" placeholder
          case it: Iterable[_] => it.size.toLong
          case m: Array[_] => m.length.toLong
          case s => show(s).length.toLong
        }
        case "kindOf" => kindOf(a.head)
        case "kindIs" => kindOf(a(1)) == show(a(0))
        case "urlParse" =>
          val u = new java.net.URI(show(a.head))
          Map(
            "scheme" -> Option(u.getScheme).getOrElse(""),
            "host" -> Option(u.getHost).getOrElse(""),
            "path" -> Option(u.getPath).getOrElse(""),
            "query" -> Option(u.getQuery).getOrElse(""),
            "fragment" -> Option(u.getFragment).getOrElse(""),
            "userinfo" -> Option(u.getUserInfo).getOrElse(""))

        case other => throw new IllegalArgumentException(s"unsupported template function: $other")
      }
  }

  /** Go time.Duration.String for whole seconds: 1h0m0s / 1m5s / 5s / 0s. */
  private def goDurationString(secs: Long): String = {
    val sign = if (secs < 0) "-" else ""
    val t = math.abs(secs)
    val (h, m, s) = (t / 3600, t % 3600 / 60, t % 60)
    if (h > 0) s"$sign${h}h${m}m${s}s"
    else if (m > 0) s"$sign${m}m${s}s"
    else s"$sign${s}s"
  }

  /** Go path.Base: strip trailing slashes, last element; "" → ".". */
  private def pathBase(p: String): String = {
    val t = p.reverse.dropWhile(_ == '/').reverse
    if (p.isEmpty) "."
    else if (t.isEmpty) "/"
    else t.substring(t.lastIndexOf('/') + 1)
  }

  /** Go path.Dir: Clean of everything before the final element. */
  private def pathDir(p: String): String = {
    val t = p.reverse.dropWhile(_ == '/').reverse
    val cut = t.lastIndexOf('/')
    if (cut < 0) "."
    else if (cut == 0) "/"
    else pathClean(t.substring(0, cut))
  }

  /** Go path.Clean: resolve //, ., .. lexically; "" → ".". */
  private def pathClean(p: String): String = {
    if (p.isEmpty) return "."
    val abs = p.startsWith("/")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    p.split('/').foreach {
      case "" | "." => ()
      case ".." =>
        if (out.nonEmpty && out.last != "..") out.remove(out.size - 1)
        else if (!abs) out += ".."
      case seg => out += seg
    }
    val joined = out.mkString("/")
    if (abs) "/" + joined
    else if (joined.isEmpty) "."
    else joined
  }

  /** Greedy word wrap at `width` columns (sprig's util.Wrap): words
    * longer than the width stand alone on their line.
    */
  private def wordWrap(s: String, width: Int, sep: String): String = {
    val words = s.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return s
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder(words.head)
    words.tail.foreach { w =>
      if (cur.length + 1 + w.length > width) { lines += cur.toString; cur.clear(); cur ++= w }
      else { cur += ' '; cur ++= w }
    }
    lines += cur.toString
    lines.mkString(sep)
  }

  /** sprig kindOf (Go reflect kinds for the template value model). */
  private def kindOf(v: Any): String = v match {
    case null => "invalid"
    case _: String => "string"
    case _: Long | _: Int => "int64"
    case _: Double | _: Float => "float64"
    case _: Boolean => "bool"
    case _: Map[_, _] => "map"
    case _: Iterable[_] | _: Array[_] => "slice"
    case _ => "invalid"
  }

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case null => Map.empty
    case other => sys.error(s"expected dict, got: $other")
  }

  private def asSeq(v: Any): Seq[Any] = v match {
    case it: Iterable[_] => it.toSeq
    case arr: Array[_] => arr.toSeq
    case null => Seq.empty
    case other => Seq(other)
  }

  private def asDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue
    case s: String => s.toDouble
    case null => sys.error("numeric template arg is missing")
    case other => other.toString.toDouble
  }

  /** Go regexp replacement `${1}` → Java `$1` (Java reserves `${...}`
    * for named groups).
    */
  private def goReplToJava(repl: String): String =
    repl.replaceAll("\\$\\{(\\d+)\\}", "\\$$1")

  private def isEmptyVal(v: Any): Boolean = v match {
    case null => true
    case "" => true
    case false => true
    case n: Number => n.doubleValue == 0.0
    case it: Iterable[_] => it.isEmpty
    case arr: Array[_] => arr.isEmpty
    case _ => false
  }

  private def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case null => false
    case s: String => s == "true"
    case n: Number => n.doubleValue != 0.0
    case _ => true
  }

  private def hexDigest(algo: String, s: String): String =
    java.security.MessageDigest.getInstance(algo)
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toInstant(v: Any): java.time.Instant = v match {
    case i: java.time.Instant => i
    case t: java.sql.Timestamp => t.toInstant
    case d: java.util.Date => d.toInstant
    case l: Long => java.time.Instant.ofEpochSecond(l)
    case s: String => java.time.Instant.parse(s)
    case other => sys.error(s"not a time value: $other")
  }

  /** JSON text → driver values (Map/List/String/Number/Boolean/null)
    * via the Jackson shipped with Spark.
    */
  private def jsonParse(s: String): Any = {
    import scala.jdk.CollectionConverters._
    def conv(v: Any): Any = v match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, x) => k.toString -> conv(x) }.toMap
      case l: java.util.List[_] => l.asScala.map(conv).toList
      case x => x
    }
    conv(new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(s, classOf[Object]))
  }

  /** Go `MarshalIndent`-style two-space pretty form of [[toJsonString]]
    * (keys sorted, close bracket at parent indent).
    */
  private def toPrettyJsonString(v: Any, indent: String): String = v match {
    case m: Map[_, _] if m.nonEmpty =>
      val in2 = indent + "  "
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) =>
          in2 + toJsonString(k) + ": " + toPrettyJsonString(x, in2) }
        .mkString("{\n", ",\n", "\n" + indent + "}")
    case it: Iterable[_] if it.nonEmpty =>
      val in2 = indent + "  "
      it.map(x => in2 + toPrettyJsonString(x, in2))
        .mkString("[\n", ",\n", "\n" + indent + "]")
    case other => toJsonString(other)
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
        case '|' => out += "|"; i += 1
        case '"' =>
          val end = s.indexOf('"', i + 1)
          require(end >= 0, s"unterminated string in template expr: $s")
          out += s.substring(i, end + 1)
          i = end + 1
        case _ =>
          val start = i
          while (i < s.length && !s(i).isWhitespace && s(i) != '(' && s(i) != ')'
            && s(i) != '|') i += 1
          out += s.substring(start, i)
      }
    }
    out.toList
  }

  private[transform] def parseExpr(s: String): Ast = {
    val (ast, rest) = parsePipeline(tokenize(s))
    require(rest.isEmpty, s"trailing tokens in template expr: $s")
    ast
  }

  /** Go-template pipelines: `a | fn args | fn2` desugars to
    * `fn2 (fn args a)` — the piped value is appended as the LAST
    * argument (text/template semantics, which is how sprig is used:
    * `[[ .f | default "x" | upper ]]`).
    */
  private def parsePipeline(toks: List[String]): (Ast, List[String]) = {
    var (ast, rest) = parseSeq(toks)
    while (rest.nonEmpty && rest.head == "|") {
      rest = rest.tail
      require(rest.nonEmpty, "dangling | in template expr")
      val fn = rest.head
      rest = rest.tail
      val args = scala.collection.mutable.ListBuffer.empty[Ast]
      while (rest.nonEmpty && rest.head != ")" && rest.head != "|") {
        val (a, r) = parseAtom(rest)
        args += a
        rest = r
      }
      ast = Call(fn, args.toList :+ ast)
    }
    (ast, rest)
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
      // function call: name then args until ')', '|' or end
      var rest = toks.tail
      val args = scala.collection.mutable.ListBuffer.empty[Ast]
      while (rest.nonEmpty && rest.head != ")" && rest.head != "|") {
        val (a, r) = parseAtom(rest)
        args += a
        rest = r
      }
      (Call(head, args.toList), rest)
    }
  }

  private def parseAtom(toks: List[String]): (Ast, List[String]) = toks match {
    case "(" :: rest =>
      val (a, r) = parsePipeline(rest)
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

  /** Column mirror of [[isEmptyVal]] (sprig emptiness: null, "", false,
    * numeric 0, empty list/map). The compiler has no schema, so the
    * typed checks gate on `typeof(c)` — a per-type constant — and test
    * the universally-castable STRING form: a string "0" keeps
    * typeof=string and is NOT empty (ids stay safe), while int/double 0
    * renders "0"/"0.0" under a numeric typeof and is.
    */
  private def isEmptyCol(c: Column): Column = {
    val t = call_function("typeof", c)
    val s = c.cast("string")
    val numericT = t.isin("tinyint", "smallint", "int", "bigint",
      "float", "double").or(t.startsWith("decimal"))
    val containerT = t.startsWith("array").or(t.startsWith("map"))
    c.isNull
      .or(s === "")
      .or(numericT.and(regexp_like(s, lit("^-?0+(\\.0+)?$"))))
      .or(t === "boolean" && s === "false")
      .or(containerT.and(s.isin("[]", "{}")))
  }

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
        case "mul" => a.map(_.cast("long")).reduce(_ * _)
        case "add" => a.map(_.cast("long")).reduce(_ + _)
        case "sub" => a.map(_.cast("long")).reduce(_ - _)
        case "mod" => a(0).cast("long") % a(1).cast("long")
        case "add1" => a.head.cast("long") + 1
        case "printf" =>
          args.head match {
            case StrLit(fmt) => format_string(fmt.replace("%d", "%s"), a.tail: _*)
            case _ => throw new IllegalArgumentException("printf needs literal format")
          }

        // --- sprig subset (reference compiler.go:30-39 registers the
        // full sprig TxtFuncMap; these are the functions that appear in
        // sink/source config templates). Argument order follows sprig
        // (piped value LAST): `default d v`, `replace old new s`,
        // `trunc n s`, `date layout t`, ...
        // sprig emptiness (typed, via isEmptyCol's typeof gate) so the
        // Column path agrees with the driver mirror on 0/false/[].
        // Branches are string-typed: ANSI CaseWhen coercion would
        // otherwise runtime-cast a string fallback to the field's type
        // (`false | default "d"` → cast error); templates render to
        // text anyway and downstream numeric fns re-cast explicitly.
        case "default" =>
          when(isEmptyCol(a(1)), a(0).cast("string"))
            .otherwise(a(1).cast("string"))
        case "coalesce" =>
          coalesce(a.map(c =>
            when(isEmptyCol(c), lit(null)).otherwise(c.cast("string"))): _*)
        case "replace" => call_function("replace", a(2), a(0), a(1))
        case "trunc" => args.head match {
          case NumLit(n) if n >= 0 => substring(a(1), 1, n.toInt)
          case NumLit(n) => substring(a(1), n.toInt, -n.toInt) // last -n chars
          case _ => throw new IllegalArgumentException("trunc needs literal length")
        }
        case "substr" => (args(0), args(1)) match {
          case (NumLit(st), NumLit(en)) => substring(a(2), st.toInt + 1, (en - st).toInt)
          case _ => throw new IllegalArgumentException("substr needs literal bounds")
        }
        case "repeat" => args.head match {
          case NumLit(n) => repeat(a(1), n.toInt)
          case _ => throw new IllegalArgumentException("repeat needs literal count")
        }
        case "title" => initcap(a.head)
        case "trimAll" => args.head match {
          case StrLit(cut) => trim(a(1), cut)
          case _ => throw new IllegalArgumentException("trimAll needs literal cutset")
        }
        case "trimPrefix" => args.head match {
          case StrLit(p) => when(a(1).startsWith(p),
            a(1).substr(lit(p.length + 1), length(a(1)))).otherwise(a(1))
          case _ => throw new IllegalArgumentException("trimPrefix needs literal prefix")
        }
        case "trimSuffix" => args.head match {
          case StrLit(p) => when(a(1).endsWith(p),
            a(1).substr(lit(1), length(a(1)) - p.length)).otherwise(a(1))
          case _ => throw new IllegalArgumentException("trimSuffix needs literal suffix")
        }
        case "contains" => a(1).contains(a(0))
        case "hasPrefix" => a(1).startsWith(a(0))
        case "hasSuffix" => a(1).endsWith(a(0))
        case "quote" => concat(lit("\""), a.head.cast("string"), lit("\""))
        case "squote" => concat(lit("'"), a.head.cast("string"), lit("'"))
        case "b64enc" => base64(a.head.cast("binary"))
        case "b64dec" => unbase64(a.head).cast("string")
        case "sha256sum" => sha2(a.head.cast("binary"), 256)
        case "md5sum" => md5(a.head.cast("binary"))
        case "ternary" => when(a(2).cast("boolean"), a(0)).otherwise(a(1))
        case "max" => greatest(a.map(_.cast("long")): _*)
        case "min" => least(a.map(_.cast("long")): _*)
        case "ceil" => ceil(a.head.cast("double"))
        case "floor" => floor(a.head.cast("double"))
        case "round" => round(a.head.cast("double")).cast("long")
        case "nospace" => regexp_replace(a.head, "\\s", "")
        case "snakecase" => lower(regexp_replace(regexp_replace(
          regexp_replace(a.head, "([A-Z]+)([A-Z][a-z])", "$1_$2"),
          "([a-z0-9])([A-Z])", "$1_$2"), "[-\\s]+", "_"))
        case "kebabcase" => lower(regexp_replace(regexp_replace(
          regexp_replace(a.head, "([A-Z]+)([A-Z][a-z])", "$1-$2"),
          "([a-z0-9])([A-Z])", "$1-$2"), "[_\\s]+", "-"))
        case "abbrev" => args.head match {
          case NumLit(n) => when(length(a(1)) <= n.toInt, a(1))
            .otherwise(concat(substring(a(1), 1, n.toInt - 3), lit("...")))
          case _ => throw new IllegalArgumentException("abbrev needs literal width")
        }
        case "date" => args.head match {
          case StrLit(layout) => date_format(a(1), goLayoutToJava(layout))
          case _ => throw new IllegalArgumentException("date needs literal layout")
        }
        case "toDate" => args.head match {
          case StrLit(layout) => to_timestamp(a(1), goLayoutToJava(layout))
          case _ => throw new IllegalArgumentException("toDate needs literal layout")
        }
        case "dateModify" | "date_modify" => args.head match {
          case StrLit(dur) =>
            a(1) + expr(s"INTERVAL '${goDurationSeconds(dur)}' SECOND")
          case _ => throw new IllegalArgumentException("dateModify needs literal duration")
        }
        case "unixEpoch" => unix_timestamp(a.head)

        // type tests / conversions
        case "empty" => isEmptyCol(a.head)
        case "atoi" | "int" | "int64" => a.head.cast("long")
        case "float64" => a.head.cast("double")
        case "toString" => a.head.cast("string")

        // float math
        case "addf" => a.map(_.cast("double")).reduce(_ + _)
        case "subf" => a.map(_.cast("double")).reduce(_ - _)
        case "mulf" => a.map(_.cast("double")).reduce(_ * _)
        case "divf" => a.map(_.cast("double")).reduce(_ / _)
        case "maxf" => greatest(a.map(_.cast("double")): _*)
        case "minf" => least(a.map(_.cast("double")): _*)

        // lists (intermediate array Columns; a terminal list renders via
        // cast-to-string — pipe through `join` for Go-identical output)
        case "list" => array(a: _*)
        case "splitList" => args.head match {
          case StrLit(sep) => split(a(1), java.util.regex.Pattern.quote(sep), -1)
          case _ => throw new IllegalArgumentException("splitList needs literal separator")
        }
        case "join" => args.head match {
          case StrLit(sep) => array_join(a(1).cast("array<string>"), sep)
          case _ => throw new IllegalArgumentException("join needs literal separator")
        }
        case "sortAlpha" => sort_array(a.head.cast("array<string>"))
        case "reverse" => reverse(a.head)
        case "uniq" => array_distinct(a.head)
        case "compact" => filter(a.head, x => !isEmptyCol(x))
        case "first" => get(a.head, lit(0))
        case "last" => get(a.head, size(a.head) - 1)
        case "rest" => slice(a.head, lit(2), greatest(size(a.head) - 1, lit(0)))
        case "initial" => slice(a.head, lit(1), greatest(size(a.head) - 1, lit(0)))
        case "append" => concat(a(0), array(a(1)))
        case "prepend" => concat(array(a(1)), a(0))
        case "concat" => concat(a: _*)
        case "has" => array_contains(a(1), a(0))
        // NOT array_except: sprig's without preserves duplicates among
        // survivors; array_except would dedupe them
        case "without" =>
          filter(a(0), x => !coalesce(x.isin(a.tail: _*), lit(false)))
        case "until" => args.head match {
          case NumLit(n) => typedLit((0L until n).toSeq)
          case _ => throw new IllegalArgumentException("until needs literal bound")
        }
        case "untilStep" => args match {
          case Seq(NumLit(s), NumLit(e), NumLit(st)) =>
            typedLit((s until e by st).toSeq)
          case _ => throw new IllegalArgumentException("untilStep needs literal bounds")
        }
        case "seq" => args match {
          case Seq(NumLit(e)) => lit((1L to e).mkString(" "))
          case Seq(NumLit(s), NumLit(e)) => lit((s to e).mkString(" "))
          case Seq(NumLit(s), NumLit(st), NumLit(e)) =>
            lit((s to e by st).mkString(" "))
          case _ => throw new IllegalArgumentException("seq needs literal bounds")
        }

        // strings (round 4 additions)
        case "plural" => when(a(2).cast("long") === 1, a(0)).otherwise(a(1))
        case "indent" => args.head match {
          case NumLit(n) => regexp_replace(a(1), "(?m)^", " " * n.toInt)
          case _ => throw new IllegalArgumentException("indent needs literal width")
        }
        case "nindent" => args.head match {
          case NumLit(n) =>
            concat(lit("\n"), regexp_replace(a(1), "(?m)^", " " * n.toInt))
          case _ => throw new IllegalArgumentException("nindent needs literal width")
        }
        case "cat" => concat_ws(" ", a.map(_.cast("string")): _*)
        case "camelcase" => array_join(
          transform(split(a.head, "[-_\\s]+"), w => initcap(w)), "")
        case "initials" => array_join(
          transform(split(a.head, "\\s+"), w => w.substr(1, 1)), "")
        case "regexMatch" => args.head match {
          case StrLit(p) => a(1).rlike(p)
          case _ => throw new IllegalArgumentException("regexMatch needs literal pattern")
        }
        case "regexFind" => args.head match {
          case StrLit(p) => regexp_extract(a(1), p, 0)
          case _ => throw new IllegalArgumentException("regexFind needs literal pattern")
        }
        case "regexReplaceAll" => (args.head, args(2)) match {
          case (StrLit(p), StrLit(r)) => regexp_replace(a(1), p, goReplToJava(r))
          case _ => throw new IllegalArgumentException(
            "regexReplaceAll needs literal pattern and replacement")
        }
        case "regexSplit" => (args.head, args(2)) match {
          case (StrLit(p), NumLit(n)) => split(a(1), p, n.toInt)
          case _ => throw new IllegalArgumentException(
            "regexSplit needs literal pattern and count")
        }
        case "sha1sum" => sha1(a.head.cast("binary"))
        case "sha512sum" => sha2(a.head.cast("binary"), 512)
        case "env" => args.head match {
          case StrLit(n) => lit(sys.env.getOrElse(n, ""))
          case _ => throw new IllegalArgumentException("env needs literal name")
        }

        case "deepCopy" => a.head // Column values are immutable
        case "adler32sum" | "semver" | "semverCompare" | "dig" | "fromJson" |
            "toPrettyJson" | "b32enc" | "b32dec" =>
          throw new IllegalArgumentException(s"$fn is driver-complete: on " +
            "the Column path it constant-folds with literal args only " +
            "(record-field args are not supported)")

        // --- dict family over MapType columns --------------------------
        case "dict" =>
          require(a.size % 2 == 0, "dict needs an even number of args")
          map(a.grouped(2).flatMap { case Seq(k, v) =>
            Seq(k.cast("string"), v) }.toSeq: _*)
        case "get" =>
          coalesce(try_element_at(a(0), a(1).cast("string")).cast("string"), lit(""))
        case "set" => map_concat(
          map_filter(a(0), (k, _) => k =!= a(1).cast("string")),
          map(a(1).cast("string"), a(2)))
        case "unset" => map_filter(a(0), (k, _) => k =!= a(1).cast("string"))
        case "hasKey" => map_contains_key(a(0), a(1).cast("string"))
        case "keys" => concat(a.map(map_keys): _*)
        case "values" => concat(a.map(map_values): _*)
        case "pluck" =>
          filter(array(a.tail.map(d =>
            try_element_at(d, a.head.cast("string"))): _*), _.isNotNull)
        case "merge" =>
          // dst (first arg) wins — drop src keys the accumulator has
          a.reduceLeft((dst, src) => map_concat(dst,
            map_filter(src, (k, _) => !map_contains_key(dst, k))))
        case "mergeOverwrite" =>
          // later srcs win
          a.reduceLeft((dst, src) => map_concat(
            map_filter(dst, (k, _) => !map_contains_key(src, k)), src))
        case "pick" =>
          if (a.tail.isEmpty) map_filter(a.head, (_, _) => lit(false))
          else map_filter(a.head, (k, _) =>
            a.tail.map(t => k === t.cast("string")).reduce(_ || _))
        case "omit" =>
          if (a.tail.isEmpty) a.head
          else map_filter(a.head, (k, _) =>
            a.tail.map(t => k =!= t.cast("string")).reduce(_ && _))
        // mirror the driver path's sprig empty() semantics
        case "all" => a.map(x => !isEmptyCol(x)).reduce(_ && _)
        case "any" => a.map(x => !isEmptyCol(x)).reduce(_ || _)

        case "chunk" =>
          val n = a(0).cast("int")
          val arr = a(1)
          filter(
            transform(
              sequence(lit(0), greatest(
                ceil(size(arr).cast("double") / n).cast("long") - 1, lit(0))),
              i => slice(arr, (i.cast("int") * n + 1), n)),
            c => size(c) > 0)
        case "slice" => a match {
          case Seq(l) => l
          case Seq(l, from) =>
            slice(l, from.cast("int") + 1, greatest(size(l) - from.cast("int"), lit(0)))
          case Seq(l, from, to) =>
            slice(l, from.cast("int") + 1, greatest(to.cast("int") - from.cast("int"), lit(0)))
          case _ => throw new IllegalArgumentException("slice takes 1-3 args")
        }
        case "swapcase" => array_join(
          transform(split(a.head.cast("string"), ""),
            c => when(c === upper(c), lower(c)).otherwise(upper(c))), "")
        case "untitle" => array_join(
          transform(split(a.head.cast("string"), " ", -1),
            w => concat(lower(substring(w, 1, 1)), substring(w, 2, Int.MaxValue))), " ")
        case "urlParse" =>
          val u = a.head.cast("string")
          def part(p: String) = coalesce(parse_url(u, lit(p)), lit(""))
          map(
            lit("scheme"), part("PROTOCOL"),
            lit("host"), part("HOST"),
            lit("path"), part("PATH"),
            lit("query"), part("QUERY"),
            lit("fragment"), part("REF"),
            lit("userinfo"), part("USERINFO"))

        // --- round-8 breadth (mirrors of the driver forms above) -------
        case "dateInZone" => (args(0), args(2)) match {
          case (StrLit(layout), StrLit(tz)) =>
            date_format(from_utc_timestamp(a(1), tz), goLayoutToJava(layout))
          case _ => throw new IllegalArgumentException(
            "dateInZone needs literal layout and zone")
        }
        case "htmlDate" => date_format(a.head, "yyyy-MM-dd")
        case "htmlDateInZone" => args(1) match {
          case StrLit(tz) => date_format(from_utc_timestamp(a(0), tz), "yyyy-MM-dd")
          case _ => throw new IllegalArgumentException("htmlDateInZone needs literal zone")
        }
        case "duration" =>
          // Go time.Duration.String for whole seconds (sign carried)
          val secs = a.head.cast("long")
          val t = abs(secs)
          val sign = when(secs < 0, lit("-")).otherwise(lit(""))
          val h = (t / 3600).cast("long"); val m = (t % 3600 / 60).cast("long")
          val s = (t % 60).cast("long")
          concat(sign,
            when(h > 0, concat(h, lit("h"), m, lit("m"), s, lit("s")))
              .when(m > 0, concat(m, lit("m"), s, lit("s")))
              .otherwise(concat(s, lit("s"))))
        case "durationRound" =>
          // numeric seconds on the Column path; duration STRINGS fold
          // with literal args (driver mirror parses them)
          val secs = a.head.cast("long")
          val t = abs(secs)
          val sign = when(secs < 0, lit("-")).otherwise(lit(""))
          concat(sign,
            when(t >= 365L * 86400, concat((t / (365L * 86400)).cast("long"), lit("y")))
              .when(t >= 30L * 86400, concat((t / (30L * 86400)).cast("long"), lit("mo")))
              .when(t >= 86400, concat((t / 86400).cast("long"), lit("d")))
              .when(t >= 3600, concat((t / 3600).cast("long"), lit("h")))
              .when(t >= 60, concat((t / 60).cast("long"), lit("m")))
              .otherwise(concat(t.cast("long"), lit("s"))))
        case "base" | "osBase" =>
          val p = a.head.cast("string")
          val t = regexp_replace(p, "/+$", "")
          when(p === "", lit("."))
            .when(t === "", lit("/"))
            .otherwise(substring_index(t, "/", -1))
        case "dir" | "osDir" =>
          // assumes already-clean input on the Column path (the driver
          // mirror runs full Go path.Clean; literal args fold there)
          val p = a.head.cast("string")
          val t = regexp_replace(p, "/+$", "")
          val cut = regexp_replace(t, "/[^/]*$", "")
          when(!t.contains("/"), lit("."))
            .when(cut === "", lit("/"))
            .otherwise(cut)
        case "ext" | "osExt" =>
          val p = a.head.cast("string")
          val t = regexp_replace(p, "/+$", "")
          val b = when(t === "", lit("/")).otherwise(substring_index(t, "/", -1))
          when(b.contains("."), regexp_extract(b, "(\\.[^.]*)$", 1)).otherwise(lit(""))
        case "isAbs" | "osIsAbs" => a.head.cast("string").startsWith("/")
        case "regexFindAll" => (args(0), args(2)) match {
          case (StrLit(pat), NumLit(n)) =>
            val all = regexp_extract_all(a(1), lit(pat), lit(0))
            if (n < 0) all else slice(all, 1, n.toInt)
          case _ => throw new IllegalArgumentException(
            "regexFindAll needs literal pattern and count")
        }
        case "regexReplaceAllLiteral" => (args(0), args(2)) match {
          case (StrLit(pat), StrLit(repl)) => regexp_replace(a(1), pat,
            java.util.regex.Matcher.quoteReplacement(repl))
          case _ => throw new IllegalArgumentException(
            "regexReplaceAllLiteral needs literal pattern and replacement")
        }
        case "regexQuoteMeta" =>
          regexp_replace(a.head, "([\\\\.+*?()|\\[\\]{}^$])", "\\\\$1")
        case "toDecimal" => conv(a.head, 8, 10).cast("long")
        case "required" => args.head match {
          case StrLit(msg) =>
            when(isEmptyCol(a(1)), raise_error(lit(msg)))
              .otherwise(a(1).cast("string"))
          case _ => throw new IllegalArgumentException("required needs a literal message")
        }
        case "fail" => raise_error(a.head.cast("string"))
        case "urlJoin" =>
          def p(k: String) = coalesce(
            try_element_at(a.head, lit(k)).cast("string"), lit(""))
          concat(
            when(p("scheme") =!= "", concat(p("scheme"), lit("://"))).otherwise(lit("")),
            when(p("userinfo") =!= "" && p("host") =!= "",
              concat(p("userinfo"), lit("@"))).otherwise(lit("")),
            p("host"), p("path"),
            when(p("query") =!= "", concat(lit("?"), p("query"))).otherwise(lit("")),
            when(p("fragment") =!= "", concat(lit("#"), p("fragment"))).otherwise(lit("")))
        case "split" | "splitn" =>
          val (sepAst, nLim, subject) =
            if (fn == "split") (args(0), -1, a(1))
            else (args(0), args(1) match {
              case NumLit(n) => n.toInt
              case _ => throw new IllegalArgumentException("splitn needs literal count")
            }, a(2))
          val sep = sepAst match {
            case StrLit(s) => s
            case _ => throw new IllegalArgumentException(s"$fn needs literal separator")
          }
          val parts = split(subject.cast("string"),
            java.util.regex.Pattern.quote(sep), nLim)
          map_from_arrays(
            transform(sequence(lit(0), size(parts) - 1),
              i => concat(lit("_"), i.cast("string"))), parts)
        case "len" =>
          val isContainer = args.head match {
            case Call(f, _) if listFns(f) || dictFns(f) || f == "chunk" => true
            case _ => false
          }
          if (isContainer) size(a.head).cast("long")
          else {
            // a container-typed record FIELD can't be measured here
            // (size() needs a statically-array/map column, which a
            // generic template compiler doesn't see) — fail loudly at
            // runtime instead of returning the stringified length,
            // which would silently diverge from the driver mirror
            val t = call_function("typeof", a.head)
            when(t.startsWith("array").or(t.startsWith("map")),
              raise_error(lit("len of a container-typed record field is " +
                "driver-complete; render via the driver path")))
              .otherwise(length(a.head.cast("string")).cast("long"))
          }
        case "kindOf" => kindOfCol(a.head)
        case "kindIs" => kindOfCol(a(1)) === a(0).cast("string")
        case "wrap" | "wrapWith" | "clean" | "osClean" =>
          throw new IllegalArgumentException(s"$fn is driver-complete: on " +
            "the Column path it constant-folds with literal args only " +
            "(record-field args are not supported)")

        case other => throw new IllegalArgumentException(s"unsupported template function: $other")
      }
  }

  /** sprig kindOf over a Column, via typeof (mirrors the driver map). */
  private def kindOfCol(c: Column): Column = {
    val t = call_function("typeof", c)
    when(t === "string", "string")
      .when(t.isin("tinyint", "smallint", "int", "bigint"), "int64")
      .when(t.isin("float", "double") || t.startsWith("decimal"), "float64")
      .when(t === "boolean", "bool")
      .when(t.startsWith("map"), "map")
      .when(t.startsWith("array"), "slice")
      .otherwise("invalid")
  }

  // --- sprig/Go helpers -------------------------------------------------

  /** Go reference-time layout → java.time pattern (the tokens that
    * occur in real templates; unknown letter runs are quoted through).
    */
  private[graft] def goLayoutToJava(layout: String): String = {
    val tokens: Seq[(String, String)] = Seq(
      "2006" -> "yyyy", "January" -> "MMMM", "Jan" -> "MMM",
      "Monday" -> "EEEE", "Mon" -> "EEE", ".000000" -> ".SSSSSS",
      ".000" -> ".SSS", "Z07:00" -> "XXX", "-07:00" -> "XXX",
      "-0700" -> "Z", "MST" -> "zzz", "15" -> "HH", "01" -> "MM",
      "02" -> "dd", "03" -> "hh", "04" -> "mm", "05" -> "ss",
      "PM" -> "a", "pm" -> "a")
    val sb = new StringBuilder
    var i = 0
    while (i < layout.length) {
      tokens.find { case (go, _) => layout.startsWith(go, i) } match {
        case Some((go, java)) => sb ++= java; i += go.length
        case None =>
          val c = layout(i)
          if (c.isLetter) sb ++= s"'$c'" else if (c == '\'') sb ++= "''" else sb += c
          i += 1
      }
    }
    sb.toString.replace("''''", "''") // collapse adjacent quoted letters
  }

  /** Go duration string ("1h30m", "-15m", "90s") → whole seconds. */
  private[graft] def goDurationSeconds(d: String): Long = {
    val neg = d.startsWith("-")
    val m = java.util.regex.Pattern.compile("(\\d+)(h|ms|m|s)").matcher(d)
    var secs = 0L
    while (m.find()) {
      val n = m.group(1).toLong
      secs += (m.group(2) match {
        case "h" => n * 3600
        case "m" => n * 60
        case "s" => n
        case "ms" => n / 1000
      })
    }
    if (neg) -secs else secs
  }
}
