package graft.transform

/** Semantic-version parsing and constraint matching for the sprig
  * `semver` / `semverCompare` template functions (the public
  * Masterminds/semver surface sprig wraps).
  *
  * Supported constraint grammar: `||`-separated OR groups of
  * space/comma-separated AND terms; each term is
  * `[op]version` with op ∈ {=, !=, >, <, >=, <=, ^, ~} and wildcard
  * components `x`/`X`/`*`. Precedence follows semver 2.0: numeric
  * triple first, then prerelease (absent > present; identifiers
  * compare numerically when both numeric, else ASCII); build metadata
  * is ignored.
  */
object Semver {

  case class V(major: Long, minor: Long, patch: Long,
      pre: Seq[String], meta: String) {
    def triple: (Long, Long, Long) = (major, minor, patch)
  }

  def parse(s0: String): V = {
    val s1 = s0.trim.stripPrefix("v")
    val (core, meta) = s1.indexOf('+') match {
      case -1 => (s1, "")
      case i => (s1.substring(0, i), s1.substring(i + 1))
    }
    val (nums, pre) = core.indexOf('-') match {
      case -1 => (core, Seq.empty[String])
      case i => (core.substring(0, i), core.substring(i + 1).split('.').toSeq)
    }
    val parts = nums.split('.')
    def num(i: Int): Long =
      if (i < parts.length && parts(i).nonEmpty) parts(i).toLong else 0L
    V(num(0), num(1), num(2), pre, meta)
  }

  /** semver 2.0 §11 precedence. */
  def compare(a: V, b: V): Int = {
    val t = implicitly[Ordering[(Long, Long, Long)]].compare(a.triple, b.triple)
    if (t != 0) return t
    (a.pre.isEmpty, b.pre.isEmpty) match {
      case (true, true) => 0
      case (true, false) => 1 // release > prerelease
      case (false, true) => -1
      case _ =>
        a.pre.zip(b.pre).foreach { case (x, y) =>
          val c =
            if (x.forall(_.isDigit) && y.forall(_.isDigit)) x.toLong.compare(y.toLong)
            else if (x.forall(_.isDigit)) -1 // numeric < alphanumeric
            else if (y.forall(_.isDigit)) 1
            else x.compare(y)
          if (c != 0) return c
        }
        a.pre.length.compare(b.pre.length)
    }
  }

  /** `semverCompare constraint version` (sprig arg order). */
  def matches(constraint: String, version: String): Boolean = {
    val v = parse(version)
    constraint.split("\\|\\|").exists { group =>
      val terms = group.trim.split("[,\\s]+").filter(_.nonEmpty)
      terms.nonEmpty && terms.forall(matchTerm(_, v))
    }
  }

  private def wildcard(s: String): Boolean =
    s == "x" || s == "X" || s == "*"

  private def matchTerm(term: String, v: V): Boolean = {
    val (op, rest) = term match {
      case t if t.startsWith(">=") || t.startsWith("<=") || t.startsWith("!=") =>
        (t.substring(0, 2), t.substring(2))
      case t if "><=^~".contains(t.head.toString) => (t.head.toString, t.tail)
      case t => ("=", t)
    }
    val spec = rest.trim.stripPrefix("v")
    // Masterminds rule: a prerelease version only matches terms that
    // themselves carry a prerelease; ">=1.0.0" does NOT admit
    // "1.1.0-alpha". The hyphen must sit BEFORE any build metadata —
    // ">=1.0.0+build-1" carries no prerelease.
    if (v.pre.nonEmpty && !spec.takeWhile(_ != '+').contains('-')) return false
    if (wildcard(spec) || spec.isEmpty) return true
    // wildcard / partial versions define a [lo, hi) range
    val core = spec.takeWhile(c => c != '-' && c != '+')
    val comps = core.split('.').toSeq
    val known = comps.takeWhile(c => !wildcard(c))
    // parse(spec) only when no wildcard components remain — "1.2.x" must
    // lower-bound as 1.2.0, not crash on "x".toLong
    val lo =
      if (known.size == comps.size) parse(spec)
      else parse((known ++ Seq.fill(math.max(0, 3 - known.size))("0")).mkString("."))
    def upperAfter(idx: Int): V = known.take(idx) match {
      case Seq() => V(Long.MaxValue, 0, 0, Nil, "")
      case Seq(ma) => V(ma.toLong + 1, 0, 0, Nil, "")
      case Seq(ma, mi) => V(ma.toLong, mi.toLong + 1, 0, Nil, "")
      case s => V(s(0).toLong, s(1).toLong, s(2).toLong + 1, Nil, "")
    }
    op match {
      case ">" =>
        if (known.size < 3) compare(v, upperAfter(known.size)) >= 0
        else compare(v, lo) > 0
      case "<" => compare(v, lo) < 0
      case ">=" => compare(v, lo) >= 0
      case "<=" =>
        if (known.size < 3) compare(v, upperAfter(known.size)) < 0
        else compare(v, lo) <= 0
      case "!=" =>
        if (known.size < 3) compare(v, lo) < 0 || compare(v, upperAfter(known.size)) >= 0
        else compare(v, lo) != 0
      case "=" =>
        if (known.size < 3) compare(v, lo) >= 0 && compare(v, upperAfter(known.size)) < 0
        else compare(v, lo) == 0
      case "~" =>
        // ~1.2.3 → [1.2.3, 1.3.0); ~1.2 → [1.2, 1.3); ~1 → [1, 2)
        val hi =
          if (known.size <= 1) V(lo.major + 1, 0, 0, Nil, "")
          else V(lo.major, lo.minor + 1, 0, Nil, "")
        compare(v, lo) >= 0 && compare(v, hi) < 0
      case "^" =>
        // compatible within the leftmost nonzero component
        val hi =
          if (lo.major > 0 || known.size <= 1) V(lo.major + 1, 0, 0, Nil, "")
          else if (lo.minor > 0 || known.size == 2) V(0, lo.minor + 1, 0, Nil, "")
          else V(0, 0, lo.patch + 1, Nil, "")
        compare(v, lo) >= 0 && compare(v, hi) < 0
      case _ => false
    }
  }
}
