package graft.functions

/** Required-literal-span extraction from a regex — the analysis behind
  * pg_trgm's regex index support (and Lucene/RE2 prefilters): every
  * match of the pattern must contain each extracted span as a plain
  * substring, so an n-gram index can intersect the spans' grams and
  * run the real regex engine on candidates only.
  *
  * CONSERVATIVE by construction: the extractor handles the common
  * subset (literals, escaped literals, character classes, `.`,
  * single-atom quantifiers, anchors) and returns None — "no index
  * help, fall back to the scan" — on anything whose span analysis is
  * nontrivial (alternation, groups, backreferences, lookaround).
  * Being conservative can only ADD candidates, never lose a match:
  *  - a class/dot/shorthand atom breaks the current literal run;
  *  - `*`/`?`/`{0,…}` make the preceding atom optional → it is
  *    removed from the run and the run breaks;
  *  - `+`/`{1,…}` keep the preceding atom (≥1 occurrence guaranteed)
  *    but still break the run after it — "ab+c" guarantees "ab" and
  *    "c" but the extractor does not claim the adjacency "bc".
  * Runs shorter than [[MinSpan]] are dropped (they carry no full
  * trigram). Reference behavior: /root/reference has no regex index;
  * this serves the engine's own idx_regex_prefilter operator. */
object RegexLiterals {

  /** Spans shorter than this carry no complete trigram. */
  val MinSpan = 3

  private val ClassShorthand = "dDwWsS"
  private val ZeroWidth = "bBAGzZ" // anchors/boundaries: match positions, not chars

  /** Escapes that denote a single known literal character. Everything
    * ALPHANUMERIC outside this map, the shorthands and the zero-width
    * anchors is treated as "outside the subset" (\\Q…\\E quoting, \\xhh,
    * \\uhhhh, \\cX, \\p{…}, \\k<…>, backreferences) — the extractor
    * bails rather than guess, because a wrong span LOSES matches. */
  private val ControlEscape: Map[Char, Char] = Map(
    'n' -> '\n', 't' -> '\t', 'r' -> '\r', 'f' -> '\f',
    'a' -> '', 'e' -> '')

  /** The literal substrings every match must contain, or None when the
    * pattern uses constructs outside the analyzed subset (alternation,
    * groups, backreferences, lookaround) or yields no span ≥ MinSpan. */
  def requiredSpans(pattern: String): Option[Seq[String]] = {
    val spans = scala.collection.mutable.ArrayBuffer[String]()
    val run = new StringBuilder
    def flush(): Unit = { if (run.length >= MinSpan) spans += run.toString; run.clear() }
    // Quantifiers bind to CODE POINTS, not UTF-16 units: dropping one
    // unit of a supplementary atom would leave a lone surrogate in the
    // run — an unsound span (a match need not contain it). Drop the
    // whole last code point.
    def dropLastAtom(): Unit = if (run.nonEmpty) {
      val k = if (run.length >= 2 && Character.isLowSurrogate(run.charAt(run.length - 1))
        && Character.isHighSurrogate(run.charAt(run.length - 2))) 2 else 1
      run.setLength(run.length - k)
    }
    var i = 0
    val n = pattern.length
    while (i < n) {
      pattern.charAt(i) match {
        case '|' | '(' | ')' => return None // alternation/groups: bail
        case '^' | '$' => flush(); i += 1 // anchors just break the run
        case '[' => // character class: skip to its ']', break the run
          flush()
          var j = i + 1
          if (j < n && pattern.charAt(j) == '^') j += 1
          if (j < n && pattern.charAt(j) == ']') j += 1 // leading ] is literal
          while (j < n && pattern.charAt(j) != ']') {
            pattern.charAt(j) match {
              case '\\' => j += 1
              case '[' => return None // Java nested class ([a&&[^b]]): bail
              case _ =>
            }
            j += 1
          }
          if (j >= n) return None // unterminated class
          i = j + 1
        case '.' => flush(); i += 1
        case '*' | '?' => // preceding atom optional: if it was a literal
          // atom still in the run, drop it; either way break the run.
          dropLastAtom()
          flush(); i += 1
        case '+' => flush(); i += 1 // atom guaranteed once; break after it
        case '{' => // {m,…}: m = 0 behaves like *, m ≥ 1 like +
          val j = pattern.indexOf('}', i)
          if (j < 0) return None
          val body = pattern.substring(i + 1, j)
          val m = body.takeWhile(_.isDigit)
          // Counts beyond Int range are outside the subset — bail (the
          // documented None contract), never NumberFormatException.
          if (m.isEmpty || m.length > 9) return None
          if (m.toInt == 0) dropLastAtom()
          flush(); i = j + 1
        case '\\' =>
          if (i + 1 >= n) return None
          val c = pattern.charAt(i + 1)
          if (Character.isSurrogate(c)) return None // \<astral>: outside the subset
          if (ClassShorthand.indexOf(c) >= 0) { flush(); i += 2 } // \d \w \s …
          else if (ZeroWidth.indexOf(c) >= 0) { flush(); i += 2 } // \b \A \z …
          else if (c.isDigit) return None // backreference: bail
          else if (c.isLetter) ControlEscape.get(c) match {
            // Known control escape → its literal character; any OTHER
            // alphabetic escape (\Q, \E, \x, \u, \c, \p, \k, …) is
            // outside the subset — a guessed span would LOSE matches.
            case None => return None
            case Some(lit) =>
              i += 2
              if (i < n && (pattern.charAt(i) == '*' || pattern.charAt(i) == '?')) {
                flush(); i += 1 // optional atom: never enters the run
              } else run += lit
          }
          else {
            // escaped punctuation literal (\. \- \\ \+ …) — peek so an
            // optional quantifier drops the whole atom, not one char.
            i += 2
            if (i < n && (pattern.charAt(i) == '*' || pattern.charAt(i) == '?')) {
              flush(); i += 1 // optional atom: never enters the run
            } else run += c
          }
        case c =>
          // A supplementary code point is ONE regex atom spanning two
          // UTF-16 units — consume both so a following quantifier binds
          // to the whole pair. An UNPAIRED surrogate is outside the
          // subset (its match semantics are not a plain substring): bail.
          val pairLen =
            if (Character.isHighSurrogate(c) && i + 1 < n &&
              Character.isLowSurrogate(pattern.charAt(i + 1))) 2
            else if (Character.isSurrogate(c)) return None
            else 1
          i += pairLen
          if (i < n && (pattern.charAt(i) == '*' || pattern.charAt(i) == '?')) {
            flush(); i += 1 // optional atom: never enters the run
          } else run ++= pattern.substring(i - pairLen, i)
      }
    }
    flush()
    if (spans.isEmpty) None else Some(spans.toSeq)
  }

  /** Per-branch required spans for a pattern with TOP-LEVEL alternation
    * — pg_trgm's treatment of `A|B|C`: every match is a match of SOME
    * branch and therefore contains all of THAT branch's spans, so an
    * n-gram prefilter may take the UNION of the branches' candidate
    * sets. Returns one span list per branch; None when any branch is
    * outside the analyzed subset or yields no span ≥ MinSpan (that
    * branch's matches would be invisible to the index — the whole
    * pattern must fall back to the scan). Contamination blocklists are
    * alternations in practice, so this is the difference between the
    * prefilter firing and not. A pattern without top-level `|`
    * degenerates to a single [[requiredSpans]] branch. */
  def branchSpans(pattern: String): Option[Seq[Seq[String]]] =
    splitTopLevel(pattern) match {
      case Some(branches) =>
        val per = branches.map { b =>
          // Small literal-only classes expand into explicit variants
          // ([Tt]able → Table, table): every match of the branch is a
          // match of SOME variant, so the variant span-lists join the
          // union like ordinary alternation branches. Expansion must
          // strictly succeed (every variant spanned) or the branch
          // falls back to the unexpanded analysis, where the class
          // just breaks the literal run — expansion can only ever ADD
          // index coverage, never remove it.
          expandSmallClasses(b)
            .flatMap { vs =>
              val spans = vs.map(requiredSpans)
              if (spans.exists(_.isEmpty)) None else Some(spans.map(_.get))
            }
            .orElse(requiredSpans(b).map(Seq(_)))
        }
        if (per.exists(_.isEmpty)) None else Some(per.flatMap(_.get))
      case None =>
        // The splitter could not confidently scan (nested class, group,
        // trailing backslash …) — defer to the single-pattern analysis,
        // which bails on the same constructs.
        requiredSpans(pattern).map(Seq(_))
    }

  /** Variant bound for [[expandSmallClasses]] — the cartesian product
    * of expanded class sizes may not exceed this (each variant costs
    * one all-grams-present postings probe). */
  val MaxExpandedVariants = 8

  /** Rewrite SMALL literal-only character classes as explicit variant
    * patterns — the case-variant-blocklist shape (`[Tt]able`,
    * `gr[ae]y`). A class expands only when ALL of: not negated, no
    * escapes / `&` / nested class / surrogates inside, every range
    * small, total members keep the variant product ≤
    * [[MaxExpandedVariants]], and no quantifier binds it (expanding
    * `[ab]+` to `a+|b+` would LOSE mixed matches like "ab"). Classes
    * that do not qualify stay in place — the downstream analysis
    * treats them as run-breakers, which is always sound. Substituted
    * members are re-escaped unless alphanumeric, so `[.+]` expands to
    * `\.` / `\+`, never to a metacharacter. Returns None when nothing
    * expanded (caller keeps the unexpanded path). */
  private[graft] def expandSmallClasses(branch: String): Option[Seq[String]] = {
    // Parse into alternating literal-text segments and expandable
    // member lists; opaque classes stay inside the text segments.
    val segs = scala.collection.mutable.ArrayBuffer[Either[String, Seq[String]]]()
    val cur = new StringBuilder
    var product = 1L
    var expandedAny = false
    var i = 0
    val n = branch.length
    while (i < n) {
      branch.charAt(i) match {
        case '\\' =>
          if (i + 1 >= n) return None
          cur ++= branch.substring(i, i + 2); i += 2
        case '[' =>
          var j = i + 1
          val neg = j < n && branch.charAt(j) == '^'
          if (neg) j += 1
          var opaque = neg
          val members = scala.collection.mutable.ArrayBuffer[Char]()
          if (j < n && branch.charAt(j) == ']') {
            // Leading ] is a literal member — but `[]-a]` is the range
            // ]-a, and mis-parsing it as {], -, a} would LOSE matches.
            // Rare shape; keep the class opaque rather than model it.
            opaque = true; j += 1
          }
          while (j < n && branch.charAt(j) != ']') {
            branch.charAt(j) match {
              case '\\' => opaque = true; j += 1 // escapes: out of subset
              case '[' => return None // nested class: can't even scan
              case '&' => opaque = true // && intersection risk
              case c if Character.isSurrogate(c) => opaque = true
              case c =>
                // a-z range (not a leading/trailing literal '-')
                if (j + 2 < n && branch.charAt(j + 1) == '-' &&
                  branch.charAt(j + 2) != ']') {
                  val hi = branch.charAt(j + 2)
                  if (Character.isSurrogate(hi) || hi < c ||
                    hi - c + 1 > MaxExpandedVariants) opaque = true
                  else (c to hi).foreach(members += _)
                  j += 2
                } else members += c
            }
            j += 1
          }
          if (j >= n) return None // unterminated class
          // A quantifier binds the whole class atom: do not expand.
          if (j + 1 < n && "*?+{".indexOf(branch.charAt(j + 1)) >= 0) opaque = true
          if (members.isEmpty) opaque = true
          val dm = members.distinct
          if (!opaque && product * dm.size <= MaxExpandedVariants) {
            segs += Left(cur.toString); cur.clear()
            segs += Right(dm.map { c =>
              if (c.isLetterOrDigit) c.toString else "\\" + c
            }.toSeq)
            product *= dm.size
            expandedAny = true
          } else cur ++= branch.substring(i, j + 1)
          i = j + 1
        case c => cur += c; i += 1
      }
    }
    if (!expandedAny) return None
    segs += Left(cur.toString)
    // Cartesian product of the expanded member choices.
    val variants = segs.foldLeft(Seq("")) {
      case (acc, Left(text)) => acc.map(_ + text)
      case (acc, Right(ms)) => acc.flatMap(v => ms.map(v + _))
    }
    Some(variants)
  }

  /** Split at top-level `|` only: not escaped, not inside a character
    * class, not inside a group. None when the scan meets a construct
    * it cannot confidently skip (groups, nested classes, unterminated
    * class/escape) — [[branchSpans]] then falls back to the
    * single-pattern path, whose own bails keep soundness. */
  private def splitTopLevel(pattern: String): Option[Seq[String]] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    val n = pattern.length
    while (i < n) {
      pattern.charAt(i) match {
        case '\\' =>
          if (i + 1 >= n) return None
          cur ++= pattern.substring(i, i + 2); i += 2
        case '(' | ')' => return None // grouped alternation: not top-level-splittable
        case '[' => // skip the class wholesale; '|' inside is literal
          var j = i + 1
          if (j < n && pattern.charAt(j) == '^') j += 1
          if (j < n && pattern.charAt(j) == ']') j += 1
          while (j < n && pattern.charAt(j) != ']') {
            pattern.charAt(j) match {
              case '\\' => j += 1
              case '[' => return None // Java nested class: can't scan confidently
              case _ =>
            }
            j += 1
          }
          if (j >= n) return None // unterminated class
          cur ++= pattern.substring(i, j + 1); i = j + 1
        case '|' => parts += cur.toString; cur.clear(); i += 1
        case c => cur += c; i += 1
      }
    }
    parts += cur.toString
    Some(parts.toSeq)
  }
}
