package graft

import graft.functions.RegexLiterals.requiredSpans
import org.apache.spark.sql.functions._

/** Required-literal-span extraction: exact cases for the analyzed
  * subset, bail-out cases for everything else, and the soundness
  * property on real corpus data — every rlike match must contain
  * every extracted span (conservativeness can add candidates but
  * must never lose a match). */
class RegexLiteralsSpec extends SparkSuite {

  test("extracts the spans idx_regex_prefilter depends on") {
    assert(requiredSpans("fast [a-z]+ sort") === Some(Seq("fast ", " sort")))
  }

  test("subset cases extract conservative spans") {
    assert(requiredSpans("hello.*world") === Some(Seq("hello", "world")))
    // '?' makes the previous atom optional — it never enters the run.
    assert(requiredSpans("colou?r") === Some(Seq("colo")))
    // {0,n} behaves like '*': the atom is dropped from the run.
    assert(requiredSpans("a{0,2}bcd") === Some(Seq("bcd")))
    // Anchors break runs but don't bail.
    assert(requiredSpans("^prefix") === Some(Seq("prefix")))
    // Escaped literal characters join the run.
    assert(requiredSpans("""foo\.bar""") === Some(Seq("foo.bar")))
  }

  test("bails to None on constructs outside the subset or short spans") {
    assert(requiredSpans("a|b") === None) // alternation
    assert(requiredSpans("(foo)+") === None) // groups
    assert(requiredSpans("""\d{3}-\d{4}""") === None) // no span >= 3
    assert(requiredSpans("ab+c") === None) // runs too short after breaks
    assert(requiredSpans("""(\w)\1""") === None) // backreference
    assert(requiredSpans("[unterminated") === None)
    // Alphabetic escapes outside the known control set are NOT literal
    // trailing characters — guessing would lose matches (\Qab.cd\E
    // would have produced the bogus span "Qab.cdE").
    assert(requiredSpans("""\Qab.cd\E""") === None)
    assert(requiredSpans("""foo\x41bar""") === None) // hex escape
    // (built by concatenation: Scala pre-processes \u even in triple quotes)
    assert(requiredSpans("foo\\" + "u0041bar") === None) // unicode escape
    // Java nested character classes bail rather than mis-scan the
    // outer ']' into a span no match contains.
    assert(requiredSpans("[a-z&&[^x]]abc") === None)
    // Repetition counts beyond Int range bail, never throw.
    assert(requiredSpans("abc{99999999999}") === None)
    // Escaped surrogate halves are outside the subset.
    assert(requiredSpans("abc\\" + "😀") === None)
    // Unpaired surrogates are outside the subset.
    assert(requiredSpans("abc\uD83Dxyz") === None)
  }

  test("supplementary code points are single atoms under quantifiers") {
    // 😀 is two UTF-16 units; '*' must drop BOTH — the r10 hole left a
    // lone high surrogate in the span ("ab\uD83D"), which "ab" (the
    // zero-repetition match) does not contain.
    assert(requiredSpans("ab😀*") === None) // "ab" < MinSpan
    assert(requiredSpans("abc😀*") === Some(Seq("abc")))
    assert(requiredSpans("abc😀?def") === Some(Seq("abc", "def")))
    // {0,n} takes the same whole-atom drop path.
    assert(requiredSpans("abc😀{0,2}def") === Some(Seq("abc", "def")))
    // Unquantified astral literals DO enter the run intact.
    assert(requiredSpans("ab😀cd") === Some(Seq("ab😀cd")))
    // '+' guarantees one occurrence: the pair stays, run breaks after.
    assert(requiredSpans("abc😀+") === Some(Seq("abc😀")))
  }

  test("control escapes map to their real characters; anchors are zero-width") {
    // \n is the newline, not the letter n — "foo\nbar" must yield
    // spans real matches contain.
    assert(requiredSpans("""foo\nbar""") === Some(Seq("foo\nbar")))
    assert(requiredSpans("""tab\there""") === Some(Seq("tab\there")))
    // \b and \z match positions: they break the run, never enter it.
    assert(requiredSpans("""word\b next""") === Some(Seq("word", " next")))
    assert(requiredSpans("""ending\z""") === Some(Seq("ending")))
  }

  test("top-level alternation splits into per-branch spans") {
    import graft.functions.RegexLiterals.branchSpans
    // The idx_regex_alt pattern, pinned.
    assert(branchSpans("fast [a-z]+ sort|hash join|window agg") ===
      Some(Seq(Seq("fast ", " sort"), Seq("hash join"), Seq("window agg"))))
    // One branch without a usable span poisons the whole pattern: its
    // matches would be invisible to the union-of-candidates index.
    assert(branchSpans("hash join|ab") === None) // "ab" < MinSpan
    assert(branchSpans("hash join|\\d+") === None) // span-free branch
    assert(branchSpans("hash join|(foo)bar") === None) // grouped branch bails
    // '|' inside a character class is literal, not an alternation —
    // and a single-member class EXPANDS, fusing the runs into one
    // stronger span (r11 class expansion).
    assert(branchSpans("abc[|]def") === Some(Seq(Seq("abc|def"))))
    // Escaped '|' is a literal too — one branch, pipe in the span.
    assert(branchSpans("""abc\|def""") === Some(Seq(Seq("abc|def"))))
    // No alternation degenerates to the single requiredSpans branch.
    assert(branchSpans("fast [a-z]+ sort") === Some(Seq(Seq("fast ", " sort"))))
    // An empty branch (trailing '|') matches anything: bail.
    assert(branchSpans("hash join|") === None)
  }

  test("small literal classes expand into variant span-lists") {
    import graft.functions.RegexLiterals.branchSpans
    // The case-variant blocklist shape.
    assert(branchSpans("[Tt]able") ===
      Some(Seq(Seq("Table"), Seq("table"))))
    assert(branchSpans("gr[ae]y matter") ===
      Some(Seq(Seq("gray matter"), Seq("grey matter"))))
    // Small range expands; members dedup.
    assert(branchSpans("ab[0-1]cd") ===
      Some(Seq(Seq("ab0cd"), Seq("ab1cd"))))
    assert(branchSpans("ab[xx]cd") === Some(Seq(Seq("abxcd"))))
    // Metacharacter members re-escape: [.] is a literal dot, not a
    // wildcard — the variant span must contain the dot itself.
    assert(branchSpans("ab[.]cd") === Some(Seq(Seq("ab.cd"))))
    // Expansion composes with top-level alternation (union flattens).
    assert(branchSpans("[Tt]able|hash join") ===
      Some(Seq(Seq("Table"), Seq("table"), Seq("hash join"))))
    // Budget is greedy left-to-right: the first 3-member class expands
    // (3 ≤ 8), the second would make 9 variants > 8 and stays an
    // opaque run-breaker — partial expansion, still sound.
    assert(branchSpans("[abc]xyzq[def]") ===
      Some(Seq(Seq("axyzq"), Seq("bxyzq"), Seq("cxyzq"))))
    // Quantified classes never expand ([ab]+ to a+|b+ would lose "ab").
    assert(branchSpans("abc[xy]+def") === Some(Seq(Seq("abc", "def"))))
    // Negated / escaped / big-range classes stay opaque run-breakers.
    assert(branchSpans("abc[^x]def") === Some(Seq(Seq("abc", "def"))))
    assert(branchSpans("abc[a-z]def") === Some(Seq(Seq("abc", "def"))))
    // Expansion that leaves a variant span-free falls back to the
    // unexpanded analysis ("[ab]cd" variants "acd"/"bcd" are fine, but
    // "[ab]cd" unexpanded has no span ≥ 3 → expansion is what saves it).
    assert(branchSpans("[ab]cd") === Some(Seq(Seq("acd"), Seq("bcd"))))
    // A leading-] class is opaque (the []-a] range mis-parse trap).
    assert(branchSpans("abc[]x]def") === Some(Seq(Seq("abc", "def"))))
  }

  test("soundness on corpus data: every rlike match contains every span") {
    val docs = Tables(spark, sf001, "documents")
    for (pat <- Seq("fast [a-z]+ sort", "hello.*world", "table [a-z]+ part",
        "big\\s+data")) {
      requiredSpans(pat).foreach { spans =>
        val matches = docs.where(col("text").rlike(pat))
        val violating = spans.foldLeft(matches) { (df, sp) =>
          df.where(!col("text").contains(sp))
        }
        // every span-violating row would be a lost match
        assert(spans.forall(sp =>
          matches.where(!col("text").contains(sp)).count() === 0L), pat)
        assert(violating.count() === 0L, pat)
      }
    }
  }
}
