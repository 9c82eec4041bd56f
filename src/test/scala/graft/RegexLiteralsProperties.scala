package graft

import graft.functions.RegexLiterals.requiredSpans
import org.scalacheck.{Gen, Prop, Properties}

/** Generative soundness fuzz for the required-literal-span extractor:
  * patterns are built from the analyzed subset TOGETHER with a random
  * matching instantiation (each atom instantiated consistently with
  * its quantifier), so the property needs no regex engine — by
  * construction the instantiation matches the pattern, and every
  * extracted span must appear in it verbatim. A conservative
  * extractor may return fewer/shorter spans (or None); it must never
  * claim a span a match can lack. */
object RegexLiteralsProperties extends Properties("graft.regexliterals") {

  private val litChar: Gen[Char] = Gen.oneOf(('a' to 'z') ++ ('0' to '9'))

  /** (pattern fragment, one matching instantiation). Includes the atom
    * classes the first fuzz round could not reach: escaped punctuation
    * (\.), control escapes (\n, \t), class shorthands (\d), zero-width
    * anchors (\b), and Java NESTED classes (bail region). */
  private val atom: Gen[(String, String)] = Gen.oneOf(
    litChar.map(c => (c.toString, c.toString)),
    Gen.oneOf("x", "q", "7").map(c => (s"[$c$c]", c)), // tiny class
    // Multi-member literal class, instantiated by ONE member — the
    // r11 class-expansion case ([Tt]able → variants): the variant the
    // instantiation picked must be among the returned span-lists.
    Gen.choose(2, 3).flatMap(k => Gen.listOfN(k, litChar)).flatMap(ms =>
      Gen.oneOf(ms).map(m => (s"[${ms.mkString}]", m.toString))),
    litChar.map(c => (".", c.toString)),
    Gen.oneOf(('.', "."), ('+', "+"), ('-', "-")).map { case (c, i) =>
      (s"\\$c", i) }, // escaped punctuation literal
    Gen.oneOf(('n', "\n"), ('t', "\t"), ('r', "\r")).map { case (c, i) =>
      (s"\\$c", i) }, // control escapes — the r10 soundness hole
    Gen.oneOf(("\\d", "5"), ("\\w", "k"), ("\\s", " ")), // shorthands
    // (zero-width \b is NOT generated: mid-word it would break the
    // "instantiation matches the pattern" invariant below; the exact
    // spec covers anchors.)
    Gen.const(("[a&&[^b]]", "a")), // Java nested class — must bail (None)
    // Supplementary (astral) literals — two UTF-16 units, one regex
    // atom: the r11 surrogate-soundness case (a quantifier must drop
    // the WHOLE pair, or a zero-repetition match lacks the lone high
    // surrogate the buggy span would claim).
    Gen.oneOf("😀", "𝒳", "🚀").map(s => (s, s))
  )

  private val quantified: Gen[(String, String)] = for {
    (p, inst) <- atom
    q <- Gen.oneOf("", "", "", "*", "+", "?") // bias toward plain atoms
    reps <- q match {
      case "" => Gen.const(1)
      case "*" => Gen.choose(0, 2)
      case "+" => Gen.choose(1, 2)
      case "?" => Gen.choose(0, 1)
    }
  } yield (p + q, inst * reps)

  private val patternAndMatch: Gen[(String, String)] =
    Gen.nonEmptyListOf(quantified).map { atoms =>
      (atoms.map(_._1).mkString, atoms.map(_._2).mkString)
    }

  property("every extracted span occurs in every matching string") =
    Prop.forAll(patternAndMatch) { case (pattern, matching) =>
      // Generator invariant, checked against the REAL engine (the one
      // rlike uses): the constructed string is a genuine full match.
      java.util.regex.Pattern.compile(pattern).matcher(matching).matches() &&
      (requiredSpans(pattern) match {
        case Some(spans) => spans.forall(matching.contains(_))
        case None => true // bailing is always sound
      })
    }

  property("spans are at least trigram-sized") =
    Prop.forAll(patternAndMatch) { case (pattern, _) =>
      requiredSpans(pattern).forall(_.forall(sp =>
        sp.length >= graft.functions.RegexLiterals.MinSpan))
    }

  // ── Alternation soundness: a match of `A|B|C` satisfies SOME branch,
  // so it must contain ALL of that branch's spans — the property the
  // union-of-candidates prefilter rests on. The generated match is an
  // instantiation of one randomly picked branch. ─────────────────────
  private val altPatternAndMatch: Gen[(String, String, Int)] = for {
    k <- Gen.choose(2, 4)
    branches <- Gen.listOfN(k, patternAndMatch)
    pick <- Gen.choose(0, k - 1)
  } yield (branches.map(_._1).mkString("|"), branches(pick)._2, pick)

  property("alternation: the matched branch's spans all occur in the match") =
    Prop.forAll(altPatternAndMatch) { case (pattern, matching, _) =>
      java.util.regex.Pattern.compile(pattern).matcher(matching).matches() &&
      (graft.functions.RegexLiterals.branchSpans(pattern) match {
        case Some(branches) =>
          branches.exists(spans => spans.forall(matching.contains(_)))
        case None => true // bailing is always sound
      })
    }

  property("alternation: at least one span-list per top-level pipe branch") =
    // Class expansion may add VARIANTS beyond the pipe count (each a
    // sound union member), but can never return fewer lists than
    // branches — every branch contributes at least one.
    Prop.forAll(altPatternAndMatch) { case (pattern, _, _) =>
      graft.functions.RegexLiterals.branchSpans(pattern).forall(
        _.length >= pattern.count(_ == '|') + 1)
    }
}
