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

  /** (pattern fragment, one matching instantiation). */
  private val atom: Gen[(String, String)] = Gen.oneOf(
    litChar.map(c => (c.toString, c.toString)),
    Gen.oneOf("x", "q", "7").map(c => (s"[$c$c]", c)), // tiny class
    litChar.map(c => (".", c.toString))
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
      requiredSpans(pattern) match {
        case Some(spans) => spans.forall(matching.contains(_))
        case None => true // bailing is always sound
      }
    }

  property("spans are at least trigram-sized and pattern substrings of literals") =
    Prop.forAll(patternAndMatch) { case (pattern, _) =>
      requiredSpans(pattern).forall(_.forall(sp =>
        sp.length >= graft.functions.RegexLiterals.MinSpan))
    }
}
