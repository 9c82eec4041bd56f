package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles over a token array: one pass, allocation-light.
  *
  * The composable formulation —
  * `transform(sequence(1, size-n+1), i -> concat_ws(' ', element_at(tok, i), …))`
  * — is a higher-order function, evaluated interpreted with a full
  * expression-tree walk per element (and, before token materialization,
  * a re-split of the whole document per element). This native expression
  * cut the raw shingle scan from ~4 s to sub-second at bench scale.
  *
  * Semantics match the HOF version and the SQL oracle
  * (`list_transform(range(len(tok)-2), i -> tok[i+1] || ' ' || …)`):
  * fewer than n tokens → empty array.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements() - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** DISTINCT character n-grams of a string — the trigram-index build
  * explode, natively. The composable formulation
  * `array_distinct(transform(sequence(0, length-n), i -> substring(text, i+1, n)))`
  * materializes an index array, walks the interpreted HOF tree per
  * position (each `substring` re-scanning the string's code points from
  * the front — quadratic per doc), then hashes the result again for
  * array_distinct. This expression does one code-point offset pass and
  * one insertion-ordered dedup. Semantics match the HOF version and the
  * DuckDB oracle (`substr` counts CODE POINTS in both engines): fewer
  * than n code points → empty array; first-occurrence order (order is
  * irrelevant downstream — the grams are exploded into set-shaped
  * postings — but parity keeps plans comparable). */
case class CharGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    // Code-point start offsets (one pass; == char offsets for BMP-only
    // strings, surrogate pairs advance by 2).
    val offs = new Array[Int](len + 1)
    var i = 0
    var m = 0
    while (i < len) {
      offs(m) = i
      i += Character.charCount(s.codePointAt(i))
      m += 1
    }
    offs(m) = len
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](math.min(m, 256))
      var k = 0
      while (k + n <= m) {
        seen.add(s.substring(offs(k), offs(k + n)))
        k += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): CharGrams = copy(child = c)
}
