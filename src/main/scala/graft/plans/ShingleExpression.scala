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
