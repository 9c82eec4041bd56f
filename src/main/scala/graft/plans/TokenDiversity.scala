package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lexical-diversity counters over a token array in ONE hash pass:
  * (n_tokens, n_types, n_hapax).
  *
  * The composable formulation needs `array_distinct` plus a NESTED
  * higher-order filter — `filter(array_distinct(tok), t ->
  * size(filter(tok, u -> u = t)) = 1)` — which is interpreted and
  * O(types·tokens) with a full expression-tree walk per comparison.
  * This expression is O(tokens) expected (one occurrence-count map),
  * the same complexity DuckDB's native list kernels get, so the engines
  * stay at parity on the text_ttr scan.
  *
  * Semantics match the HOF version and the SQL oracle exactly: counts
  * over the token array as-is (caller tokenizes), hapax = types whose
  * occurrence count is exactly 1.
  */
case class TokenDiversity(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("n_hapax", LongType, nullable = false)))

  override def prettyName: String = "token_diversity"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      counts.merge(toks.getUTF8String(i), 1, (a, b) => a + b)
      i += 1
    }
    var hapax = 0L
    val it = counts.values().iterator()
    while (it.hasNext) if (it.next() == 1) hapax += 1
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, counts.size().toLong, hapax))
  }

  override protected def withNewChildInternal(c: Expression): TokenDiversity =
    copy(child = c)
}
