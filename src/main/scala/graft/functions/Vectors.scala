package graft.functions

import graft.plans.{SortedIntersectCount, SortedIntersectCountStr, VecDot, VecDotD, VecSqDist, VecSqDistD}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns, backed by
  * the codegen'd Catalyst expressions in [[graft.plans]] (a tight
  * primitive loop inside whole-stage codegen — the higher-order-function
  * formulation is interpreted and ~100× slower at scale).
  *
  * All math is double-precision sequential folds, bit-reproducible and
  * matched by the DuckDB oracles computing the identical fold.
  */
object Vectors {

  private def bin(f: (org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.catalyst.expressions.Expression) =>
      org.apache.spark.sql.catalyst.expressions.Expression)(a: Column, b: Column): Column =
    GraftBridge.column(f(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Sequential-fold dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column = bin(VecDot.apply)(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0-norm yields null/NaN as in the oracle. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column = bin(VecSqDist.apply)(a, b)

  /** array<double> variants — the IVF codebook path (exactly-widened
    * corpus vs double-valued Lloyd centroids). */
  def dotD(a: Column, b: Column): Column = bin(VecDotD.apply)(a, b)
  def sqDistD(a: Column, b: Column): Column = bin(VecSqDistD.apply)(a, b)

  /** |a ∩ b| for SORTED DISTINCT long arrays (two-pointer merge,
    * allocation-free — `array_intersect` hash-builds per row). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    bin(SortedIntersectCount.apply)(a, b)

  /** String-array variant (binary UTF8 order, as sort_array emits). */
  def sortedIntersectCountStr(a: Column, b: Column): Column =
    bin(SortedIntersectCountStr.apply)(a, b)
}
