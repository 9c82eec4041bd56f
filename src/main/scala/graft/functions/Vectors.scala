package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns, built from
  * codegen'd higher-order functions (`zip_with`, `aggregate`, `transform`)
  * — no UDF, no driver collect, scales linearly with rows.
  *
  * All math is done in Double with a sequential left fold so results are
  * bit-reproducible and match an oracle computing the same fold.
  */
object Vectors {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe only in that 0-norm yields null. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x)
}
