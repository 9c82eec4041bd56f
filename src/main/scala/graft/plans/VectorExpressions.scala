package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector math over
  * `array<float>` columns.
  *
  * Why custom expressions (SURVEY.md §7.3): the composable alternative —
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` — is a
  * higher-order function, which Catalyst evaluates *interpreted* (per
  * element: a lambda-variable bind, boxing, and a tree walk). At bench
  * scale that made a 64-dim dot product the bottleneck of every
  * similarity query (~20 s for 80k pairs). These expressions are a tight
  * primitive loop over `ArrayData` with full `doGenCode`, so they stay
  * inside whole-stage codegen: same queries run in milliseconds.
  *
  * Numeric contract (oracle parity): sequential left-to-right fold,
  * each float pair widened to double before multiply/accumulate —
  * bit-identical to a SQL engine computing
  * `list_sum(list_transform(range(n), i -> CAST(a[i+1] AS DOUBLE) * CAST(b[i+1] AS DOUBLE)))`.
  */
abstract class VecBinaryFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Java source for one loop step; `a`,`b`,`i` are in scope. */
  protected def stepCode(acc: String, a: String, b: String, i: String): String
  protected def step(acc: Double, x: Float, y: Float): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) { s = step(s, a.getFloat(i), b.getFloat(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // Spark's codegen default for a double slot is -1.0, not 0.0 —
      // the accumulator must be zeroed before the loop.
      s"""
         |${ev.value} = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  ${stepCode(ev.value, a, b, i)}
         |}
       """.stripMargin
    })
}

/** Sequential-fold dot product: Σ aᵢ·bᵢ (doubles). */
case class VecDot(left: Expression, right: Expression) extends VecBinaryFold {
  override def prettyName: String = "vec_dot"
  protected def step(acc: Double, x: Float, y: Float): Double =
    acc + x.toDouble * y.toDouble
  protected def stepCode(acc: String, a: String, b: String, i: String): String =
    s"$acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Squared Euclidean distance: Σ (aᵢ−bᵢ)² (doubles). */
case class VecSqDist(left: Expression, right: Expression) extends VecBinaryFold {
  override def prettyName: String = "vec_sq_dist"
  protected def step(acc: Double, x: Float, y: Float): Double = {
    val d = x.toDouble - y.toDouble; acc + d * d
  }
  protected def stepCode(acc: String, a: String, b: String, i: String): String =
    s"""double d = (double)$a.getFloat($i) - (double)$b.getFloat($i); $acc += d * d;"""
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(left = l, right = r)
}

/** Double-array twin of [[VecBinaryFold]] — the IVF codebook path
  * compares the (exactly-widened) corpus against double-valued Lloyd
  * means, so both inputs are `array<double>`. Same sequential-fold
  * numeric contract; the oracle's
  * `list_sum(list_transform(range(n), i -> f(a[i+1], b[i+1])))` over
  * DOUBLE[] lists computes the identical operation sequence. */
abstract class VecBinaryFoldD extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def stepCode(acc: String, a: String, b: String, i: String): String
  protected def step(acc: Double, x: Double, y: Double): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) { s = step(s, a.getDouble(i), b.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  ${stepCode(ev.value, a, b, i)}
         |}
       """.stripMargin
    })
}

/** Sequential-fold dot product over two array<double> columns. */
case class VecDotD(left: Expression, right: Expression) extends VecBinaryFoldD {
  override def prettyName: String = "vec_dot_d"
  protected def step(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def stepCode(acc: String, a: String, b: String, i: String): String =
    s"$acc += $a.getDouble($i) * $b.getDouble($i);"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotD =
    copy(left = l, right = r)
}

/** Squared Euclidean distance over two array<double> columns. */
case class VecSqDistD(left: Expression, right: Expression) extends VecBinaryFoldD {
  override def prettyName: String = "vec_sq_dist_d"
  protected def step(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  protected def stepCode(acc: String, a: String, b: String, i: String): String =
    s"""double d = $a.getDouble($i) - $b.getDouble($i); $acc += d * d;"""
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDistD =
    copy(left = l, right = r)
}

/** Intersection size of two SORTED DISTINCT long arrays by two-pointer
  * merge — the triangle census's per-edge kernel.
  *
  * `array_intersect` is semantically right but builds a hash set per
  * ROW (one per oriented edge — millions of allocations per census);
  * the adjacency arrays are already sorted by construction, so a merge
  * walk does the same count allocation-free and stays inside
  * whole-stage codegen. Callers own the precondition (sorted, distinct,
  * non-null elements); `sort_array(collect_list(...))` establishes it.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |${ev.value} = 0L;
         |int $i = 0, $j = 0;
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** String-array twin of [[SortedIntersectCount]] — merge walk over two
  * SORTED DISTINCT string arrays (binary UTF8String order, which is
  * exactly what `sort_array` produced them in). The similarity-join
  * verify step runs this once per surviving candidate pair. */
case class SortedIntersectCountStr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count_str"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1L; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val cmp = ctx.freshName("cmp")
      s"""
         |${ev.value} = 0L;
         |int $i = 0, $j = 0;
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { ${ev.value}++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; }
         |  else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCountStr =
    copy(left = l, right = r)
}
