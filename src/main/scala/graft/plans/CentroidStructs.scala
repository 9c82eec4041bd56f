package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-centroid (quantized squared L2, cid) structs over an
  * `array<double>` vector — the IVF coarse-assignment kernel as ONE
  * expression with a RUNTIME loop over the codebook.
  *
  * Why not compose K `vec_sq_dist_d` kernels inside `array(struct…)`
  * (the previous formulation): whole-stage codegen UNROLLS that — the
  * generated source grows ∝ K, and janino compile time grows worse
  * than linearly. Measured on the Lloyd training pass at K=31: ~25 s
  * per round with codegen on vs ~3 s interpreted — the compiler, not
  * the data, was the cost; at the adaptive SemDeDup K (∝ √corpus) it
  * would dominate the whole query. Here the codebook is a REFERENCE
  * OBJECT (`double[][]`) and the generated code is a fixed ~20-line
  * double loop — O(1) in K, so assignment codegen-compiles in
  * milliseconds at any codebook size.
  *
  * Numeric contract (oracle parity, identical to the composed form it
  * replaces): per centroid a sequential left-to-right fold of
  * Σ (vᵢ−cᵢ)² over min(|v|, |c|) elements, quantized as
  * floor(s·1e6 + 0.5) / 1e6 — bit-for-bit what `Num.roundp(sqDistD)`
  * computed and what the DuckDB oracle's
  * `floor(list_sum(list_transform(…)) * 1000000 + 0.5) / 1000000`
  * computes. Struct order (d, then cid) is the shared argmin/sort
  * tie-break convention.
  */
case class CentroidStructs(child: Expression, cids: Array[Long],
    cents: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "centroid_structs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Any](cids.length)
    var k = 0
    while (k < cids.length) {
      val c = cents(k)
      val n = math.min(v.numElements(), c.length)
      var s = 0.0d
      var i = 0
      while (i < n) { val d = v.getDouble(i) - c(i); s += d * d; i += 1 }
      out(k) = new GenericInternalRow(
        Array[Any](math.floor(s * 1e6 + 0.5) / 1e6, cids(k)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |Object[] $out = new Object[$cidsRef.length];
         |for (int $k = 0; $k < $cidsRef.length; $k++) {
         |  double[] $c = $centsRef[$k];
         |  int $n = java.lang.Math.min($v.numElements(), $c.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $v.getDouble($i) - $c[$i];
         |    $s += $d * $d;
         |  }
         |  $out[$k] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] {
         |      java.lang.Double.valueOf(java.lang.Math.floor($s * 1.0E6 + 0.5) / 1.0E6),
         |      java.lang.Long.valueOf($cidsRef[$k]) });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidStructs =
    copy(child = newChild)
}
