package graft

import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: the rewrite must cluster BOTH dimensions per file —
  * that is the entire point vs a single-column sort. */
class LayoutSpec extends SparkSuite {

  private def withDims(df: DataFrame): DataFrame = df
    .withColumn("xb", (col("o_custkey") % 256).cast("long"))
    .withColumn("yb", (datediff(col("o_orderdate"), lit("1992-01-01")) % 256).cast("long"))

  /** Per output file: (x-span, y-span) of the min-max stats a reader
    * would prune on. */
  private def spans(path: String): Array[(Long, Long)] =
    withDims(spark.read.parquet(path))
      .groupBy(input_file_name().as("f"))
      .agg((max("xb") - min("xb")).as("sx"), (max("yb") - min("yb")).as("sy"))
      .collect().map(r => (r.getAs[Long]("sx"), r.getAs[Long]("sy")))

  test("zkey interleaves bits: known points land on known Morton codes") {
    import spark.implicits._
    val df = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L), (3L, 5L))
      .toDF("x", "y").select(Layout.zkey(col("x"), col("y")).as("z"))
    // x fills even bits (0x5555), y odd (0xAAAA); (3,5) = 0b011 ⨯ 0b101
    // → z = 1·1 + 1·4 + 1·2 + 1·32 = 0b100111.
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 0x5555L, 0xAAAAL, 0xFFFFL, 39L))
  }

  test("zkey round-trips: de-interleaving even/odd bits recovers (x, y)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zkey(col("x"), col("y")).as("z"))
      .collect()
    out.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      def deinterleave(bits: Long, offset: Int): Long =
        (0 until 8).map(i => ((bits >> (2 * i + offset)) & 1L) << i).sum
      assert(deinterleave(z, 0) === x, s"x from z=$z")
      assert(deinterleave(z, 1) === y, s"y from z=$z")
    }
  }

  test("z-ordered files are tight in both dims; a plain sort leaves one dim wide") {
    val o = withDims(Layout.ordersZkeyed(spark, sf001))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    Layout.rewriteZordered(o, 4, s"$dir/z")
    o.repartitionByRange(4, col("xb")).sortWithinPartitions("xb")
      .write.mode("overwrite").parquet(s"$dir/x")

    val z = spans(s"$dir/z")
    val x = spans(s"$dir/x")
    assert(z.length === 4 && x.length === 4)

    // Four z-range files ≈ the four top-bit quadrants: every file covers
    // about half of EACH dim (span ≲ 128 + sampling slack)…
    z.foreach { case (sx, sy) =>
      assert(sx <= 176 && sy <= 176, s"z file spans ($sx, $sy) — not quadrant-tight")
    }
    // …while the x-sorted layout is tighter on x but pays full width on
    // y, so min-max stats can never prune a y predicate.
    assert(x.forall(_._1 <= 80), s"x-sorted x-spans: ${x.map(_._1).toSeq}")
    assert(x.exists(_._2 >= 220), s"x-sorted y-spans: ${x.map(_._2).toSeq}")

    // Two-sided box predicate (x < 100 AND y < 100): count files whose
    // min-max box intersects it — the files a stats-pruning reader must
    // open. The z layout confines the box to its low quadrant.
    def opened(path: String): Long =
      withDims(spark.read.parquet(path))
        .groupBy(input_file_name()).agg(min("xb").as("nx"), min("yb").as("ny"))
        .where(col("nx") < 100 && col("ny") < 100).count()
    assert(opened(s"$dir/z") <= 2)
  }
}
