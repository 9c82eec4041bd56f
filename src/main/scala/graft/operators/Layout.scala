package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * The reference stores its corpus in whatever order ingestion produced
  * (SURVEY §2.1) — fine at single-node scale, fatal at 100 TB where the
  * only affordable query is one that *skips* most files. Parquet readers
  * skip via file/row-group min-max stats, but stats only help when the
  * layout clusters the filtered columns. Sorting clusters exactly one
  * column; a Z-order (Morton) key interleaves the bits of two columns so
  * a range partition on the single key yields files that are tight in
  * BOTH dimensions — each file covers a quadrant of the value space
  * instead of a stripe, so two-sided predicates prune on both axes.
  *
  * The key is pure integer bit arithmetic (shift / mask / add), so it
  * runs inside whole-stage codegen, costs no shuffle beyond the range
  * partition the rewrite needs anyway, and reproduces exactly in ANSI
  * SQL for the oracle.
  */
object Layout {

  /** Bits kept per dimension (8 → 16-bit Morton key, 256×256 grid).
    * Coarse on purpose: layout keys need only enough resolution to
    * separate files; finer bits would just shuffle bytes for no extra
    * pruning. */
  val Bits = 8

  /** Morton-interleave two already-bucketed dims (values in [0, 2^Bits)):
    * x occupies even bit positions, y odd. */
  def zkey(xb: Column, yb: Column): Column =
    (0 until Bits).map { i =>
      shiftright(xb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Orders keyed for (customer, order-date) two-sided scans: customer
    * bucket in the low (even) bits, day-number bucket in the odd bits. */
  def ordersZkeyed(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
      zkey(col("o_custkey") % 256,
        datediff(col("o_orderdate"), lit("1992-01-01")) % 256).as("zkey"))
  }

  /** Rewrite a frame into `n` z-clustered parquet files: range-partition
    * on the Morton key (one shuffle, driver samples the range bounds),
    * sort within partitions so row groups inherit the clustering too. */
  def rewriteZordered(df: DataFrame, n: Int, path: String): Unit =
    df.repartitionByRange(n, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)

  /** Simulated file size (rows) for the skipping metric. */
  val SkipFileRows = 512

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Morton keys for the orders table — the layout column a
    // z-ordered rewrite clusters on. Oracled bit-for-bit: the key is
    // plain integer arithmetic. ──────────────────────────────────────
    "layout_zorder" -> ((s, dir) =>
      ordersZkeyed(s, dir).select(col("o_orderkey"), col("zkey"))),

    // ── Zone-map file-skipping effectiveness — the NUMBER the z-order
    // rewrite exists to move: lay the table out in ~512-row "files"
    // under each layout (natural key order vs Morton order), compute
    // each file's min/max zone maps on both filter dims, and count the
    // files a two-sided box predicate can SKIP. Natural order clusters
    // one axis (stripes: the box hits every stripe crossing its
    // x-range); Morton files cover quadrants, so both axes prune.
    // Files are KEY-RANGE delimited (equal-width slices of the layout
    // key's span, file count from a scalar count agg) — exactly how a
    // range-partitioned writer rolls files, and deliberately NOT a
    // global row_number: file assignment is pure map-side arithmetic
    // over three broadcast scalars, so the metric itself scales (the
    // first cut used two global windows and degraded 20× at the 100×
    // corpus). Production skipping reads real parquet footers; the
    // rewrite itself is [[rewriteZordered]]'s range partition. ───────
    "layout_skipping" -> ((s, dir) => {
      val base = ordersZkeyed(s, dir).select(col("o_orderkey"), col("zkey"),
        (col("o_custkey") % 256).as("xb"),
        (datediff(col("o_orderdate"), lit("1992-01-01")) % 256).as("yb"))
      // ONE scalar pass for everything broadcast downstream: row count
      // (→ file count), the key span, and the predicate's true row
      // count; then ONE zone-map pass over both layouts — each row
      // explodes into its (layout, file) pair, so the whole metric is
      // two scans of the table, not four.
      val stats = base.agg(count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("k_min"), max(col("o_orderkey")).as("k_max"),
        sum((col("xb").between(16, 47) && col("yb").between(64, 127))
          .cast("long")).as("n_match_rows"))
      val withNf = base.crossJoin(broadcast(stats))
        .withColumn("nf", ceil(col("n_rows") / lit(SkipFileRows.toDouble)))
      // Equal-width key slices; products stay < 2^53, exact in the
      // double division (keys ≤ ~1e9, nf ≤ ~3e4).
      val natural = floor((col("o_orderkey") - col("k_min")) * col("nf") /
        (col("k_max") - col("k_min") + lit(1L)))
      val zorder = floor(col("zkey") * col("nf") / lit(65536L))
      withNf
        .select(col("xb"), col("yb"), col("n_match_rows"),
          explode(array(
            struct(lit("natural").as("layout"), natural.as("f")),
            struct(lit("zorder").as("layout"), zorder.as("f")))).as("lf"))
        .groupBy(col("lf.layout").as("layout"), col("lf.f").as("f"))
        .agg(min(col("xb")).as("min_x"), max(col("xb")).as("max_x"),
          min(col("yb")).as("min_y"), max(col("yb")).as("max_y"),
          first(col("n_match_rows")).as("n_match_rows"))
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("n_files"),
          sum((col("max_x") < 16 || col("min_x") > 47 ||
            col("max_y") < 64 || col("min_y") > 127).cast("long")).as("n_skipped"),
          first(col("n_match_rows")).as("n_match_rows"))
    })
  )

  def oracles: Map[String, String] = Map(
    "layout_zorder" -> {
      val terms = (0 until Bits).map { i =>
        s"((xb >> $i) & 1) * ${1L << (2 * i)} + ((yb >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH b AS (
         |  SELECT o_orderkey,
         |    o_custkey % 256 AS xb,
         |    date_diff('day', DATE '1992-01-01', o_orderdate) % 256 AS yb
         |  FROM orders)
         |SELECT o_orderkey, CAST($terms AS BIGINT) AS zkey FROM b""".stripMargin
    },

    "layout_skipping" -> {
      val terms = (0 until Bits).map { i =>
        s"((xb >> $i) & 1) * ${1L << (2 * i)} + ((yb >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH b AS (
         |  SELECT o_orderkey,
         |    o_custkey % 256 AS xb,
         |    date_diff('day', DATE '1992-01-01', o_orderdate) % 256 AS yb
         |  FROM orders),
         |z AS (SELECT o_orderkey, xb, yb, CAST($terms AS BIGINT) AS zkey FROM b),
         |s AS (SELECT count(*) AS n_rows, min(o_orderkey) AS k_min,
         |        max(o_orderkey) AS k_max FROM z),
         |w AS (SELECT z.*, CAST(ceil(s.n_rows / $SkipFileRows.0) AS BIGINT) AS nf,
         |        s.k_min, s.k_max FROM z, s),
         |nat AS (
         |  SELECT CAST(floor((o_orderkey - k_min) * nf
         |    / CAST(k_max - k_min + 1 AS DOUBLE)) AS BIGINT) AS f, xb, yb FROM w),
         |zo AS (
         |  SELECT CAST(floor(zkey * nf / 65536.0) AS BIGINT) AS f, xb, yb FROM w),
         |natf AS (SELECT f, min(xb) mnx, max(xb) mxx, min(yb) mny, max(yb) mxy
         |  FROM nat GROUP BY f),
         |zof AS (SELECT f, min(xb) mnx, max(xb) mxx, min(yb) mny, max(yb) mxy
         |  FROM zo GROUP BY f),
         |m AS (SELECT count(*) AS n_match_rows FROM z
         |  WHERE xb BETWEEN 16 AND 47 AND yb BETWEEN 64 AND 127),
         |agg AS (
         |  SELECT 'natural' AS layout, count(*) AS n_files,
         |    CAST(sum(CASE WHEN mxx < 16 OR mnx > 47 OR mxy < 64 OR mny > 127
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped
         |  FROM natf
         |  UNION ALL
         |  SELECT 'zorder', count(*),
         |    CAST(sum(CASE WHEN mxx < 16 OR mnx > 47 OR mxy < 64 OR mny > 127
         |      THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM zof)
         |SELECT layout, n_files, n_skipped, n_match_rows FROM agg, m""".stripMargin
    }
  )
}
