package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portable deterministic sketches — count-min and HyperLogLog built as
  * plain DataFrame aggregations rather than opaque binary blobs.
  *
  * The reference approximates nothing (every count in its daily report
  * is exact — SURVEY §2.4), which caps it at single-node scale. At
  * 100 TB the first-class citizens are *mergeable* summaries: each
  * executor folds its partition into a tiny sketch, partial aggregation
  * combines them map-side, and the merged result answers frequency /
  * cardinality queries with bounded error and no second pass over the
  * data.
  *
  * Two deliberate design points:
  *
  *  - **Sketches are DataFrames, not binaries.** A CMS here is just
  *    `(seed, bucket) → cnt` rows (≤ d·w of them) and an HLL is
  *    `(group, register) → max_rho`. Merging is `groupBy.sum` /
  *    `groupBy.max` — the same partial-agg machinery Catalyst already
  *    optimizes — and the sketch stays queryable, joinable, and
  *    persistable as parquet without a custom serde. The build is one
  *    map-side-combined shuffle whose width is the sketch size, never
  *    the data size.
  *
  *  - **Hashing is md5-derived, so the whole sketch — not just its
  *    error bound — is reproducible in ANSI SQL.** Estimates hash-match
  *    a DuckDB oracle exactly (the same trick as the minhash family,
  *    Dedup.scala). Engine-native hashes (xxhash64) would be faster but
  *    unverifiable cross-engine; swapping the hash is a one-line change
  *    where throughput matters more than auditability.
  *
  * Float determinism: the HLL harmonic sum Σ 2^−M_j is computed in
  * *integer* arithmetic as Σ 2^(53−M_j) (each term exact, total < 2^61,
  * no FP accumulation-order dependence), and only the final division
  * happens in doubles — so Spark and DuckDB agree bit-for-bit no matter
  * what order their aggregates visit rows.
  */
object Sketches {

  /** CMS depth (independent hash rows) and width (buckets per row). At
    * width 8192 a 600 k-row scale factor costs ~N/w ≈ 73 expected
    * collision mass per bucket; the min over 4 seeds keeps the realized
    * overestimate well under that. Sketch size d·w·16 B ≈ 512 KiB —
    * broadcastable however large the input. */
  val CmsDepth = 4
  val CmsWidth = 8192

  /** HLL register count m (2^8). Standard error 1.04/√m ≈ 6.5 %. */
  val HllM = 256

  /** Bloom filter geometry: 4096 bits, 3 probes. At ~400 member keys
    * the fill is ≈ 25 %, so the false-positive rate is ≈ 0.25³ ≈ 1.6 %. */
  val BloomBits = 4096
  val BloomK = 3

  /** KMV sketch size (the K smallest distinct hashes kept per set);
    * relative std error of the union estimate ≈ 1/√K ≈ 6%. */
  val KmvK = 256

  /** Per-customer 1996/1997 presence flags — the shared exact-twin
    * input for the KMV set-algebra queries. Two PARTIALLY overlapping
    * sets: customers who ordered in 1996 vs 1997 (year-over-year
    * retention — a real release-audit shape; the event-log user sets
    * fully coincide, which would degenerate the demos to the union). */
  private def kmvYearFlags(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .where(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("o_custkey"))
      .agg(max((year(col("o_orderdate")) === 1996).cast("int")).as("v"),
        max((year(col("o_orderdate")) === 1997).cast("int")).as("p"))

  /** The shared KMV sketch pipeline for the set-algebra queries: one
    * row carrying both year-sketches (a, b), their k-min union sample
    * u, ku = |u|, and the union estimate (K−1)/θ. Intersect and diff
    * BOTH derive from this frame — the SketchSpec consistency test
    * (d.est_union === i.est_union, exact Double equality) is guaranteed
    * by construction because there is exactly one copy of the theta
    * arithmetic to drift. */
  private def kmvYearUnionEst(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val K = KmvK
    def hashesOf(y: Int) = Tables(s, dir, "orders")
      .where(year(col("o_orderdate")) === y)
      .select(md5(concat(lit("kmv|"), col("o_custkey").cast("string"))).as("h"))
    val agg = new graft.plans.KmvAggregator(K)
    def sketchOf(y: Int, name: String) = hashesOf(y).as[String]
      .groupByKey(_ => true).agg(agg.toColumn.name("kmv"))
      .map(_._2).toDF(name)
    sketchOf(1996, "a").crossJoin(sketchOf(1997, "b"))
      .withColumn("u",
        slice(array_sort(array_distinct(concat(col("a"), col("b")))), 1, K))
      .withColumn("ku", size(col("u")))
      .withColumn("theta",
        conv(substring(element_at(col("u"), col("ku")), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0))
      .withColumn("est_union", when(col("ku") < K, col("ku").cast("double"))
        .otherwise(lit((K - 1).toDouble) / col("theta")))
  }

  private val Pow53 = 9007199254740992L // 2^53, exact in a double

  private def seeds: Column =
    array((0 until CmsDepth).map(i => lit(i)): _*)

  /** One md5 per input row; the d hash rows read disjoint 32-bit slices
    * of it (seed i → hex chars [1+8i, 8+8i]) — md5 bits are independent,
    * so slicing one digest is as good as d digests at a quarter the
    * hashing cost, which dominates the sketch build. */
  private def cmsHash(key: Column): Column =
    md5(concat(lit("cms|"), key.cast("string")))

  /** Build the count-min sketch of `key`'s frequency distribution:
    * one row per non-empty (seed, bucket) cell. The explode widens the
    * stream d-fold *before* the shuffle, but partial aggregation caps
    * what actually moves at d·w rows per map task. */
  def cmsSketch(rows: DataFrame, key: String): DataFrame =
    cmsSketchWeighted(rows.select(col(key), lit(1L).as("w")), key, "w")

  /** CMS from a KEYED AGGREGATE (key, weight): cell counts are sums of
    * weights — bit-identical to [[cmsSketch]] over the raw rows (which
    * is exactly the weight-1 case), but the hash/explode work is
    * key-cardinality-sized instead of corpus-sized. The right entry
    * whenever an exact per-key count already exists in the plan
    * (sk_cms_heavy probes one); raw-row cmsSketch remains the one-pass
    * streaming shape. */
  def cmsSketchWeighted(keyed: DataFrame, key: String, weight: String): DataFrame =
    keyed.select(cmsHash(col(key)).as("h"), col(weight).as("w"))
      .select(explode(seeds).as("seed"), col("h"), col("w"))
      .select(col("seed"),
        (conv(expr("substring(h, 1 + 8 * seed, 8)"), 16, 10).cast("long") % CmsWidth).as("bucket"),
        col("w"))
      .groupBy("seed", "bucket").agg(sum(col("w")).as("cnt"))

  /** Point-estimate the frequency of each row of `probes` (small) from a
    * built sketch: re-hash the key, look each seed's cell up, take the
    * min across seeds. The sketch side is broadcast — probing never
    * shuffles the probe set. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, key: String): DataFrame = {
    val keep = probes.columns.map(col)
    probes.withColumn("h", cmsHash(col(key)))
      .select(((keep :+ col("h")) :+ explode(seeds).as("seed")).toIndexedSeq: _*)
      .withColumn("bucket",
        conv(expr("substring(h, 1 + 8 * seed, 8)"), 16, 10).cast("long") % CmsWidth)
      .join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy(keep.toIndexedSeq: _*)
      .agg(min(col("cnt")).as("cms_est"))
  }

  /** Leading-zero count (+1) of the 52-bit tail, computed on the hex
    * string itself: 4 bits per leading '0' hex char, then a CASE on the
    * first non-zero nibble — no float log2, no engine-specific bit ops,
    * so the identical expression runs in DuckDB. Empty tail (all zeros,
    * p = 16^−13) degenerates to the max rank 53. */
  private def rho(tail: Column): Column = {
    val t = regexp_replace(tail, "^0+", "")
    val c = substring(t, 1, 1)
    val extra = when(c === "1", 3)
      .when(c.isin("2", "3"), 2)
      .when(c.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    (lit(13) - length(t)) * 4 + extra + 1
  }

  /** Per-group HLL registers of `key`: (grp…, reg) → max rho. This IS
    * the sketch — m rows per group, mergeable by groupBy.max. */
  def hllRegisters(rows: DataFrame, grp: Seq[String], key: String): DataFrame = {
    val h = md5(concat(lit("hll|"), col(key).cast("string")))
    rows.select(grp.map(col) :+ h.as("h"): _*)
      .select(grp.map(col) :+
        conv(substring(col("h"), 1, 2), 16, 10).cast("int").as("reg") :+
        rho(substring(col("h"), 3, 13)).as("rho"): _*)
      .groupBy((grp :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("mx"))
  }

  /** Cardinality estimate per group from a register table: the standard
    * HLL estimator α_m·m²/Σ2^−M_j with the small-range (linear
    * counting) correction. The harmonic sum is integer (see header);
    * absent registers contribute 2^53 (= 2^−0 scaled) each. */
  def hllEstimate(registers: DataFrame, grp: Seq[String]): DataFrame = {
    val agg = registers.groupBy(grp.map(col): _*)
      .agg(sum(expr("shiftleft(cast(1 as bigint), 53 - mx)")).as("zp"),
        count(lit(1)).as("nreg"))
    val m = HllM
    val denom = (col("zp") + (lit(m.toLong) - col("nreg")) * lit(Pow53)).cast("double")
    // α_m·m² · 2^53: the two power-of-two factors only shift the
    // exponent, so the numerator is exact and rawE is a single rounding.
    val rawE = lit(0.7213) / (lit(1.0) + lit(1.079) / m) * (m.toLong * m) * lit(Pow53.toDouble) / denom
    val v = lit(m.toLong) - col("nreg")
    val est = when(rawE <= 2.5 * m && v > 0, lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(rawE)
    agg.select(grp.map(col) :+ est.as("hll_raw"): _*)
  }

  private def bseeds: Column =
    array((0 until BloomK).map(i => lit(i.toString)): _*)

  private def bloomBit(seed: Column, key: Column): Column =
    conv(substring(md5(concat(lit("bf"), seed, lit("|"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % BloomBits

  /** The set-bit set of a Bloom filter over `key` — the sketch as rows
    * (≤ BloomBits of them), same design point as the CMS/HLL above:
    * mergeable by union+distinct, broadcastable, SQL-reproducible. */
  def bloomBitSet(keys: DataFrame, key: String): DataFrame =
    keys.select(explode(bseeds).as("seed"), col(key).as("k"))
      .select(bloomBit(col("seed"), col("k")).as("bit"))
      .distinct()

  /** Mergeable quantile sketch: an equi-width histogram (bin = ⌊v/w⌋)
    * per group. The histogram is ADDITIVE — merging partials is
    * `groupBy(g, bin).sum(c)`, the same contract as the other sketches
    * here — and a quantile is read off the cumulative counts as the
    * upper edge of the first bin where cum ≥ ⌈p·n⌉ (error ≤ one bin
    * width, memory = value-range/w per group, one map-side-combined
    * shuffle to build). Integer bins and edges keep every engine
    * bit-identical. */
  def quantileHist(df: DataFrame, group: Column, value: Column,
                   binWidth: Long, ps: Seq[(String, Double)]): DataFrame = {
    val hist = df.select(group.as("g"),
        floor(value / binWidth).cast("long").as("bin"))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(Window.partitionBy(col("g"))
        .orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("g"))))
    val aggs = ps.map { case (name, p) =>
      min(when(col("cum") >= ceil(col("n") * p),
        (col("bin") + 1) * binWidth)).as(name)
    } :+ max(col("n")).as("n")
    cum.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Histogram-quantile sketch over l_extendedprice per return
    // flag: p50/p95/p99 upper edges from 256-wide bins. The window
    // runs over the HISTOGRAM (bins per group ≤ range/width), never
    // the data. ──────────────────────────────────────────────────────
    "sk_quantile_hist" -> ((s, dir) =>
      quantileHist(Tables(s, dir, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"), 256L,
        Seq("p50_ub" -> 0.5, "p95_ub" -> 0.95, "p99_ub" -> 0.99))),

    // ── CMS heavy-hitter probe: build the sketch over l_suppkey, probe
    // the exact top-10 suppliers by lineitem volume. cms_est ≥ exact
    // always (counts only ever collide upward); the min over 4 seeds
    // keeps the overshoot near zero at these widths. ─────────────────
    "sk_cms_heavy" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      // One corpus-sized aggregate (map-side combined), then every
      // downstream step — sketch build, probe, ranking — runs on the
      // ~|suppliers| keyed frame. The weighted sketch is bit-identical
      // to hashing the 6 M raw rows (cell count = Σ key weights).
      val exact = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("exact_cnt"))
        .localCheckpoint(false)
      val top = exact.orderBy(col("exact_cnt").desc, col("l_suppkey")).limit(10)
      cmsEstimate(cmsSketchWeighted(exact, "l_suppkey", "exact_cnt"),
        top, "l_suppkey")
    }),

    // ── Bloom pre-filter as a declarative data op (the runtime-
    // injected variant is pinned in ScaleSpec): build the bit set from
    // the dim-side keys (European suppliers), probe every fact key,
    // and report how many fact rows survive vs truly match. On a real
    // cluster this is the pattern for skipping a 100 TB fact scan's
    // shuffle: the ≤ 4 Kib bit set broadcasts, the fact side drops
    // ~98 % of non-matching rows before the join. ────────────────────
    "bloom_prefilter" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier")
      val nat = Tables(s, dir, "nation")
      val reg = Tables(s, dir, "region")
      val dim = sup.join(nat, sup("s_nationkey") === nat("n_nationkey"))
        .join(reg, nat("n_regionkey") === reg("r_regionkey"))
        .where(col("r_name") === "EUROPE")
        .select(col("s_suppkey"))
      val bits = bloomBitSet(dim, "s_suppkey")
      val li = Tables(s, dir, "lineitem")
      val factKeys = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      val probe = factKeys
        .select(col("l_suppkey"), col("n"), explode(bseeds).as("seed"))
        .withColumn("bit", bloomBit(col("seed"), col("l_suppkey")))
      // A key survives iff all K seeds land on set bits.
      val pass = probe.join(broadcast(bits), "bit")
        .groupBy(col("l_suppkey"), col("n"))
        .agg(countDistinct(col("seed")).as("nb"))
        .where(col("nb") === BloomK)
      val trueKeys = factKeys
        .join(dim, factKeys("l_suppkey") === dim("s_suppkey"), "left_semi")
      li.agg(count(lit(1)).as("n_fact_rows"))
        .crossJoin(pass.agg(coalesce(sum(col("n")), lit(0L)).as("n_candidate_rows")))
        .crossJoin(trueKeys.agg(coalesce(sum(col("n")), lit(0L)).as("n_true_rows")))
    }),

    // ── KMV (theta-sketch) set-operation estimation: the K smallest
    // distinct member hashes per set are a MERGEABLE synopsis — the
    // k-min of (A ∪ B) equals the k-min of (kmvA ∪ kmvB), so union
    // cardinality ((K−1)/θ, θ = the Kth smallest normalized hash) and
    // intersection (Jaccard over the union sketch × est-union) come
    // from two K-sized sketches, never the sets. Built with the
    // bounded-heap [[graft.plans.KmvAggregator]] (map-side K values
    // per partition — the HLL feasibility argument applied to set
    // algebra, which HLL itself cannot do: HLL has no intersection).
    // Exact twins ride along so the estimate's error is visible; all
    // arithmetic is seeded-md5 deterministic, so the DuckDB oracle
    // replays the ESTIMATES bit-for-bit. Reference shape: the
    // overlap-audit a corpus release runs between user segments /
    // snapshot versions. ─────────────────────────────────────────────
    "sk_kmv_intersect" -> ((s, dir) => {
      val ex = kmvYearFlags(s, dir)
        .agg(sum(when(col("v") === 1 || col("p") === 1, 1L).otherwise(0L))
            .as("exact_union"),
          sum(when(col("v") === 1 && col("p") === 1, 1L).otherwise(0L))
            .as("exact_intersect"))
      val est = kmvYearUnionEst(s, dir)
        .withColumn("matches",
          size(array_intersect(array_intersect(col("u"), col("a")), col("b"))))
      est.crossJoin(ex).select(
        Num.roundp(col("est_union"), 4).as("est_union"),
        Num.roundp((col("matches").cast("double") / col("ku")) * col("est_union"), 4)
          .as("est_intersect"),
        col("exact_union"), col("exact_intersect"))
    }),

    // ── KMV set-DIFFERENCE estimation — the churn side of the
    // sk_kmv_intersect release audit: |A \ B| ≈ est_union × (u-sample
    // hashes in A but not B) / |u|. Membership against B is exact on
    // the sketches: u is the k-min of A ∪ B, so any u-hash belonging
    // to B is ≤ θ_u ≤ θ_B and therefore present in B's k-min — the
    // same below-theta argument the intersection rides. Two K-sized
    // sketches, never the sets; exact twin alongside; seeded-md5
    // arithmetic so the oracle replays the estimate bit-for-bit.
    // Reference shape: "how many users/docs did we LOSE between
    // snapshot versions" — the question a corpus diff answers before
    // a release ships. ───────────────────────────────────────────────
    "sk_kmv_diff" -> ((s, dir) => {
      val ex = kmvYearFlags(s, dir)
        .agg(sum(when(col("v") === 1 && col("p") === 0, 1L).otherwise(0L))
          .as("exact_diff"))
      val est = kmvYearUnionEst(s, dir)
        .withColumn("onlya",
          size(array_except(array_intersect(col("u"), col("a")), col("b"))))
      est.crossJoin(ex).select(
        Num.roundp(col("est_union"), 4).as("est_union"),
        Num.roundp((col("onlya").cast("double") / col("ku")) * col("est_union"), 4)
          .as("est_diff"),
        col("exact_diff"))
    }),

    // ── HLL distinct parts per return flag, next to the exact count.
    // Exercises both estimator branches across scale factors: linear
    // counting at sf0.001 (≈200 distinct < 2.5m), the raw harmonic
    // estimator from sf0.01 up. ──────────────────────────────────────
    "sk_hll_groups" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
      val est = hllEstimate(hllRegisters(li, Seq("l_returnflag"), "l_partkey"),
        Seq("l_returnflag"))
      exact.join(est, "l_returnflag")
        .select(col("l_returnflag"), col("exact_distinct"),
          Num.roundp(col("hll_raw"), 4).as("hll_est"))
    })
  )

  def oracles: Map[String, String] = Map(
    "sk_kmv_intersect" ->
      s"""WITH va AS (SELECT DISTINCT md5('kmv|' || CAST(o_custkey AS VARCHAR)) AS h
         |            FROM orders WHERE year(o_orderdate) = 1996),
         |vb AS (SELECT DISTINCT md5('kmv|' || CAST(o_custkey AS VARCHAR)) AS h
         |       FROM orders WHERE year(o_orderdate) = 1997),
         |a AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |      FROM va) WHERE rn <= $KmvK),
         |b AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |      FROM vb) WHERE rn <= $KmvK),
         |uu AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |       FROM (SELECT h FROM va UNION SELECT h FROM vb)) WHERE rn <= $KmvK),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS matches FROM uu
         |      WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)),
         |su AS (SELECT count(*) AS ku, max(h) AS hmax FROM uu),
         |th AS (SELECT ku,
         |  list_sum(list_transform(range(8),
         |    i -> (strpos('0123456789abcdef', substr(hmax, CAST(i + 1 AS INT), 1)) - 1)
         |      * 16 ** (7 - i))) / 4294967296.0 AS theta
         |  FROM su),
         |eu AS (SELECT CASE WHEN th.ku < $KmvK THEN CAST(th.ku AS DOUBLE)
         |              ELSE ${KmvK - 1} / th.theta END AS est_union, th.ku
         |       FROM th),
         |ex AS (
         |  SELECT CAST(count(*) FILTER (WHERE v OR p) AS BIGINT) AS exact_union,
         |    CAST(count(*) FILTER (WHERE v AND p) AS BIGINT) AS exact_intersect
         |  FROM (SELECT o_custkey, bool_or(year(o_orderdate) = 1996) AS v,
         |          bool_or(year(o_orderdate) = 1997) AS p
         |        FROM orders WHERE year(o_orderdate) IN (1996, 1997)
         |        GROUP BY 1))
         |SELECT floor(eu.est_union * 10000 + 0.5) / 10000 AS est_union,
         |  floor(((m.matches * 1.0 / eu.ku) * eu.est_union) * 10000 + 0.5) / 10000
         |    AS est_intersect,
         |  ex.exact_union, ex.exact_intersect
         |FROM eu, m, ex""".stripMargin,

    "sk_kmv_diff" ->
      s"""WITH va AS (SELECT DISTINCT md5('kmv|' || CAST(o_custkey AS VARCHAR)) AS h
         |            FROM orders WHERE year(o_orderdate) = 1996),
         |vb AS (SELECT DISTINCT md5('kmv|' || CAST(o_custkey AS VARCHAR)) AS h
         |       FROM orders WHERE year(o_orderdate) = 1997),
         |a AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |      FROM va) WHERE rn <= $KmvK),
         |b AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |      FROM vb) WHERE rn <= $KmvK),
         |uu AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |       FROM (SELECT h FROM va UNION SELECT h FROM vb)) WHERE rn <= $KmvK),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS onlya FROM uu
         |      WHERE h IN (SELECT h FROM a) AND h NOT IN (SELECT h FROM b)),
         |su AS (SELECT count(*) AS ku, max(h) AS hmax FROM uu),
         |th AS (SELECT ku,
         |  list_sum(list_transform(range(8),
         |    i -> (strpos('0123456789abcdef', substr(hmax, CAST(i + 1 AS INT), 1)) - 1)
         |      * 16 ** (7 - i))) / 4294967296.0 AS theta
         |  FROM su),
         |eu AS (SELECT CASE WHEN th.ku < $KmvK THEN CAST(th.ku AS DOUBLE)
         |              ELSE ${KmvK - 1} / th.theta END AS est_union, th.ku
         |       FROM th),
         |ex AS (
         |  SELECT CAST(count(*) FILTER (WHERE v AND NOT p) AS BIGINT) AS exact_diff
         |  FROM (SELECT o_custkey, bool_or(year(o_orderdate) = 1996) AS v,
         |          bool_or(year(o_orderdate) = 1997) AS p
         |        FROM orders WHERE year(o_orderdate) IN (1996, 1997)
         |        GROUP BY 1))
         |SELECT floor(eu.est_union * 10000 + 0.5) / 10000 AS est_union,
         |  floor(((m.onlya * 1.0 / eu.ku) * eu.est_union) * 10000 + 0.5) / 10000
         |    AS est_diff,
         |  ex.exact_diff
         |FROM eu, m, ex""".stripMargin,

    "sk_quantile_hist" ->
      """WITH h AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice / 256) AS BIGINT) AS bin, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, bin, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM h)
        |SELECT g,
        |  min(CASE WHEN cum >= ceil(n * 0.5)  THEN (bin + 1) * 256 END) AS p50_ub,
        |  min(CASE WHEN cum >= ceil(n * 0.95) THEN (bin + 1) * 256 END) AS p95_ub,
        |  min(CASE WHEN cum >= ceil(n * 0.99) THEN (bin + 1) * 256 END) AS p99_ub,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM cum GROUP BY g""".stripMargin,

    "sk_cms_heavy" ->
      """WITH seeds AS (SELECT * FROM (VALUES (0),(1),(2),(3)) s(seed)),
        |sk AS (
        |  SELECT seed,
        |    CAST(('0x' || substr(md5('cms|' || CAST(l_suppkey AS VARCHAR)), 1 + 8 * seed, 8))::UBIGINT
        |         % 8192 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem CROSS JOIN seeds GROUP BY 1, 2),
        |exact AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS exact_cnt
        |          FROM lineitem GROUP BY 1),
        |top AS (SELECT * FROM exact ORDER BY exact_cnt DESC, l_suppkey LIMIT 10),
        |probe AS (
        |  SELECT t.l_suppkey, t.exact_cnt, s.seed,
        |    CAST(('0x' || substr(md5('cms|' || CAST(t.l_suppkey AS VARCHAR)), 1 + 8 * s.seed, 8))::UBIGINT
        |         % 8192 AS BIGINT) AS bucket
        |  FROM top t CROSS JOIN seeds s)
        |SELECT p.l_suppkey, p.exact_cnt, CAST(min(k.cnt) AS BIGINT) AS cms_est
        |FROM probe p JOIN sk k ON k.seed = p.seed AND k.bucket = p.bucket
        |GROUP BY 1, 2""".stripMargin,

    "bloom_prefilter" ->
      """WITH seeds AS (SELECT * FROM (VALUES ('0'),('1'),('2')) s(seed)),
        |dim AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |bits AS (
        |  SELECT DISTINCT ('0x' || substr(md5('bf' || seed || '|' || CAST(s_suppkey AS VARCHAR)), 1, 8))::UBIGINT
        |         % 4096 AS bit
        |  FROM dim CROSS JOIN seeds),
        |fk AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1),
        |probe AS (
        |  SELECT f.l_suppkey, f.n, s.seed,
        |    ('0x' || substr(md5('bf' || s.seed || '|' || CAST(f.l_suppkey AS VARCHAR)), 1, 8))::UBIGINT
        |    % 4096 AS bit
        |  FROM fk f CROSS JOIN seeds s),
        |pass AS (
        |  SELECT p.l_suppkey, p.n
        |  FROM probe p JOIN bits b ON b.bit = p.bit
        |  GROUP BY 1, 2 HAVING count(DISTINCT p.seed) = 3),
        |tk AS (
        |  SELECT f.l_suppkey, f.n FROM fk f
        |  WHERE EXISTS (SELECT 1 FROM dim d WHERE d.s_suppkey = f.l_suppkey))
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_fact_rows,
        |  (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM pass) AS n_candidate_rows,
        |  (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM tk) AS n_true_rows""".stripMargin,

    "sk_hll_groups" ->
      """WITH hashed AS (
        |  SELECT l_returnflag, md5('hll|' || CAST(l_partkey AS VARCHAR)) AS h
        |  FROM lineitem),
        |bits AS (
        |  SELECT l_returnflag,
        |    ('0x' || substr(h, 1, 2))::UBIGINT AS reg,
        |    regexp_replace(substr(h, 3, 13), '^0+', '') AS t
        |  FROM hashed),
        |regs AS (
        |  SELECT l_returnflag, reg,
        |    max((13 - length(t)) * 4 +
        |        CASE WHEN substr(t, 1, 1) = '1' THEN 3
        |             WHEN substr(t, 1, 1) IN ('2','3') THEN 2
        |             WHEN substr(t, 1, 1) IN ('4','5','6','7') THEN 1
        |             ELSE 0 END + 1) AS mx
        |  FROM bits GROUP BY 1, 2),
        |agg AS (
        |  SELECT l_returnflag,
        |    sum(1::BIGINT << (53 - mx)) AS zp,
        |    count(*) AS nreg
        |  FROM regs GROUP BY 1),
        |est AS (
        |  SELECT l_returnflag,
        |    CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / 256)
        |      * 65536 * CAST(9007199254740992 AS DOUBLE)
        |      / CAST(zp + (256 - nreg) * 9007199254740992 AS DOUBLE) AS raw_e,
        |    256 - nreg AS v
        |  FROM agg),
        |fixed AS (
        |  SELECT l_returnflag,
        |    CASE WHEN raw_e <= 640.0 AND v > 0
        |         THEN 256.0 * ln(CAST(256.0 AS DOUBLE) / CAST(v AS DOUBLE))
        |         ELSE raw_e END AS hll_raw
        |  FROM est),
        |exact AS (
        |  SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
        |  FROM lineitem GROUP BY 1)
        |SELECT e.l_returnflag, e.exact_distinct,
        |  CAST(FLOOR(f.hll_raw * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS hll_est
        |FROM exact e JOIN fixed f ON f.l_returnflag = e.l_returnflag""".stripMargin
  )
}
