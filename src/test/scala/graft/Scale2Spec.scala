package graft

import graft.operators.{Scale2, SimJoin}
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-technique parity: every query in Scale2/SimJoin must equal the
  * naive plan it replaces — the technique changes the plan, not the
  * answer. */
class Scale2Spec extends SparkSuite {

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("cdc apply == window latest-row with tombstone filter") {
    val got = SparkEntry.queries("cdc_apply_latest")(spark, sf001)
    val e = Tables(spark, sf001, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
    val want = e.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_op"),
        functions.Num.roundp(col("value"), 4).as("last_value"), col("us").as("last_us"))
    assert(rowSet(got) === rowSet(want))
    assert(got.count() > 0)
  }

  test("binned interval join == direct theta join") {
    val got = SparkEntry.queries("iv_overlap_join")(spark, sf001)
    val o = Tables(spark, sf001, "orders")
    def iv(m: Int, r: Int, t: String) = o.where(col("o_orderkey") % m === r)
      .select(col("o_orderkey").as(s"${t}_key"),
        col("o_orderdate").cast("date").as(s"${t}_start"),
        date_add(col("o_orderdate").cast("date"), 14).as(s"${t}_end"))
    val want = iv(31, 0, "a").crossJoin(iv(37, 5, "b"))
      .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("a_key"), col("b_key"),
        (datediff(least(col("a_end"), col("b_end")),
          greatest(col("a_start"), col("b_start"))) + 1).as("overlap_days"))
    assert(rowSet(got) === rowSet(want))
    assert(got.count() > 0)
  }

  test("salted aggregation == direct groupBy, bit-exact (integer cents)") {
    val got = SparkEntry.queries("skew_salted_agg")(spark, sf001)
    val key = when(col("l_orderkey") % 10 < 7, lit("hot"))
      .otherwise(concat(lit("k"), (col("l_orderkey") % 100).cast("string")))
    val want = Tables(spark, sf001, "lineitem")
      .groupBy(key.as("k"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("sum_price_cents"))
    assert(rowSet(got) === rowSet(want))
    // The hot key really is hot: ~70 % of rows.
    val hot = got.where(col("k") === "hot").select(col("n_rows")).head().getLong(0)
    val all = Tables(spark, sf001, "lineitem").count()
    assert(hot > all * 6 / 10 && hot < all * 8 / 10)
  }

  test("salted join == plain join") {
    val got = SparkEntry.queries("skew_salted_join")(spark, sf001)
    val want = Tables(spark, sf001, "lineitem")
      .join(Tables(spark, sf001, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("rev_cents"))
    assert(rowSet(got) === rowSet(want))
  }

  test("equi-depth buckets: counts differ by ≤1 within a priority, ranges tile") {
    val h = SparkEntry.queries("hist_equidepth")(spark, sf001)
    h.groupBy("o_orderpriority")
      .agg((max(col("n")) - min(col("n"))).as("spread"), count(lit(1)).as("nb"))
      .collect().foreach { r =>
        assert(r.getLong(1) <= 1, s"${r.getString(0)} bucket counts uneven")
        assert(r.getLong(2) === 10L)
      }
    // Buckets are ordered: lo of bucket k ≥ hi of bucket k-1 is NOT
    // guaranteed at equal prices, but hi must be non-decreasing.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority").orderBy("bucket")
    val bad = h.withColumn("prev_hi", lag(col("hi"), 1).over(w))
      .where(col("prev_hi").isNotNull && col("hi") < col("prev_hi")).count()
    assert(bad === 0L)
  }

  test("banded levenshtein agrees with the full distance under the band") {
    val d = SparkEntry.queries("x_levenshtein")(spark, sf001)
    val bad = d.where(
      (col("lev") <= 10 && col("lev_band") =!= col("lev")) ||
      (col("lev") > 10 && col("lev_band") =!= -1)).count()
    assert(bad === 0L)
    assert(d.count() > 0)
  }

  test("prefix-filtered similarity join == brute-force all-pairs (lossless)") {
    val ex = Tables(spark, sf001, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("tok"))
      .select(col("doc_id"), explode(Text.shingles(col("tok"), 3)).as("tok"))
      .distinct()
    val got = SimJoin.prefixJoin(ex, SimJoin.Tau)
    // Brute force: every pair via the full token equi-join (no prefix).
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = ex.toDF("a", "tok").join(ex.toDF("b", "tok"), "tok")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("i"))
    val j = col("i").cast("double") /
      (col("sa.sz") + col("sb.sz") - col("i")).cast("double")
    val want = inter
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .where(j >= SimJoin.Tau)
      .select(col("a"), col("b"), functions.Num.roundp(j, 4).as("jacc"))
    assert(rowSet(got) === rowSet(want))
    assert(got.count() > 0)
    // Lossless ⊇ probabilistic: every LSH-verified pair (same sets,
    // same τ) must appear in the prefix-filtered result.
    val lsh = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf001)
      .select(col("a"), col("b"))
    val missed = lsh.exceptAll(got.select(col("a"), col("b"))).count()
    assert(missed === 0L)
  }
}
