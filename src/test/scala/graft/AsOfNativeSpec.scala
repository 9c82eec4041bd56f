package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Native as-of join (AsOfJoinNode → AsOfJoinExec): must be
  * indistinguishable from the window-composition form, with the plan a
  * co-partitioned sorted merge. */
class AsOfNativeSpec extends SparkSuite {

  private def clicksPurchases = {
    val ev = Tables(spark, sf001, "events")
    (ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id")),
      ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
          col("value").as("purchase_value")))
  }

  test("native as-of equals the window-composition form on testdata") {
    val (clicks, purchases) = clicksPurchases
    val native = AsOf.joinNative(clicks, purchases, "user_id", "ts",
      Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("purchase_id"), col("purchase_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val composed = AsOf.join(clicks, purchases, "user_id", "ts",
      Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("asof_purchase_id"), col("asof_purchase_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(native === composed)
    assert(native.nonEmpty)
    assert(native.exists(_._2.isEmpty), "expected some unmatched clicks (left join)")
    assert(native.exists(_._2.nonEmpty), "expected some matched clicks")
  }

  test("native as-of on a hand-built frame: ties inclusive, latest match wins, nulls carried") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 15L, "f"),
      (1L, 5L, "c"), (2L, 10L, "d"), (3L, 10L, "e")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, Some(100L)), (1L, 15L, None), (1L, 16L, Some(160L)), (2L, 11L, Some(200L)))
      .toDF("k", "t", "v")
    val out = AsOf.joinNative(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("a") === Some(100L)) // tie at t=10 matches (inclusive)
    assert(out("b") === Some(160L)) // latest qualifying row (t=16) wins
    assert(out("f") === None) // matched row's NULL payload stays NULL — no back-fill
    assert(out("c") === None) // before any right row
    assert(out("d") === None) // right row at t=11 is after left t=10
    assert(out("e") === None) // key with no right rows at all
  }

  test("forward native as-of equals the forward window-composition form") {
    val (clicks, purchases) = clicksPurchases
    val native = AsOf.joinForwardNative(clicks, purchases, "user_id", "ts",
      Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("purchase_id"), col("purchase_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val composed = AsOf.joinForward(clicks, purchases, "user_id", "ts",
      Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("asof_purchase_id"), col("asof_purchase_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(native === composed)
    assert(native.exists(_._2.nonEmpty))
  }

  test("randomized: native agrees with the composed form in both directions") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val left = Seq.fill(40)((rnd.nextInt(4).toLong, rnd.nextInt(30).toLong))
        .distinct.toDF("k", "t")
      val right = Seq.fill(25)((rnd.nextInt(4).toLong, rnd.nextInt(30).toLong,
        if (rnd.nextBoolean()) Long.box(rnd.nextInt(99).toLong) else null))
        .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq // unique (k,t)
        .toDF("k", "t", "v")
      def normalize(df: org.apache.spark.sql.DataFrame, vCol: String) =
        df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
          Option(r.getAs[java.lang.Long](vCol))).toMap
      assert(normalize(AsOf.joinNative(left, right, "k", "t", Seq("v")), "v") ===
        normalize(AsOf.join(left, right, "k", "t", Seq("v")), "asof_v"))
      assert(normalize(AsOf.joinForwardNative(left, right, "k", "t", Seq("v")), "v") ===
        normalize(AsOf.joinForward(left, right, "k", "t", Seq("v")), "asof_v"))
    }
  }

  test("native as-of plan: custom exec node, one exchange + sort per side") {
    val (clicks, purchases) = clicksPurchases
    val plan = AsOf.joinNative(clicks, purchases, "user_id", "ts",
      Seq("purchase_id", "purchase_value")).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size === 2, plan)
    assert(!plan.contains("Window"), plan) // no union+window materialization
  }

  test("exec metrics report output and matched row counts") {
    // AQE wraps the plan in AdaptiveSparkPlanExec (opaque to collect);
    // run this one un-adaptive so the exec node is reachable.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (clicks, purchases) = clicksPurchases
      val df = AsOf.joinNative(clicks, purchases, "user_id", "ts",
        Seq("purchase_id", "purchase_value"))
      val n = df.count()
      val matchedTruth = df.where(col("purchase_id").isNotNull).count()
      df.collect() // one clean execution of THIS plan to populate metrics
      val exec = df.queryExecution.executedPlan.collectFirst {
        case p if p.nodeName.contains("AsOfJoin") => p
      }.get
      assert(exec.metrics("numOutputRows").value === n)
      assert(exec.metrics("numMatched").value === matchedTruth)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
