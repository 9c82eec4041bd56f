package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Graph analytics: PageRank and the degree-ordered triangle census. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank matches the hand-computed fixpoint on a 2-in-1 funnel") {
    // a→c, b→c: a and b have no in-edges, so from iteration 1 on they sit
    // at (1-d)/N = 0.05; c then receives 0.05 + 0.85·(0.05 + 0.05) = 0.135.
    val edges = Seq(("a", "c"), ("b", "c")).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 3, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr("a") - 0.05) < 1e-12)
    assert(math.abs(pr("b") - 0.05) < 1e-12)
    assert(math.abs(pr("c") - 0.135) < 1e-12)
    // Dangling mass (c has no out-edges) is dropped, never inflated.
    assert(pr.values.sum <= 1.0 + 1e-12)
  }

  test("triangle census: K4 is fully clustered, a path has no triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r = Graph.triangleStats(k4).collect()(0)
    // The census materializes its 1-row result and must release every
    // cached input (edge/degree/oriented/adjacency frames) on return.
    val leaked = spark.sparkContext.getPersistentRDDs
      .filter { case (id, rdd) => !before.contains(id) && !rdd.isCheckpointed }
    assert(leaked.isEmpty,
      s"triangleStats leaked caches: ${leaked.keys.toSeq.sorted}")
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_wedges") === 12L) // 4 · C(3,2)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Double]("clustering") === 1.0)

    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val p = Graph.triangleStats(path).collect()(0)
    assert(p.getAs[Long]("n_triangles") === 0L)
    assert(p.getAs[Long]("n_wedges") === 1L)
    assert(p.getAs[Double]("clustering") === 0.0)
  }

  test("co-purchase census invariants hold on testdata") {
    val r = Graph.queries("graph_triangles")(spark, sf001).collect()(0)
    val (edges, wedges, tris) = (r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
    assert(edges > 0 && wedges > 0)
    assert(tris * 3 <= wedges) // every triangle closes 3 wedges
    val cc = r.getAs[Double]("clustering")
    assert(cc >= 0.0 && cc <= 1.0)
    // Degree-distribution handshake: Σ deg·n_nodes = 2·|E| — against
    // the FULL edge set (the census runs on the deterministic sample).
    val dist = Graph.queries("graph_degree_dist")(spark, sf001)
    val degSum = dist.agg(sum(col("deg") * col("n_nodes"))).head().getLong(0)
    assert(degSum === 2 * Graph.coPurchaseEdges(spark, sf001).count())
    // And the sampled census edge set is a strict subset of the full one.
    assert(edges <= Graph.coPurchaseEdges(spark, sf001).count())
  }

  test("triangle shuffle path (above the edge ceiling) equals the broadcast path") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    def row(df: org.apache.spark.sql.DataFrame) =
      df.collect()(0).toSeq
    assert(row(Graph.triangleStats(k4, broadcastMaxEdges = 0L)) ===
      row(Graph.triangleStats(k4)))
    // and on the real co-purchase graph
    val edges = Graph.coPurchaseEdges(spark, sf001)
    assert(row(Graph.triangleStats(edges, broadcastMaxEdges = 0L)) ===
      row(Graph.triangleStats(edges)))
  }

  test("pageRank switches broadcast → shuffle join above the node ceiling") {
    val edges = Seq(("a", "c"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    // Force a deterministic physical choice: with auto-broadcast off,
    // any BroadcastHashJoin in the round plan can only come from our
    // explicit hint.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def roundPlan(bcast: Boolean): String = {
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        val eDeg = edges.join(
          edges.groupBy("src").agg(count(lit(1)).cast("double").as("deg")), "src")
        val pr0 = nodes.select(col("node"), lit(0.25).as("pr"))
        Graph.prRound(eDeg, nodes, pr0, 4.0, 0.85, bcast)
          .queryExecution.executedPlan.toString
      }
      assert(roundPlan(bcast = true).contains("BroadcastHashJoin"),
        "below the ceiling the rank vector must broadcast")
      assert(!roundPlan(bcast = false).contains("BroadcastHashJoin"),
        "above the ceiling the rank vector must move through the shuffle")
      // And the two formulations agree bit-for-bit on the ranks.
      val bPr = Graph.pageRank(edges, iters = 3, damping = 0.85)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val sPr = Graph.pageRank(edges, iters = 3, damping = 0.85,
          broadcastMaxNodes = 0L) // every graph is "too big" → shuffle mode
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(bPr == sPr)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("weighted reservoir keys recompute exactly from the md5 uniform") {
    val rows = SparkEntry.queries("samp_weighted_reservoir")(spark, sf001).collect()
    assert(rows.length === 100)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val (id, w, key) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val hex = md.digest(s"res|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val expect = math.floor(math.log(u) / w * 1e6 + 0.5) / 1e6
      assert(math.abs(expect - key) < 1e-9, s"doc $id")
    }
    // Weighted by n_chars: the sample must skew long — its mean length
    // sits clearly above the corpus mean (306 at sf0.001).
    val mean = rows.map(_.getLong(1).toDouble).sum / rows.length
    assert(mean > 306.0, s"sample mean $mean not above corpus mean")
  }

  test("link prediction: candidates are non-edges with correct CN/Jaccard") {
    // Square 1-2-4-3-1 plus chord 1-2: predicted links are the two
    // diagonals (1,4) and (2,3), each with 2 common neighbors.
    //   N(1)={2,3}, N(2)={1,4}, N(3)={1,4}, N(4)={2,3}
    // (1,4): CN={2,3}, |N1∪N4|=2+2-2 → jaccard 1.0; same for (2,3).
    val rows = Graph.queries("graph_link_predict")(spark, sf001).collect()
    assert(rows.length === 20)
    // Spot invariants on testdata: scores are ranked, jaccard ∈ (0, 1],
    // cn ≥ 1, and no predicted pair is an existing sampled edge.
    val ranked = rows.map(r => (r.getAs[Long]("cn"), r.getAs[Double]("jaccard")))
    assert(ranked.sliding(2).forall { case Array((c1, j1), (c2, j2)) =>
      c1 > c2 || (c1 == c2 && j1 >= j2) })
    assert(ranked.forall { case (c, j) => c >= 1 && j > 0.0 && j <= 1.0 })
    val edges = Graph.coPurchaseEdges(spark, sf001, sampleHex = Some("3"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall(r =>
      !edges.contains((r.getAs[Long]("a"), r.getAs[Long]("b")))))
  }
}
