package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over relationships implicit in the star schema — the
  * natural extension of the dedup-cluster work (DedupCluster.scala gives
  * components; this module adds centrality and local structure). The
  * reference has no graph ops (its only key-matching is the upsert
  * anti-join, SURVEY §2.3 / collect/consumer.py:81), but a training-data
  * pipeline needs them: PageRank-style authority weighting for source
  * quality, and triangle/clustering statistics to characterize near-dup
  * candidate graphs before purging.
  *
  * Scale design:
  *  - PageRank is the canonical iterative join+agg. The edge list is
  *    persisted once (with its static degrees broadcast-joined on);
  *    each round broadcasts the node-sized rank vector into the edge
  *    scan — no edge shuffle per iteration, only the map-side-combined
  *    inflow aggregation — and is materialized before the next round
  *    consumes it (nested lazy broadcasts re-execute their child
  *    plans, so unmaterialized rounds would cost 1+2+…+k). On a graph
  *    whose node set outgrows broadcast, dropping the hints degrades
  *    gracefully to the co-partitioned shuffle-join formulation.
  *  - Triangle counting uses the degree-orientation trick (orient every
  *    undirected edge from the (degree, id)-smaller endpoint to the
  *    larger; count oriented wedges closed by an oriented edge). Each
  *    triangle is counted exactly once and the wedge set shrinks from
  *    Σ C(deg,2) to Σ C(outdeg,2) with outdeg ≤ √(2|E|) — on a 100 TB
  *    co-occurrence graph the difference between a feasible shuffle and
  *    an explosion around hub nodes. The joins are plain equi-joins on
  *    edge keys, so Catalyst handles partial aggregation/AQE as usual.
  */
object Graph {

  private val Damping = 0.85
  private val PrIters = 3

  /** All ordered pairs (a, b), a-before-b, from a SORTED array column —
    * the map-side C(n,2) fan-out shared by the co-purchase edge build
    * and both link-prediction wedge expansions. Bounds are 1-based
    * (Spark `slice`): element i pairs with the i+2..n suffix. */
  private def sortedPairs(ns: org.apache.spark.sql.Column,
      a: String, b: String): org.apache.spark.sql.Column =
    flatten(transform(ns, (x, i) =>
      transform(slice(ns, i + lit(2), size(ns) - i - 1), y =>
        struct(x.as(a), y.as(b)))))

  /** Customer→supplier interaction edges: one directed edge per distinct
    * (customer, supplier) trade in the order history. Node ids are
    * mapped into disjoint long ranges (customer → 2k, supplier → 2k+1):
    * integer keys keep every downstream shuffle/aggregation primitive
    * (string ids measured ~2× slower across the whole query). */
  def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    // Disk artifact (ArtifactCache): the edge list is a pure function
    // of lineitem×orders, and its 60 M-row join+distinct was 48.6 s of
    // graph_pagerank's 64.5 s at the 100× corpus — built once per
    // corpus generation, read thereafter.
    ArtifactCache.parquet(spark, dir, "trade-edges", Seq("lineitem", "orders")) {
      val li = Tables(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
    }

  /** Undirected co-purchase edges between parts appearing in the same
    * order, canonicalized u < v. Self-join of lineitem on the order key:
    * the shuffle is on l_orderkey, and the per-order pair fan-out is
    * C(items-per-order, 2) — bounded, since orders are small.
    *
    * `sampleHex` keeps only orders whose md5 first hex digit is below
    * it — deterministic order-sampling (the same subgraph on every
    * engine, run, and cluster size). The triangle census uses ~19 %
    * ('3'): the co-purchase graph's average degree grows linearly with
    * the corpus, so wedge work grows quadratically — on the full sf0.1
    * graph the exact census is a 16 M-wedge join (~60 s); on the
    * deterministic sample it keeps the same plan shape at 1/28 the
    * cost. Full-graph exactness is still covered at the smaller SFs. */
  def coPurchaseEdges(spark: SparkSession, dir: String,
      sampleHex: Option[String] = None): DataFrame =
    // Disk artifact per sample variant — shared by the census, the
    // degree profile and link prediction (all rebuilt this edge list
    // per session before).
    ArtifactCache.parquet(spark, dir,
        s"copurchase-edges-${sampleHex.getOrElse("full")}",
        Seq("lineitem")) {
      val li0 = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val li = sampleHex match {
        case Some(h) => li0.where(
          substring(md5(concat(lit("gs|"), col("ok").cast("string"))), 1, 1) < h)
        case None => li0
      }
      // One shuffle to per-order part sets, then the C(items,2) pair
      // fan-out stays map-side (orders are small) — measured ~25% faster
      // than the self-join + filter form, which shuffles lineitem twice.
      val ps = li.groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      ps.select(explode(sortedPairs(col("ps"), "u", "v")).as("p"))
        .select(col("p.u"), col("p.v")).distinct()
    }

  /** One propagation round as a plan (shared by the loop and the plan-
    * pinning spec): inflow aggregation + damped update. `bcast` selects
    * the physical strategy for BOTH node-sized joins — broadcast (edges
    * never shuffle) vs co-partitioned shuffle join (for graphs whose
    * node set outgrows executor memory; `eDeg`/`nodes` arrive pre-hash-
    * partitioned on the join keys, so only the node-sized side moves). */
  private[graft] def prRound(eDeg: DataFrame, nodes: DataFrame,
      pr: DataFrame, n: Double, damping: Double, bcast: Boolean): DataFrame = {
    def hint(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val inflow = eDeg
      .join(hint(pr.withColumnRenamed("node", "src")), "src")
      .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
      .groupBy("node").agg(sum(col("c")).as("inflow"))
    nodes
      .join(hint(inflow), Seq("node"), "left")
      .select(col("node"),
        (lit((1 - damping) / n) +
          lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
  }

  /** Node count above which the per-round rank vector stops being
    * broadcast and the co-partitioned shuffle formulation engages. At
    * ~16 bytes/row a 50 M-node rank vector is ~1 GB per executor —
    * around the practical broadcast ceiling on a standard 8-16 GB
    * executor; beyond it the rank vector must move through the shuffle,
    * not the driver. */
  val PrBroadcastMaxNodes = 50L * 1000 * 1000

  /** Edge count above which the triangle census's adjacency table stops
    * being broadcast: at ~10 bytes per adjacency entry, 100 M edges is
    * ~1 GB of neighbor arrays — the practical broadcast ceiling. */
  val TriBroadcastMaxEdges = 100L * 1000 * 1000

  /** Per-hub neighbor quota for graph_link_predict_capped — the single
    * quality/cost knob of the capped variant. Interpolated into its
    * DuckDB oracle so the two sides can never drift. */
  val LinkPredQuota = 32

  /** BFS round cap — hop distances beyond this are not computed (both
    * the Spark frontier loop and the recursive oracle stop here, so
    * the "distance ≤ cap" semantics are shared exactly). */
  val BfsMaxHops = 4

  /** Simplified PageRank, fixed iteration count: uniform init 1/N, then
    * pr'(v) = (1-d)/N + d·Σ_{u→v} pr(u)/outdeg(u). Dangling mass (nodes
    * with no out-edges) is dropped, not redistributed — ranks sum to < 1,
    * which is fine for the relative-ordering use and keeps the oracle an
    * exact SQL unroll. Returns (node, pr) for every node.
    *
    * Physical strategy is size-switched on the MEASURED node count (it
    * is already counted for the 1/N init, so the switch is free):
    *  - n ≤ broadcastMaxNodes: the rank vector is node-sized — broadcast
    *    it into the edge scan, so edges never shuffle; the only shuffle
    *    per round is the map-side-combined inflow aggregation.
    *  - n > broadcastMaxNodes: broadcasting would OOM the executors —
    *    pre-hash-partition the edge list on `src` (and the node list on
    *    `node`) ONCE outside the loop; each round's joins then reuse
    *    that partitioning (persisted InMemoryRelation reports its
    *    outputPartitioning), so only the node-sized rank vector moves
    *    per round, never the edges. */
  def pageRank(edges: DataFrame, iters: Int = PrIters, damping: Double = Damping,
      broadcastMaxNodes: Long = PrBroadcastMaxNodes): DataFrame = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val nodesPre = nodes0.persist(StorageLevel.MEMORY_AND_DISK)
    val nCount = nodesPre.count()
    val n = nCount.toDouble
    val bcast = nCount <= broadcastMaxNodes
    val nodes =
      if (bcast) nodesPre
      else {
        // Shuffle mode: pin the partitioning the per-round joins need.
        val repart = nodes0.repartition(col("node"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        repart.count()
        nodesPre.unpersist(blocking = false)
        repart
      }
    // Degree is static — join it onto the edges once, outside the loop
    // (degrees are node-sized: broadcast, no edge shuffle).
    val eDeg0 = e
      .join(broadcast(e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))), "src")
    val eDeg = (if (bcast) eDeg0 else eDeg0.repartition(col("src")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    eDeg.count()
    e.unpersist(blocking = false)
    var pr = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    var prevPersisted: DataFrame = null
    for (_ <- 1 to iters) {
      // Materialize each round before the next consumes it: the next
      // round's broadcast would otherwise re-execute this round's plan
      // lazily (nested broadcast exchanges rebuild their child plans,
      // they don't remember prior collections), turning 3 rounds of
      // work into 1+2+3. The persist keeps lineage one round deep; the
      // predecessor is freed eagerly.
      val next = prRound(eDeg, nodes, pr, n, damping, bcast)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      if (prevPersisted != null) prevPersisted.unpersist(blocking = false)
      prevPersisted = next
      pr = next
    }
    // pr is persisted and materialized, so releasing the upstream
    // caches cannot trigger a recompute in the caller.
    eDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    pr
  }

  /** Global triangle census of an undirected (u < v) edge list:
    * node/edge/wedge/triangle counts and the global clustering
    * coefficient 3·triangles / wedges.
    *
    * Counting is edge-iterator-with-orientation: orient every edge from
    * the (deg, id)-smaller endpoint, build each node's sorted out-
    * neighbor array once, and per oriented edge (a,b) count
    * |N⁺(a) ∩ N⁺(b)| — each triangle closes exactly one oriented edge.
    * Versus materializing the wedge set (Σ C(outdeg,2) rows — 41 M at
    * sf0.1, the r3 formulation sampled to stay feasible) this shuffles
    * only |E| rows carrying arrays bounded by the orientation's
    * outdeg ≤ √(2|E|) cap, which is what makes the FULL census run in
    * seconds — no sampling. The intersect stays inside codegen. */
  def triangleStats(edges: DataFrame,
      broadcastMaxEdges: Long = TriBroadcastMaxEdges): DataFrame = {
    val (out, cleanup) = triangleStatsPlan(edges, broadcastMaxEdges)
    // The census result is ONE row — materialize it driver-side so every
    // cached input (edge list, degrees, oriented edges, the shuffled
    // adjacency) is released before returning; a lazy return would pin
    // all four frames in the block manager for the session (the
    // inc_cc_merge leak class; the collect is bounded by the 1-row
    // cross-join of scalar aggregates).
    // finally: a failed census job must still release the caches, or
    // an error-tolerant driver session carries them forever.
    val rows = try out.collect().toSeq finally cleanup()
    val s = edges.sparkSession
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
  }

  /** The census' LAZY plan plus a cleanup handle for its caches — split
    * out so PlanSpec can pin the physical shape (broadcast adjacency,
    * codegen'd sorted-intersect kernel) before materialization. */
  private[graft] def triangleStatsPlan(edges: DataFrame,
      broadcastMaxEdges: Long = TriBroadcastMaxEdges): (DataFrame, () => Unit) = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Orient each edge from the (deg, id)-smaller endpoint to the larger;
    // a struct comparison gives the lexicographic (deg, id) order.
    val er = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val lower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = er.select(
      when(lower, col("u")).otherwise(col("v")).as("src"),
      when(lower, col("v")).otherwise(col("u")).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = oriented.count()
    val adj0 = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    // Inner joins are lossless in both branches: src always has an
    // adjacency row (it owns ≥1 out-edge), and a dst with no out-edges
    // contributes zero to the sum anyway.
    // Per-edge kernel: |N⁺(a) ∩ N⁺(b)| by the codegen'd two-pointer
    // merge over the sorted arrays (array_intersect hash-builds per
    // row — millions of allocations per census).
    def census(withNa: DataFrame) = withNa
      .agg(coalesce(sum(
          graft.functions.Vectors.sortedIntersectCount(col("na"), col("nb"))), lit(0L))
        .cast("long").as("n_triangles"))
    var adjPersisted: Option[DataFrame] = None
    val tri =
      if (edgeCount <= broadcastMaxEdges) {
        // Small-graph plan: the src-side join is already co-partitioned
        // (adj is a groupBy(src) over the same hash) so it shuffles
        // nothing extra; the node-sized adjacency broadcasts into the
        // dst side, so no edge row ever re-shuffles with its array
        // attached.
        census(oriented
          .join(adj0.select(col("src"), col("nbrs").as("na")), "src")
          .join(broadcast(adj0.select(col("src").as("dst"), col("nbrs").as("nb"))), "dst"))
      } else {
        // Above the ceiling the adjacency can't broadcast and one of
        // the two arrays must ride a shuffle — O(wedge-volume), the
        // MapReduce census bound. Order the joins to ship the CHEAPER
        // side: degree orientation points edges at the (deg, id)-larger
        // endpoint, so dst nodes are the high-degree ones with the
        // SMALL out-lists — Σ|N⁺(dst)| = Σ indeg·outdeg is measured
        // ~0.6× of Σ|N⁺(src)| = Σ outdeg² on the co-purchase graph.
        // Attach nb (dst side) first, then join on src, where the
        // persisted adjacency's groupBy(src) partitioning is reused —
        // the heavy na arrays attach at their home partitions and
        // never move. adj persists (not ReusedExchange) because the
        // two references differ by join key, and the second must
        // report its outputPartitioning to skip the exchange.
        val adj = adj0.persist(StorageLevel.MEMORY_AND_DISK)
        adjPersisted = Some(adj)
        adj.count()
        census(oriented
          .join(adj.select(col("src").as("dst"), col("nbrs").as("nb")), "dst")
          .join(adj.select(col("src"), col("nbrs").as("na")), "src"))
      }
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val wedges = deg.agg(sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    val out = nNodes.crossJoin(nEdges).crossJoin(wedges).crossJoin(tri)
      .withColumn("clustering",
        Num.roundp(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
    val cleanup = () => {
      e.unpersist(blocking = false)
      deg.unpersist(blocking = false)
      oriented.unpersist(blocking = false)
      adjPersisted.foreach(_.unpersist(blocking = false))
    }
    (out, cleanup)
  }

  /** The capped link-prediction plan: returns the lazy top-20 frame
    * (plan-pinned in PlanSpec: in-list wedge expansion, no pair join,
    * TakeOrderedAndProject) plus the PERSISTED capped adjacency it
    * hangs off. The adjacency feeds THREE consumers (the wedge explode
    * and both degree joins) — persisting it runs the corpus-sized
    * adjacency aggregation once, not per consumer (r11 watch item:
    * 3.4 → 2.7 s at sf0.1, 19.1 → 15.9 s at the 10× decade,
    * steady-state; the table is node-sized, so the footprint is
    * bounded). The caller must unpersist after materializing. */
  private[graft] def cappedLinkPredict(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val Q = LinkPredQuota
    val e = coPurchaseEdges(s, dir)
    val adj = e.select(col("u").as("node"), col("v").as("nb"))
      .union(e.select(col("v").as("node"), col("u").as("nb")))
    // Pre-cap BEFORE collecting (r13): slice(collect_set)) capped the
    // wedge fan-out but still buffered a hot hub's ENTIRE adjacency in
    // the aggregation buffer — the same OOM class as percentile().
    // The rank window sorts through the external sorter (spills), the
    // filter keeps ≤ Q rows per node, and only then does a now-bounded
    // collect build the neighbor list. Edges are distinct by
    // construction (coPurchaseEdges ends in .distinct()), so "Q
    // smallest distinct neighbors" is preserved exactly.
    val nbrs = adj
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("node")).orderBy(col("nb"))))
      .where(col("rn") <= Q)
      .groupBy("node")
      .agg(sort_array(collect_list(col("nb"))).as("ns"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = nbrs.select(col("node"), size(col("ns")).cast("long").as("deg"))
    val wedges = nbrs.select(explode(sortedPairs(col("ns"), "a", "b")).as("p"))
      .select(col("p.a"), col("p.b"))
    val cn = wedges.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
    val cand = cn.join(e, cn("a") === e("u") && cn("b") === e("v"), "left_anti")
    val top = cand
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"), col("cn"),
        // cn can exceed the CAPPED degree sum (middles count a/b via
        // their own capped lists), so the union estimate is clamped
        // to ≥1 — quota-jaccard is a bounded-cost approximation.
        Num.roundp(col("cn").cast("double") /
          greatest(col("da") + col("db") - col("cn"), lit(1L)), 6)
          .as("jaccard"))
      .orderBy(col("cn").desc, col("jaccard").desc, col("a"), col("b"))
      .limit(20)
    (top, nbrs)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── PageRank authority over the customer→supplier trade graph,
    // 3 fixed iterations (oracle = exact SQL unroll). Customers have no
    // in-edges, so their rank settles at (1-d)/N; suppliers accumulate
    // authority ∝ trade breadth. ─────────────────────────────────────
    "graph_pagerank" -> ((s, dir) =>
      pageRank(tradeEdges(s, dir))
        .select(col("node"), Num.roundp(col("pr") * 1000.0, 6).as("pr_k"))),

    // ── Degree distribution of the part co-purchase graph — the
    // profile that decides whether the triangle join is safe to run
    // (hub detection before the quadratic wedge fan-out). Full graph:
    // this one is linear in the edges. ───────────────────────────────
    "graph_degree_dist" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir)
      e.select(col("u").as("node")).union(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
    }),

    // ── Triangle census + global clustering coefficient — EXACT on the
    // full graph: the edge-iterator form (per-edge out-neighbor
    // intersect) killed the wedge materialization that previously
    // forced a ~19 % sample at sf0.1. ────────────────────────────────
    "graph_triangles" -> ((s, dir) =>
      triangleStats(coPurchaseEdges(s, dir))),

    // ── Common-neighbor link prediction on the co-purchase graph:
    // non-adjacent pairs at distance 2, scored by shared-neighbor count
    // and neighbor-Jaccard, top 20. UNLIKE triangles, the wedge set IS
    // the candidate set here, so the edge-iterator trick can't avoid
    // materializing it — Σ C(deg,2) work by construction. The same
    // deterministic md5 order-sample that bounded the pre-edge-iterator
    // census ('3' → ~19 %) bounds it; on a real deployment the cap is a
    // per-hub neighbor quota instead of a global sample. Integer counts
    // all the way: the only float is the final quantized ratio. ──────
    "graph_link_predict" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir, sampleHex = Some("3"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val adj = e.select(col("u").as("node"), col("v").as("nb"))
        .union(e.select(col("v").as("node"), col("u").as("nb")))
      // One adjacency aggregation feeds all three consumers: the edges
      // are DISTINCT pairs, so the true degree IS the neighbor-list
      // size — deriving deg from the persisted nbrs saves the second
      // corpus-sized groupBy the old plan paid (same shape as the
      // capped variant's r12 fix).
      val nbrs = adj.groupBy("node")
        .agg(sort_array(collect_set(col("nb"))).as("ns"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = nbrs.select(col("node"), size(col("ns")).cast("long").as("deg"))
      // Same in-list pair expansion as coPurchaseEdges: wedge (a, b)
      // through each middle node, a < b canonical.
      val wedges = nbrs.select(explode(sortedPairs(col("ns"), "a", "b")).as("p"))
        .select(col("p.a"), col("p.b"))
      val cn = wedges.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
      val cand = cn.join(e, cn("a") === e("u") && cn("b") === e("v"), "left_anti")
      val top = cand
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .select(col("a"), col("b"), col("cn"),
          Num.roundp(col("cn").cast("double") /
            (col("da") + col("db") - col("cn")), 6).as("jaccard"))
        .orderBy(col("cn").desc, col("jaccard").desc, col("a"), col("b"))
        .limit(20)
      // Materialize the (20-row) result via the TakeOrderedAndProject
      // driver-side top-k (a localCheckpoint here re-executes through
      // the .rdd path and loses that fast path — measured 9.1 s vs
      // 4.8 s), then drop the cached edge blocks so they don't
      // accumulate across a 219-query session. The collect is bounded
      // by the LIMIT 20.
      val rows = top.collect().toSeq
      e.unpersist(blocking = false)
      nbrs.unpersist(blocking = false)
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), top.schema)
    }),

    // ── Link prediction, PRODUCTION SCALE PATH: the per-hub neighbor
    // QUOTA the sampled variant's comment promises. Each node keeps its
    // Q smallest neighbor ids (deterministic truncation — the standard
    // hub cap in production link prediction), so wedge work is bounded
    // by Σ C(min(deg,Q),2) ≤ N·C(Q,2): LINEAR in nodes at any scale,
    // no sampling needed — this runs on the FULL graph the md5-sample
    // variant subsets. Scores are quota-approximate by construction
    // (cn counts middles via capped lists; jaccard uses capped
    // degrees); ranking quality degrades gracefully with Q while the
    // cost bound is hard. ────────────────────────────────────────────
    "graph_link_predict_capped" -> ((s, dir) => {
      val (top, nbrs) = cappedLinkPredict(s, dir)
      // Materialize via the TakeOrderedAndProject driver top-k (LIMIT-
      // bounded collect), then drop the cached adjacency blocks.
      val rows = top.collect().toSeq
      nbrs.unpersist(blocking = false)
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), top.schema)
    }),

    // ── Multi-source BFS hop distance over the (undirected) trade
    // graph, frontier-based: each round joins ONLY the newly-discovered
    // frontier against the edges and anti-joins the settled set — the
    // scale-correct BFS (joining the full distance map per round grows
    // quadratically at scale; the frontier shrinks as the wave
    // saturates). Rounds are capped at [[BfsMaxHops]] and exit EARLY on
    // an empty frontier (localCheckpoint is eager, so the emptiness
    // check is a local lookup, not a recompute); per-round
    // localCheckpoint truncates the iterative lineage (the fixpoint
    // replay hazard — see inc_cc_merge's postmortem). The doubled edge
    // list is persisted once across the rounds instead of re-deriving
    // the union from the artifact per join. Oracle: a recursive CTE
    // with the same cap, min-d per node ≡ first-discovery round.
    // Seeds: ALL graph nodes with id < 10 — in the 2k/2k+1 node
    // encoding that is customers with custkey < 5 AND suppliers with
    // suppkey < 5 (the odd ids 1,3,5,7,9). ────────────────────────────
    "graph_bfs_hops" -> ((s, dir) => {
      val e0 = tradeEdges(s, dir)
      val edges = e0.select(col("src"), col("dst"))
        .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var dist = edges.where(col("src") < 10).select(col("src").as("node"))
        .distinct().withColumn("hops", lit(0L)).localCheckpoint()
      var frontier = dist.select(col("node"))
      var r = 1
      var emptied = false
      // try/finally: a throwing round must still release the edge cache
      // (the session-lifetime leak class the triangle census and
      // inc_cc_merge close the same way).
      try {
        while (r <= BfsMaxHops && !emptied) {
          val reached = frontier.join(edges, frontier("node") === edges("src"))
            .select(col("dst").as("node")).distinct()
          frontier = reached.join(dist, Seq("node"), "left_anti").localCheckpoint()
          if (frontier.isEmpty) emptied = true
          else {
            dist = dist
              .unionByName(frontier.withColumn("hops", lit(r.toLong)))
              .localCheckpoint()
            r += 1
          }
        }
        // dist is checkpoint-backed — the edge cache has no consumers left.
      } finally edges.unpersist(blocking = false)
      org.slf4j.LoggerFactory.getLogger("graft.operators.Graph").info(
        s"graph_bfs_hops: ${r - 1} rounds run" +
          (if (emptied) " (frontier emptied early)" else " (hop cap reached)"))
      dist
    })
  )

  def oracles: Map[String, String] = Map(
    "graph_bfs_hops" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT DISTINCT o_custkey * 2 AS src,
         |                  l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |ee AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
         |walk(node, d) AS (
         |  SELECT DISTINCT src AS node, 0 AS d FROM ee WHERE src < 10
         |  UNION
         |  SELECT ee.dst, w.d + 1 FROM walk w
         |  JOIN ee ON ee.src = w.node WHERE w.d < $BfsMaxHops)
         |SELECT node, CAST(min(d) AS BIGINT) AS hops
         |FROM walk GROUP BY node""".stripMargin,

    "graph_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey * 2 AS src,
        |                  l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src),
        |p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
        |p1 AS (SELECT nd.node, 0.15 / (SELECT n FROM nn)
        |              + 0.85 * COALESCE(f.inflow, 0) AS pr
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.dst AS node, sum(p.pr / d.deg) AS inflow
        |         FROM e JOIN p0 p ON p.node = e.src
        |                JOIN deg d ON d.src = e.src
        |         GROUP BY e.dst) f ON f.node = nd.node),
        |p2 AS (SELECT nd.node, 0.15 / (SELECT n FROM nn)
        |              + 0.85 * COALESCE(f.inflow, 0) AS pr
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.dst AS node, sum(p.pr / d.deg) AS inflow
        |         FROM e JOIN p1 p ON p.node = e.src
        |                JOIN deg d ON d.src = e.src
        |         GROUP BY e.dst) f ON f.node = nd.node),
        |p3 AS (SELECT nd.node, 0.15 / (SELECT n FROM nn)
        |              + 0.85 * COALESCE(f.inflow, 0) AS pr
        |       FROM nodes nd LEFT JOIN (
        |         SELECT e.dst AS node, sum(p.pr / d.deg) AS inflow
        |         FROM e JOIN p2 p ON p.node = e.src
        |                JOIN deg d ON d.src = e.src
        |         GROUP BY e.dst) f ON f.node = nd.node)
        |SELECT node,
        |  CAST(FLOOR(pr * 1000.0 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS pr_k
        |FROM p3""".stripMargin,

    "graph_degree_dist" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        |        GROUP BY node)
        |SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY deg""".stripMargin,

    "graph_triangles" ->
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        |        GROUP BY node),
        |o AS MATERIALIZED (
        |      SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS src,
        |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS dst
        |      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |        FROM o o1 JOIN o o2 ON o1.src = o2.src
        |             JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |       (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
        |       n_triangles,
        |       CAST(FLOOR(3.0 * n_triangles / (SELECT sum(deg * (deg - 1) // 2) FROM deg)
        |                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS clustering
        |FROM tri""".stripMargin,

    "graph_link_predict" ->
      """WITH li AS (
        |  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |  WHERE substr(md5('gs|' || CAST(l_orderkey AS VARCHAR)), 1, 1) < '3'),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |adj AS MATERIALIZED (
        |  SELECT u AS node, v AS nb FROM e UNION ALL SELECT v, u FROM e),
        |deg AS MATERIALIZED (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY node),
        |w AS (
        |  SELECT a1.nb AS a, a2.nb AS b
        |  FROM adj a1 JOIN adj a2 ON a1.node = a2.node AND a1.nb < a2.nb),
        |cn AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn FROM w GROUP BY a, b),
        |cand AS (
        |  SELECT cn.a, cn.b, cn.cn FROM cn
        |  ANTI JOIN e ON e.u = cn.a AND e.v = cn.b)
        |SELECT c.a, c.b, c.cn,
        |  floor(CAST(c.cn AS DOUBLE) / (da.deg + db.deg - c.cn) * 1000000 + 0.5)
        |    / 1000000 AS jaccard
        |FROM cand c JOIN deg da ON da.node = c.a JOIN deg db ON db.node = c.b
        |ORDER BY c.cn DESC, jaccard DESC, c.a, c.b LIMIT 20""".stripMargin,

    "graph_link_predict_capped" ->
      s"""WITH li AS (
        |  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |adj AS (
        |  SELECT u AS node, v AS nb FROM e UNION ALL SELECT v, u FROM e),
        |nbrs AS MATERIALIZED (
        |  SELECT node, list_sort(list(nb))[:$LinkPredQuota] AS ns FROM adj GROUP BY node),
        |deg AS MATERIALIZED (
        |  SELECT node, CAST(len(ns) AS BIGINT) AS deg FROM nbrs),
        |cadj AS (SELECT node, unnest(ns) AS nb FROM nbrs),
        |w AS (
        |  SELECT a1.nb AS a, a2.nb AS b
        |  FROM cadj a1 JOIN cadj a2 ON a1.node = a2.node AND a1.nb < a2.nb),
        |cn AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn FROM w GROUP BY a, b),
        |cand AS (
        |  SELECT cn.a, cn.b, cn.cn FROM cn
        |  ANTI JOIN e ON e.u = cn.a AND e.v = cn.b)
        |SELECT c.a, c.b, c.cn,
        |  floor(CAST(c.cn AS DOUBLE)
        |      / greatest(da.deg + db.deg - c.cn, 1) * 1000000 + 0.5)
        |    / 1000000 AS jaccard
        |FROM cand c JOIN deg da ON da.node = c.a JOIN deg db ON db.node = c.b
        |ORDER BY c.cn DESC, jaccard DESC, c.a, c.b LIMIT 20""".stripMargin
  )
}
