package graft.operators

import graft.Tables
import graft.functions.Num
import graft.functions.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - brute-force cosine top-k: exact baseline, broadcast the (small)
  *    query set against the corpus — one pass, no shuffle of the corpus;
  *  - IVF-style assignment: each vector is routed to its nearest
  *    centroid; at scale the centroid set is broadcast and search probes
  *    only matching cells instead of the full corpus;
  *  - embedding near-dup pairs: label-blocked cosine >= τ (blocking keys
  *    bound the pair blow-up the same way LSH bands do for text).
  *
  * All vector math is `Vectors.dot`-style sequential double folds
  * (codegen'd higher-order functions) so an oracle computing the same
  * fold matches to ~1e-14 — scores are rounded well above that.
  */
object Similarity {

  val queries: Map[String, Relational.Q] = Map(

    // ── int8 scalar quantization of the embedding corpus: per-DIM
    // affine codes (min/max over the corpus, 256 levels) — the 4×
    // memory cut that makes a billion-vector ANN index RAM-resident.
    // Reports per-vector reconstruction error (L∞, MSE) and the
    // original↔reconstructed cosine (the recall proxy: ANN over int8
    // is sound iff this stays ≈1). Dim stats are a 64-row broadcast;
    // integer codes are exact IEEE arithmetic, so both engines
    // quantize identically. ──────────────────────────────────────────
    "sim_quantize_int8" -> ((s, dir) => {
      val x = Tables(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("d"), col("col").cast("double").as("v"))
      val dims = x.groupBy(col("d"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        .withColumn("scale", (col("hi") - col("lo")) / 255.0)
      val code = when(col("scale") === 0, lit(0)).otherwise(
        least(lit(255.0), greatest(lit(0.0),
          floor((col("v") - col("lo")) / col("scale") + 0.5))).cast("int"))
      val r = x.join(broadcast(dims), "d")
        .withColumn("recon", col("lo") + code.cast("double") * col("scale"))
      val cosRec = sum(col("v") * col("recon")) /
        (sqrt(sum(col("v") * col("v"))) * sqrt(sum(col("recon") * col("recon"))))
      r.groupBy(col("vec_id")).agg(
        Num.roundp(max(abs(col("recon") - col("v"))), 6).as("linf"),
        Num.roundp(avg((col("recon") - col("v")) * (col("recon") - col("v"))), 8).as("mse"),
        Num.roundp(cosRec, 6).as("cos_rec"))
    }),

    // ── Recall of int8-quantized search against exact search: top-5 by
    // cosine over RECONSTRUCTED vectors vs the full-precision top-5,
    // recall@5 per query. The quantized dot is the classic
    // matrix-multiply-as-join-aggregate (explode dims, join on d, sum
    // products) — the shape a 100 TB engine uses when vectors live as
    // (id, dim, value) shards. Recall 1.0 here is the empirical license
    // to serve ANN from the 4×-smaller codes. ────────────────────────
    "sim_quantized_recall" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "embeddings")
      // Exact top-5 (same rule as sim_topk_bruteforce).
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val exScore = Num.roundp(Vectors.cosine(col("q_emb"), col("embedding")), 6)
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
      val exact = e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), exScore.as("score"))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("q_id"), col("vec_id"))
      // Reconstructed vectors, exploded as (vec_id, d, recon).
      val x = e.select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("d"), col("col").cast("double").as("v"))
      val dims = x.groupBy(col("d"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        .withColumn("scale", (col("hi") - col("lo")) / 255.0)
      val code = when(col("scale") === 0, lit(0)).otherwise(
        least(lit(255.0), greatest(lit(0.0),
          floor((col("v") - col("lo")) / col("scale") + 0.5))).cast("int"))
      val r = x.join(broadcast(dims), "d")
        .select(col("vec_id"), col("d"), (col("lo") + code.cast("double") * col("scale")).as("rv"))
      val qr = r.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("d"), col("rv").as("qv"))
      // Join-aggregate dot over dims; norms likewise.
      val norms = r.groupBy(col("vec_id")).agg(sqrt(sum(col("rv") * col("rv"))).as("nrm"))
      val dots = r.join(broadcast(qr), "d")
        .where(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id")).agg(sum(col("rv") * col("qv")).as("dot"))
      val quant = dots
        .join(broadcast(norms.select(col("vec_id").as("q_id"), col("nrm").as("q_nrm"))), "q_id")
        .join(norms.select(col("vec_id"), col("nrm").as("v_nrm")), "vec_id")
        .select(col("q_id"), col("vec_id"),
          Num.roundp(col("dot") / (col("q_nrm") * col("v_nrm")), 6).as("score"))
      val qTop = quant
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("q_id"), col("vec_id"))
      exact.join(qTop, Seq("q_id", "vec_id"), "left_semi")
        .groupBy(col("q_id"))
        .agg((count(lit(1)).cast("double") / 5.0).as("recall5"))
    }),

    // ── brute-force cosine top-5 for query vectors vec_id < 5 ─────────
    "sim_topk_bruteforce" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val score = Num.roundp(Vectors.cosine(col("q_emb"), col("embedding")), 6)
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), score.as("score"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 5)
    }),

    // ── IVF assignment: nearest centroid per vector ───────────────────
    "sim_ivf_assign" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "embeddings")
      val cent = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
      val dist = Num.roundp(Vectors.sqDist(col("embedding"), col("c_emb")), 6)
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("centroid_id"))
      e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("centroid_id"), dist.as("dist"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("vec_id"), col("centroid_id"), col("dist"))
    }),

    // ── per-label centroid, computed columnar (posexplode → hash agg):
    // the no-UDF, no-MLlib way to aggregate vectors — each (label, dim)
    // cell partial-aggregates map-side, so the shuffle carries one row
    // per label×64 dims regardless of corpus size. ────────────────────
    "sim_label_centroids" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .toDF("label", "dim", "v")
        .groupBy(col("label"), col("dim"))
        .agg(Num.roundp(avg(col("v").cast("double")), 6).as("centroid_v"),
          count(lit(1)).as("n_vecs"))),

    // ── embedding near-duplicate pairs (label-blocked) ────────────────
    "dedup_embed_cosine" -> ((s, dir) => {
      val a = Tables(s, dir, "embeddings").select(
        col("label"), col("vec_id").as("a"), col("embedding").as("ea"))
      val b = Tables(s, dir, "embeddings").select(
        col("label"), col("vec_id").as("b"), col("embedding").as("eb"))
      val cos = Vectors.cosine(col("ea"), col("eb"))
      a.join(b, "label").where(col("a") < col("b"))
        .where(cos >= 0.4)
        .select(col("label"), col("a"), col("b"), Num.roundp(cos, 4).as("cos"))
    }),

    // ── hyperplane-LSH near-dup: the no-labels scale path ─────────────
    // Random-hyperplane signature (sign of dot with H fixed
    // pseudo-hyperplanes) buckets the corpus; only bucket collisions are
    // cosine-verified — candidate generation is O(collisions), not
    // O(n²). The hyperplanes are derived from integer arithmetic both
    // engines compute identically (no float constants to ship).
    "dedup_embed_lsh" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val planeDot = (h: Int) => aggregate(
        transform(sequence(lit(0), lit(Dim - 1)), d =>
          element_at(col("embedding"), d + 1).cast("double") *
            (((lit(h) * Dim + d) * 73 % 199 - 99).cast("double") / 99.0d)),
        lit(0.0d), (acc, x) => acc + x)
      val bucket = concat((0 until Planes).map(h =>
        when(planeDot(h) >= 0, "1").otherwise("0")): _*)
      val bucketed = e.select(col("vec_id"), col("embedding"), bucket.as("bkt"))
      val a = bucketed.select(col("bkt"), col("vec_id").as("a"), col("embedding").as("ea"))
      val b = bucketed.select(col("bkt"), col("vec_id").as("b"), col("embedding").as("eb"))
      val cos = Vectors.cosine(col("ea"), col("eb"))
      a.join(b, "bkt").where(col("a") < col("b"))
        .where(cos >= 0.3)
        .select(col("a"), col("b"), Num.roundp(cos, 4).as("cos"))
    }),

    // ── IVF top-k search: route the query to its cell, search only
    // cell members (probe=1) ──────────────────────────────────────────
    "sim_ivf_search" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val assigned = ivfAssigned(s, dir)
      val q = assigned.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("centroid_id"))
      val score = Num.roundp(Vectors.cosine(col("q_emb"), col("embedding")), 6)
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
      assigned.join(q, "centroid_id")
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), score.as("score"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
    }),

    // ── IVF multi-probe search: each query probes its 2 nearest cells —
    // the recall/cost lever of a real IVF index (nprobe). Corpus cells
    // stay the unit of work; only the probed cells' members are scored.
    "sim_ivf_probe2" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "embeddings")
      val cent = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
      val qdist = Num.roundp(Vectors.sqDist(col("q_emb"), col("c_emb")), 6)
      val wq = Window.partitionBy(col("q_id")).orderBy(col("qdist"), col("centroid_id"))
      val probes = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .crossJoin(broadcast(cent))
        .select(col("q_id"), col("q_emb"), col("centroid_id"), qdist.as("qdist"))
        .withColumn("prk", row_number().over(wq))
        .where(col("prk") <= 2)
        .select(col("q_id"), col("q_emb"), col("centroid_id"))
      val assigned = ivfAssigned(s, dir)
      val score = Num.roundp(Vectors.cosine(col("q_emb"), col("embedding")), 6)
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
      assigned.join(probes, "centroid_id")
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), score.as("score"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
    }),

    // ── ANN quality metric: recall@3 of probe-1 IVF against the exact
    // brute-force top-3 — the number that justifies (or vetoes) the
    // approximate path at scale. ─────────────────────────────────────
    "sim_ivf_recall" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val score = Num.roundp(Vectors.cosine(col("q_emb"), col("embedding")), 6)
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
      val brute = e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), score.as("score"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3).select(col("q_id"), col("vec_id"))
      val assigned = ivfAssigned(s, dir)
      val qa = assigned.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("centroid_id"))
      val ivf = assigned.join(qa, "centroid_id")
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), score.as("score"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
      brute.join(ivf, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          Num.roundp(sum(coalesce(col("hit"), lit(0L))) / 3.0d, 4).as("recall3"))
    })
  )

  val Dim = 64
  val Planes = 6

  /** vec_id → (embedding, nearest centroid) — shared by assignment and
    * search; the centroid set (vec_id % 50 == 0) is broadcast. */
  private def ivfAssigned(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(s, dir, "embeddings")
    val cent = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val dist = Num.roundp(Vectors.sqDist(col("embedding"), col("c_emb")), 6)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("centroid_id"))
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("centroid_id"), dist.as("dist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** DuckDB double-precision sequential dot product over FLOAT[] lists —
    * same fold as Vectors.dot. */
  private def sqlDot(a: String, b: String) =
    s"list_sum(list_transform(range(64), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))"

  private def sqlNorm(a: String) = s"sqrt(${sqlDot(a, a)})"

  val oracles: Map[String, String] = Map(
    "sim_quantized_recall" ->
      s"""WITH x AS (
         |  SELECT vec_id, r.range AS d, CAST(embedding[r.range + 1] AS DOUBLE) AS v
         |  FROM embeddings, range($Dim) r),
         |dims AS (
         |  SELECT d, min(v) AS lo, max(v) AS hi, (max(v) - min(v)) / 255.0 AS scale
         |  FROM x GROUP BY d),
         |rx AS (
         |  SELECT vec_id, d,
         |    lo + CAST(CASE WHEN scale = 0 THEN 0
         |      ELSE CAST(least(255.0, greatest(0.0, floor((v - lo) / scale + 0.5))) AS INTEGER)
         |      END AS DOUBLE) * scale AS rv
         |  FROM x JOIN dims USING (d)),
         |n AS (SELECT vec_id, embedding, ${sqlNorm("embedding")} AS nrm FROM embeddings),
         |ex AS (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      floor((${sqlDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm)) * 1000000 + 0.5) / 1000000 DESC,
         |      e.vec_id) AS rk
         |  FROM n q JOIN n e ON q.vec_id < 5 AND e.vec_id <> q.vec_id),
         |exact5 AS (SELECT q_id, vec_id FROM ex WHERE rk <= 5),
         |norms AS (SELECT vec_id, sqrt(sum(rv * rv)) AS nrm FROM rx GROUP BY vec_id),
         |dots AS (
         |  SELECT q.vec_id AS q_id, e.vec_id, sum(e.rv * q.rv) AS dot
         |  FROM rx e JOIN rx q ON e.d = q.d AND q.vec_id < 5 AND e.vec_id <> q.vec_id
         |  GROUP BY 1, 2),
         |qs AS (
         |  SELECT q_id, dots.vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY
         |      floor((dot / (qn.nrm * vn.nrm)) * 1000000 + 0.5) / 1000000 DESC, dots.vec_id) AS rk
         |  FROM dots
         |  JOIN norms qn ON qn.vec_id = q_id
         |  JOIN norms vn ON vn.vec_id = dots.vec_id),
         |q5 AS (SELECT q_id, vec_id FROM qs WHERE rk <= 5)
         |SELECT q_id, CAST(count(*) AS DOUBLE) / 5.0 AS recall5
         |FROM exact5 JOIN q5 USING (q_id, vec_id)
         |GROUP BY q_id""".stripMargin,

    "sim_quantize_int8" ->
      s"""WITH x AS (
         |  SELECT vec_id, r.range AS d, CAST(embedding[r.range + 1] AS DOUBLE) AS v
         |  FROM embeddings, range($Dim) r),
         |dims AS (
         |  SELECT d, min(v) AS lo, max(v) AS hi, (max(v) - min(v)) / 255.0 AS scale
         |  FROM x GROUP BY d),
         |q AS (
         |  SELECT vec_id, v, lo, scale,
         |    CASE WHEN scale = 0 THEN 0
         |         ELSE CAST(least(255.0, greatest(0.0, floor((v - lo) / scale + 0.5))) AS INTEGER)
         |    END AS code
         |  FROM x JOIN dims USING (d)),
         |r AS (SELECT vec_id, v, lo + CAST(code AS DOUBLE) * scale AS recon FROM q)
         |SELECT vec_id,
         |  floor(max(abs(recon - v)) * 1000000 + 0.5) / 1000000 AS linf,
         |  floor(avg((recon - v) * (recon - v)) * 100000000 + 0.5) / 100000000 AS mse,
         |  floor(sum(v * recon) / (sqrt(sum(v * v)) * sqrt(sum(recon * recon))) * 1000000 + 0.5) / 1000000 AS cos_rec
         |FROM r GROUP BY vec_id""".stripMargin,

    "sim_label_centroids" ->
      """SELECT label, CAST(i AS INTEGER) AS dim,
        |  floor(avg(CAST(embedding[i+1] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS centroid_v,
        |  count(*) AS n_vecs
        |FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS i) d
        |GROUP BY 1, 2""".stripMargin,

    "sim_topk_bruteforce" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${sqlNorm("embedding")} AS nrm FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    floor((${sqlDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm)) * 1000000 + 0.5) / 1000000 AS score
         |  FROM n q JOIN n e ON q.vec_id < 5 AND e.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT q_id, vec_id, score, rk FROM ranked WHERE rk <= 5""".stripMargin,

    "sim_ivf_assign" ->
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS c_emb
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |d AS (
         |  SELECT e.vec_id, c.centroid_id,
         |    floor((list_sum(list_transform(range(64),
         |      i -> (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.c_emb[i+1] AS DOUBLE))
         |         * (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.c_emb[i+1] AS DOUBLE))))) * 1000000 + 0.5) / 1000000 AS dist
         |  FROM embeddings e CROSS JOIN c),
         |ranked AS (
         |  SELECT vec_id, centroid_id, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rk
         |  FROM d)
         |SELECT vec_id, centroid_id, dist FROM ranked WHERE rk = 1""".stripMargin,

    "dedup_embed_cosine" ->
      s"""WITH n AS (SELECT vec_id, label, embedding, ${sqlNorm("embedding")} AS nrm FROM embeddings)
         |SELECT a.label, a.vec_id AS a, b.vec_id AS b,
         |  floor((${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)) * 10000 + 0.5) / 10000 AS cos
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4""".stripMargin,

    "dedup_embed_lsh" -> {
      val bucketBits = (0 until Planes).map { h =>
        s"""CASE WHEN list_sum(list_transform(range($Dim),
           |  d -> CAST(embedding[d+1] AS DOUBLE) * CAST((($h * $Dim + d) * 73 % 199 - 99) AS DOUBLE) / 99.0)) >= 0
           |  THEN '1' ELSE '0' END""".stripMargin
      }.mkString(" || ")
      s"""WITH n AS (SELECT vec_id, embedding, ${sqlNorm("embedding")} AS nrm,
         |  $bucketBits AS bkt FROM embeddings)
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |  floor((${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)) * 10000 + 0.5) / 10000 AS cos
         |FROM n a JOIN n b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
         |WHERE ${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.3""".stripMargin
    },

    "sim_ivf_search" ->
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS c_emb
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |d AS (
         |  SELECT e.vec_id, e.embedding, c.centroid_id,
         |    floor((list_sum(list_transform(range($Dim),
         |      i -> (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.c_emb[i+1] AS DOUBLE))
         |         * (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.c_emb[i+1] AS DOUBLE))))) * 1000000 + 0.5) / 1000000 AS dist
         |  FROM embeddings e CROSS JOIN c),
         |assigned AS (
         |  SELECT vec_id, embedding, centroid_id FROM (
         |    SELECT vec_id, embedding, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rk
         |    FROM d) WHERE rk = 1),
         |n AS (SELECT vec_id, embedding, centroid_id, ${sqlNorm("embedding")} AS nrm FROM assigned),
         |scored AS (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    floor((${sqlDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm)) * 1000000 + 0.5) / 1000000 AS score
         |  FROM n q JOIN n e ON q.centroid_id = e.centroid_id
         |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT q_id, vec_id, score, rk FROM ranked WHERE rk <= 3""".stripMargin,

    "sim_ivf_probe2" ->
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS c_emb
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |d AS (
         |  SELECT e.vec_id, e.embedding, c.centroid_id,
         |    floor((list_sum(list_transform(range($Dim),
         |      i -> (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.c_emb[i+1] AS DOUBLE))
         |         * (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.c_emb[i+1] AS DOUBLE))))) * 1000000 + 0.5) / 1000000 AS dist
         |  FROM embeddings e CROSS JOIN c),
         |assigned AS (
         |  SELECT vec_id, embedding, centroid_id FROM (
         |    SELECT vec_id, embedding, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rk
         |    FROM d) WHERE rk = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, centroid_id FROM (
         |    SELECT vec_id, embedding, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS prk
         |    FROM d WHERE vec_id < 5) WHERE prk <= 2),
         |n AS (SELECT vec_id, embedding, centroid_id, ${sqlNorm("embedding")} AS nrm FROM assigned),
         |nq AS (SELECT q_id, q_emb, centroid_id, ${sqlNorm("q_emb")} AS nrm FROM probes),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |    floor((${sqlDot("q.q_emb", "e.embedding")} / (q.nrm * e.nrm)) * 1000000 + 0.5) / 1000000 AS score
         |  FROM nq q JOIN n e ON q.centroid_id = e.centroid_id
         |  WHERE e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT q_id, vec_id, score, rk FROM ranked WHERE rk <= 3""".stripMargin,

    "sim_ivf_recall" ->
      s"""WITH nall AS (SELECT vec_id, embedding, ${sqlNorm("embedding")} AS nrm FROM embeddings),
         |brute AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        floor((${sqlDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm)) * 1000000 + 0.5) / 1000000 DESC,
         |        e.vec_id) AS rk
         |    FROM nall q JOIN nall e ON q.vec_id < 5 AND e.vec_id <> q.vec_id)
         |  WHERE rk <= 3),
         |c AS (SELECT vec_id AS centroid_id, embedding AS c_emb
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |d AS (
         |  SELECT e.vec_id, e.embedding, c.centroid_id,
         |    floor((list_sum(list_transform(range($Dim),
         |      i -> (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.c_emb[i+1] AS DOUBLE))
         |         * (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.c_emb[i+1] AS DOUBLE))))) * 1000000 + 0.5) / 1000000 AS dist
         |  FROM embeddings e CROSS JOIN c),
         |assigned AS (
         |  SELECT vec_id, embedding, centroid_id FROM (
         |    SELECT vec_id, embedding, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rk
         |    FROM d) WHERE rk = 1),
         |n AS (SELECT vec_id, embedding, centroid_id, ${sqlNorm("embedding")} AS nrm FROM assigned),
         |ivf AS (
         |  SELECT q_id, vec_id, 1 AS hit FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        floor((${sqlDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm)) * 1000000 + 0.5) / 1000000 DESC,
         |        e.vec_id) AS rk
         |    FROM n q JOIN n e ON q.centroid_id = e.centroid_id
         |    WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
         |  WHERE rk <= 3)
         |SELECT b.q_id, CAST(sum(coalesce(ivf.hit, 0)) AS BIGINT) AS n_hits,
         |  floor((sum(coalesce(ivf.hit, 0)) / 3.0) * 10000 + 0.5) / 10000 AS recall3
         |FROM brute b LEFT JOIN ivf ON b.q_id = ivf.q_id AND b.vec_id = ivf.vec_id
         |GROUP BY b.q_id""".stripMargin
  )
}
