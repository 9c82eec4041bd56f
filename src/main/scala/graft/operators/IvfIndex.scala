package graft.operators

import graft.functions.{Num, Vectors}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index — the build-once / search-many deployment shape
  * of the `sim_ivf_*` inventory queries (SURVEY.md north-star
  * similarity surface). The index is two parquet tables:
  *
  *   <path>/centroids    centroid_id, c_emb
  *   <path>/assignments  vec_id, embedding, centroid_id   (bucketed
  *                       data co-located by cell)
  *
  * Build partitions the corpus by nearest centroid ONCE; every search
  * after that broadcasts only the (tiny) query set and its probed
  * cells, scanning just those cells' members — at 100 TB the
  * assignments table is additionally partitioned on `centroid_id` so a
  * probe prunes to the probed directories instead of scanning the
  * corpus. Centroids here are seeded deterministically (every k-th
  * vector) — a KMeans-refined codebook drops in without changing the
  * index layout.
  */
object IvfIndex {

  /** Build and persist the index. `everyK`: deterministic centroid seed
    * stride (vec_id % everyK == 0 → centroid). */
  def build(spark: SparkSession, corpus: DataFrame, path: String,
      everyK: Int = 50): Unit = {
    val cent = corpus.where(col("vec_id") % everyK === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    cent.write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    val dist = Num.roundp(Vectors.sqDist(col("embedding"), col("c_emb")), 6)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("centroid_id"))
    corpus.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("centroid_id"), dist.as("dist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("centroid_id") // probe → directory pruning
      .parquet(s"$path/assignments")
  }

  /** Top-k cosine neighbors for `queries` (vec_id, embedding), probing
    * each query's `nprobe` nearest cells. Returns
    * (q_id, vec_id, score, rk). */
  def search(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 3, nprobe: Int = 1): DataFrame = {
    val cent = spark.read.parquet(s"$path/centroids")
    val assigned = spark.read.parquet(s"$path/assignments")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val qdist = Num.roundp(Vectors.sqDist(col("q_emb"), col("c_emb")), 6)
    val wq = Window.partitionBy(col("q_id")).orderBy(col("qdist"), col("centroid_id"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("centroid_id"), qdist.as("qdist"))
      .withColumn("prk", row_number().over(wq))
      .where(col("prk") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("centroid_id"))
    val score = Num.roundp(Vectors.cosine(col("q_emb"), col("embedding")), 6)
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    assigned.join(broadcast(probes), "centroid_id")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), score.as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }
}
