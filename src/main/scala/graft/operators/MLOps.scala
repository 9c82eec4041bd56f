package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

/** The reference's MLlib pipeline (SURVEY.md §2.11, M1/M2:
  * dags/scripts/spark_daily_report.py:87-94) on the embeddings table.
  * Both queries are rows-only checked (no SQL oracle): PCA components
  * are sign-ambiguous and KMeans labels permutation-unstable across
  * engines — the ScalaTest specs assert the invariants instead
  * (explained variance, co-clustering, seed determinism).
  *
  * `array_to_vector` is the builtin bridge (replaces the reference's UDF
  * at spark_daily_report.py:38-41).
  */
object MLOps {

  /** Parquet → vector features, cached: every fit pass (kmeans|| init
    * steps, each Lloyd iteration, the PCA covariance pass) is an action
    * over this plan — uncached, each one re-reads the parquet and
    * re-converts array→vector, which dominated the fit wall-clock.
    * Spark's cache manager dedups by analyzed plan, so M1 and M2 (and
    * repeated calls) share one materialization per session. */
  private def features(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
      .cache()

  val queries: Map[String, Relational.Q] = Map(

    // ── M1: PCA k=2 projection ────────────────────────────────────────
    "m1_pca_project" -> ((s, dir) => {
      val df = features(s, dir)
      val model = new PCA().setK(2)
        .setInputCol("features").setOutputCol("pca")
        .fit(df)
      model.transform(df)
        .select(col("vec_id"),
          Num.roundp(element_at(vector_to_array(col("pca")), 1), 4).as("pc1"),
          Num.roundp(element_at(vector_to_array(col("pca")), 2), 4).as("pc2"))
    }),

    // ── M2: KMeans k=5 seed=42 cluster assignment ─────────────────────
    "m2_kmeans_cluster" -> ((s, dir) => {
      val df = features(s, dir)
      val model = new KMeans().setK(5).setSeed(42)
        .setFeaturesCol("features").setPredictionCol("cluster")
        .fit(df)
      model.transform(df)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
    })
  )

  /** No oracles: see scaladoc. */
  val oracles: Map[String, String] = Map.empty
}
