package graft

import org.apache.spark.sql.functions._

/** Round-5 curation additions: SemDeDup (cluster-blocked semantic
  * purge), quality-aware keep-longest survivor selection, and the
  * Gopher-style composite quality gate. The DuckDB hash-parity is the
  * driver's job; these specs pin the SEMANTIC invariants the hash
  * can't express (survivor existence, cross-operator agreement).
  */
class SemDedupSpec extends SparkSuite {

  test("dedup_semantic: purge implies a similar neighbor, and every " +
      "similarity-affected cell keeps at least one affected member") {
    val rows = SparkEntry.queries("dedup_semantic")(spark, sf001).collect()
    assert(rows.length === 500)
    val purged = rows.filter(_.getAs[Boolean]("purged"))
    assert(purged.nonEmpty, "threshold produced no purges — recalibrate")
    // a vector can only be purged by a similar dominating neighbor
    assert(purged.forall(_.getAs[Long]("n_dups") > 0))
    // the diversity-keeping rule can never wipe out a whole cell's
    // affected set: the max-(dist, -id) member is dominated by nobody
    rows.filter(_.getAs[Long]("n_dups") > 0)
      .groupBy(_.getAs[Long]("centroid_id"))
      .foreach { case (cid, members) =>
        assert(members.exists(!_.getAs[Boolean]("purged")),
          s"cell $cid purged every affected member")
      }
  }

  test("decontam_embed: eval side past the broadcast bound fails fast " +
      "with the cell-blocked rewrite named") {
    val e = Tables(spark, sf001, "embeddings")
    val ex = intercept[IllegalArgumentException] {
      operators.Similarity.decontamEmbed(
        e.where(col("vec_id") % 97 =!= 0),
        e.where(col("vec_id") % 97 === 0),
        maxEvalRows = 2)
    }
    assert(ex.getMessage.contains("broadcast bound"))
    assert(ex.getMessage.contains("IVF-cell-blocked"))
    // and the in-bound path is the inventory query, unchanged
    val rows = SparkEntry.queries("decontam_embed")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_eval_hits") > 0))
  }

  test("dedup_keep_longest: survivor is a maximal-length member of its " +
      "cluster, clusters match the CC operator") {
    val kept = SparkEntry.queries("dedup_keep_longest")(spark, sf001).collect()
    assert(kept.nonEmpty && kept.forall(_.getAs[Long]("n_members") >= 2))
    val cc = SparkEntry.queries("dedup_cc_clusters")(spark, sf001)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    assert(kept.map(_.getAs[Long]("cluster_id")).toSet === cc.map(_._2).toSet)
    val nTok = Tables(spark, sf001, "documents")
      .select(col("doc_id"),
        size(functions.Text.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    val byCluster = cc.groupBy(_._2)
    kept.foreach { r =>
      val members = byCluster(r.getAs[Long]("cluster_id")).map(_._1)
      val keeper = r.getAs[Long]("kept_doc_id")
      assert(members.contains(keeper))
      assert(r.getAs[Long]("kept_n_tokens") === members.map(nTok).max)
      assert(nTok(keeper) === members.map(nTok).max)
    }
  }

  test("quality_gopher: pass iff no reasons; rules agree with " +
      "text_quality length and text_repetition verdicts") {
    val g = SparkEntry.queries("quality_gopher")(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("pass"), r.getAs[String]("reasons"))).toMap
    assert(g.size === 500)
    val known = Set("len", "wordlen", "stop", "dominance", "repetition")
    g.values.foreach { case (pass, reasons) =>
      assert(pass === reasons.isEmpty)
      if (reasons.nonEmpty)
        assert(reasons.split(",").forall(known), reasons)
    }
    // len rule ≡ text_quality.len_ok (same 30..1000 bounds)
    SparkEntry.queries("text_quality")(spark, sf001).collect().foreach { r =>
      val wantFail = !r.getAs[Boolean]("len_ok")
      val hasLen = g(r.getAs[Long]("doc_id"))._2.split(",").contains("len")
      assert(hasLen === wantFail, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // dominance+repetition ≡ text_repetition.rep_ok (thresholds 1/5, 3/5)
    SparkEntry.queries("text_repetition")(spark, sf001).collect().foreach { r =>
      val reasons = g(r.getAs[Long]("doc_id"))._2.split(",").toSet
      val gateOk = !reasons("dominance") && !reasons("repetition")
      assert(gateOk === r.getAs[Boolean]("rep_ok"),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
