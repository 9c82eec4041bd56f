package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-2 battery (Extended2) on sf0.001;
  * exact values are hash-checked against DuckDB by the oracle gate. */
class Extended2Spec extends SparkSuite {

  test("samp_hash_split partitions every document exactly once") {
    val splits = SparkEntry.queries("samp_hash_split")(spark, sf001).collect()
    val total = splits.map(_.getAs[Long]("n")).sum
    assert(total == 500) // every doc in exactly one split
    val bySplit = splits.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 12/2/2 sixteenths: train must dominate
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("samp_epoch_shuffle is a per-shard permutation with contiguous positions") {
    val rows = SparkEntry.queries("samp_epoch_shuffle")(spark, sf001).collect()
    // Every document appears exactly once across all shards.
    assert(rows.map(_.getAs[Long]("doc_id")).toSet.size == rows.length)
    assert(rows.length == 500)
    // Within each shard, positions are exactly 1..n (a permutation,
    // no gaps — the loader can consume pos as a dense index).
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val ps = rs.map(_.getAs[Long]("pos")).sorted
      assert(ps.toSeq == (1L to rs.length).toSeq, s"shard $shard")
    }
    // Shard assignment is the key residue (the reader-parallelism
    // contract), independent of the epoch seed.
    rows.foreach(r =>
      assert(r.getAs[Long]("shard") == r.getAs[Long]("doc_id") % 8))
  }

  test("idx_phrase_search matches a naive per-document adjacency count") {
    val tk = graft.functions.Text.tokens(col("text"))
    // Naive truth computed a completely different way: evaluate the
    // adjacency predicate at every position of every document.
    val naive = Tables(spark, sf001, "documents")
      // Docs with < 2 tokens can't carry the phrase; dropping them
      // first also keeps element_at in range (Spark 4's ANSI mode
      // throws on out-of-bounds array indexing).
      .where(size(tk) >= 2)
      .select(col("doc_id"), size(filter(
        transform(sequence(lit(0), size(tk) - lit(2)),
          i => element_at(tk, i + 1) === "table" &&
            element_at(tk, i + 2) === "part"),
        b => b)).cast("long").as("n"))
      .where(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val idx = SparkEntry.queries("idx_phrase_search")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(idx === naive)
    assert(idx.nonEmpty) // the phrase actually occurs in the corpus
  }

  test("samp_stratified is deterministic across invocations") {
    val a = SparkEntry.queries("samp_stratified")(spark, sf001).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    val b = SparkEntry.queries("samp_stratified")(spark, sf001).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("text_tfidf_topterms yields at most 3 ranked terms per doc") {
    val r = SparkEntry.queries("text_tfidf_topterms")(spark, sf001).collect()
    val byDoc = r.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { rows =>
      val rks = rows.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks == (1L to rks.length) && rks.length <= 3)
      // scores non-increasing in rank
      val sc = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("score"))
      assert(sc.zip(sc.tail).forall { case (x, y) => x >= y })
    }
  }

  test("w6_range_frame trailing window includes the current row") {
    val r = SparkEntry.queries("w6_range_frame")(spark, sf001).collect()
    assert(r.forall(_.getAs[Long]("n7") >= 1))
  }

  test("j5_cross_join is |region| x |distinct status|") {
    assert(SparkEntry.queries("j5_cross_join")(spark, sf001).count() == 15)
  }

  test("sql_q10_returned returns exactly 20 strictly ordered rows") {
    val r = SparkEntry.queries("sql_q10_returned")(spark, sf001).collect()
    assert(r.length == 20)
    val rev = r.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("w8_value_window: full-frame first/last and count agree per user") {
    val r = SparkEntry.queries("w8_value_window")(spark, sf001).collect()
    assert(r.nonEmpty)
    val byUser = r.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("n_in_user")).distinct.toSeq == Seq(rows.length))
      assert(rows.map(r => Option(r.getAs[Any]("first_v"))).distinct.length == 1)
      assert(rows.map(r => Option(r.getAs[Any]("last_v"))).distinct.length == 1)
    }
  }

  test("x_null_funcs: nullif/coalesce compose to the sentinel") {
    val r = SparkEntry.queries("x_null_funcs")(spark, sf001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val nz = Option(row.getAs[Any]("nz_disc"))
      val dn = row.getAs[Double]("disc_or_neg")
      if (nz.isEmpty) assert(dn == -1.0) // discount was exactly 0.05
      else assert(dn == nz.get.asInstanceOf[Double])
      assert(row.getAs[Double]("g_qd") >= row.getAs[Double]("l_qd"))
    }
  }
}
