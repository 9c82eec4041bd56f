package graft

import graft.operators.TextOps

/** The batched-BPE scale path: with batchP = 1 it must BE the oracled
  * sequential recurrence (bpe_train_merges); with batchP > 1 it trades
  * strict argmax order for ~rounds/batchP driver round-trips, stays
  * deterministic, and keeps every batch pairwise symbol-disjoint. */
class BpeScaleSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).sortBy(_._1).toSeq

  test("batchP = 1 reproduces the oracled sequential merges exactly") {
    val sequential = rows(SparkEntry.queries("bpe_train_merges")(spark, sf001))
    val batched1 = rows(TextOps.bpeTrainScaled(spark, sf001, rounds = 8, batchP = 1))
    assert(batched1 == sequential)
  }

  test("batched training is deterministic and batches are symbol-disjoint") {
    val a = rows(TextOps.bpeTrainScaled(spark, sf001, rounds = 32, batchP = 8))
    val b = rows(TextOps.bpeTrainScaled(spark, sf001, rounds = 32, batchP = 8))
    assert(a == b)
    assert(a.size == 32 && a.map(_._1) == (1L to 32L))
    // within each batch of 8, no symbol participates in two merges
    a.grouped(8).foreach { batch =>
      val syms = batch.flatMap(m => Seq(m._2, m._3))
      assert(syms.distinct.size == syms.size, s"conflicting batch: $batch")
    }
    // counts are non-increasing across batch boundaries is NOT required
    // (created pairs may rank anywhere) — but every count is positive
    // and every merged token is the concatenation of its parts
    assert(a.forall(m => m._5 > 0 && m._4 == m._2 + m._3))
  }

  test("training stops early when the vocabulary is fully merged") {
    // sf0.001 has a small corpus; an absurd round budget must terminate
    // as soon as no adjacent pairs remain instead of spinning.
    val m = rows(TextOps.bpeTrainScaled(spark, sf001, rounds = 100000, batchP = 64))
    assert(m.nonEmpty && m.size < 100000)
    assert(m.map(_._1) == (1L to m.size.toLong))
  }
}
