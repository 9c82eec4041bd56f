package graft

import graft.streaming.SpanDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Ingest-time span dedup agrees with the batch operator: replaying
  * the corpus through the stream in ascending doc_id batches produces
  * exactly the per-doc (n_chunks, n_dup, dup_frac) the full-corpus
  * `dedup_chunk_spans` sweep computes — the canonical-occurrence rule
  * (min doc_id, then min offset) IS arrival order under an ordered
  * replay. */
class SpanDedupStreamSpec extends SparkSuite {

  test("ordered two-batch replay matches the batch chunk-span sweep") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchTruth = SparkEntry.queries("dedup_chunk_spans")(spark, sf001)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(batchTruth.nonEmpty)
    assert(batchTruth.values.exists(_._2 > 0), "fixture has no duplicate spans")

    val docs = Tables(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val mid = docs(docs.length / 2)._1

    val got = scala.collection.mutable.Map[Long, (Long, Long, Double)]()
    // The accumulated hash table lives OUTSIDE the stream (lake-table
    // state, exactly like CdcStream); each batch scores against it,
    // then appends its fresh hashes.
    var seen = SpanDedupStream.emptySeen(spark).persist()
    seen.count()
    // Two sequential AvailableNow runs = the production daily-ingest
    // replay shape, and a guaranteed micro-batch boundary between the
    // halves. (addData must precede start: AvailableNow snapshots
    // offsets at start.)
    Seq(docs.filter(_._1 < mid), docs.filter(_._1 >= mid)).foreach { half =>
      val in = MemoryStream[(Long, String)]
      in.addData(half.map { case (i, t) => i -> t })
      val q = in.toDF().toDF("doc_id", "text").writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val stable = b.persist()
          SpanDedupStream.score(stable, seen).collect().foreach { r =>
            got(r.getAs[Long]("doc_id")) = ((r.getAs[Long]("n_chunks"),
              r.getAs[Long]("n_dup"), r.getAs[Double]("dup_frac")))
          }
          val next = seen.union(SpanDedupStream.freshHashes(stable, seen))
            .persist()
          next.count()
          seen.unpersist(blocking = false)
          stable.unpersist(blocking = false)
          seen = next
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }

    assert(got.keySet == batchTruth.keySet)
    val diffs = batchTruth.collect {
      case (id, truth) if got(id) != truth => (id, truth, got(id))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
    seen.unpersist(blocking = false)
  }

  test("chunk-less and unseen docs pass the gate as clean rows") {
    import spark.implicits._
    val seen = SpanDedupStream.emptySeen(spark)
    val b = Seq(1L -> "", 2L -> "one two three four five six seven eight",
      3L -> "one two three four five six seven eight").toDF("doc_id", "text")
    val r = SpanDedupStream.score(b, seen).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_chunks"), x.getAs[Long]("n_dup")))).toMap
    // empty doc: zero counts, present
    assert(r(1L) == ((0L, 0L)))
    // first copy clean, second copy fully duplicate (same 8-token chunk)
    assert(r(2L) == ((1L, 0L)))
    assert(r(3L) == ((1L, 1L)))
    // and a hash already in `seen` marks even the first arrival dup
    val seeded = SpanDedupStream.freshHashes(b, seen)
    val r2 = SpanDedupStream.score(
      Seq(9L -> "one two three four five six seven eight").toDF("doc_id", "text"),
      seeded).collect().head
    assert(r2.getAs[Long]("n_dup") == 1L)
  }
}
