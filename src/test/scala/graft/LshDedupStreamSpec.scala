package graft

import graft.streaming.LshDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming LSH gate agrees with the batch incremental-dedup
  * operator: the same batch docs streamed through foreachBatch against
  * the corpus artifacts carry exactly the near-dup verdicts and match
  * ids `dedup_incremental` computes in one sweep. (This corpus has no
  * byte-identical texts, so the batch operator's verdicts reduce to
  * near_dup/unique — the gate's exact domain.) */
class LshDedupStreamSpec extends SparkSuite {

  test("streamed near-dup verdicts equal the batch incremental sweep") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val expected = SparkEntry.queries("dedup_incremental")(spark, sf001)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"),
          Option(r.get(r.fieldIndex("match_id"))).map(_.asInstanceOf[Long])))
      .toMap
    assert(expected.nonEmpty &&
      expected.values.forall(_._1 != "exact_dup"))

    val corpus = Tables(spark, sf001, "documents")
      .where(col("doc_id") % 10 =!= 7)
    val (bands, ex, sizes) = LshDedupStream.corpusArtifacts(corpus)
    Seq(bands, ex, sizes).foreach { d => d.persist(); d.count() }

    val batchDocs = Tables(spark, sf001, "documents")
      .where(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))

    val in = MemoryStream[(Long, String)]
    // two addData blocks (before start — AvailableNow snapshots the
    // offsets at start): the gate must be memoryless across batches
    val (half1, half2) = batchDocs.splitAt(batchDocs.length / 2)
    in.addData(half1: _*)
    in.addData(half2: _*)
    val got = scala.collection.mutable.Map[Long, (Boolean, Option[Long])]()
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        LshDedupStream.gate(b, bands, ex, sizes).collect().foreach { r =>
          got(r.getAs[Long]("doc_id")) = (r.getAs[Boolean]("near_dup"),
            Option(r.get(r.fieldIndex("match_id"))).map(_.asInstanceOf[Long]))
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    Seq(bands, ex, sizes).foreach(_.unpersist(blocking = false))

    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (verdict, matchId)) =>
      val (nd, m) = got(id)
      assert(nd == (verdict == "near_dup"), s"doc $id: stream=$nd batch=$verdict")
      assert(m == matchId, s"doc $id: stream match=$m batch=$matchId")
    }
    assert(got.values.exists(_._1) && got.values.exists(!_._1))
  }
}
