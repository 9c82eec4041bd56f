package graft

import graft.streaming.DecontamStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming decontamination agrees with the batch operator: the same
  * document scored at ingest time (foreachBatch over a MemoryStream)
  * carries exactly the n_common/train_sz the full-corpus sweep
  * computes. */
class DecontamStreamSpec extends SparkSuite {

  test("ingest-time scores match the batch decontamination sweep") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Ground truth from the batch operator: per train doc, total
    // overlap with the whole eval set.
    val batch = SparkEntry.queries("decontam_ngram")(spark, sf001)
      .groupBy(col("train_id"))
      .agg(sum(col("n_common")).as("n_common"), first(col("train_sz")).as("sz"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(batch.nonEmpty)
    val contaminatedId = batch.maxBy(_._2._1)._1
    val cleanId = Tables(spark, sf001, "documents")
      .where(col("doc_id") % 97 =!= 0 &&
        !col("doc_id").isin(batch.keys.toSeq: _*))
      .select(min(col("doc_id"))).head().getLong(0)

    val texts = Tables(spark, sf001, "documents")
      .where(col("doc_id").isin(contaminatedId, cleanId))
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ev = DecontamStream.evalShingles(spark, sf001).persist()
    ev.count()

    val in = MemoryStream[(Long, String)]
    in.addData(contaminatedId -> texts(contaminatedId), cleanId -> texts(cleanId))
    val got = scala.collection.mutable.Map[Long, (Long, Long, Boolean)]()
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        DecontamStream.score(b, ev).collect().foreach { r =>
          got(r.getAs[Long]("doc_id")) = (r.getAs[Long]("n_common"),
            r.getAs[Long]("train_sz"), r.getAs[Boolean]("contaminated"))
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    ev.unpersist(blocking = false)

    // Contaminated doc: exact agreement with the batch sweep. Note the
    // streamed doc IS an eval-overlapping train doc, so its shingles
    // hit the same eval set rows.
    val (bN, bSz) = batch(contaminatedId)
    assert(got(contaminatedId) == ((bN, bSz, bN.toDouble / bSz >= 0.1)),
      s"stream=${got(contaminatedId)} batch=($bN, $bSz)")
    // Clean doc: zero overlap, not contaminated.
    val (cN, _, cFlag) = got(cleanId)
    assert(cN == 0L && !cFlag)
  }
}
