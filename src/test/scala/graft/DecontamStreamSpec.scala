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
    // Ground truth computed with score()'s exact semantics — overlap
    // against the DISTINCT UNION of eval shingles. (The batch
    // operator's pair-level n_common counts a shingle once PER EVAL
    // DOC containing it, so summing its rows would overcount whenever
    // eval docs share a shingle.)
    import graft.functions.Text
    val evSet = graft.streaming.DecontamStream.evalShingles(spark, sf001)
    val batch = Tables(spark, sf001, "documents")
      .where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), Text.tokens(col("text")).as("tok"))
      .select(col("doc_id"), explode(Text.shingles(col("tok"), 3)).as("s"))
      .distinct()
      .join(evSet.withColumn("hit", lit(1)), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_common"),
        count(lit(1)).as("sz"))
      .where(col("n_common") > 0)
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

  test("shingle-less docs pass through the ingest gate as clean rows") {
    import spark.implicits._
    // A doc under 3 tokens (and a fully empty one) produces no
    // shingles; the gate must still emit it — uncontaminated with zero
    // counts — never silently drop it from the scored stream.
    val ev = DecontamStream.evalShingles(spark, sf001)
    val docs = Seq(1L -> "two tokens", 2L -> "", 3L -> "one two three four five")
      .toDF("doc_id", "text")
    val out = DecontamStream.score(docs, ev).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_common"), r.getAs[Long]("train_sz"),
          r.getAs[Double]("contam_ratio"), r.getAs[Boolean]("contaminated")))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((0L, 0L, 0.0, false)))
    assert(out(2L) == ((0L, 0L, 0.0, false)))
    assert(out(3L)._2 == 3L) // 5 tokens → 3 shingles actually scored
  }
}
