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

  test("artifact compaction preserves contents and collapses the file count") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("lsh-compact").toString
    val corpus = Tables(spark, sf001, "documents").where(col("doc_id") < 200)
    val (bands, ex, sizes) = LshDedupStream.corpusArtifacts(corpus)
    // simulate many tiny per-trigger appends
    Seq(("bands", bands), ("shingles", ex), ("sizes", sizes)).foreach {
      case (name, df) => df.repartition(16).write.parquet(s"$base/$name")
    }
    def snapshot(name: String) = spark.read.parquet(s"$base/$name").collect()
      .map(_.toSeq).toSet
    def fileCount(name: String) = new java.io.File(s"$base/$name")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = Seq("bands", "shingles", "sizes")
      .map(n => n -> (snapshot(n), fileCount(n))).toMap
    assert(before.values.forall(_._2 == 16))
    val counts = LshDedupStream.compactArtifacts(spark, base)
    Seq("bands", "shingles", "sizes").foreach { n =>
      assert(counts(n) == 1, s"$n -> ${counts(n)}")
      assert(fileCount(n) == 1)
      assert(snapshot(n) == before(n)._1, s"$n contents changed")
    }
    // idempotent on an already-compacted set; missing dirs report 0
    assert(LshDedupStream.compactArtifacts(spark, base)("bands") == 1)
    assert(LshDedupStream.compactArtifacts(spark, s"$base/nope")("bands") == 0)
  }
}
