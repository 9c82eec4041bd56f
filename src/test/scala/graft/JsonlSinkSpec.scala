package graft

import java.io.File

import org.apache.spark.sql.functions._

/** graft-jsonl DSv2 sink: two-phase publish, manifest integrity,
  * round-trip fidelity. */
class JsonlSinkSpec extends SparkSuite {

  test("write publishes part files + manifest, leaves no temporaries, round-trips") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val df = Seq(
      (1L, "plain", 1.5, true),
      (2L, "quote\" and \\ and\nnewline", -0.25, false),
      // Korean + astral text: the writer must emit real UTF-8 bytes —
      // a platform-default-charset writer turns every non-ASCII char
      // into '?' in this container (ANSI_X3.4-1968 default), which is
      // silent corruption for the reference's Korean news rows.
      (4L, "뉴스 기사 제목 𝄞 café", 2.5, true),
      (3L, null.asInstanceOf[String], 0.0, true))
      .toDF("id", "txt", "score", "flag").repartition(3)

    df.write.format("graft-jsonl").mode("append").save(dir)

    val files = new File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".jsonl")) === 3, files.toSeq)
    assert(files.contains("_GRAFT_MANIFEST"))
    assert(!files.exists(_.endsWith(".tmp")), s"unpublished temporaries: ${files.toSeq}")

    // Manifest rows sum to the dataframe size and list exactly the parts.
    val manifest = scala.io.Source.fromFile(new File(dir, "_GRAFT_MANIFEST")).getLines()
      .map(_.split("\t")).map(a => a(0) -> a(1).toLong).toMap
    assert(manifest.values.sum === 4L)
    assert(manifest.keySet === files.filter(_.endsWith(".jsonl")).toSet)

    // Spark's JSON reader round-trips the content (underscore-prefixed
    // manifest is ignored by the reader by convention).
    val back = spark.read.json(dir)
      .select(col("id"), col("txt"), col("score"), col("flag"))
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("txt")),
        r.getDouble(2), r.getBoolean(3))).toSet
    val orig = df.collect().map(r => (r.getLong(0), Option(r.getAs[String]("txt")),
      r.getDouble(2), r.getBoolean(3))).toSet
    assert(back === orig)
  }

  test("streaming write publishes per-epoch files + manifests, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jsonl-ckpt").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "s").writeStream
      .format("graft-jsonl").option("checkpointLocation", ckpt)
      .outputMode("append").start(dir)
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((3L, "c"))
      q.processAllAvailable()

      val files = new File(dir).listFiles().map(_.getName).sorted
      val manifests = files.filter(_.startsWith("_GRAFT_MANIFEST-"))
      assert(manifests.length === 2, files.toSeq) // one per epoch
      assert(!files.exists(_.endsWith(".tmp")), files.toSeq)
      // Total rows across epoch manifests = all ingested rows.
      val total = manifests.map(m =>
        scala.io.Source.fromFile(new File(dir, m)).getLines()
          .map(_.split("\t")(1).toLong).sum).sum
      assert(total === 3L)
      val back = spark.read.json(dir).select("id").collect().map(_.getLong(0)).toSet
      assert(back === Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("empty partitions still publish (zero-row part files are legitimate)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-empty").toString
    Seq((1L, "x")).toDF("id", "s").repartition(4)
      .write.format("graft-jsonl").mode("append").save(dir)
    val manifest = scala.io.Source.fromFile(new File(dir, "_GRAFT_MANIFEST")).getLines().size
    assert(manifest === 4) // one entry per task, including empty ones
  }
}
