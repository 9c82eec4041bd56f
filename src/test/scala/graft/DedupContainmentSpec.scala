package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The containment-complete candidate stage: planted truncation and
  * quotation pairs — high containment, LOW Jaccard, the pairs
  * MinHash-LSH banding tuned for τ≈0.5 Jaccard is built to miss —
  * must collide via the shingle-sample postings probe, and
  * dedup_containment_full must dominate dedup_containment row-wise on
  * the corpus. */
class DedupContainmentSpec extends SparkSuite {

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val longTokens = (1 to 40).map(i => s"w$i")
  private val longDoc = longTokens.mkString(" ")
  // Truncation: the first 10 tokens — containment 1.0, Jaccard 8/38 ≈ 0.21.
  private val truncated = longTokens.take(10).mkString(" ")
  // Quotation: an 11-token span of doc 1, quoted VERBATIM mid-document
  // inside an otherwise disjoint host. The QUOTE as its own doc is
  // contained (1.0) in both the original and the host; host-vs-original
  // share only the quote window (low containment, low Jaccard).
  private val quote = longTokens.slice(14, 25)
  private val quotingHost = ((1 to 20).map(i => s"q$i") ++ quote ++
    (21 to 40).map(i => s"q$i")).mkString(" ")

  private val docs = Seq(1L -> longDoc, 2L -> truncated,
    3L -> quotingHost, 4L -> quote.mkString(" "))

  private def exOf(d: DataFrame): DataFrame = Dedup.shinglesOf(d).distinct()

  private def lshPairsOf(d: DataFrame): Set[(Long, Long)] =
    Dedup.bandRowsOf(Dedup.minhashesOf(Dedup.shinglesOf(d))).as("x")
      .join(Dedup.bandRowsOf(Dedup.minhashesOf(Dedup.shinglesOf(d))).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def samplePairsOf(d: DataFrame): Set[(Long, Long)] =
    Dedup.sampleCandidatesOf(exOf(d))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("Jaccard-LSH misses the planted truncation and quotation pairs") {
    val lsh = lshPairsOf(docsDf(docs: _*))
    // The premise of the whole pass: these are real misses, not
    // hypothetical ones. (Deterministic content — no flake.)
    assert(!lsh.contains((1L, 2L)), s"lsh=$lsh") // truncation of 1
    assert(!lsh.contains((1L, 4L)), s"lsh=$lsh") // quote from 1
    assert(!lsh.contains((3L, 4L)), s"lsh=$lsh") // quote inside host 3
  }

  test("the shingle-sample probe recalls every planted pair") {
    val samp = samplePairsOf(docsDf(docs: _*))
    assert(samp.contains((1L, 2L)), s"sample candidates=$samp")
    assert(samp.contains((1L, 4L)), s"sample candidates=$samp")
    assert(samp.contains((3L, 4L)), s"sample candidates=$samp")
    // … and not the disjoint pair (truncation vs quote share nothing).
    assert(!samp.contains((2L, 4L)), s"sample candidates=$samp")
  }

  test("recall is deterministic when the contained side fits the sample") {
    // |A| ≤ K shingles: the sample IS A's shingle set, and containment
    // ≥ 0.8 forces ≥ ⌈0.5·|A|⌉ matches — candidate by construction,
    // for ANY host document.
    val host = (1 to 30).map(i => s"h$i")
    val small = host.slice(4, 10) // 6 tokens → 4 shingles, all in host
    val d = docsDf(10L -> host.mkString(" "), 11L -> small.mkString(" "))
    assert(samplePairsOf(d).contains((10L, 11L)))
  }

  test("containment_full dominates containment on the corpus") {
    val base = Dedup.queries("dedup_containment")(spark, sf001)
      .collect().map(_.toSeq).toSet
    val full = Dedup.queries("dedup_containment_full")(spark, sf001)
      .collect().map(_.toSeq).toSet
    assert(base.subsetOf(full),
      s"missing from full: ${base -- full}")
  }
}
