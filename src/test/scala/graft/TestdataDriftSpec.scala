package graft

import org.apache.spark.sql.types._

/** Canary against driver-side testdata regeneration: round 6 lost 28
  * events-family queries because `events.ts` silently changed parquet
  * logical type (NANOS → MICROS) between rounds and the loader assumed a
  * generation. Pin the post-`Tables.apply` Spark schema of every table so
  * the NEXT drift fails here in seconds, not as silent absence in the
  * driver's correctness artifact.
  *
  * Pinned are the semantics queries depend on (names, normalized types,
  * order); parquet physical details (int32 vs int64 on key columns) are
  * asserted as the current generation produces them — if the generator
  * legitimately changes one, update the expectation here consciously.
  */
class TestdataDriftSpec extends SparkSuite {

  private def norm(dt: DataType): String = dt match {
    case ArrayType(e, _) => s"array<${norm(e)}>"
    case t               => t.simpleString
  }

  private def sig(name: String): Seq[(String, String)] =
    Tables(spark, sf001, name).schema.fields.toSeq
      .map(f => f.name -> norm(f.dataType))

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // ts must land as session-TZ TimestampType regardless of which
    // parquet generation (NANOS-as-long / MICROS / MICROS-NTZ) is on disk
    // — that is the whole contract of the Tables.apply events branch.
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("all 10 tables load with the pinned post-load schema") {
    assert(Tables.names.toSet === expected.keySet)
    for (t <- Tables.names)
      assert(sig(t) === expected(t), s"schema drift in table '$t'")
  }

  test("events.ts is a usable timestamp (window/as-of families depend on it)") {
    val e = Tables(spark, sf001, "events")
    assert(e.schema("ts").dataType === TimestampType)
    // One cheap end-to-end use: hour-truncation must analyze AND run —
    // this is exactly the expression family that broke in round 6.
    val n = e.select(org.apache.spark.sql.functions.date_trunc("hour",
      org.apache.spark.sql.functions.col("ts"))).limit(5).count()
    assert(n > 0)
  }
}
