package graft

import graft.plans.GraftFunctions

class SqlFunctionsSpec extends SparkSuite {

  test("native expressions are callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .collect().head.getDouble(0)
    assert(d == 11.0)
    val sd = spark.sql(
      """SELECT vec_sq_dist(array(CAST(0.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d""")
      .collect().head.getDouble(0)
    assert(sd == 9.0)
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','d'), 3) AS s")
      .collect().head.getAs[scala.collection.Seq[String]](0)
    assert(sh == Seq("a b c", "b c d"))
    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L, 9L), array(2L, 3L, 5L, 8L, 9L)) AS c")
      .collect().head.getLong(0)
    assert(ic == 3L)
    // the double-array (codebook-path) variants are registered too
    val dd = spark.sql(
      "SELECT vec_dot_d(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dd == 11.0)
    val sdd = spark.sql(
      "SELECT vec_sq_dist_d(array(0.0D), array(3.0D)) AS d")
      .collect().head.getDouble(0)
    assert(sdd == 9.0)
    val td = spark.sql(
      "SELECT token_diversity(array('a','b','a','c','b','a')) AS d")
      .collect().head.getStruct(0)
    assert((td.getLong(0), td.getLong(1), td.getLong(2)) === ((6L, 3L, 1L)))
    val tdEmpty = spark.sql("SELECT token_diversity(array()) AS d")
      .collect().head.getStruct(0)
    assert((tdEmpty.getLong(0), tdEmpty.getLong(1), tdEmpty.getLong(2)) === ((0L, 0L, 0L)))
  }

  test("sorted_intersect_count agrees with array_intersect on random sorted sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b").select(
      graft.functions.Vectors.sortedIntersectCount(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("hash"))
    // Both the codegen'd path (default) and the interpreted eval path
    // (codegen forced off) must match the builtin.
    assert(df.where(col("merge") =!= col("hash")).count() == 0)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.where(col("merge") =!= col("hash")).count() == 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("sorted_intersect_count_str agrees with array_intersect, Hangul included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vocab = Vector("값", "가나", "가나다", "apple", "banana", "차트",
      "한글 음절", "z", "한", "가", "key agg", "row scan")
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      (Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).distinct,
        Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).distinct)
    }
    // sort_array establishes the binary-UTF8 order the kernel assumes.
    val df = rows.toDF("a0", "b0")
      .select(sort_array(col("a0")).as("a"), sort_array(col("b0")).as("b"))
      .select(
        graft.functions.Vectors.sortedIntersectCountStr(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("hash"))
    assert(df.where(col("merge") =!= col("hash")).count() == 0)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.where(col("merge") =!= col("hash")).count() == 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
