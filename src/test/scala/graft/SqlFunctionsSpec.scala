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
  }
}
