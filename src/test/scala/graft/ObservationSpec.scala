package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Engine observability: `observe()` collects metrics during the normal
  * pass over the data — no second scan, the way a pipeline audits row
  * counts / quality gates at 100 TB without paying for extra actions. */
class ObservationSpec extends SparkSuite {

  test("observe() collects audit metrics in the same pass") {
    val obs = Observation("audit")
    val out = Tables(spark, sf001, "lineitem")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") > 45, 1).otherwise(0)).as("n_hi_qty"),
        max(col("l_extendedprice")).as("max_price"))
      .where(col("l_quantity") > 45) // downstream filter sees all metrics pre-filter
      .count()

    val m = obs.get
    assert(m("n_rows") == 6000L) // sf0.001 lineitem row count
    assert(m("n_hi_qty").asInstanceOf[Long] == out)
    assert(m("max_price").asInstanceOf[Double] > 0.0)
  }
}
