package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** SQL-surface registration for the native expressions, so `spark.sql`
  * users get them too: `SELECT vec_dot(a, b)`, `word_shingles(toks, 3)`.
  *
  * Two paths: [[GraftFunctions.register]] on a live session, or
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "vec_sq_dist" -> (es => VecSqDist(es(0), es(1))),
    "vec_dot_d" -> (es => VecDotD(es(0), es(1))),
    "vec_sq_dist_d" -> (es => VecSqDistD(es(0), es(1))),
    "sorted_intersect_count" -> (es => SortedIntersectCount(es(0), es(1))),
    "sorted_intersect_count_str" -> (es => SortedIntersectCountStr(es(0), es(1))),
    "word_shingles" -> (es => WordShingles(es(0),
      es(1).eval().asInstanceOf[Int])),
    "token_diversity" -> (es => TokenDiversity(es(0))))

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[plans] def inject(e: SparkSessionExtensions): Unit = {
    fns.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[VecDot].getName, name), builder))
    }
    e.injectOptimizerRule(_ => ShingleCountRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** `spark.sql.extensions` entry point: the native functions, the
  * shingle-count elimination rule, and the as-of join strategy. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
