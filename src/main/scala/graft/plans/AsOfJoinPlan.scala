package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — the whole-operator custom path (logical node →
  * strategy → physical operator), complementing the window-composition
  * form in operators/AsOf.scala.
  *
  * The composed form is already scale-correct (one shuffle + one sort
  * per side), but it materializes the union of both inputs through the
  * window operator and carries the payload struct across every row. The
  * native operator does what a database's ASOF JOIN does: ask the
  * planner for co-partitioning on the key and (key, time) ordering on
  * each side — EnsureRequirements inserts exactly one exchange and one
  * sort per side, or none when the data is already bucketed/sorted —
  * then streams both sorted iterators through a constant-memory merge:
  * hold the latest right row ≤ the current left time, emit left ⨝ held.
  * No union materialization, no window buffering, O(1) state per key.
  *
  * Semantics match AsOf.join / DuckDB `ASOF LEFT JOIN` (`c.ts >= p.ts`):
  * inclusive at equal times, the payload carried wholesale from the
  * single matched row (its NULL fields stay NULL), left row emitted
  * with NULL payload when no right row qualifies. NULL keys or times
  * never match (SQL comparison semantics).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. Inject via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * `spark.experimental.extraStrategies` on a live session. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, p, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, p, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], forward: Boolean = false) extends BinaryExecNode {

  /** Time direction the merge runs in. Backward as-of streams times
    * ascending and holds the latest right row ≤ t; forward as-of is the
    * SAME merge run over descending time — "≤ in merge order" then
    * means ≥ in real time, and the last qualifying row consumed is the
    * earliest next event. */
  private def timeDir = if (forward) Descending else Ascending

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "left rows with an as-of match"))

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  // Co-partition both sides on the key: EnsureRequirements aligns the
  // two hash partitionings (and partition counts), inserting at most
  // one exchange per side.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // (key, time) sort within partitions — the merge below relies on it;
  // forward mode runs time descending on both sides.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTime, timeDir) :: Nil,
      SortOrder(rightKey, Ascending) :: SortOrder(rightTime, timeDir) :: Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  private def bind(a: Attribute, schema: Seq[Attribute]) = {
    val i = schema.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"$a not found in ${schema.mkString(",")}")
    BoundReference(i, a.dataType, a.nullable)
  }

  /** Detach a comparison value from the (reused) row buffer it was read
    * from, so it can be held across iterator steps. */
  private def detach(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case x => x
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = bind(leftKey, left.output)
    val lt = bind(leftTime, left.output)
    val rk = bind(rightKey, right.output)
    val rt = bind(rightTime, right.output)
    val keyOrd = GraftBridge.interpretedOrdering(leftKey.dataType)
    val baseTimeOrd = GraftBridge.interpretedOrdering(leftTime.dataType)
    // "≤ in merge order": real ≤ backward, real ≥ forward.
    val timeOrd = if (forward) baseTimeOrd.reverse else baseTimeOrd
    val payloadAttrs = payload.map(_.withNullability(true))
    val rightSchema = right.output
    val leftSchema = left.output
    val outSchema = output
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val payloadProj = UnsafeProjection.create(payload, rightSchema)
        val resultProj = UnsafeProjection.create(outSchema, leftSchema ++ payloadAttrs)
        val nullPayload = new GenericInternalRow(payload.size)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var pending: InternalRow = _ // lookahead right row (copied)
          private var held: InternalRow = _ // payload of best match for current left key
          private var lastKey: Any = _
          private var hasLastKey = false

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lkV = lk.eval(l)
            val ltV = lt.eval(l)
            if (!hasLastKey || lkV == null || keyOrd.compare(lkV, lastKey) != 0) {
              held = null // new key group: previous hold is stale
              lastKey = if (lkV == null) null else detach(lkV)
              hasLastKey = lkV != null
            }
            if (lkV != null && ltV != null) advance(lkV, ltV)
            val hit = lkV != null && ltV != null && held != null
            val p = if (hit) held else nullPayload
            outRows += 1
            if (hit) matched += 1
            resultProj(joined(l, p))
          }

          /** Consume right rows up to (key, time): rows behind the left
            * key are dropped, matching-key rows at or before the left
            * time become the held payload (later rows overwrite — the
            * latest qualifying row wins), the first row beyond stays
            * pending. Each right row is visited once per partition. */
          private def advance(lkV: Any, ltV: Any): Unit = {
            var done = false
            while (!done && (pending != null || rIter.hasNext)) {
              val r = if (pending != null) pending else rIter.next()
              val rkV = rk.eval(r)
              val rtV = rt.eval(r)
              val cmp = if (rkV == null) -1 else keyOrd.compare(rkV, lkV)
              if (cmp < 0) pending = null // right behind left key (or null key): drop
              else if (cmp > 0) { // right ahead: stop, keep for later
                if (pending == null) pending = r.copy()
                done = true
              } else if (rtV == null) {
                pending = null // null time can never match; must not stall the key group
              } else if (timeOrd.compare(rtV, ltV) <= 0) {
                held = payloadProj(r).copy() // qualifying match: hold it
                pending = null
              } else { // same key, beyond left time: stop
                if (pending == null) pending = r.copy()
                done = true
              }
            }
          }
        }
    }
  }
}
