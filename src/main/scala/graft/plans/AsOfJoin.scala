package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  Expression,
  GenericInternalRow,
  JoinedRow,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class operator — the one place in this repo
  * where Spark's built-ins genuinely cannot express the SEMANTICS in
  * one operator: the q37 recipe composes a range join (which
  * materializes EVERY candidate pair inside the tolerance window) with
  * a row_number de-rank — correct, but the intermediate frame is
  * candidates-sized, not output-sized. This operator is the direct
  * physical form: both sides hash-partitioned on the key and sorted by
  * (key, time), then ONE forward merge pass per partition emits each
  * left row joined to the latest right row with rightTime ≤ leftTime —
  * O(|L| + |R|), zero intermediate frame, the classic streaming merge
  * every time-series store implements natively (and DuckDB ships as
  * ASOF JOIN — the q124 oracle).
  *
  * Spark-first wiring, the (c) tier of the custom-operator preference
  * order: logical [[AsOfJoin]] node → [[AsOfJoinStrategy]] planner
  * strategy (injected by [[GraftExtensions]]) → [[AsOfJoinExec]]
  * physical node that declares ClusteredDistribution + per-side
  * (key, time) orderings, so EnsureRequirements plants exactly one
  * exchange per side and co-partitions them — the same contract
  * SortMergeJoinExec declares; AQE and whole-stage codegen around it
  * compose untouched.
  *
  * Contract: LEFT OUTER as-of semantics (unmatched left rows keep
  * right columns NULL); times are LongType (exact integer micros, the
  * q119 convention); a NULL left time or right time never matches; the
  * two sides must not share attribute ids (alias one side — enforced
  * loudly in [[AsOf.join]]).
  *
  * Directions (the pandas merge_asof axis; q143b/q143c):
  *  - "backward" (default): latest right with rightTime ≤ leftTime;
  *  - "forward": earliest right with rightTime ≥ leftTime — the SAME
  *    merge pass, because its one-row lookahead into the sorted right
  *    stream IS the forward candidate once stale rows are consumed;
  *  - "nearest": the closer of the two under the tolerance, ties to
  *    backward (the earlier right row — documented, and the oracle
  *    spells the same rule). Tolerance bounds the matched-side distance
  *    (left−right for backward, right−left for forward, min for
  *    nearest).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long] = None,
    direction: String = "backward"
) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override lazy val resolved: Boolean =
    childrenResolved &&
      (leftKeys ++ rightKeys ++ Seq(leftTime, rightTime)).forall(_.resolved)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): LogicalPlan = copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lks, rks, lt, rt, tol, dir) =>
      AsOfJoinExec(lks, rks, lt, rt, tol, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    direction: String,
    left: SparkPlan,
    right: SparkPlan
) extends SparkPlan
    with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows")
  )

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)
    )

  // rows stream out in the left child's (key, time) order, one per left row
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    require(
      leftTime.dataType == LongType && rightTime.dataType == LongType,
      "as-of times must be LongType (exact integer micros)"
    )
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    require(
      leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"as-of needs matching key lists, got ${leftKeys.size}/${rightKeys.size}"
    )
    val keyTypes = leftKeys.map(_.dataType)
    require(
      rightKeys.map(_.dataType) == keyTypes,
      s"as-of key types differ: $keyTypes vs ${rightKeys.map(_.dataType)}"
    )
    // hoist everything the task closure needs into serializable locals —
    // capturing a SparkPlan member inside zipPartitions would drag `this`
    // (non-serializable) into the closure
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val rightWidth = rOut.size
    // tolerance as a primitive with a sentinel: Option boxing inside the
    // per-row merge would allocate; MaxValue means "unbounded" exactly
    val tolUs = toleranceUs.getOrElse(Long.MaxValue)
    // direction as a primitive too (0 backward, 1 forward, 2 nearest):
    // the hot loop must not compare strings per row
    val mode = direction match {
      case "backward" => 0
      case "forward"  => 1
      case "nearest"  => 2
      case other =>
        throw new IllegalArgumentException(
          s"as-of direction must be backward|forward|nearest, got $other"
        )
    }
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
      // bind against allOut (right side already nullable) so the generated
      // reads null-check — binding against rOut's original nullability
      // would skip the check and misread the all-null pad row
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // latest right row (copied) whose time ≤ current left time, with
        // its key and time (the time re-checked against the tolerance
        // per LEFT row — a candidate in range for one left row can be
        // stale for a later one)
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _
        private var candidateTime: Long = 0L
        // one-row lookahead into the right iterator
        private var rNext: InternalRow = _
        private var rNextKey: InternalRow = _
        private var rNextTime: Long = 0L
        advanceRight()

        /** Load the next right row with a non-null key AND time. Null
          * times can never match and — sorted NULLS FIRST — would
          * otherwise block the scan at each key boundary. Null KEYS must
          * be skipped too: the natural ordering says NULL == NULL, so a
          * null-key right row would equi-match a null-key left row,
          * which SQL equi-join (and DuckDB ASOF JOIN) semantics forbid.
          */
        private def advanceRight(): Unit = {
          var loaded = false
          while (!loaded && rIter.hasNext) {
            rNext = rIter.next()
            val t = rTimeProj(rNext)
            val k = rKeyProj(rNext)
            if (!t.isNullAt(0) && !k.anyNull) {
              rNextTime = t.getLong(0)
              rNextKey = k.copy()
              loaded = true
            }
          }
          if (!loaded) { rNext = null; rNextKey = null }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          // a null left key is unmatched by definition (no equi-join
          // semantics ever match NULL keys); fold it into the same
          // "cannot match" path as a null left time so the candidate
          // comparison below never sees a null key on either side
          val ltNull = lTimeProj(lRow).isNullAt(0) || lKey.anyNull
          val lTime = if (ltNull) 0L else lTimeProj(lRow).getLong(0)
          // consume right rows that can no longer beat future candidates:
          // stale keys, and same-key rows at or before this left time (the
          // LAST of which is the backward as-of match — later left rows
          // only move forward, so consumed rows are never needed again).
          // Forward mode consumes strictly-before rows WITHOUT retaining
          // them (they can't match this or any later left row) — the
          // lookahead rNext then IS the earliest same-key row at or after
          // this left time. Nearest consumes like backward, so `candidate`
          // (last ≤) and `rNext` (first ≥) bracket the left time.
          var advancing = rNext != null
          while (advancing) {
            val cmp = keyOrd.compare(rNextKey, lKey)
            if (cmp < 0) {
              advanceRight()
            } else if (
              cmp == 0 && !ltNull &&
              (if (mode == 1) rNextTime < lTime else rNextTime <= lTime)
            ) {
              if (mode != 1) {
                candidate = rNext.copy()
                candidateKey = rNextKey
                candidateTime = rNextTime
              }
              advanceRight()
            } else advancing = false
            if (rNext == null) advancing = false
          }
          // backward candidate valid within tolerance?
          val bOk =
            mode != 1 && !ltNull && candidate != null &&
              keyOrd.compare(candidateKey, lKey) == 0 &&
              lTime - candidateTime <= tolUs
          // forward candidate (the lookahead) valid within tolerance?
          val fOk =
            mode != 0 && !ltNull && rNext != null &&
              keyOrd.compare(rNextKey, lKey) == 0 &&
              rNextTime - lTime <= tolUs
          // nearest: closer side wins, ties to backward (the earlier row)
          val useBackward =
            bOk && (!fOk || mode != 2 || lTime - candidateTime <= rNextTime - lTime)
          numOutputRows += 1
          if (useBackward) {
            numMatched += 1
            resultProj(joined(lRow, candidate))
          } else if (fOk) {
            numMatched += 1
            resultProj(joined(lRow, rNext))
          } else resultProj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): SparkPlan = copy(left = newLeft, right = newRight)
}

/** Column-API entry point for the operator. */
object AsOf {

  /** Left-outer as-of join: each left row picks the latest right row
    * with the same key and rightTime ≤ leftTime — and, when a
    * `toleranceUs` is given, within that many microseconds
    * (leftTime − rightTime ≤ tolerance; a match beyond it reverts the
    * row to the unmatched NULL form — the pandas merge_asof tolerance
    * contract). `direction` selects the pandas axis: "backward"
    * (default), "forward" (earliest rightTime ≥ leftTime), or "nearest"
    * (closer of the two under the tolerance, ties to backward). Column
    * NAMES (not Columns) keep side resolution unambiguous; the sides
    * must not share attribute ids — alias one side's columns first (a
    * plain select with fresh names suffices).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      toleranceUs: Option[Long] = None,
      direction: String = "backward"
  ): DataFrame =
    joinKeys(
      left,
      right,
      Seq(leftKey),
      Seq(rightKey),
      leftTime,
      rightTime,
      toleranceUs,
      direction
    )

  /** COMPOSITE-key as-of join (q124b): the production shape where the
    * series identity is more than one column — (symbol, venue),
    * (user, day). Same operator, same single merge pass: the key
    * projections/ordering/distribution simply carry every key column,
    * and a NULL in ANY key field disqualifies the row (multi-column
    * equi-join semantics, matching DuckDB's multi-condition ASOF).
    */
  def joinKeys(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceUs: Option[Long] = None,
      direction: String = "backward"
  ): DataFrame = {
    require(
      Set("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be backward|forward|nearest, got $direction"
    )
    require(
      leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"as-of needs matching non-empty key lists, got $leftKeys / $rightKeys"
    )
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val lPlan = ColumnBridge.plan(left)
    val rPlan = ColumnBridge.plan(right)
    val shared = lPlan.outputSet.intersect(rPlan.outputSet)
    require(
      shared.isEmpty,
      s"as-of sides share attributes $shared — alias one side's columns first"
    )
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output
        .find(_.name == n)
        .getOrElse(
          throw new IllegalArgumentException(
            s"column $n not in [${p.output.map(_.name).mkString(", ")}]"
          )
        )
    ColumnBridge.ofRows(
      left.sparkSession,
      AsOfJoin(
        lPlan,
        rPlan,
        leftKeys.map(attr(lPlan, _)),
        rightKeys.map(attr(rPlan, _)),
        attr(lPlan, leftTime),
        attr(rPlan, rightTime),
        toleranceUs,
        direction
      )
    )
  }
}
