package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, AttributeReference, AttributeSet, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.GraftShim

/** Whole-operator as-of join: custom `LogicalPlan` → `SparkStrategy` →
  * `SparkPlan`, registered via `SparkSessionExtensions` (rung (c) of the
  * custom-operator ladder; [[graft.operators.AsOfJoin]] is rung (a), the
  * same semantics composed from built-in operators).
  *
  * Why a physical operator when the composition already works: the
  * tag-union-scan plan pays for generality — it widens every row to
  * `(key, ts, left-struct | right-struct, side)` BEFORE the shuffle (both
  * sides shuffle a null-padded struct slot), and the window's running
  * `last(ignoreNulls)` materializes a match column per row before the
  * left-only filter drops the right rows again. This node shuffles each
  * side's own columns only, sorts within partitions, and streams a
  * per-partition merge: for every left row, the latest right row with
  * `right.ts <= left.ts` in the same key group is sitting at the merge
  * cursor — zero per-row state beyond one buffered payload, no padding,
  * no post-filter. Exactly SortMergeJoin's execution shape, specialized
  * to latest-≤ instead of equality ranges.
  *
  * Distribution contract: `requiredChildDistribution` asks Catalyst to
  * CO-PARTITION both children on the join keys (`EnsureRequirements`
  * inserts/reuses compatible hash exchanges, AQE coalesces them
  * consistently) and `requiredChildOrdering` asks for an in-partition
  * (keys, ts) sort — so the operator composes with bucketing: a source
  * already hash-distributed on the keys skips the shuffle entirely.
  *
  * Semantics (identical to [[graft.operators.AsOfJoin.asOf]], property-
  * tested against it): left-outer; ties `right.ts == left.ts` match;
  * right rows with null keys or null ts can never match (SQL equi-join
  * null semantics); left rows with null keys/ts survive unmatched;
  * `right` unique per (keys, ts) for determinism.
  */
object NativeAsOfJoin {

  /** DataFrame builder — resolves names against both inputs, manufactures
    * the output attributes (`prefix + ts`, `prefix + payload…`), and wraps
    * the logical node back into a DataFrame. Requires the session to carry
    * [[graft.GraftExtensions]] (true for every [[graft.GraftSession]]).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           prefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    val resolver = spark.sessionState.conf.resolver
    val lPlan = left.queryExecution.analyzed
    // self-join safety: if the right plan shares attribute ids with the
    // left (both derived from one source), re-alias to fresh ids so the
    // node's two sides stay unambiguous
    val rPlan0 = right.queryExecution.analyzed
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)

    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(s"asOf: column '$name' not found on $side side"))
    val lKeys = keys.map(attr(lPlan, _, "left"))
    val rKeys = keys.map(attr(rPlan, _, "right"))
    val lTs = attr(lPlan, tsCol, "left")
    val rTs = attr(rPlan, tsCol, "right")
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType, s"asOf: key '${l.name}' type mismatch (${l.dataType} vs ${r.dataType})") }
    require(lTs.dataType == rTs.dataType, s"asOf: ts type mismatch (${lTs.dataType} vs ${rTs.dataType})")
    require(RowOrdering.isOrderable(lTs.dataType), s"asOf: ts type ${lTs.dataType} is not orderable")
    require(RowOrdering.isOrderable(lKeys.map(_.asInstanceOf[Expression])), "asOf: key types not orderable")

    val payload = rPlan.output.filterNot(a => rKeys.exists(_.exprId == a.exprId) || a.exprId == rTs.exprId)
    val rightOut = (rTs +: payload).map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    val outClash = lPlan.output.map(_.name).toSet.intersect(rightOut.map(_.name).toSet)
    require(outClash.isEmpty,
      s"asOf output names collide with left columns: ${outClash.mkString(", ")} (choose another prefix)")

    GraftShim.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys, lTs, rTs, payload, rightOut))
  }
}

/** Logical as-of join node. Constructed resolved (attributes captured from
  * analyzed child plans); `rightOut` carries the manufactured output
  * attributes so analysis, optimization, and physical planning all agree
  * on ids.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightPayload: Seq[Attribute],
    rightOut: Seq[AttributeReference]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ rightOut

  // rightOut exists only here — without this, CheckAnalysis would flag the
  // manufactured attributes as unresolvable against the children
  override def producedAttributes: AttributeSet = AttributeSet(rightOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in [[graft.GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs, p.rightPayload,
        p.rightOut, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: children co-partitioned on the keys and sorted by
  * (keys, ts) in-partition; one streaming merge pass per partition holding
  * a single buffered right payload.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightPayload: Seq[Attribute],
    rightOut: Seq[AttributeReference],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightOut

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // left rows pass through in arrival order with columns appended
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val lOutput = left.output
    val rOutput = right.output
    val lKeyExprs: Seq[Expression] = leftKeys
    val rKeyExprs: Seq[Expression] = rightKeys
    val lTsExpr: Expression = leftTs
    val rTsExpr: Expression = rightTs
    val rValExprs: Seq[Expression] = rightTs +: rightPayload
    val outAttrs = output
    val nRightOut = rightOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOutput)
      val rValProj = UnsafeProjection.create(rValExprs, rOutput)
      val outProj = UnsafeProjection.create(outAttrs.map(a => a: Expression), lOutput ++ rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRightOut)

      // merge cursor state: the buffered latest-≤ payload for the key
      // currently under the cursor, plus at most one peeked right row
      // (safe to hold un-copied — no further next() until it is consumed)
      var curKey: InternalRow = null
      var curVal: InternalRow = null
      var rHead: InternalRow = null

      // advance the right side to the latest row with key == lk and
      // ts <= lts; strictly-smaller keys are final (left is key-ascending)
      def advance(lk: InternalRow, lts: InternalRow): Unit = {
        var done = false
        while (!done) {
          if (rHead == null) {
            if (rIter.hasNext) rHead = rIter.next() else done = true
          }
          if (!done) {
            val rk = rKeyProj(rHead)
            val rts = rTsProj(rHead)
            if (rk.anyNull || rts.isNullAt(0)) rHead = null // can never match
            else {
              val c = keyOrd.compare(rk, lk)
              if (c > 0) done = true
              else if (c < 0) rHead = null // earlier key: never needed again
              else if (tsOrd.compare(rts, lts) <= 0) {
                curKey = rk.copy(); curVal = rValProj(rHead).copy(); rHead = null
              } else done = true
            }
          }
        }
      }

      lIter.map { lrow =>
        val lk = lKeyProj(lrow)
        val lts = lTsProj(lrow)
        if (lk.anyNull || lts.isNullAt(0)) outProj(joined(lrow, nullRight))
        else {
          advance(lk, lts)
          if (curKey != null && keyOrd.compare(curKey, lk) == 0)
            outProj(joined(lrow, curVal))
          else outProj(joined(lrow, nullRight))
        }
      }
    }
  }
}
