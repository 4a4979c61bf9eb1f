package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN as a first-class operator: LogicalPlan + Strategy + SparkPlan
  * (SURVEY §7.3 / extension level (c)).
  *
  * Semantics: for every left row, attach the LAST right row with the same
  * key whose time is <= the left row's time — ties resolved by the right
  * tie-break ordering (last wins) — or nulls if none: the classic
  * point-in-time lookup. `j6_asof_join` computes the same result via
  * union + last(ignoreNulls) windows; this operator is the direct physical
  * form:
  *
  *  - requiredChildDistribution clusters BOTH sides on the key → one
  *    co-partitioning exchange each, exactly like a shuffle join;
  *  - requiredChildOrdering sorts partitions by (key, time[, tiebreak]) →
  *    the merge is one forward pass, O(n+m) per partition, holding exactly
  *    one buffered right row — no window buffers, no unioned stream;
  *  - that profile is what survives 100 TB: shuffle on key once, stream.
  *
  * v1 restriction (documented): key and time expressions must evaluate to
  * Long (LongType / TimestampType / IntegerType-widened) — the corpus
  * shapes. Generalizing = swapping two `getLong`s for interpreted orderings.
  */
object AsOfJoin {

  final case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      rightTieBreak: Seq[Expression])
      extends BinaryNode {
    // right side is outer: its attributes become nullable
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, tb) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
      case _ => Nil
    }
  }

  final case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      rightTieBreak: Seq[Expression])
      extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq(
        Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
          rightTieBreak.map(SortOrder(_, Ascending)))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val outAttrs = output
      val lk = leftKey; val rk = rightKey; val lt = leftTime; val rt = rightTime
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lktProj = UnsafeProjection.create(Seq(lk, lt), lOut)
        val rktProj = UnsafeProjection.create(Seq(rk, rt), rOut)
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val nullRight = new GenericInternalRow(rOut.length)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var rKey = 0L
          private var rTime = 0L
          private var rRow: InternalRow = _   // buffered right row, not yet folded
          private var rHave = false
          private var matchRow: InternalRow = _
          private var matchKey = 0L
          private var matchValid = false

          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              val r = rIter.next()
              val kt = rktProj(r)
              rKey = kt.getLong(0)
              rTime = kt.getLong(1)
              rRow = r.copy()
              rHave = true
            } else rHave = false

          advanceRight()

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val kt = lktProj(l)
            val lKey = kt.getLong(0)
            val lTime = kt.getLong(1)
            while (rHave && (rKey < lKey || (rKey == lKey && rTime <= lTime))) {
              matchRow = rRow; matchKey = rKey; matchValid = true
              advanceRight()
            }
            if (matchValid && matchKey == lKey) outProj(joined(l, matchRow))
            else outProj(joined(l, nullRight))
          }
        }
      }
    }
  }

  /** Public API (columns resolved by name against each side):
    * {{{
    * AsOfJoin(events, orders,
    *   leftKey = "user_id", rightKey = "o_custkey",
    *   leftTime = "ts", rightTime = "o_orderdate",
    *   rightTieBreak = Seq("o_orderkey"))
    * }}}
    */
  def apply(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val spark: SparkSession = left.sparkSession
    GraftSqlBridge.addStrategy(spark, AsOfStrategy)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    GraftSqlBridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightTieBreak.map(attr(rPlan, _))))
  }
}
