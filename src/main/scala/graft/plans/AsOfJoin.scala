package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftnative.PlanDataset

/** As-of join as a first-class operator (the guide's tier (c): custom
  * `LogicalPlan` + `Strategy` + physical node) — for every left row,
  * attach the LATEST right row of the same key whose timestamp is ≤ the
  * left timestamp, or nulls (left outer).
  *
  * The declared-query surface keeps the equi-join + window formulation
  * (`q_join_asof`) because the DuckDB oracle shares it line for line;
  * this operator exists for the scale path: the window formulation
  * materializes EVERY (left, right-candidate) pair before ranking —
  * worst case |left|×|right| rows per key through the shuffle — while
  * this node is a single co-partitioned merge pass: each side shuffles
  * once on its key, sorts (key, ts) within partitions, and streams —
  * O(L + R) per partition, no candidate blowup, no rank. That is the
  * difference between "works on 60k rows" and "works on 100 TB of
  * events against a day of orders".
  *
  * Keys and timestamps are pre-cast to LONG by [[AsOf.join]] so the
  * merge loop needs no type dispatch; nulls in key/ts are the caller's
  * responsibility (filter first — as-of semantics for null time are
  * undefined anyway).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression)
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Both sides hash-cluster on their key (EnsureRequirements inserts
    * the exchanges) ... */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** ... and sort (key, ts) within partitions, so the join is a single
    * forward merge per partition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lk = BindReferences.bindReference(leftKey, left.output)
      val lt = BindReferences.bindReference(leftTs, left.output)
      val rk = BindReferences.bindReference(rightKey, right.output)
      val rt = BindReferences.bindReference(rightTs, right.output)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // one-row lookahead into the right stream + the last right row
      // that matched the current key (rows are reused by the sorter —
      // the candidate must be copied once when stored)
      var pending: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      lIt.map { l =>
        val key = lk.eval(l).asInstanceOf[Long]
        val ts = lt.eval(l).asInstanceOf[Long]
        var ahead = false
        while (!ahead && (pending != null || rIt.hasNext)) {
          if (pending == null) pending = rIt.next()
          val rKey = rk.eval(pending).asInstanceOf[Long]
          if (rKey < key ||
              (rKey == key && rt.eval(pending).asInstanceOf[Long] <= ts)) {
            if (rKey == key) { lastMatch = pending.copy(); lastMatchKey = rKey }
            pending = null // consumed (either matched or obsolete key)
          } else ahead = true // right stream is past this left row
        }
        if (lastMatch != null && lastMatchKey == key) joined(l, lastMatch)
        else joined(l, nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Public DataFrame-level API. */
object AsOf {

  /** Left-outer as-of join: for each `left` row, the latest `right` row
    * with the same key and `rightTs <= leftTs`. Key/ts expressions are
    * cast to LONG up front (timestamps are epoch-micros internally).
    * Rows with equal (key, ts) on the right: the merge keeps the last
    * in sort order — supply a unique ts (or pre-dedupe) for fully
    * deterministic picks, exactly as the window formulation needs a
    * tiebreak column.
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: Column, leftTs: Column,
      rightKey: Column, rightTs: Column): DataFrame = {
    val spark = left.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val l2 = left.withColumn("__asof_lk", leftKey.cast("long"))
      .withColumn("__asof_lt", leftTs.cast("long"))
    val r2 = right.withColumn("__asof_rk", rightKey.cast("long"))
      .withColumn("__asof_rt", rightTs.cast("long"))
    val lPlan = l2.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).get
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, "__asof_lk"), attr(lPlan, "__asof_lt"),
      attr(rPlan, "__asof_rk"), attr(rPlan, "__asof_rt"))
    PlanDataset.ofRows(left.sparkSession, node)
      .drop("__asof_lk", "__asof_lt", "__asof_rk", "__asof_rt")
  }
}
