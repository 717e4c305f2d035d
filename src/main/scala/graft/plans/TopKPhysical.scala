package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType

import scala.collection.mutable

/** Whole-operator custom plan: per-group top-k as a first-class
  * physical operator (the full LogicalPlan → Strategy → SparkPlan
  * ladder rung, SURVEY §7.3 / guide "custom operator" shape).
  *
  * The window formulation (TopKPerGroup) sorts every group in full;
  * this operator declares `ClusteredDistribution(groupCols)` — so the
  * planner inserts exactly one hash exchange — and then keeps a
  * BOUNDED buffer per group per partition: O(n log k) work, O(groups·k)
  * memory, no sort of the long tail. The same shape a
  * TakeOrderedAndProject gives globally, generalized per group.
  *
  * Registered via `spark.experimental.extraStrategies` (or an
  * extensions hook); exposed through [[TopKPhysical.topK]].
  */
case class TopKPerGroupPlan(groupCols: Seq[Expression], orderCols: Seq[SortOrder],
                            k: Int, rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupCols: Seq[Expression], orderCols: Seq[SortOrder],
                            k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val trimAt = math.max(k * 4, 64)
    // Per-task row budget before a global trim pass. Memory contract:
    // the operator holds at most max(budget, 2·groups·k) buffered rows
    // per task — the groups·k floor is the task's own OUTPUT
    // cardinality, i.e. the minimum any per-group top-k must retain.
    // Only the per-group trim headroom sits above that floor, and the
    // global trim collapses it whenever the budget is hit.
    val maxBufferedRows = session.conf
      .get("spark.graft.topk.maxBufferedRows", (4 * 1024 * 1024).toString).toLong
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(groupCols, childOutput)
      val ordering = RowOrdering.create(orderCols, childOutput)
      val outProj = UnsafeProjection.create(output, output)
      val buffers = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
      var total = 0L
      var nextGlobalTrim = maxBufferedRows
      it.foreach { row =>
        val key = groupProj(row)
        val buf = buffers.get(key) match {
          case Some(b) => b
          case None =>
            val b = mutable.ArrayBuffer.empty[InternalRow]
            buffers.put(key.copy(), b)
            b
        }
        buf += row.copy()
        total += 1
        if (buf.length >= trimAt) {
          val kept = buf.sorted(ordering).take(k)
          total -= (buf.length - kept.length)
          buf.clear(); buf ++= kept
        }
        if (total >= nextGlobalTrim) {
          // high-cardinality grouping: collapse EVERY buffer to k so a
          // task's memory can't grow past the output-size floor; back
          // off the next trigger so we don't thrash once at the floor
          var newTotal = 0L
          buffers.valuesIterator.foreach { b =>
            if (b.length > k) {
              val kept = b.sorted(ordering).take(k)
              b.clear(); b ++= kept
            }
            newTotal += b.length
          }
          total = newTotal
          nextGlobalTrim = math.max(maxBufferedRows, total * 2)
        }
      }
      buffers.iterator.flatMap { case (_, buf) =>
        buf.sorted(ordering).take(k).iterator.zipWithIndex.map { case (r, i) =>
          outProj(new JoinedRow(r, InternalRow(i + 1)))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, rank, child) =>
      TopKPerGroupExec(g, o, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPhysical {

  /** Ensure the strategy is installed in this session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Per-group top-k through the custom physical operator; `orderBy`
    * pairs are (column name, ascending?). Appends `rankName`. */
  def topK(df: DataFrame, groupBy: Seq[String], orderBy: Seq[(String, Boolean)],
           k: Int, rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = ColumnBridge.analyzed(df)
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val orders = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    ColumnBridge.ofRows(spark,
      TopKPerGroupPlan(groupBy.map(attr), orders, k, rank, analyzed))
  }
}
