package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** Logical "k best rows per key" operator — the whole-operator custom-plan
  * path of the engine design (SURVEY.md §7.3 ladder step (c)): a
  * `LogicalPlan` node + `SparkStrategy` + physical `SparkPlan`, registered
  * through `SparkSessionExtensions` (graft.plans.GraftExtensions).
  *
  * Why not the window form (`row_number().over(...) <= k`, q16)? The window
  * plan must SORT every partition's full row set after the shuffle —
  * O(n log n) per partition on data that is then 99% discarded. This node
  * plans to two [[org.apache.spark.sql.graft.TopKPerKeyExec]] stages
  * (partial → exchange → final), so each map task ships at most k rows per
  * key it has seen, and no stage ever holds more than k rows per key —
  * the aggregation-like shape that survives 100 TB fact inputs. Same
  * result set as the window form (asserted by the shared q16/q69 oracle),
  * minus the rank column.
  *
  * Semantics: the first `k` rows of each key group under `sortOrder`
  * (total order — callers must include a tie-break column).
  */
case class TopKPerKeyNode(
    grouping: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"TopKPerKeyNode: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}
