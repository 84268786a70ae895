package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Per-child Filter/Project pushdown through [[BucketUnionPlan]] — the
  * Union-style distributivity the generic optimizer can't apply to an
  * opaque node (and must not apply naively: [[BucketUnionPlan]] claims
  * every child attribute in `references` precisely so ColumnPruning
  * doesn't collapse the right child to an empty projection).
  *
  * A union commutes with deterministic filters and projections:
  * `Filter(U(l, r)) == U(Filter(l), Filter(r))`, with the condition's
  * attributes remapped per child by POSITION (node output reuses the
  * left child's exprIds, so the left remap is the identity and the
  * right remap substitutes the positional twin). Projections prune by
  * position too, always retaining the bucket key column — the zip
  * exec's `ClusteredDistribution` needs it even when the parent
  * doesn't.
  *
  * Why this matters at scale: a composed state chain is base ∪ delta ∪
  * delta…, each level a bucketed parquet scan. After this rule, an
  * ad-hoc selective read over the composed view (`state.where(pred)
  * .select(cols)`) cascades the filter and pruned column set down
  * every level of the chain (the rewrite re-matches on the nested
  * [[BucketUnionPlan]] children), landing them adjacent to each leaf
  * relation where FileSourceStrategy turns them into parquet
  * `PushedFilters` + a pruned `ReadSchema`. Before, the whole chain
  * was scanned in full and filtered above the zip. The engine's own
  * keyed probe reads (broadcast joins) were never affected; this
  * closes the gap for everything else.
  */
object BucketUnionPushdown extends Rule[LogicalPlan] {

  private def remap(e: Expression, from: Seq[Attribute],
      to: Seq[Attribute]): Expression = {
    val m = from.map(_.exprId).zip(to).toMap
    e.transform { case a: AttributeReference => m.getOrElse(a.exprId, a) }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // Filter distributes into both children (same rows survive: a row
    // of the union passes iff it passes in the child it came from)
    case Filter(cond, b: BucketUnionPlan) if cond.deterministic =>
      b.copy(
        left = Filter(remap(cond, b.output, b.left.output), b.left),
        right = Filter(remap(cond, b.output, b.right.output), b.right))

    // Project prunes both children to the referenced columns + the
    // bucket key (kept so the zip's clustering requirement resolves);
    // the parent projection stays, its exprIds are preserved by the
    // positional prune
    case p @ Project(list, b: BucketUnionPlan) if list.forall(_.deterministic) =>
      val needed = p.references
      val keep = b.output.zipWithIndex.collect {
        case (a, i) if needed.contains(a) || a.name == b.keyName => i
      }
      if (keep.size == b.output.size) p
      else p.copy(child = b.copy(
        left = Project(keep.map(b.left.output(_)), b.left),
        right = Project(keep.map(b.right.output(_)), b.right)))
  }
}
