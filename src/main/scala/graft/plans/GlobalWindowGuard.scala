package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Conf-gated scale lint, installed through `SparkSessionExtensions`
  * (see [[graft.ext.GraftExtensions]]): a window with an EMPTY
  * partition spec moves every input row into one task — the classic
  * 100 TB scale-killer, and the reason this engine's ranking operators
  * (Rank, TopK, Corpus.globalIds) are built from per-partition
  * aggregates + broadcast offsets instead of `row_number() OVER
  * (ORDER BY …)`. The engine's standing discipline is that every
  * remaining global window sits above a relation already bounded to a
  * handful of rows; this rule enforces that discipline mechanically at
  * optimization time instead of leaving it to code review.
  *
  * "Provably bounded" is a RECURSIVE cardinality argument, not a
  * subtree-contains check: an Aggregate (grouped relations here are
  * day/label/partition-count sized), a GlobalLimit (top-N lists), a
  * LocalRelation/OneRowRelation/Range literal, or a checkpointed
  * LogicalRDD (this engine only checkpoints small materialized state —
  * stream sinks, label fixpoints) bounds its subtree; a join is
  * bounded only when the sides that drive its cardinality are (both
  * for inner/outer/cross, the left alone for semi/anti); everything
  * else is bounded iff all its children are. The recursion closes the
  * `raw.crossJoin(broadcast(agg))` loophole the old exists-anywhere
  * check admitted — a 1-row broadcast aggregate does NOT bound the
  * unbounded probe side it multiplies. It remains a lint, not a
  * cardinality proof (a Generate above a bounded child passes), but
  * the naive window-over-raw-scan class — the mistake that silently
  * works at sf0.01 and falls over on a cluster — cannot slip through
  * a bounded sibling anymore.
  *
  * Gated by `spark.graft.failOnGlobalWindow` (the graft session
  * factory turns it ON, so every Verify/Bench/test run re-proves the
  * discipline; spark-submit users opt in per job).
  */
object GlobalWindowGuard extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.failOnGlobalWindow"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "false") == "true") {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty && !provablyBounded(w.child) =>
          throw new IllegalStateException(
            "GlobalWindowGuard: window with empty PARTITION BY over a " +
              "relation not provably bounded (no Aggregate/Limit/" +
              "checkpoint below) — this moves every row into one task " +
              "at scale. Partition the window, pre-aggregate, or set " +
              s"$ConfKey=false to override. Offending window:\n$w")
        case _ => ()
      }
    }
    plan
  }

  private def provablyBounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalRelation | _: OneRowRelation |
        _: Range => true
    // checkpointed/materialized state (LogicalRDD lives in a
    // non-catalyst package; match by name to avoid the dependency)
    case r if r.getClass.getSimpleName == "LogicalRDD" => true
    case j: Join => j.joinType match {
      // semi/anti output ≤ |left|: only the left drives cardinality
      case org.apache.spark.sql.catalyst.plans.LeftSemi |
          org.apache.spark.sql.catalyst.plans.LeftAnti =>
        provablyBounded(j.left)
      case _ => provablyBounded(j.left) && provablyBounded(j.right)
    }
    case leaf if leaf.children.isEmpty => false // file scans etc.
    case other => other.children.forall(provablyBounded)
  }
}
