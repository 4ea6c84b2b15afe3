package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extracted from the ANALYZED Catalyst plan —
  * the governance surface a lake deployment wires into its catalog:
  * for every output column of a query, the set of (source table,
  * source column) leaves it derives from, computed by walking alias
  * definitions down to relation attributes. Because the walk runs on
  * the resolved-but-unoptimized plan, user-written aliases survive
  * (the optimizer may collapse or rename them), and because ExprIds
  * are unique per attribute, a self-join's two sides cannot
  * cross-contaminate.
  *
  * Scale: this is pure PLAN analysis — no job runs, no data is read;
  * cost is O(plan nodes × expressions) on the driver, identical for a
  * 60 k-row or a 100 TB input of the same query.
  */
object Lineage {

  /** (output column, source table, source column) triples, one per
    * contributing leaf, deterministic order left to the caller.
    */
  def trace(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed

    def origins(p: LogicalPlan): Map[ExprId, Set[(String, String)]] = p match {
      case lr: LogicalRelation =>
        val table = lr.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths.headOption
              .map(_.getName.replaceAll("\\.parquet$", "")).getOrElse("?")
          case other => other.getClass.getSimpleName
        }
        lr.output.map(a => a.exprId -> Set((table, a.name))).toMap
      case leaf: LeafNode =>
        leaf.output.map(a => a.exprId -> Set((leaf.nodeName, a.name))).toMap
      case other =>
        val fromChildren = other.children.map(origins)
          .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
        def resolve(e: Expression): Set[(String, String)] =
          e.references.toSeq
            .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty)).toSet
        // every Alias anywhere in this node's expressions defines a new
        // attribute whose lineage is its child's reference closure —
        // covers Project, Aggregate (grouping aliases included), Window
        val defined = other.expressions.flatMap(_.collect {
          case a: Alias => a.exprId -> resolve(a.child)
        }).toMap
        fromChildren ++ defined
    }

    val m = origins(plan)
    plan.output.flatMap { a =>
      m.getOrElse(a.exprId, Set(("?", a.name)))
        .toSeq.sorted.map { case (t, c) => (a.name, t, c) }
    }
  }
}
