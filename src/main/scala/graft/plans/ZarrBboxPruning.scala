package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types.DoubleType

import graft.functions.GeoFunctions.BboxIntersects
import graft.sources.ZarrScan

/**
 * Post-pushdown optimizer rule making the reference's flagship STAC-style
 * search (reference: README.md:3-16) chunk-pruned: a `bbox_intersects(bbox,
 * x0, y0, x1, y1)` conjunct over a Zarr scan is planted into the [[ZarrScan]],
 * whose partition planning then skips every chunk range whose recorded
 * per-chunk envelope (`_graft_stats.json` — [[graft.zarr.ZarrStats]]) cannot
 * intersect the query box. The reference cannot do this: it declines filter
 * pushdown entirely (src/table_provider.rs:85), and bare Zarr v3 carries no
 * chunk statistics anyway.
 *
 * `bbox_intersects` is a custom Catalyst expression, so it can never reach
 * the DSv2 `pushFilters` path (Spark only translates standard expressions to
 * `sources.Filter`s) — hence this rule, which must run AFTER
 * `V2ScanRelationPushDown`. The only such batch reachable from user code is
 * "User Provided Optimizers" (`experimental.extraOptimizations`) — Spark's
 * "Pre CBO Rules" batch sits BEFORE early scan pushdown, so
 * `injectPreCBORule` never sees the scan (pinned by the GraftExtensions
 * SQL-path spec). Installed by `GeoFunctions.register` and by the
 * extension's `bbox_intersects` builder. The `Filter` above the scan is
 * left untouched, so like
 * all graft stats pruning this is advisory: wrong/stale envelopes cost I/O,
 * never correctness.
 */
object ZarrBboxPruning extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: DataSourceV2ScanRelation)
        if r.scan.isInstanceOf[ZarrScan] &&
          r.scan.asInstanceOf[ZarrScan].bboxFilter.isEmpty =>
      val scanCols = r.output.map(_.exprId).toSet
      val box = splitConjunctivePredicates(cond).collectFirst {
        case BboxIntersects(Seq(a: AttributeReference, x0, y0, x1, y1))
            if scanCols.contains(a.exprId) =>
          for (vx0 <- lit(x0); vy0 <- lit(y0); vx1 <- lit(x1); vy1 <- lit(y1))
            yield (a.name, vx0, vy0, vx1, vy1)
      }.flatten
      box match {
        case Some((col, x0, y0, x1, y1)) =>
          val scan = r.scan.asInstanceOf[ZarrScan]
          f.copy(child = r.copy(scan = scan.withBboxFilter(col, x0, y0, x1, y1)))
        case None => f
      }
  }

  /** Foldable double expression → its value (constant folding has already
   *  collapsed the register-time casts, but fold defensively). */
  private def lit(e: Expression): Option[Double] = e match {
    case Literal(v: Double, DoubleType) => Some(v)
    case _ if e.foldable && e.dataType == DoubleType =>
      Option(e.eval(null)).map(_.asInstanceOf[Double])
    case _ => None
  }
}
