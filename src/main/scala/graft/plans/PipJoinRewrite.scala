package graft.plans

import graft.functions.{CellOfExpr, PipExpr, PolygonCoverExpr}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (SURVEY.md §4.2, the data-induced-predicate pattern):
  * a `pip(x, y, exterior, holes)` predicate over a cross/unconditioned
  * join — the naive way to write a spatial join — is rewritten into the
  * staged plan the engine would build by hand:
  *
  * {{{
  *   Filter pip(x, y, ext, holes)            Filter pip(...)   <- exact refine
  *     Join Cross                     =>       Join Inner (cell_of(x,y,L) = __pip_cell)
  *       points                                  points
  *       polygons                                Generate explode(polygon_cover(ext, holes, L))
  * }}}
  *
  * The cover is an exact cell set, so prefilter ⊇ truth and the kept
  * refine filter restores equality — the rewrite is purely a plan
  * improvement (cross product -> equi-join on an int64 key that
  * broadcast/sort-merge/AQE-skew machinery can handle).
  *
  * Fires only when the pip arguments split cleanly across the two join
  * sides and the right side is not already cover-exploded (idempotence).
  */
object PipJoinRewrite extends Rule[LogicalPlan] {

  /** Fallback cover/prefilter cell level when the polygon side carries no
    * row-count stats; coarse enough that any polygon's cover stays small,
    * fine enough to prune (overridable per-query by building the staged
    * join explicitly via SpatialJoins.pipJoin, whose AutoLevel samples
    * actual bboxes — an optimizer rule must not launch jobs, so here the
    * choice comes from plan statistics only).
    */
  val Level = 9

  /** Level for one rewrite, from the polygon side's optimizer stats:
    * scale the prefilter grid with the polygon COUNT (more polygons =>
    * finer cells keep the expected polygons-per-cell bounded, so the
    * equi-join prunes instead of degenerating back toward the product).
    * log4(n)+4 puts 100 polygons at level ~7 and 1M at level 12 (clamped
    * [6, 12] — past 12 cover explosion outweighs extra pruning for the
    * unknown-bbox case this rescue rule serves); stats-less sides keep
    * the historical constant.
    */
  private[graft] def levelFor(polySide: LogicalPlan): Int =
    polySide.stats.rowCount match {
      case Some(n) =>
        val lvl = (math.log(math.max(1.0, n.toDouble)) / math.log(4.0)).round.toInt + 4
        math.max(6, math.min(12, lvl))
      case None => Level
    }

  private def alreadyRewritten(p: LogicalPlan): Boolean = p.exists {
    case Generate(Explode(_: PolygonCoverExpr), _, _, _, _, _) => true
    case _ => false
  }

  /** True when the condition already carries an equality key linking the
    * two sides. The rewrite exists to RESCUE unconditioned products; a
    * join that is already keyed (e.g. the staged pipJoin's geometry
    * re-join by poly_id, whose pip refine sits in the same condition) is
    * fine as-is, and injecting a second cover explode there re-replicates
    * every polygon's geometry once per cover cell for no pruning gain.
    */
  private def hasEquiKey(cond: Expression, left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        val (ar, br) = (a.references, b.references)
        ar.nonEmpty && br.nonEmpty &&
          ((ar.subsetOf(left.outputSet) && br.subsetOf(right.outputSet)) ||
           (br.subsetOf(left.outputSet) && ar.subsetOf(right.outputSet)))
      case _ => false
    }

  private def splitsAcross(pip: PipExpr, left: LogicalPlan, right: LogicalPlan): Boolean = {
    val ptRefs = pip.x.references ++ pip.y.references
    val polyRefs = pip.exterior.references ++ pip.holes.references
    ptRefs.nonEmpty && polyRefs.nonEmpty &&
      ptRefs.subsetOf(left.outputSet) && polyRefs.subsetOf(right.outputSet)
  }

  private def rewrite(cond: Expression, pip: PipExpr, left: LogicalPlan,
                      right: LogicalPlan): LogicalPlan = {
    val level = levelFor(right)
    val cellAttr = AttributeReference("__pip_cell", LongType, nullable = false)()
    val gen = Generate(
      Explode(PolygonCoverExpr(pip.exterior, pip.holes, Literal(level))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellAttr), child = right)
    val equi = EqualTo(CellOfExpr(pip.x, pip.y, Literal(level)), cellAttr)
    val join = Join(left, gen, Inner, Some(equi), JoinHint.NONE)
    Project(left.output ++ right.output, Filter(cond, join))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // filter (still) sitting above an unconditioned join
    case f @ Filter(cond, Join(left, right, Inner | Cross, None, _))
        if !alreadyRewritten(right) =>
      splitPip(cond, left, right) match {
        case Some(pip) => rewrite(cond, pip, left, right)
        case None => f
      }
    // predicate already pushed into the join condition — but only when no
    // equality key links the sides (an already-keyed join needs no rescue)
    case j @ Join(left, right, Inner | Cross, Some(cond), _)
        if !alreadyRewritten(right) && !hasEquiKey(cond, left, right) =>
      splitPip(cond, left, right) match {
        case Some(pip) => rewrite(cond, pip, left, right)
        case None => j
      }
  }

  private def splitPip(cond: Expression, left: LogicalPlan,
                       right: LogicalPlan): Option[PipExpr] =
    splitConjunctivePredicates(cond).collectFirst {
      case p: PipExpr if splitsAcross(p, left, right) => p
    }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }
}
