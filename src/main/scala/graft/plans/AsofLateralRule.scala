package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{First, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan-level rescue for LATERAL "best-match probe" subqueries — the
  * shape [[graft.functions.ChSqlParser]] emits for CH `ASOF JOIN` /
  * `ANY JOIN` text:
  *
  * {{{ l LEFT JOIN LATERAL (SELECT * FROM r WHERE <cond(l, r)>
  *     [ORDER BY ord] LIMIT 1) p }}}
  *
  * Spark's own decorrelation of a LIMIT-1 subquery correlated on an
  * INEQUALITY builds a domain of distinct left ordering values and
  * nested-loop-joins it against the whole right side on the inequality
  * alone — O(|distinct ts| x |right|) work (measured: minutes at
  * sf0.1, where the rewritten plan below takes under a second). This
  * rule runs at post-hoc resolution, BEFORE decorrelation, and turns
  * the lateral into the plan a human would write:
  *
  *  1. tag every left row with a monotonic id;
  *  2. JOIN the right side on the FULL probe condition (its equi
  *     conjuncts drive a hash/sort-merge join; the inequality rides
  *     along as a residual — never a nested loop over a domain);
  *  3. per left row, keep the best right row: `max_by(struct(r.*),
  *     ord)` for a descending probe, `min_by` ascending, `first`
  *     (arbitrary, like CH ANY) when the probe has no ORDER BY;
  *  4. re-expand the kept struct to the lateral's output columns,
  *     preserving the original attribute ids.
  *
  * Join output is bounded by per-key match products (the same bound
  * every window-based asof pays), aggregated down map-side before the
  * shuffle. The API forms (`AsOfJoin.leftAsOf` — linear union-window —
  * and `leftAsOfBucketed`) remain the preferred 100-TB shapes; this
  * rule makes the TEXT spelling safe at scale.
  *
  * The match is conservative: LIMIT 1, lateral condition None, LeftOuter
  * or Inner, a projection that passes the probe's rows through
  * unchanged, and a single-key sort (if any) over probe-side attrs
  * only. Anything else falls back to Spark's own decorrelation —
  * correct, just slower.
  */
class AsofLateralRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Cross is how `CROSS JOIN LATERAL` (the parser's INNER asof/any
    // emission) arrives; with the probe's own filter as the join
    // condition it is exactly an inner join
    case lj @ LateralJoin(left, sub: LateralSubquery, joinType @ (LeftOuter | Inner | Cross), None)
        if sub.plan.resolved && left.resolved =>
      rewrite(lj, left, sub, joinType == LeftOuter).getOrElse(lj)
  }

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAlias(child)
    case other => other
  }

  /** Project that just passes its child's output through (bare attrs,
    * positionally complete) — `SELECT *` over the probe. */
  private def passthrough(projList: Seq[NamedExpression], child: LogicalPlan): Boolean =
    projList.length == child.output.length && projList.zip(child.output).forall {
      case (a: AttributeReference, b) => a.exprId == b.exprId
      case _ => false
    }

  private def rewrite(
      lj: LateralJoin,
      left: LogicalPlan,
      sub: LateralSubquery,
      leftOuter: Boolean): Option[LogicalPlan] = {
    // ---- unwrap: [Alias] Limit 1 -> [Sort] -> [Alias] [Project(*)] -> Filter
    val (limited, sortOpt, filtered): (Boolean, Option[Seq[SortOrder]], LogicalPlan) =
      stripAlias(sub.plan) match {
        case GlobalLimit(IntegerLiteral(1), LocalLimit(IntegerLiteral(1), body)) =>
          stripAlias(body) match {
            case Sort(orders, true, sortChild, _) =>
              (true, Some(orders), stripAlias(sortChild))
            case other => (true, None, other)
          }
        case _ => (false, None, EmptyRelation(Nil))
      }
    if (!limited) return None
    val (cond0, inner) = filtered match {
      case Filter(c, child) => (c, child)
      case Project(projList, Filter(c, child)) if passthrough(projList, child) =>
        (c, child)
      case _ => return None
    }
    // sort must order on the probe side only (no outer refs); multi-key
    // sorts fold into ONE struct ordering (lexicographic, matching the
    // row sort) when every key shares the same direction
    val sortOrder: Option[(Expression, SortDirection)] = sortOpt match {
      case Some(orders) if orders.nonEmpty =>
        if (orders.exists(_.child.exists(_.isInstanceOf[OuterReference]))) return None
        if (!orders.forall(_.child.references.subsetOf(inner.outputSet))) return None
        if (orders.map(_.direction).distinct.length != 1) return None // mixed: leave to Spark
        val ord =
          if (orders.length == 1) orders.head.child
          else CreateStruct(orders.map(_.child))
        Some((ord, orders.head.direction))
      case _ => None
    }
    if (left.output.isEmpty || inner.output.isEmpty) return None
    // the correlated probe condition becomes a plain join condition
    val cond = cond0.transform { case OuterReference(a) => a }
    if (!cond.references.subsetOf(left.outputSet ++ inner.outputSet)) return None
    if (cond.exists(!_.deterministic)) return None

    // 1) tag left rows
    val lid = Alias(MonotonicallyIncreasingID(), "ch_asof_lid_")()
    val left2 = Project(left.output :+ lid, left)
    // 2) one real join on the full condition
    val joined = Join(left2, inner,
      if (leftOuter) LeftOuter else Inner, Some(cond), JoinHint.NONE)
    // 3) best right row per left row
    val rStruct = CreateStruct(inner.output)
    val bestAgg = sortOrder match {
      case Some((ord, Descending)) => new MaxBy(rStruct, ord)
      case Some((ord, _)) => new MinBy(rStruct, ord)
      case None =>
        // ANY probe: an arbitrary row; unmatched left-outer rows carry a
        // struct of NULLs whose fields re-expand to NULL columns
        new First(rStruct, ignoreNulls = false)
    }
    val bestName = Alias(bestAgg.toAggregateExpression(), "ch_asof_best_")()
    // left-outer unmatched rows: the ordered probes see a NULL ordering
    // value (max_by/min_by ignore it -> NULL best); ANY keeps the
    // all-NULL struct. Either way the re-expanded fields are NULL.
    //
    // Group on the lid ALONE (one long — narrow sort/shuffle key, and
    // the map-side partial collapses to |left| rows before the
    // exchange); every left column rides along as first() of its
    // single-lid group.
    val lidAttr = lid.toAttribute
    val carried = left.output.map(a =>
      Alias(new First(a, ignoreNulls = false).toAggregateExpression(), a.name)())
    val agg = Aggregate(Seq(lidAttr), (carried :+ bestName).toSeq, joined)
    // 4) restore the lateral's output columns and ids
    val best = bestName.toAttribute
    val leftCols = left.output.zip(carried).map { case (orig, c) =>
      Alias(c.toAttribute, orig.name)(exprId = orig.exprId)
    }
    val rightCols = sub.plan.output.zipWithIndex.map { case (out, i) =>
      Alias(GetStructField(best, i, Some(out.name)), out.name)(exprId = out.exprId)
    }
    val result = Project((leftCols ++ rightCols).toSeq, agg)
    // sanity: same schema as the node we replace
    if (result.output.map(a => (a.name, a.exprId)) !=
      lj.output.map(a => (a.name, a.exprId))) return None
    Some(result)
  }
}

/** Placeholder leaf used only as a never-matching sentinel above. */
private object EmptyRelation {
  def apply(out: Seq[Attribute]): LogicalPlan = LocalRelation(out)
}
