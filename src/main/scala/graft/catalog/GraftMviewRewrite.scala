package graft.catalog

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** Transparent materialized-view acceleration: a GROUP BY over a graft
  * table whose grouping/filter columns and aggregate functions are all
  * derivable from a FRESH materialized view (`CALL graft.sys.mview`;
  * watermark == the base's current commit version) is answered from
  * the mview instead of the base —
  *
  * {{{ Aggregate(g, aggs, [Filter(c,)] base) }}}
  *
  * becomes
  *
  * {{{ Aggregate(g', aggs', [Filter(c',)] base_mv_name) }}}
  *
  * where every SUM(x) re-aggregates the stored partial as
  * SUM(sum_x), COUNT(*)/COUNT(x) as SUM(cnt_*) (coalesced to 0 for
  * the empty global-aggregate case, matching COUNT's semantics), and
  * MIN/MAX as MIN(min_x)/MAX(max_x). The mview stores PARTIAL
  * aggregates — `CALL graft.sys.mview_refresh` appends the CDC delta's
  * partials without touching existing rows — so a group may span
  * several mview rows and the rewrite ALWAYS re-aggregates; grouping
  * by any expression OVER the mview's group columns (e.g. a coarser
  * rollup, `year(d)` over a `d`-grouped mview) and filtering on any
  * mview group column stay exact for the same reason. Result types are
  * preserved by casting re-aggregated sums back to the original
  * aggregate's type (SUM over DECIMAL widens per-level; the cast
  * restores the direct plan's precision).
  *
  * The reference has no analogue (its coprocessor computes partials at
  * region servers per query — `SparkSqlRegionObserver.scala:42-196` —
  * but never persists them); this is the summary-table pattern a
  * 100-TB dashboard workload needs: the fact scan happens once at
  * build/refresh, not per query.
  *
  * A watermark stale by APPENDS ONLY does not disable the mview: the
  * rewrite repairs it at read time by unioning the CDC delta (wm, now]
  * — resolved from manifests, reading only appended regions — as
  * singleton partials (sum_x = x, cnt_star = 1, min_x = x), the
  * "lambda" read a Druid-style real-time rollup serves. Exact by the
  * same partial-aggregate algebra; O(delta) per query, never a base
  * scan.
  *
  * Runs at the pre-CBO seam like [[GraftIndexRewrite]], while the base
  * is still a plain [[DataSourceV2Relation]]. Does not fire on:
  * absent mviews, staleness containing row-removing or in-place ops
  * (DELETE / UPDATE / MERGE / OVERWRITE / RESTORE) or an unservable
  * delta, dedupKeys bases, DISTINCT or FILTER'd aggregates,
  * time-travel / CDC-pinned snapshots, columns outside the mview's
  * group set. Kill switch: `spark.graft.accel.mviewRewrite=false`. */
class GraftMviewRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!GraftAccel.on(GraftAccel.MviewRewrite)) return plan
    plan.transformDown {
      case a: Aggregate => rewrite(a).getOrElse(a)
    }
  }

  /** Optional Filter/Project sandwich over a live graft relation:
    * returns (filter conditions, project-alias inlinings, relation).
    * Project aliases matter because `PullOutGroupingExpressions` (an
    * early optimizer batch, so it runs before this pre-CBO rule)
    * rewrites GROUP BY <expr> into a Project computing the expression
    * below the Aggregate — inlining the alias recovers the base
    * columns the expression is really over. */
  private def strip(p: LogicalPlan, conds: Seq[Expression],
      subst: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression])
      : Option[(Seq[Expression],
        Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression],
        DataSourceV2Relation)] = p match {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
        r.table.asInstanceOf[GraftTable].snapshot.isEmpty &&
        // a `changesFromVersion` CDC read is version-pinned at scan
        // build, not via `snapshot` — it must answer from the base
        // (mview_refresh's own delta aggregation is exactly this
        // shape; rewriting it onto the mview would corrupt the
        // appended partials), and it also keeps the delta relation
        // this rule itself emits from re-firing
        !r.options.containsKey(GraftChanges.FromKey) =>
      Some((conds, subst, r))
    case Filter(c, child) => strip(child, conds :+ c, subst)
    case Project(l, child) =>
      val m = l.collect { case al: Alias => al.exprId -> al.child }
      strip(child, conds, subst ++ m)
    case _ => None
  }

  private def rewrite(a: Aggregate): Option[LogicalPlan] = {
    val (conds, subst, r) = strip(a.child, Nil, Map.empty)
      .getOrElse(return None)
    val table = r.table.asInstanceOf[GraftTable]
    // resolve project-alias chains to fixpoint so every expression the
    // rewrite inspects is phrased over the base relation's columns
    def fix(e: Expression): Expression = {
      var cur = e
      var prev: Expression = null
      while (prev == null || !cur.fastEquals(prev)) {
        prev = cur
        cur = cur.transformUp {
          case at: AttributeReference if subst.contains(at.exprId) =>
            subst(at.exprId)
        }
      }
      cur
    }
    candidates(table).iterator.flatMap { case (dir, m, stale) =>
      rewriteWith(a, conds.map(fix), fix, table, dir, m, stale)
    }.nextOption()
  }

  private def rewriteWith(a: Aggregate, conds: Seq[Expression],
      fix: Expression => Expression, baseTable: GraftTable,
      mvDir: File, mvMeta: TableMeta,
      staleWindow: Option[(Long, Long)]): Option[LogicalPlan] = {
    val groupCols = mvMeta.properties(TableMeta.MviewGroupByProp)
      .split(";").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    // "fn:col" (col lowercase, "*" for count-star) -> stored column
    val aggMap: Map[(String, String), String] =
      mvMeta.properties(TableMeta.MviewAggsProp).split(";").toSeq
        .filter(_.nonEmpty).map { entry =>
          val Array(spec, stored) = entry.split("=", 2)
          val Array(fn, col) = spec.split(":", 2)
          (fn, col) -> stored
        }.toMap

    val mvTable = new GraftTable(mvDir.getName, mvDir, mvMeta)
    val mvRel = DataSourceV2Relation.create(mvTable, None, None)
    def mvAttr(name: String): AttributeReference =
      mvRel.output.find(_.name.equalsIgnoreCase(name)).get

    // rewrite an aggregate function call onto the stored partials;
    // None = not derivable from this mview -> the rule does not fire
    def rwAgg(agg: AggregateExpression): Option[Expression] = {
      if (agg.filter.isDefined) return None
      def summed(stored: String): Expression =
        Sum(mvAttr(stored)).toAggregateExpression()
      def grpAttr(x: Expression): Option[AttributeReference] = x match {
        case at: AttributeReference if groupCols(at.name.toLowerCase) =>
          Some(mvAttr(at.name))
        case _ => None
      }
      val out = if (agg.isDistinct) agg.aggregateFunction match {
        // DISTINCT over mview GROUP columns is derivable because the
        // mview carries the exact value set of its group tuple —
        // partial-row multiplicities are what DISTINCT discards. The
        // classic shape: COUNT(DISTINCT user) GROUP BY day over a
        // (day, user)-grouped mview.
        case Count(children) if children.forall(grpAttr(_).isDefined) =>
          Some(Count(children.map(grpAttr(_).get))
            .toAggregateExpression(isDistinct = true))
        case Sum(x, _) => grpAttr(x).map(a =>
          Sum(a).toAggregateExpression(isDistinct = true))
        case Min(x) => grpAttr(x).map(a => Min(a).toAggregateExpression())
        case Max(x) => grpAttr(x).map(a => Max(a).toAggregateExpression())
        case _ => None
      } else agg.aggregateFunction match {
        case Sum(x: AttributeReference, _) =>
          aggMap.get(("sum", x.name.toLowerCase)).map(summed)
        // AVG(x) = SUM(sum_x) / SUM(cnt_x) — the dashboard aggregate.
        // Requires BOTH stored partials: count:x specifically (not
        // count:*), so SQL NULL semantics survive (AVG ignores NULLs;
        // an all-NULL group yields NULL because the re-summed sum is
        // NULL before the divide). Non-decimal inputs only: their
        // Average evaluates exactly as sum/count in double arithmetic,
        // which this reproduces; decimal AVG carries Spark-internal
        // precision/rounding rules a re-derivation could drift from,
        // so it declines to the base scan (correct, just not
        // accelerated).
        case aggregate.Average(x: AttributeReference, _)
            if !x.dataType.isInstanceOf[org.apache.spark.sql.types
              .DecimalType] =>
          for {
            sc <- aggMap.get(("sum", x.name.toLowerCase))
            cc <- aggMap.get(("count", x.name.toLowerCase))
          } yield {
            import org.apache.spark.sql.catalyst.expressions.{Divide, If, IsNull, Literal => Lit}
            import org.apache.spark.sql.types.DoubleType
            val total = Cast(Sum(mvAttr(sc)).toAggregateExpression(),
              DoubleType)
            val n = Cast(Sum(mvAttr(cc)).toAggregateExpression(),
              DoubleType)
            // all-NULL group ⇒ total is NULL and n is 0: answer NULL
            // without evaluating the divide (ANSI Divide checks the
            // divisor FIRST and would raise DIVIDE_BY_ZERO where base
            // AVG returns NULL); identical aggregate subtrees dedup in
            // physical planning, so `total` costs once
            If(IsNull(total), Lit(null, DoubleType), Divide(total, n))
          }
        // MIN/MAX over a group column need no stored partial: the
        // value-set extremum is multiplicity-independent
        case Min(x: AttributeReference) =>
          aggMap.get(("min", x.name.toLowerCase))
            .map(c => Min(mvAttr(c)).toAggregateExpression())
            .orElse(grpAttr(x).map(a => Min(a).toAggregateExpression()))
        case Max(x: AttributeReference) =>
          aggMap.get(("max", x.name.toLowerCase))
            .map(c => Max(mvAttr(c)).toAggregateExpression())
            .orElse(grpAttr(x).map(a => Max(a).toAggregateExpression()))
        case Count(Seq(Literal(_, _))) =>
          aggMap.get(("count", "*"))
            .map(c => Coalesce(Seq(summed(c), Literal(0L, LongType))))
        case Count(Seq(x: AttributeReference)) =>
          aggMap.get(("count", x.name.toLowerCase))
            .map(c => Coalesce(Seq(summed(c), Literal(0L, LongType))))
        // hll_sketch_agg over a stored DataSketches sketch partial
        // re-aggregates as hll_union_agg. HLL merge is a per-register
        // max, so the unioned estimate tracks the direct sketch's
        // within representation-transition noise (last-permille — the
        // documented approximate-transparency contract of sketch
        // rollups in BigQuery/Druid; the user already opted into an
        // approximate aggregate). Only the default-lgK form matches
        // the stored sketch's configuration.
        case h: aggregate.HllSketchAgg =>
          (h.left, h.right) match {
            case (x: AttributeReference, Literal(lgk: Int, _))
                if lgk == 12 =>
              aggMap.get(("hll", x.name.toLowerCase)).map(c =>
                aggregate.HllUnionAgg(mvAttr(c), Literal(false))
                  .toAggregateExpression())
            case _ => None
          }
        // kll_sketch_agg over a stored KLL partial re-aggregates as
        // kll_union_agg — same approximate-transparency contract as
        // hll: merge preserves the sketch's rank-error bound, and the
        // user already opted into an approximate aggregate. Only the
        // default-k form matches the stored sketch's configuration.
        // The builder implicit-casts the input to double, so the
        // attribute may arrive wrapped in that cast.
        case ksa: graft.functions.KllSketchAgg if ksa.k == 200 =>
          (ksa.child match {
            case x: AttributeReference => Some(x)
            case Cast(x: AttributeReference, org.apache.spark.sql.types
              .DoubleType, _, _) => Some(x)
            case _ => None
          }).flatMap(x => aggMap.get(("kll", x.name.toLowerCase)).map(c =>
            graft.functions.KllUnionAgg(mvAttr(c), 200)
              .toAggregateExpression()))
        case _ => None
      }
      out.map(e =>
        if (e.dataType == agg.dataType) e else Cast(e, agg.dataType))
    }

    // rewrite any expression: aggregate calls via rwAgg, group-column
    // references onto the mview's same-named columns, anything else
    // structurally — unknown attributes or aggregates make the whole
    // rewrite decline
    def rw(e: Expression): Option[Expression] = e match {
      case agg: AggregateExpression => rwAgg(agg)
      case at: AttributeReference =>
        if (groupCols(at.name.toLowerCase)) Some(mvAttr(at.name)) else None
      case _ =>
        val kids = e.children.map(rw)
        if (kids.forall(_.isDefined)) Some(e.withNewChildren(kids.map(_.get)))
        else None
    }

    val newConds = conds.map(rw)
    val newGroup = a.groupingExpressions.map(e => rw(fix(e)))
    val newAggs: Seq[Option[NamedExpression]] = a.aggregateExpressions.map {
      case al: Alias =>
        rw(fix(al.child)).map(c =>
          Alias(c, al.name)(al.exprId, al.qualifier, al.explicitMetadata))
      case at: AttributeReference =>
        rw(fix(at)).map(c => Alias(c, at.name)(at.exprId, at.qualifier))
      case ne => rw(fix(ne)).map(_.asInstanceOf[NamedExpression])
    }
    if ((newConds ++ newGroup ++ newAggs).exists(_.isEmpty)) return None

    // the partial source: the mview alone when fresh; when stale by
    // appends only, the mview's partials UNION'd with the CDC delta's
    // rows projected as singleton partials (sum_x = x, cnt_star = 1,
    // min_x/max_x = x) — the "lambda" read Druid-style real-time
    // rollups serve, exact by the partial-aggregate algebra. The
    // delta relation is version-pinned [wm+1, now] and resolved from
    // manifests, so the repair reads only appended regions: O(delta)
    // per query, never a base scan.
    val partialCols: Seq[String] =
      (groupColsOrdered(mvMeta) ++ aggMap.values.toSeq.sorted)
    val mvSide: LogicalPlan = Project(partialCols.map(mvAttr),
      newConds.flatten.foldRight(mvRel: LogicalPlan)((c, p) => Filter(c, p)))
    val source: Option[LogicalPlan] = staleWindow match {
      case None => Some(mvSide)
      case Some((wm, now)) =>
        val opts = new java.util.HashMap[String, String]()
        opts.put(GraftChanges.FromKey, wm.toString)
        opts.put(GraftChanges.ToKey, now.toString)
        val deltaRel = DataSourceV2Relation.create(baseTable, None, None,
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
        def dAttr(name: String): Option[AttributeReference] =
          deltaRel.output.find(_.name.equalsIgnoreCase(name))
        val specs = aggMap.toSeq.map { case ((fn, col), stored) =>
          (fn, col, stored)
        }
        val deltaExprs: Seq[Option[NamedExpression]] =
          partialCols.map { pc =>
            if (groupColsOrdered(mvMeta).contains(pc))
              dAttr(pc).map(at => Alias(at, pc)())
            else specs.find(_._3 == pc).flatMap { case (fn, col, stored) =>
              val t = mvAttr(stored).dataType
              fn match {
                case "count" if col == "*" =>
                  Some(Alias(Cast(Literal(1L, LongType), t), stored)())
                case "count" => dAttr(col).map(at => Alias(Cast(
                  org.apache.spark.sql.catalyst.expressions.If(
                    org.apache.spark.sql.catalyst.expressions.IsNull(at),
                    Literal(0L, LongType), Literal(1L, LongType)), t),
                  stored)())
                case "sum" | "min" | "max" =>
                  dAttr(col).map(at => Alias(
                    if (at.dataType == t) at else Cast(at, t), stored)())
                // hll: a raw row has no scalar singleton-sketch form —
                // the whole stale-repair declines, falling back to the
                // base (refresh to re-arm)
                case _ => None
              }
            }
          }
        if (deltaExprs.exists(_.isEmpty)) None
        else {
          val dConds = conds.map(_.transform {
            case at: AttributeReference => dAttr(at.name).getOrElse(at)
          })
          val deltaSide = Project(deltaExprs.flatten,
            dConds.foldRight(deltaRel: LogicalPlan)((c, p) => Filter(c, p)))
          Some(org.apache.spark.sql.catalyst.plans.logical.Union(
            Seq(mvSide, deltaSide)))
        }
    }
    source.map(src =>
      Aggregate(newGroup.flatten, newAggs.flatten.toSeq, src))
  }

  private def groupColsOrdered(m: TableMeta): Seq[String] =
    m.properties(TableMeta.MviewGroupByProp)
      .split(";").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq

  /** Usable sibling mviews of this base, deterministic name order,
    * fresh ones first. Third element: None = fresh (watermark == the
    * base's current commit version); Some((wm, now)) = stale by
    * APPENDS ONLY — repairable at read time by unioning the CDC delta
    * (wm, now] as singleton partials. Any row-removing or in-place op
    * in the window (DELETE, UPDATE/MERGE, OVERWRITE, RESTORE), a
    * dedupKeys base (upsert folds rewrite in place), or an
    * unservable delta range (vacuumed originals) disables the mview —
    * refresh/rebuild with `CALL graft.sys.mview[_refresh]`. */
  private def candidates(table: GraftTable)
      : Seq[(File, TableMeta, Option[(Long, Long)])] = {
    val parent = table.tableDir.getParentFile
    val prefix = s"${table.tableDir.getName}_mv_"
    val names = Option(parent.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith(prefix)).sorted
    if (names.isEmpty) return Nil
    lazy val current = TableMeta.currentVersion(table.tableDir)
    val found = names.toSeq.flatMap { n =>
      val dir = new File(parent, n)
      if (!TableMeta.exists(dir)) None
      else {
        val m = TableMeta.load(dir)
        val structural = m.properties.contains(TableMeta.MviewOfProp) &&
          m.properties.contains(TableMeta.MviewGroupByProp) &&
          m.properties.contains(TableMeta.MviewAggsProp)
        val stamped = m.properties.get(TableMeta.MviewVersionProp)
          .flatMap(_.toLongOption)
        // A refresh killed between its partials INSERT and its
        // watermark ALTER leaves [[TableMeta.MviewPendingProp]] behind
        // with the delta ALREADY in the stored partials — repairing
        // from the stamped watermark would union that delta a second
        // time. "Landed" = an APPEND commit in the mview's history
        // after the recorded version (a bare version comparison would
        // be fooled by maintenance commits — compact/vacuum/analyze
        // bump the version without adding the delta rows); then the
        // effective watermark is the intent's target. If it never
        // landed, the stamped watermark still describes the content
        // exactly. A malformed intent disables the mview (base scan
        // is always correct).
        val wm: Option[Long] =
          m.properties.get(TableMeta.MviewPendingProp) match {
            case None => stamped
            case Some(pend) => try {
              val Array(tgts, ver) = pend.split(":", 2)
              val tgt = tgts.split(";").head.trim.toLong
              val landed = TableMeta.history(dir)
                .exists(e => e.version > ver.toLong && e.op == "append")
              if (landed) stamped.map(math.max(_, tgt))
              else stamped
            } catch { case _: Exception => None }
          }
        if (!structural || wm.isEmpty) None
        else if (wm.contains(current)) Some((dir, m, None))
        else appendOnlyWindow(table, wm.get, current)
          .map(w => (dir, m, Some(w)))
      }
    }
    found.sortBy(_._3.isDefined) // fresh (no repair needed) first
  }

  /** The (wm, now] window iff it contains only append-shaped commits
    * and its CDC delta is servable from manifests. */
  private def appendOnlyWindow(table: GraftTable, wm: Long,
      now: Long): Option[(Long, Long)] =
    try {
      if (TableMeta.dedupKeys(table.meta.properties)) None
      else if (TableMeta.history(table.tableDir).exists(e =>
          e.version > wm && e.version <= now &&
            Set("rowlevel", "overwrite", "restore", "delete")(e.op))) None
      else {
        // servability probe: resolves the delta's region list from
        // manifests only (zero data IO); throws on vacuumed originals
        GraftChanges.regionsBetween(table.tableDir, wm, Some(now))
        Some((wm, now))
      }
    } catch { case _: Exception => None }
}
