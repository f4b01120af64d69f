package graft.catalog

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Transparent secondary-index acceleration (the Phoenix behavior: an
  * index's EXISTENCE is the opt-in): a point filter on a non-key
  * column that has a FRESH secondary index (`CALL graft.sys.index`;
  * watermark == the base's current commit version) is rewritten from
  *
  * {{{ Filter(c = lit, base) }}}
  *
  * into
  *
  * {{{
  *   Filter(c = lit,                           // residual — exactness
  *     Join(base, LeftSemi, base.keys = i.keys,
  *          Project(keys, Filter(c = lit, base_idx_c))))
  * }}}
  *
  * Runs ONCE at the pre-CBO seam, while both sides are still plain
  * [[DataSourceV2Relation]]s — the normal V2 pushdown then turns the
  * index probe into a key-pruned point scan (c leads the index key),
  * and the runtime-filter machinery hands the probe's key set to the
  * base scan (region pruning + reader-level page-skip envelope, see
  * SecondaryIndexSpec). The residual filter on top keeps answers exact
  * under every edge (duplicate base keys, index entries for sibling
  * rows), so the rewrite is safe whenever it fires; the freshness gate
  * makes firing complete (no false negatives: every matching row has
  * an index entry at the watermark version).
  *
  * Does not fire on: key columns (interval pruning already serves
  * them), stale or absent indexes, time-travel/CDC-pinned snapshots,
  * non-literal or null comparisons. Kill switch:
  * `spark.graft.accel.indexRewrite=false`. */
class GraftIndexRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!GraftAccel.on(GraftAccel.IndexRewrite)) return plan
    plan.transformUp {
      case f @ Filter(cond, r: DataSourceV2Relation)
          if r.table.isInstanceOf[GraftTable] =>
        rewrite(f, cond, r).getOrElse(f)
    }
  }

  private def rewrite(f: Filter, cond: Expression,
      r: DataSourceV2Relation): Option[LogicalPlan] = {
    val table = r.table.asInstanceOf[GraftTable]
    if (table.snapshot.isDefined) return None // time travel: stale by def
    val meta = table.meta
    val keySet = meta.keyCols.map(_.toLowerCase).toSet
    // every base key column must be available to join on
    val keyAttrs = meta.keyCols.flatMap(k =>
      r.output.find(_.name.equalsIgnoreCase(k)))
    if (keyAttrs.length != meta.keyCols.length) return None

    val atom = splitConjunctivePredicates(cond).iterator.flatMap {
      case EqualTo(a: AttributeReference, l: Literal)
          if l.value != null && !keySet(a.name.toLowerCase) =>
        freshIndex(table, a.name).map(d => (a, l, d))
      case EqualTo(l: Literal, a: AttributeReference)
          if l.value != null && !keySet(a.name.toLowerCase) =>
        freshIndex(table, a.name).map(d => (a, l, d))
      case _ => None
    }.nextOption()

    atom.map { case (attr, lit, (idxDir, idxMeta)) =>
      val idxTable = new GraftTable(idxDir.getName, idxDir, idxMeta)
      val idxRel = DataSourceV2Relation.create(idxTable, None, None)
      val probeCol = idxRel.output
        .find(_.name.equalsIgnoreCase(attr.name)).get
      val probeKeys = meta.keyCols.map(k =>
        idxRel.output.find(_.name.equalsIgnoreCase(k)).get)
      val probe = Project(probeKeys,
        Filter(EqualTo(probeCol, lit), idxRel))
      val joinCond = keyAttrs.zip(probeKeys)
        .map { case (b, p) => EqualTo(b, p): Expression }
        .reduce(And)
      Filter(cond,
        Join(r, probe, LeftSemi, Some(joinCond), JoinHint.NONE))
    }
  }

  /** The sibling index table for `col`, iff structurally an index of
    * this base (key = col; base keys) AND fresh (watermark == the
    * base's current commit version — an append since the build would
    * make the index under-deliver, so staleness disables the rewrite
    * rather than risking false negatives). */
  private def freshIndex(table: GraftTable, col: String)
      : Option[(File, TableMeta)] = {
    val dir = new File(table.tableDir.getParentFile,
      s"${table.tableDir.getName}_idx_${col.toLowerCase}")
    if (!TableMeta.exists(dir)) return None
    val m = TableMeta.load(dir)
    val structural = m.properties.contains(TableMeta.IndexOfProp) &&
      m.keyCols.map(_.toLowerCase) ==
        (col.toLowerCase +: table.meta.keyCols.map(_.toLowerCase))
    val fresh = m.properties.get(TableMeta.IndexedVersionProp)
      .flatMap(_.toLongOption)
      .contains(TableMeta.currentVersion(table.tableDir))
    if (structural && fresh) Some((dir, m)) else None
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, rr) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(rr)
      case other => Seq(other)
    }
}
