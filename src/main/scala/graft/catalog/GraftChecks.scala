package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BindReferences, EqualNullSafe, Expression, Literal, RuntimeReplaceable, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.types.{BooleanType, StructType}

/** CHECK constraints (`'graft.check.<name>'='<boolean expr>'` in
  * TBLPROPERTIES) — Delta's table-constraint contract rebuilt on the
  * graft write path:
  *
  *  - the expression is analyzed against the table schema at CREATE /
  *    ALTER time (type coercion included), so a typo'd column or a
  *    non-boolean expression fails the DDL, not the first INSERT;
  *  - `ALTER TABLE … SET TBLPROPERTIES('graft.check.x'='…')` scans the
  *    EXISTING data and refuses if any stored row violates (the Delta
  *    ADD CONSTRAINT contract) — which is what lets every later write
  *    path assume the invariant holds;
  *  - every user-facing write (INSERT/streaming epoch/bulk load/COPY
  *    INTO/row-level UPDATE-MERGE rewrite) evaluates the bound,
  *    codegen'd predicate per row and fails the WRITE — before any
  *    commit — naming the constraint. Internal layout rewrites
  *    (cluster) skip re-validation: their rows were validated at
  *    ingest or at ADD CONSTRAINT time.
  *
  * SQL CHECK semantics: a row violates only when the expression is
  * FALSE — NULL passes (the standard's "not known to be false"). The
  * writer therefore tests `expr <=> false`, not `NOT expr`.
  *
  * At 100 TB the cost model is exactly Delta's: one extra projected
  * predicate inside the write task (codegen'd, no shuffle, no extra
  * pass), and ADD CONSTRAINT pays one parallel validation scan. */
object GraftChecks {

  val Prefix = "graft.check."

  /** (name, sql) pairs, sorted by name for deterministic error order. */
  def specs(properties: Map[String, String]): Seq[(String, String)] =
    properties.toSeq.collect {
      case (k, v) if k.toLowerCase.startsWith(Prefix) &&
          k.length > Prefix.length =>
        k.substring(Prefix.length) -> v
    }.sortBy(_._1)

  /** Analyze `sql` against `schema` (full analyzer: resolution + type
    * coercion) and return the condition BOUND to schema ordinals —
    * serializable, ready for `Predicate.create` inside a write task.
    * Refuses non-boolean, non-deterministic, and subquery conditions. */
  def resolve(schema: StructType, name: String, sql: String): Expression = {
    val cond = resolveExpr(schema, s"CHECK constraint '$name'", sql)
    require(cond.dataType == BooleanType,
      s"CHECK constraint '$name': '$sql' is " +
        s"${cond.dataType.simpleString}, not BOOLEAN")
    require(cond.deterministic,
      s"CHECK constraint '$name': '$sql' is non-deterministic")
    require(!SubqueryExpression.hasSubquery(cond),
      s"CHECK constraint '$name': subqueries are not supported")
    cond
  }

  /** The analysis+binding core shared with generated columns: any-type
    * expression over `schema`, analyzed by the full analyzer and bound
    * to schema ordinals. */
  def resolveExpr(schema: StructType, label: String,
      sql: String): Expression = {
    val spark = SparkSession.active
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val attrs = schema.fields.toSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)())
      // Project, not Filter: the same path must analyze non-boolean
      // generation expressions (a Filter would type-reject them before
      // resolve()'s own BOOLEAN message could fire)
      val analyzed = spark.sessionState.analyzer.execute(
        org.apache.spark.sql.catalyst.plans.logical.Project(
          Seq(org.apache.spark.sql.catalyst.expressions.Alias(
            parsed, "_g")()), LocalRelation(attrs)))
      spark.sessionState.analyzer.checkAnalysis(analyzed)
      // RuntimeReplaceable nodes (BETWEEN, nvl, …) only exist for the
      // optimizer, and their replacements may carry With/common-
      // expression scaffolding (also unevaluable outside the optimizer).
      // Expand both to fixpoint — ReplaceExpressions +
      // RewriteWithExpression collapsed to the eval-only case (inlining
      // a shared def twice costs a duplicate eval, fine for a
      // per-row predicate).
      import org.apache.spark.sql.catalyst.expressions.{CommonExpressionRef, With}
      var c = analyzed
        .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
        .projectList.head.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Alias].child
      while (c.exists(e =>
          e.isInstanceOf[RuntimeReplaceable] || e.isInstanceOf[With]))
        c = c.transformUp {
          case r: RuntimeReplaceable => r.replacement
          case w: With =>
            val defs = w.defs.map(d => d.id -> d.child).toMap
            w.child.transformUp {
              case ref: CommonExpressionRef => defs(ref.id)
            }
        }
      BindReferences.bindReference(c, attrs)
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => throw new IllegalArgumentException(
        s"$label: cannot analyze '$sql' against the " +
          s"table schema: ${e.getMessage}")
    }
  }

  /** The VIOLATION predicate (`cond <=> false`): true exactly when the
    * row fails the constraint under SQL CHECK null semantics. */
  def violation(cond: Expression): Expression =
    EqualNullSafe(cond, Literal(false, BooleanType))

  /** All constraints of `meta`, resolved and bound — computed on the
    * driver at write-build time and shipped inside the writer factory. */
  def bound(meta: TableMeta): Seq[(String, Expression)] =
    specs(meta.properties).map { case (n, sql) =>
      n -> resolve(meta.schema, n, sql)
    }

  /** ADD CONSTRAINT validation scan: count stored rows violating `sql`.
    * Runs as a normal parallel read of the table (pruning/pushdown
    * apply); one scan, the Delta ADD CONSTRAINT cost. */
  def violationsInExisting(catalogName: String, ident: String,
      sql: String): Long =
    SparkSession.active.table(s"$catalogName.$ident")
      .where(s"NOT coalesce(($sql), true)").count()
}
