package graft.catalog

import org.apache.spark.sql.catalyst.expressions.{BoundReference, EqualNullSafe, Expression, IsNotNull, Not, SubqueryExpression}
import org.apache.spark.sql.types.{MetadataBuilder, StructType}

/** `GENERATED ALWAYS AS (expr)` columns — Delta's generated-column
  * contract on the graft write path. The generation expression lives in
  * the column metadata under Spark's own key (`GENERATION_EXPRESSION`,
  * what `GeneratedColumn.validateGeneratedColumns` reads), so it
  * round-trips the stored schema like DEFAULT values do.
  *
  * Spark 4.1 validates the expression at CREATE TABLE but leaves both
  * storage and INSERT-time computation to the connector — the stock
  * `TableInfo.schema()` even drops the expression, so a catalog that
  * declares `SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS` without
  * implementing the fill would silently hand the user a plain nullable
  * column. Here the write task does both halves per row, Delta's
  * semantics exactly:
  *
  *  - arrived NULL (column omitted from the INSERT, or explicit NULL):
  *    the bound, codegen'd generation expression fills the value;
  *  - arrived non-NULL: it must EQUAL the computed value (`<=>`), else
  *    the write fails naming the column — "GENERATED ALWAYS" means a
  *    user cannot override, and silently replacing their value would be
  *    worse than refusing.
  *
  * Key columns cannot be generated: the V2 append path range-shuffles
  * and sorts on key values BEFORE the write task runs, so a key whose
  * value materializes inside the task would be shuffled by its
  * pre-fill NULL and land unsorted. At 100 TB the cost model matches
  * CHECK constraints: one extra projection inside the write task — no
  * shuffle, no extra pass. */
object GraftGenerated {

  /** Spark's metadata key (`GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY`). */
  val MetaKey = "GENERATION_EXPRESSION"

  /** (field ordinal, generation sql) pairs declared in `schema`. */
  def specs(schema: StructType): Seq[(Int, String)] =
    schema.fields.zipWithIndex.collect {
      case (f, i) if f.metadata.contains(MetaKey) =>
        i -> f.metadata.getString(MetaKey)
    }.toSeq

  /** CREATE-time validation: analyzes every generation expression
    * against the NON-generated columns (no chains, no cycles), requires
    * determinism / no subqueries / exact declared type, and refuses
    * generated key columns. */
  def validate(schema: StructType, keyCols: Seq[String]): Unit = {
    val gen = specs(schema)
    if (gen.isEmpty) return
    val genNames = gen.map { case (i, _) => schema.fields(i).name }
    val keySet = keyCols.map(_.toLowerCase).toSet
    val base = StructType(schema.fields.filterNot(f =>
      genNames.exists(_.equalsIgnoreCase(f.name))))
    gen.foreach { case (i, sql) =>
      val f = schema.fields(i)
      require(!keySet.contains(f.name.toLowerCase),
        s"key column ${f.name} cannot be GENERATED ALWAYS AS: the " +
          "append path shuffles and sorts on key values before the " +
          "write task computes them")
      val e = GraftChecks.resolveExpr(base,
        s"generated column '${f.name}'", sql)
      require(e.deterministic,
        s"generated column '${f.name}': '$sql' is non-deterministic")
      require(!SubqueryExpression.hasSubquery(e),
        s"generated column '${f.name}': subqueries are not supported")
      require(e.dataType == f.dataType,
        s"generated column '${f.name}': '$sql' is " +
          s"${e.dataType.simpleString}, not the declared " +
          s"${f.dataType.simpleString} (add an explicit CAST)")
    }
  }

  /** Bound per-row machinery for the writer, computed on the driver and
    * shipped in the factory: for each generated column, (name, ordinal,
    * fill expression bound to FULL-schema ordinals, violation
    * predicate). The fill is `coalesce(col, expr)` in expression form;
    * the violation is `col IS NOT NULL AND NOT(col <=> expr)`. */
  def bound(meta: TableMeta): Seq[(String, Int, Expression, Expression)] =
    specs(meta.schema).map { case (i, sql) =>
      val f = meta.schema.fields(i)
      // resolve against the full schema (references to other generated
      // columns were already refused at CREATE by validate's base-only
      // analysis), so BoundReference ordinals line up with row layout
      val e = GraftChecks.resolveExpr(meta.schema,
        s"generated column '${f.name}'", sql)
      val ref = BoundReference(i, f.dataType, f.nullable)
      (f.name, i, e, And(IsNotNull(ref), Not(EqualNullSafe(ref, e))))
    }

  private def And(l: Expression, r: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.And(l, r)

  /** DROP COLUMN guard: every surviving generation expression must
    * still validate against the narrowed schema (same dangling rule as
    * CHECK constraints — dropping the generated column itself is fine,
    * dropping a column its expression reads is not). */
  def refuseDanglingDrop(narrowed: StructType, keyCols: Seq[String],
      dropped: String): Unit =
    try validate(narrowed, keyCols)
    catch { case e: IllegalArgumentException =>
      throw new IllegalArgumentException(
        s"cannot drop column $dropped: a generated column references " +
          s"it (drop the generated column first). ${e.getMessage}")
    }
}
