package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** Persistent SQL views over the graft catalog.
  *
  * Core Spark 4.1 ships the `ViewCatalog` connector interface but NO
  * analyzer or exec support for it (nothing in catalyst/sql-core
  * references it), so `CREATE VIEW graft.ns.v AS …` dies in
  * ResolveSessionCatalog before a V2 catalog could see it. The
  * sanctioned escape is the same pair of seams every other graft
  * statement uses: the DELEGATING PARSER intercepts the view DDL
  * ([[GraftSqlParser]]) and an injected RESOLUTION rule
  * ([[GraftViewSubstitution]]) expands a stored view's SQL in place of
  * its unresolved relation — the Iceberg-extensions view design
  * re-expressed on graft's warehouse.
  *
  * Semantics (stock Spark's persistent-view contract where it exists):
  *  - LATE-BINDING: the stored SQL re-analyzes at every query, so a
  *    view sees schema changes to its base tables; a view whose base
  *    vanished fails at ITS use site, loudly.
  *  - Stored relative references are absolutized against the CREATING
  *    session's (catalog, namespace) — the stored text carries its
  *    context header, so `USE`-context at query time cannot re-point
  *    the view.
  *  - Referencing a TEMP view is refused at create (stock Spark's
  *    rule: a persistent object may not capture session state).
  *  - Direct self-reference at CREATE OR REPLACE is refused (it would
  *    expand forever); deeper cycles die at the analyzer's iteration
  *    cap, loudly.
  *  - Writes through a view are refused by name.
  *
  * Storage: `<warehouse>/<ns>/_views/<name>.sql` — first line is a
  * `-- graft-view context: <catalog>.<namespace>` header, rest is the
  * SQL text. Views are namespace-local files, so DROP NAMESPACE
  * removes them with the directory, and a `clone`d or backed-up
  * warehouse carries its views. The name `_views` cannot collide with
  * a table: table identifiers create `TableMeta` directories and are
  * validated word-shaped, while `_views` is reserved.
  */
object GraftViews {

  private def dir(nsDir: File): File = new File(nsDir, "_views")
  private def sqlFile(nsDir: File, name: String): File =
    new File(dir(nsDir), s"$name.sql")

  def exists(nsDir: File, name: String): Boolean =
    sqlFile(nsDir, name).isFile

  def list(nsDir: File): Seq[String] =
    Option(dir(nsDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".sql"))
      .map(_.getName.stripSuffix(".sql")).toSeq.sorted

  /** Load (creationCatalog, creationNamespace, sql). */
  def load(nsDir: File, name: String): Option[(String, String, String)] = {
    val f = sqlFile(nsDir, name)
    if (!f.isFile) None
    else {
      val text = new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8)
      val (header, sql) = text.split("\n", 2) match {
        case Array(h, rest) => (h, rest)
        case _ => (text, "")
      }
      val ctx = header.stripPrefix("-- graft-view context: ").trim
      val dot = ctx.indexOf('.')
      require(dot > 0, s"corrupt view file ${f.getPath}: bad header")
      Some((ctx.substring(0, dot), ctx.substring(dot + 1), sql))
    }
  }

  /** Atomic create (tmp + move): a killed writer never leaves a
    * half-written view; OR REPLACE swaps in one rename. */
  def create(nsDir: File, name: String, catalog: String, namespace: String,
      sql: String, orReplace: Boolean): Unit = {
    val f = sqlFile(nsDir, name)
    if (f.isFile && !orReplace)
      throw new IllegalStateException(
        s"view $namespace.$name already exists (use CREATE OR REPLACE VIEW)")
    Files.createDirectories(dir(nsDir).toPath)
    val tmp = Paths.get(f.getPath + s".tmp${ProcessHandle.current().pid()}")
    Files.write(tmp,
      s"-- graft-view context: $catalog.$namespace\n$sql"
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, f.toPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def drop(nsDir: File, name: String): Boolean =
    sqlFile(nsDir, name).delete()
}

/** Injected resolution rule: an [[UnresolvedRelation]] naming a stored
  * graft view expands to its parsed SQL (aliased, so `v.col`
  * qualification works). Runs inside the analyzer's fixed-point
  * resolution batch, so views over views expand across iterations;
  * writes targeting a view are refused before substitution. */
class GraftViewSubstitution(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def cm = session.sessionState.catalogManager

  private def graftCatalogOf(name: String): Option[GraftCatalog] =
    try cm.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  private def isCatalogName(name: String): Boolean =
    try { cm.catalog(name); true } catch { case _: Exception => false }

  /** Resolve a (possibly relative) multipart name to a stored view. */
  private def lookup(parts: Seq[String])
      : Option[(String, String, String, (String, String, String))] = {
    // temp views shadow stored views (stock Spark's precedence) —
    // never hijack a name the session catalog resolves first
    if (parts.length <= 2 &&
        session.sessionState.catalog.isTempView(parts)) return None
    val abs = parts match {
      case Seq(cat, ns, v) => Some((cat, ns, v))
      case Seq(ns, v) => Some((cm.currentCatalog.name, ns, v))
      case Seq(v) if cm.currentNamespace.length == 1 =>
        Some((cm.currentCatalog.name, cm.currentNamespace.head, v))
      case _ => None
    }
    abs.flatMap { case (cat, ns, v) =>
      graftCatalogOf(cat).flatMap(g =>
        g.viewDefinition(ns, v).map(d => (cat, ns, v, d)))
    }
  }

  /** Absolutize the stored SQL's relative table references against the
    * view's creation context, so `USE` at query time cannot re-point
    * them. 3-part names and names whose head is a registered catalog
    * pass through. */
  private def absolutize(plan: LogicalPlan, cat: String, ns: String)
      : LogicalPlan = plan transformUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
      u.copy(multipartIdentifier = Seq(cat, ns, u.multipartIdentifier.head))
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
        !isCatalogName(u.multipartIdentifier.head) =>
      u.copy(multipartIdentifier = cat +: u.multipartIdentifier)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // refuse writes through a view BEFORE substitution would turn the
    // target into a subquery (and the error into analyzer noise)
    plan match {
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
        i.table match {
          case u: UnresolvedRelation if lookup(u.multipartIdentifier).isDefined =>
            throw new UnsupportedOperationException(
              s"cannot INSERT into view ${u.multipartIdentifier.mkString(".")}")
          case _ =>
        }
      case _ =>
    }
    plan transformUp {
      case u: UnresolvedRelation if !u.isStreaming =>
        lookup(u.multipartIdentifier) match {
          case Some((_, _, v, (ccat, cns, sql))) =>
            val parsed = session.sessionState.sqlParser.parsePlan(sql)
            SubqueryAlias(v, absolutize(parsed, ccat, cns))
          case None => u
        }
    }
  }
}
