package graft.catalog

import org.apache.spark.sql.SparkSession

/** Write-audit-publish (WAP) branch plumbing shared by the write
  * builder, the scan builder, and the procedures.
  *
  * The flow (Iceberg's `spark.wap.branch` staging pattern re-expressed
  * on the graft commit log — see [[TableMeta]]'s branch section for
  * the storage protocol):
  *
  * {{{
  *   CALL graft.sys.branch('ns.t', 'audit')        -- or auto-created
  *   SET spark.graft.wap.branch = audit
  *   INSERT INTO graft.ns.t ...                    -- stages, invisible
  *   SELECT ... FROM graft.ns.t                    -- post-publish preview
  *   RESET spark.graft.wap.branch                  -- main: unchanged
  *   CALL graft.sys.publish('ns.t', 'audit')       -- one atomic commit
  * }}}
  *
  * Per-operation faces that need no session state:
  * `df.writeTo("graft.ns.t").option("branch", "audit").append()` and
  * `spark.read.option("branch", "audit").table("graft.ns.t")`.
  * An EMPTY option value forces main, overriding the session conf —
  * the escape hatch for maintenance writes that must never stage.
  */
object GraftBranch {
  /** Per-operation read/write option. */
  val OptionKey = "branch"

  /** Read option (with [[OptionKey]]): `true` reads ONLY the staged
    * delta instead of the post-publish preview — the audit face that
    * validates exactly the new batch. */
  val DeltaOptionKey = "branchDelta"

  /** Session-wide WAP staging conf: while set, every graft append
    * stages on this branch and every graft scan reads the post-publish
    * preview of it (tables without the branch read plain main). */
  val WapConf = "spark.graft.wap.branch"

  /** Resolve the effective branch: explicit option beats session conf;
    * an explicit EMPTY option opts out of the conf. */
  def resolve(option: Option[String]): Option[String] =
    option match {
      case Some(v) => Some(v.trim).filter(_.nonEmpty)
      case None => SparkSession.getActiveSession
        .flatMap(_.conf.getOption(WapConf))
        .map(_.trim).filter(_.nonEmpty)
    }
}
