package graft.catalog

import java.io.File

/** Incremental "what changed since version N" reads over the commit
  * log — the batch CDC face (Delta's `table_changes` / Iceberg's
  * incremental read re-expressed over the graft region manifest):
  *
  * {{{
  *   spark.read.option("changesFromVersion", v1)   // exclusive start
  *        .option("changesToVersion", v2)          // optional, inclusive
  *        .table("graft.ns.t")
  * }}}
  *
  * The changed-row set is resolved ENTIRELY from manifests — a region
  * carries data "new since v1" iff it is an ORIGINAL (srcMaxId < 0,
  * the same lineage rule the streaming tail uses) with id above the
  * highest id at v1 — so planning is O(manifest) with zero data IO,
  * and the scan reads only the changed regions. All pushdown surfaces
  * (column pruning, storage predicates, agg pushdown) compose, because
  * the region list rides the same `pinned` seam as time travel.
  *
  * Semantics (shared with the streaming tail, which uses the same
  * lineage rule — stream ≡ batch-changes by construction):
  *  - appends / streaming epochs / dedupKeys upserts: exactly the
  *    appended rows (for upserts, the new "latest" versions — CDC
  *    post-images);
  *  - UPDATE/MERGE copy-on-write rewrites carry CHANGED data
  *    (srcMaxId = -1) and are emitted whole: region-granular
  *    post-images, like CDF-less Delta;
  *  - compaction / clustering / split / merge rewrites (srcMaxId ≥ 0)
  *    re-arrange ALREADY-SEEN data and are skipped; the originals they
  *    replaced are read from the retired list (one cycle of slack,
  *    exactly the stream's rule). Further behind → loud failure.
  *  - DELETEs are not change events (no tombstone stream): rows
  *    appended in the range are delivered AS APPENDED even if a later
  *    DELETE dropped them (same as a stream that consumed them before
  *    the delete); a consumer needing deletes diffs snapshots. A
  *    post-range vacuum that purged needed originals refuses loudly
  *    instead of under-delivering.
  *
  * Reference: the HBase-era analogue is a timerange Scan
  * (`Scan.setTimeRange` over cell versions); graft's region ids are
  * the commit-ordered clock (reference scan face:
  * HBaseSQLReaderRDD.scala's Scan construction).
  */
object GraftChanges {

  /** Reader option: exclusive start version (a commit-log seq, as
    * listed by `CALL graft.sys.history`). */
  val FromKey = "changesFromVersion"

  /** Reader option: inclusive end version; default = current. */
  val ToKey = "changesToVersion"

  /** Regions holding data committed in versions (fromV, toV] — original
    * regions with id above the highest id at fromV, served from the end
    * state's live list UNION its retired list (a retired original with
    * a new id is a post-fromV append later consumed by a rewrite or
    * dropped by a metadata DELETE — its data is still "the appended
    * rows", served as appended). One rewrite cycle of slack, exactly
    * the streaming tail's; further behind refuses loudly, as does any
    * post-fromV vacuum that provably purged needed originals (the
    * precise per-vacuum check reconstructs the pre-vacuum retired
    * list). Reliable within the history retention horizon
    * (`historyRetainMillis`) — older ranges refuse at `stateAt`. */
  def regionsBetween(tableDir: File, fromV: Long,
      toV: Option[Long]): Seq[RegionMeta] = {
    val end = toV.map(v => TableMeta.stateAt(tableDir, v))
      .getOrElse(TableMeta.loadState(tableDir))
    val startState = TableMeta.stateAt(tableDir, fromV)
    val a = (startState.regions ++ startState.retired)
      .map(_.id).maxOption.getOrElse(0L)
    val coveredPrev = end.retired.map(_.srcMaxId).maxOption.getOrElse(-1L)
    if (a < coveredPrev) throw new IllegalStateException(
      s"changesFromVersion $fromV of ${tableDir.getName} is more than " +
        "one compaction cycle behind: the original regions holding " +
        "its delta have been aged out of the retired list. Consume " +
        "changes more often than the table is compacted, or stream " +
        "the table instead")
    val picked = (end.regions ++ end.retired)
      .filter(r => r.srcMaxId < 0 && r.id > a)
      .groupBy(_.id).values.map(_.head).toSeq.sortBy(_.id)
    // a vacuum after fromV purges retired files; if any purged entry
    // was a post-fromV original we cannot serve, the delta is
    // incomplete — refuse rather than silently under-deliver
    val pickedIds = picked.map(_.id).toSet
    val endV = toV.getOrElse(Long.MaxValue)
    TableMeta.history(tableDir)
      .filter(e => e.op == "vacuum" && e.version > fromV &&
        e.version <= endV)
      .foreach { v =>
        val pre =
          try TableMeta.stateAt(tableDir, v.version - 1)
          catch { case _: Exception =>
            throw new IllegalStateException(
              s"changes of ${tableDir.getName} since version $fromV " +
                s"cannot be verified complete: the state before the " +
                s"vacuum at version ${v.version} is no longer " +
                "reconstructible. Diff snapshots instead")
          }
        val lost = pre.retired.filter(r =>
          r.srcMaxId < 0 && r.id > a && !pickedIds(r.id))
        if (lost.nonEmpty) throw new IllegalStateException(
          s"changes of ${tableDir.getName} since version $fromV are " +
            s"incomplete: the vacuum at version ${v.version} purged " +
            s"${lost.size} post-$fromV original region(s) (e.g. " +
            s"${lost.head.file}). Consume changes before vacuuming, " +
            "or diff snapshots")
      }
    val gone = picked.filterNot(r => new File(tableDir, r.file).isFile)
    if (gone.nonEmpty) throw new IllegalStateException(
      s"changes of ${tableDir.getName} since version $fromV reference " +
        s"${gone.size} region file(s) removed by vacuum (e.g. " +
        s"${gone.head.file}); this change range is no longer readable")
    picked
  }
}
