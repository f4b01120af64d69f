package graft.catalog

import java.io.File
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types.{DataType, StructType}

/** Catalog metadata for one graft table, persisted as JSON files inside
  * the table directory.
  *
  * Capability port of the reference's catalog persistence (Heracles
  * stores a Java-serialized `HBaseRelation` in an HBase `metadata`
  * table — /root/reference `HBaseCatalog.scala:814-870`); the rebuild
  * stores plain JSON beside the data, which is the V2-catalog-idiomatic
  * equivalent (serialization format is an implementation detail, not a
  * capability — SURVEY §7.1 step 2).
  *
  * Layout of a table directory:
  * {{{
  *   <warehouse>/<namespace>/<table>/
  *     _graft_meta.json      schema, key columns, table properties
  *     _graft_regions.json   one entry per region file: rows + per-key-
  *                           dimension min/max in order-preserving hex
  *     part-*.parquet        region data files, sorted by composite key
  * }}}
  */
/** `bucket` = fixed-region index when the table declares `regionSplits`
  * (-1 otherwise): the value of the table's region transform for every
  * row in the file, enabling key-grouped (storage-partitioned) plans.
  * `host` = optional locality hint (the node holding the region's
  * blocks — the rebuild of the reference's
  * `HBaseSQLReaderRDD.getPreferredLocations:115-119`); empty for
  * location-less filesystems (file://, s3://). */
/** `id` = stable region identity, assigned monotonically at manifest
  * commit time and never reused; streaming offsets reference ids, so a
  * checkpoint stays meaningful across manifest rewrites. `srcMaxId` ≥ 0
  * marks a compaction REWRITE that contains exactly the original data
  * of every region with id ≤ srcMaxId (a rewrite carries no new data —
  * the analogue of Delta's dataChange=false files); -1 = an original
  * append. */
/** `stats` = per-NON-KEY-column min/max/null-count ([[ColStat]]; hex of
  * the order-preserving encoding, string bounds truncated), collected by
  * the region writer — lets the driver skip regions on non-key
  * predicates before scheduling any task ([[ColStats]]). Empty on
  * pre-upgrade manifests (→ no pruning, sound). */
final case class RegionMeta(file: String, rows: Long,
    mins: Seq[String], maxs: Seq[String], bucket: Int = -1,
    host: String = "", id: Long = 0L, srcMaxId: Long = -1L,
    stats: Map[String, ColStat] = Map.empty)

final case class TableMeta(schema: StructType, keyCols: Seq[String],
    properties: Map[String, String]) {
  def keyTypes: Seq[DataType] = keyCols.map(schema(_).dataType)

  /** Fixed split points on the first key column, when declared. */
  lazy val splits: Option[RegionSplits] =
    properties.get(TableMeta.RegionSplitsProp)
      .map(RegionSplits.parse(schema(keyCols.head).dataType, _))
}

object TableMeta {
  val MetaFile = "_graft_meta.json"
  val RegionsFile = "_graft_regions.json"

  /** Commit-log directory: small sequential delta segments
    * (`_graft_log/000000000042.json`) written by APPEND commits, folded
    * into the full [[RegionsFile]] checkpoint every
    * [[logCheckpointEvery]] commits (and by every full-state rewrite —
    * compaction, DELETE, vacuum). Appending one region to a 100k-region
    * table writes O(1) bytes, not an O(regions) manifest rewrite — the
    * log-segment + checkpoint discipline Delta Lake uses for exactly
    * this reason. The reference never hits the problem only because
    * HBase owns its region metadata server-side; a file-backed manifest
    * must solve it in the layout. */
  val LogDirName = "_graft_log"

  /** Reference DDL property names (SURVEY §1.4): keyCols = `k1;k2;…`,
    * nonKeyCols = `col,family,qualifier;…`, encodingFormat. */
  val KeyColsProp = "keyCols"
  val NonKeyColsProp = "nonKeyCols"
  val EncodingProp = "encodingFormat"
  val NumRegionsProp = "numRegions"
  val RegionSplitsProp = "regionSplits"

  /** Max rows per parquet page in region files (0 = parquet default).
    * Smaller pages give the column-index (page-stats) skip finer
    * seek granularity inside a region — the rebuild of the reference's
    * in-region `SEEK_NEXT_USING_HINT` skip-scan
    * (`HBaseCustomFilter.findNextHint:353-404`) — at the cost of more
    * page headers. Set it on tables whose trailing key dimensions get
    * point predicates over wide leading-dimension runs. */
  val PageRowLimitProp = "graft.pageRowLimit"

  /** `;`-separated columns to write parquet BLOOM FILTERS for (the
    * HBase column-family BLOOMFILTER option reborn storage-native).
    * Min/max stats skip RANGE predicates on clustered columns; blooms
    * skip POINT predicates on scattered high-cardinality columns —
    * uuid/fingerprint lookups — where a region's [min,max] spans
    * everything. Row-group level, consulted automatically by the
    * pushed-predicate filter in both readers; adaptively sized. */
  val BloomColsProp = "graft.bloomCols"

  def bloomCols(properties: Map[String, String]): Seq[String] =
    properties.get(BloomColsProp).toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)

  /** `'graft.dedupKeys'='true'`: compaction keeps the LATEST row per
    * key — the row from the highest source region id wins (region ids
    * are monotone in commit order, so this is commit order). Restores
    * the reference's Put-upsert semantics (`HBaseRelation.scala:
    * 659-723`, latest cell wins on key collision) for its
    * insert-twice workloads: appends stay cheap and append-only, the
    * fold to one-row-per-key happens at compaction, exactly where the
    * reference's region server folds HFile cells. Until a compaction
    * runs, reads see both versions (the reference shows one
    * immediately) — documented divergence, same end state. Duplicate
    * keys INSIDE one insert batch have no defined winner, matching
    * HBase's same-timestamp ambiguity. */
  val DedupKeysProp = "graft.dedupKeys"

  def dedupKeys(properties: Map[String, String]): Boolean =
    properties.get(DedupKeysProp).exists(_.trim.equalsIgnoreCase("true"))

  private def mapper = new ObjectMapper()

  /** The storage seam every manifest write goes through ([[CommitStore]]).
    * Selected once per catalog initialization; `@volatile` because the
    * catalog may be initialized on a different thread than committers. */
  @volatile private[catalog] var commitStore: CommitStore =
    CommitStore.LockedPosix

  private def writeAtomic(path: File, content: String): Unit =
    commitStore.putReplace(path, content)

  def exists(tableDir: File): Boolean = new File(tableDir, MetaFile).isFile

  // under the manifest lock: vacuum sweeps *.tmp crash leftovers on
  // the same lock, so a concurrent ALTER's in-flight tmp must not be
  // observable outside it (and concurrent ALTERs serialize)
  def save(tableDir: File, meta: TableMeta): Unit =
    withManifestLock(tableDir) {
      val m = mapper
      val root = m.createObjectNode()
      root.put("schema", meta.schema.json)
      val kc = root.putArray("keyCols")
      meta.keyCols.foreach(kc.add)
      val props = root.putObject("properties")
      meta.properties.foreach { case (k, v) => props.put(k, v) }
      writeAtomic(new File(tableDir, MetaFile), root.toString)
    }

  def load(tableDir: File): TableMeta = {
    val root = mapper.readTree(new File(tableDir, MetaFile))
    val schema = DataType.fromJson(root.get("schema").asText)
      .asInstanceOf[StructType]
    val keyCols = {
      val a = root.get("keyCols").asInstanceOf[ArrayNode]
      (0 until a.size).map(a.get(_).asText)
    }
    val props = {
      val p = root.get("properties").asInstanceOf[ObjectNode]
      val it = p.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
      b.result()
    }
    TableMeta(schema, keyCols, props)
  }

  /** `epochs = null` (the default) preserves the file's existing
    * streaming-epoch ledger — callers rewriting the region list without
    * threading epoch state through cannot accidentally wipe the
    * replay-dedup record. Pass a map (possibly empty) to set it.
    * Retired regions and the id counter are always preserved; regions
    * without an id get one stamped. */
  def saveRegions(tableDir: File, regions: Seq[RegionMeta],
      generation: Long = 0L,
      epochs: Map[String, Long] = null): Unit = {
    val s = loadState(tableDir)
    val effEpochs =
      if (epochs != null)
        epochs.map { case (q, e) => q -> EpochEntry(e, generation) }
      else s.epochs
    val (rs, next) = stamped(regions, s.nextId)
    saveState(tableDir, ManifestState(generation, rs, effEpochs,
      s.retired, next))
  }

  /** Assign stable ids (from `from`) to regions that lack one. */
  private def stamped(regions: Seq[RegionMeta], from: Long)
      : (Seq[RegionMeta], Long) = {
    var next = from
    val rs = regions.map { r =>
      if (r.id > 0) r else { val r2 = r.copy(id = next); next += 1; r2 }
    }
    (rs, next max (rs.map(_.id).maxOption.getOrElse(0L) + 1))
  }

  private def regionsJson(arr: ArrayNode, regions: Seq[RegionMeta]): Unit =
    regions.foreach { r =>
      val o = arr.addObject()
      o.put("file", r.file)
      o.put("rows", r.rows)
      o.put("id", r.id)
      if (r.srcMaxId >= 0) o.put("srcMaxId", r.srcMaxId)
      if (r.bucket >= 0) o.put("bucket", r.bucket)
      if (r.host.nonEmpty) o.put("host", r.host)
      val mins = o.putArray("mins"); r.mins.foreach(mins.add)
      val maxs = o.putArray("maxs"); r.maxs.foreach(maxs.add)
      if (r.stats.nonEmpty) {
        val so = o.putObject("stats")
        // stat keys persist lowercase so pruning ([[ColStats.Compiled]])
        // never re-cases the map per region on manifest-scale scans
        r.stats.foreach { case (c, st) =>
          val e = so.putObject(c.toLowerCase)
          st.min.foreach(e.put("mn", _))
          st.max.foreach(e.put("mx", _))
          e.put("nc", st.nulls)
        }
      }
    }

  private def epochsJson(root: ObjectNode,
      epochs: Map[String, EpochEntry]): Unit =
    if (epochs.nonEmpty) {
      val e = root.putObject("epochs")
      epochs.foreach { case (q, ent) =>
        val o = e.putObject(q)
        o.put("ep", ent.epoch); o.put("gen", ent.touchedGen)
      }
    }

  /** Write the complete manifest as a CHECKPOINT, consuming (deleting)
    * every log segment it folds in — the checkpoint records `lastSeq`
    * so readers know which segments are already included. Callers own
    * locking; `state` must derive from a [[loadState]] under the same
    * lock (it is the merged checkpoint+segments view). */
  def saveState(tableDir: File, state: ManifestState): Unit = {
    // lastSeq stays monotone across checkpoints even when the log is
    // empty: a later segment writer must never reuse a consumed seq
    val lastSeq = loadLoaded(tableDir).lastSeq
    val m = mapper
    val root = m.createObjectNode()
    root.put("generation", state.gen)
    root.put("nextId", state.nextId)
    if (lastSeq > 0L) root.put("lastSeq", lastSeq)
    epochsJson(root, state.epochs)
    regionsJson(root.putArray("regions"), state.regions)
    if (state.retired.nonEmpty)
      regionsJson(root.putArray("retired"), state.retired)
    val f = new File(tableDir, RegionsFile)
    writeAtomic(f, root.toString)
    // consume AFTER the atomic checkpoint move: a reader that listed
    // the log before the move still holds a valid (pre-checkpoint)
    // view; one that lists after sees the gap only alongside the new
    // checkpoint, which its stat-recheck detects
    listSegSeqs(tableDir).filter(_ <= lastSeq)
      .foreach(q => segFile(tableDir, q).delete())
    // invalidate rather than write through: the next load re-parses
    // (once per commit) and re-applies load-side normalizations
    // (lowercase stat keys, id synthesis) uniformly
    stateCache.remove(f.getCanonicalPath)
  }

  /** Manifest generation: bumped by compaction (which rewrites the
    * region set), preserved by appends. Streaming offsets carry it so a
    * checkpoint taken before a compaction fails loudly instead of
    * re-reading or mis-slicing rewritten regions. */
  def loadGeneration(tableDir: File): Long =
    loadState(tableDir).gen // cache hit on repeated polls

  def loadRegions(tableDir: File): Seq[RegionMeta] =
    loadManifest(tableDir)._2

  /** Generation + regions from ONE parse of the manifest file. Streaming
    * offsets must use this: reading generation and region list in two
    * separate file reads can straddle a compaction commit and pair the
    * old generation with the new region count (spurious stream failure). */
  def loadManifest(tableDir: File): (Long, Seq[RegionMeta]) = {
    val s = loadState(tableDir)
    (s.gen, s.regions)
  }

  /** One streaming query's ledger entry: last committed epoch id plus
    * the manifest generation current at that commit. `touchedGen` lets
    * compaction age out entries of long-terminated queries instead of
    * growing the ledger forever. */
  final case class EpochEntry(epoch: Long, touchedGen: Long)

  /** Full manifest state. `epochs` = per-streaming-query last committed
    * epoch, the dedup ledger that makes the native streaming sink
    * effectively exactly-once (a replayed epoch after a restart is
    * recognized and skipped). `retired` = regions rewritten by the most
    * recent compaction, files retained on disk for one compaction cycle
    * so a tailing stream checkpointed before the compaction can still
    * read the original data it had not yet consumed. `nextId` = the
    * next stable region id to assign. */
  final case class ManifestState(gen: Long, regions: Seq[RegionMeta],
      epochs: Map[String, EpochEntry],
      retired: Seq[RegionMeta] = Nil, nextId: Long = 1L)

  /** A merged manifest view: the checkpoint state with every log
    * segment ≤ `lastSeq` applied, plus the checkpoint file's identity
    * key the view was validated against. `cpSeq` = the checkpoint's
    * OWN lastSeq (segments ≤ it are folded/orphaned) — kept so
    * live-segment counts need no checkpoint re-parse. */
  private final case class Loaded(cpKey: Any, lastSeq: Long,
      state: ManifestState, cpSeq: Long = 0L)

  /** Parsed-manifest cache, keyed by canonical path and invalidated by
    * the checkpoint file's identity (inode via
    * BasicFileAttributes.fileKey — every [[saveState]] is an atomic
    * tmp+move, so each commit is a new inode), size, and nanosecond
    * mtime. The reference caches region info with a 600 s TTL
    * (`HBaseRelation.fetchPartitions:203-235`); stat-based invalidation
    * gives the same O(1) repeated-scan cost WITHOUT the staleness
    * window — a 100k-region checkpoint parses once per CHECKPOINT
    * instead of once per scan, and loads after an append apply only
    * the new O(1) log segments onto the cached view. Same-JVM
    * checkpoints invalidate eagerly in [[saveState]]. */
  private val stateCache = new java.util.concurrent.ConcurrentHashMap[
    String, Loaded]()

  /** Checkpoint parse count, exposed for the cache-behavior spec. */
  private[catalog] val manifestParses =
    new java.util.concurrent.atomic.AtomicLong

  /** Log-segment parse count, exposed for the log-behavior spec. */
  private[catalog] val segmentParses =
    new java.util.concurrent.atomic.AtomicLong

  /** Fold the log into a fresh checkpoint once it reaches this many
    * segments (per-load cost is O(segments) stats of a bounded dir,
    * so keep it small; overridden by tests). */
  private[catalog] var logCheckpointEvery = 16

  /** Drop a table's parsed-state entry (called by dropTable — the
    * directory is going away, so the entry would otherwise pin a full
    * ManifestState on the driver heap forever). */
  def evictManifestCache(tableDir: File): Unit =
    stateCache.remove(new File(tableDir, RegionsFile).getCanonicalPath)

  private def manifestKey(f: File): Any =
    try {
      val a = Files.readAttributes(f.toPath,
        classOf[java.nio.file.attribute.BasicFileAttributes])
      (a.fileKey, a.size, a.lastModifiedTime)
    } catch { case _: Exception => null }

  def loadState(tableDir: File): ManifestState = loadLoaded(tableDir).state

  private def logDirOf(tableDir: File) = new File(tableDir, LogDirName)

  private def segFile(tableDir: File, seq: Long): File =
    new File(logDirOf(tableDir), f"$seq%012d.json")

  private def listSegSeqs(tableDir: File): Seq[Long] = {
    val names = logDirOf(tableDir).list()
    if (names == null) Nil
    else names.toSeq.filter(_.endsWith(".json"))
      .flatMap(n => n.stripSuffix(".json").toLongOption).sorted
  }

  /** Lock-free reader protocol: stat the checkpoint, take the cached
    * view if its identity matches (else parse), apply log segments
    * newer than the view's `lastSeq` in seq order, then RE-stat the
    * checkpoint. An unchanged stat proves no checkpoint landed before
    * the segment listing, so no consumed segment was missed; a changed
    * stat (concurrent checkpoint, which deletes folded segments)
    * retries against the new checkpoint. Writers serialize on
    * [[withManifestLock]], so seqs are contiguous and segments
    * themselves are atomic tmp+move files. */
  private def loadLoaded(tableDir: File): Loaded = {
    val f = new File(tableDir, RegionsFile)
    val path = f.getCanonicalPath
    var attempt = 0
    while (true) {
      attempt += 1
      val k0 = manifestKey(f)
      val cached = stateCache.get(path)
      val hit = cached != null && k0 != null && cached.cpKey == k0
      try {
        val (base, baseSeq, cpSeq) =
          if (hit) (cached.state, cached.lastSeq, cached.cpSeq)
          else if (f.isFile) {
            val (st, cp) = parseCheckpoint(f); (st, cp, cp)
          } else (ManifestState(0L, Nil, Map.empty), 0L, 0L)
        val segs = listSegSeqs(tableDir).filter(_ > baseSeq)
        if (hit && segs.isEmpty) return cached
        val merged = segs.foldLeft(base)((s, q) =>
          applySegment(s, parseSegment(segFile(tableDir, q))))
        val lastSeq = if (segs.nonEmpty) segs.max else baseSeq
        val k1 = manifestKey(f)
        val stable = if (k0 == null) k1 == null else k0 == k1
        if (stable) {
          val loaded = Loaded(k0, lastSeq, merged, cpSeq)
          if (k0 != null) stateCache.put(path, loaded)
          return loaded
        }
        // unstable: a checkpoint landed mid-read, so `merged` may be
        // MISSING regions the fold consumed — never return it; fail
        // loudly if the manifest won't hold still (each retry needs a
        // fresh fold to keep failing, so 8 in a row means something is
        // pathologically rewriting the table)
        if (attempt >= 8) throw new IllegalStateException(
          s"manifest of $tableDir kept changing under $attempt read " +
            "attempts; retry the query")
      } catch {
        // a concurrent checkpoint consumed a segment between listing
        // and parse — the retry reads the new checkpoint instead
        case e: java.io.IOException => if (attempt >= 8) throw e
      }
    }
    sys.error("unreachable")
  }

  private def parseEpochs(root: com.fasterxml.jackson.databind.JsonNode,
      defaultGen: Long): Map[String, EpochEntry] =
    Option(root.get("epochs")).map { e =>
      val it = e.fields()
      val b = Map.newBuilder[String, EpochEntry]
      while (it.hasNext) {
        val kv = it.next()
        val v = kv.getValue
        // pre-upgrade ledgers stored a bare epoch number
        b += kv.getKey -> (if (v.isNumber) EpochEntry(v.asLong, defaultGen)
          else EpochEntry(v.get("ep").asLong, v.get("gen").asLong))
      }
      b.result()
    }.getOrElse(Map.empty)

  private def parseRegionList(
      root: com.fasterxml.jackson.databind.JsonNode,
      field: String): Seq[RegionMeta] = {
    val arr = root.get(field).asInstanceOf[ArrayNode]
    if (arr == null) return Nil
    (0 until arr.size).map { i =>
      val o = arr.get(i)
      def strs(f2: String): Seq[String] = {
        val a = o.get(f2).asInstanceOf[ArrayNode]
        (0 until a.size).map(a.get(_).asText)
      }
      val stats: Map[String, ColStat] = if (!o.has("stats")) Map.empty
      else {
        val so = o.get("stats")
        val it = so.fields()
        val b = Map.newBuilder[String, ColStat]
        while (it.hasNext) {
          val kv = it.next()
          val e = kv.getValue
          // lowercase on load too: manifests written before the
          // lowercase-at-save change stay schema-cased on disk
          b += kv.getKey.toLowerCase -> ColStat(
            Option(e.get("mn")).map(_.asText),
            Option(e.get("mx")).map(_.asText),
            if (e.has("nc")) e.get("nc").asLong else 0L)
        }
        b.result()
      }
      RegionMeta(o.get("file").asText, o.get("rows").asLong,
        strs("mins"), strs("maxs"),
        if (o.has("bucket")) o.get("bucket").asInt else -1,
        if (o.has("host")) o.get("host").asText else "",
        if (o.has("id")) o.get("id").asLong else 0L,
        if (o.has("srcMaxId")) o.get("srcMaxId").asLong else -1L,
        stats)
    }
  }

  private def parseCheckpoint(f: File): (ManifestState, Long) = {
    manifestParses.incrementAndGet()
    val root = mapper.readTree(f)
    val g = root.get("generation")
    val gen = if (g == null) 0L else g.asLong
    val epochs = parseEpochs(root, gen)
    var regions = parseRegionList(root, "regions")
    val retired = parseRegionList(root, "retired")
    // pre-upgrade manifests carry no ids: the live list is append-
    // ordered, so positions are stable identities — synthesize ids
    // from them once; subsequent saves persist the assignment
    if (regions.exists(_.id == 0L))
      regions = regions.zipWithIndex.map { case (r, i) =>
        if (r.id > 0) r else r.copy(id = i + 1L)
      }
    val maxSeen = (regions ++ retired).map(_.id).maxOption.getOrElse(0L)
    val nextId = {
      val n = root.get("nextId")
      if (n == null) maxSeen + 1 else n.asLong max (maxSeen + 1)
    }
    val lastSeq = Option(root.get("lastSeq")).map(_.asLong).getOrElse(0L)
    (ManifestState(gen, regions, epochs, retired, nextId), lastSeq)
  }

  /** One log segment: regions appended and/or epoch-ledger entries
    * updated by a single commit. */
  private final case class SegmentDelta(regions: Seq[RegionMeta],
      epochs: Map[String, EpochEntry])

  private def parseSegment(f: File): SegmentDelta = {
    segmentParses.incrementAndGet()
    val root = mapper.readTree(f)
    SegmentDelta(parseRegionList(root, "regions"), parseEpochs(root, 0L))
  }

  private def applySegment(s: ManifestState, d: SegmentDelta)
      : ManifestState = {
    val maxId = d.regions.map(_.id).maxOption.getOrElse(0L)
    s.copy(regions = s.regions ++ d.regions,
      epochs = s.epochs ++ d.epochs,
      nextId = s.nextId max (maxId + 1L))
  }

  /** Append one commit's delta to the log. Callers own locking (seq
    * allocation assumes serialized writers). Published if-absent as a
    * tripwire: under a working manifest lock a seq collision is
    * impossible ([[saveState]] keeps `lastSeq` monotone, so consumed
    * seqs are never reallocated) — if one happens anyway, a second
    * committer slipped past a lock the filesystem ignored, and the
    * commit MUST fail loudly instead of silently dropping a
    * concurrent writer's regions. */
  private def writeSegment(tableDir: File, seq: Long,
      regions: Seq[RegionMeta], epochs: Map[String, EpochEntry]): Unit = {
    val d = logDirOf(tableDir)
    d.mkdirs()
    val root = mapper.createObjectNode()
    root.put("seq", seq)
    epochsJson(root, epochs)
    regionsJson(root.putArray("regions"), regions)
    if (!commitStore.putIfAbsent(segFile(tableDir, seq), root.toString))
      throw new java.util.ConcurrentModificationException(
        s"log segment $seq of $tableDir already exists: a concurrent " +
          "committer got past the manifest lock, so this filesystem's " +
          s"locking is not trustworthy under commit store " +
          s"'${commitStore.name}'. No data was overwritten; this " +
          "commit was aborted. Configure a commit store suited to the " +
          "filesystem (README: commit-store deployment matrix).")
  }

  /** Fold the log into a checkpoint once it is long enough. Callers own
    * locking. */
  private def maybeCheckpoint(tableDir: File): Unit =
    if (listSegSeqs(tableDir).size >= logCheckpointEvery)
      saveState(tableDir, loadState(tableDir))

  /** Merged state + LIVE (unfolded) log-segment count, from ONE
    * consistent view under the manifest lock — for operational
    * readouts; two unsynchronized reads could straddle a commit and
    * report a segment whose regions the state view excludes. Orphan
    * segments (≤ the checkpoint's lastSeq, crash leftovers) are not
    * counted. */
  private[catalog] def stateAndLogLength(tableDir: File)
      : (ManifestState, Int) =
    withManifestLock(tableDir)(stateAndLogLengthUnsafe(tableDir))

  // callers own locking (the OS file lock is NOT same-JVM reentrant)
  private def stateAndLogLengthUnsafe(tableDir: File)
      : (ManifestState, Int) = {
    val l = loadLoaded(tableDir) // cached — no O(regions) re-parse
    (l.state, listSegSeqs(tableDir).count(_ > l.cpSeq))
  }

  /** Fold the commit log into the checkpoint NOW (the
    * `graft.sys.fold` procedure); returns the number of live segments
    * folded. A no-op on an already-folded log. */
  private[catalog] def foldLog(tableDir: File): Int =
    withManifestLock(tableDir) {
      val (st, live) = stateAndLogLengthUnsafe(tableDir)
      if (live > 0) saveState(tableDir, st)
      live
    }

  /** Run `body` holding the table's manifest lock. Every manifest
    * read-modify-write — append and compaction swap alike — must go
    * through here. Delegates to the configured [[CommitStore]]: the
    * default [[CommitStore.LockedPosix]] uses a per-table monitor for
    * same-JVM threads plus an OS advisory file lock for other
    * processes, and refuses loudly on filesystems whose locks do not
    * work rather than running a lock that does not lock. */
  def withManifestLock[T](tableDir: File)(body: => T): T =
    commitStore.exclusively(tableDir)(body)

  def appendRegions(tableDir: File, added: Seq[RegionMeta]): Unit = {
    // a zero-region commit (all-empty write tasks) must not grow the
    // log or count toward the checkpoint fold
    if (added.isEmpty) return
    withManifestLock(tableDir) {
      val l = loadLoaded(tableDir)
      val (rs, _) = stamped(added.map(_.copy(id = 0L)), l.state.nextId)
      writeSegment(tableDir, l.lastSeq + 1L, rs, Map.empty)
      maybeCheckpoint(tableDir)
    }
  }

  /** Epoch-deduplicated append for the streaming sink: commits `added`
    * only if `epochId` is newer than the query's last committed epoch,
    * making micro-batch replays after failures idempotent. Returns
    * whether the regions were committed (false = duplicate replay; the
    * caller should discard its files). */
  def commitEpoch(tableDir: File, added: Seq[RegionMeta],
      queryId: String, epochId: Long): Boolean =
    withManifestLock(tableDir) {
      val l = loadLoaded(tableDir)
      val s = l.state
      s.epochs.get(queryId) match {
        case Some(e) if e.epoch >= epochId =>
          // duplicate replay — but the query is demonstrably alive, so
          // refresh its ledger entry's generation: a replaying-but-not-
          // advancing query must not look dead to compaction's aging
          if (e.touchedGen < s.gen) {
            writeSegment(tableDir, l.lastSeq + 1L, Nil,
              Map(queryId -> e.copy(touchedGen = s.gen)))
            maybeCheckpoint(tableDir) // same fold trigger as appends
          }
          false
        case _ =>
          val (rs, _) = stamped(added.map(_.copy(id = 0L)), s.nextId)
          writeSegment(tableDir, l.lastSeq + 1L, rs,
            Map(queryId -> EpochEntry(epochId, s.gen)))
          maybeCheckpoint(tableDir)
          true
      }
    }
}
