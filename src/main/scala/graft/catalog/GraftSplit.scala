package graft.catalog

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier

import graft.codec.KeyCodec

/** Targeted region splitting (`CALL graft.sys.split`): rewrite ONLY
  * the regions larger than `target_bytes`, each into key-contiguous
  * parts — the graft analogue of the HBase region split the reference
  * delegates to its region servers (a region crossing
  * `hbase.hregion.max.filesize` splits in place;
  * `HBasePartition.scala:31-60` models the resulting boundaries).
  *
  * Compaction ([[GraftCompact]]) is a whole-table rewrite — the wrong
  * cost model when ONE region went hot under a skewed append stream.
  * At 100 TB the fix for a 40 GB region must cost O(that region):
  * each oversized region is re-cut locally into
  * ceil(bytes/target) parts, sort preserved by sequential copy, part
  * boundaries advanced to the next leading-key change (a single key
  * never spans two regions, so point lookups keep touching one
  * region), with fresh key bounds and per-column stats per part.
  * Pruning sharpens for free: each part's bounds/stats cover a
  * fraction of the original region's.
  *
  * Three phases like [[GraftDelete.deleteWhere]]: snapshot candidates,
  * rewrite WITHOUT the lock (one Spark task per oversized region —
  * region files live on storage every scan task can read, so the
  * rewrite parallelizes across executors), then swap under the
  * manifest lock with an O(touched) delta. Sources retire (files kept
  * one compaction cycle for tailing streams) and the parts carry
  * `srcMaxId` lineage exactly like delete's boundary rewrites, so a
  * stream that already consumed the original never re-reads its rows
  * as new data. A race with a concurrent compaction/delete/cluster
  * that replaced a candidate abandons cleanly (outputs deleted, loud
  * retry), and concurrent appends are carried forward untouched.
  *
  * Fixed-bucket tables split too: parts inherit the source's bucket
  * id, and the scan already groups multiple regions per bucket (the
  * append path commits one region per bucket per batch).
  */
object GraftSplit {

  /** Precedence safety for region rewrites on `dedupKeys` tables.
    * Latest-wins reads order versions by `_graft_region_id`, and a
    * rewrite re-stamps its rows with a FRESH (higher) id — so
    * re-cutting an OLD region would lift its stale versions above
    * newer appends. Manifest-only safe condition: a rewrite of
    * `target` regions is precedence-safe iff every OTHER live region
    * whose leading-key range overlaps the targets' envelope has a
    * LOWER id than every target (older versions losing to the fresh
    * id is the order they already lost in; a newer overlapping region
    * must win, and would not). Auto-split and streaming-litter merges
    * pass naturally — the regions being re-cut are the newest. */
  private[catalog] def precedenceSafe(target: Seq[RegionMeta],
      all: Seq[RegionMeta]): Boolean = {
    val ids = target.map(_.id).toSet
    val minId = target.map(_.id).min
    val los = target.map(r => KeyCodec.fromHex(r.mins.head))
    val his = target.map(r => KeyCodec.fromHex(r.maxs.head))
    val lo = los.reduce((a, b) => if (KeyCodec.compare(a, b) <= 0) a else b)
    val hi = his.reduce((a, b) => if (KeyCodec.compare(a, b) >= 0) a else b)
    all.filterNot(r => ids.contains(r.id)).forall { r =>
      r.id < minId ||
        KeyCodec.compare(KeyCodec.fromHex(r.maxs.head), lo) < 0 ||
        KeyCodec.compare(KeyCodec.fromHex(r.mins.head), hi) > 0
    }
  }

  /** Table property enabling HBase-style AUTOMATIC splitting: when
    * set, every batch-append commit re-checks region sizes and splits
    * oversized ones post-commit (the reference's storage tier does
    * exactly this — a region crossing `hbase.hregion.max.filesize`
    * splits without operator action). Streaming epoch commits stay
    * latency-first and leave splitting to the operator loop. */
  val MaxRegionBytesProp = "graft.maxRegionBytes"

  /** Split every region of `table` larger than `targetBytes`. Returns
    * (regions split, parts written). */
  def split(spark: SparkSession, catalogName: String, namespace: String,
      table: String, targetBytes: Long): (Int, Int) = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array(namespace), table)
    val t = cat.loadTable(ident).asInstanceOf[GraftTable]
    val res = splitDir(spark, t.tableDir, t.meta, targetBytes)
    cat.invalidateTable(ident)
    res
  }

  /** Post-batch-commit hook: honor [[MaxRegionBytesProp]] if declared.
    * A lost race (a concurrent writer's auto-split already re-cut the
    * same region) is swallowed — the append that triggered us is
    * already durable, and the next commit re-checks. */
  def maybeAutoSplit(spark: SparkSession, tableDir: File,
      meta: TableMeta): Unit =
    meta.properties.get(MaxRegionBytesProp).foreach { v =>
      try splitDir(spark, tableDir, meta, v.toLong)
      catch { case _: IllegalStateException => () }
    }

  /** The split itself, catalog-independent (callable from the write
    * path's post-commit hook, where only the table dir is in hand). */
  private[catalog] def splitDir(spark: SparkSession, tableDir: File,
      meta: TableMeta, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"target_bytes must be positive: $targetBytes")
    val dirPath = tableDir.getPath

    // phase 1: snapshot the oversized regions. A single-leading-key
    // region cannot split (no admissible boundary) — skipped here, so
    // a hot single-key region surfaces through `stats` instead of
    // looping a futile rewrite.
    val snapshot = TableMeta.loadRegions(tableDir)
    val dedup = TableMeta.dedupKeys(meta.properties)
    val cands = snapshot.filter { r =>
      new File(tableDir, r.file).length() > targetBytes && r.rows >= 2 &&
        KeyCodec.compare(KeyCodec.fromHex(r.mins.head),
          KeyCodec.fromHex(r.maxs.head)) != 0 &&
        // dedupKeys: re-idding an old region would lift stale versions
        // above newer overlapping appends — split only precedence-safe
        // regions (the newest ones; compaction folds the rest)
        (!dedup || precedenceSafe(Seq(r), snapshot))
    }
    if (cands.isEmpty) return (0, 0)

    // phase 2 (no lock): one task per oversized region
    val results: Seq[(RegionMeta, Seq[RegionMeta])] = spark.sparkContext
      .parallelize(cands, cands.size)
      .map(r => r -> splitRegion(dirPath, meta, r, targetBytes))
      .collect().toSeq
    val split = results.filter(_._2.size >= 2)
    // a candidate whose key runs defeated every boundary stays as-is
    results.filter(_._2.size < 2).foreach { case (_, parts) =>
      parts.foreach(p => new File(tableDir, p.file).delete()) }
    if (split.isEmpty) return (0, 0)

    // phase 3 (under the lock): verify the snapshot still stands, swap
    TableMeta.withManifestLock(tableDir) {
      val (state, viewSeq) = TableMeta.commitView(tableDir)
      val present = state.regions.map(_.file).toSet
      if (!split.forall { case (src, _) => present.contains(src.file) }) {
        split.foreach { case (_, parts) =>
          parts.foreach(p => new File(tableDir, p.file).delete()) }
        throw new IllegalStateException(
          "graft split lost a race with a concurrent compaction, " +
            "cluster, or delete on the same regions; retry the CALL")
      }
      var next = state.nextId
      val outs = split.flatMap { case (src, parts) =>
        parts.map { p =>
          val o = p.copy(id = next, srcMaxId = src.id); next += 1; o
        }
      }
      val sources = split.map(_._1)
      TableMeta.writeDelta(tableDir, viewSeq,
        regions = outs,
        removeIds = sources.map(_.id).toSet,
        retiredAdd = sources,
        gen = state.gen + 1,
        op = "split")
    }
    (split.size, split.map(_._2.size).sum)
  }

  /** Re-cut one region file into key-contiguous parts of roughly
    * rows/k rows each (k = ceil(bytes/target)), boundaries only where
    * the leading key changes. Sequential copy preserves the region
    * sort; per-part key bounds and column stats are tracked exactly
    * like [[GraftDelete]]'s boundary rewrite. Runs on an executor. */
  private def splitRegion(dirPath: String, meta: TableMeta,
      r: RegionMeta, targetBytes: Long): Seq[RegionMeta] = {
    import org.apache.spark.sql.types._
    val tableDir = new File(dirPath)
    val schema = meta.schema
    val keyIdx = meta.keyCols.map(schema.fieldIndex).toArray
    val keyTypes = meta.keyTypes.toArray
    val len = new File(tableDir, r.file).length()
    val k = math.max(2L, (len + targetBytes - 1) / targetBytes).toInt
    val rowsPer = math.max(1L, (r.rows + k - 1) / k)
    val pageLimit = meta.properties.get(TableMeta.PageRowLimitProp)
      .map(_.toInt).getOrElse(0)
    val blooms = TableMeta.bloomCols(meta.properties)
    val statCols = schema.fields.indices
      .filterNot(keyIdx.contains(_))
      .filter(i => ColStats.trackable(schema.fields(i).dataType)).toArray

    def keyEnc(row: org.apache.spark.sql.catalyst.InternalRow, d: Int)
        : Array[Byte] = {
      val v: Any = keyTypes(d) match {
        case BooleanType => row.getBoolean(keyIdx(d))
        case ByteType => row.getByte(keyIdx(d))
        case ShortType => row.getShort(keyIdx(d))
        case IntegerType | DateType => row.getInt(keyIdx(d))
        case LongType | TimestampType => row.getLong(keyIdx(d))
        case FloatType => row.getFloat(keyIdx(d))
        case DoubleType => row.getDouble(keyIdx(d))
        case StringType => row.getUTF8String(keyIdx(d)).toString
        case other => throw new IllegalStateException(other.toString)
      }
      KeyCodec.encode(keyTypes(d), v)
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[RegionMeta]
    var writer: ParquetRowIO.RowWriter = null
    var fileName: String = null
    var trackers: Array[ColStats.Tracker] = null
    var mins: Array[Array[Byte]] = null
    var maxs: Array[Array[Byte]] = null
    var rowsInPart = 0L

    def openPart(): Unit = {
      fileName = s"split-${r.id}-${out.size}-" +
        s"${java.util.UUID.randomUUID()}.parquet"
      writer = new ParquetRowIO.RowWriter(
        new File(tableDir, fileName).getPath, schema, pageLimit, blooms)
      trackers = statCols.map(i => ColStats.tracker(schema.fields(i)))
      mins = Array.fill[Array[Byte]](keyIdx.length)(null)
      maxs = Array.fill[Array[Byte]](keyIdx.length)(null)
      rowsInPart = 0L
    }
    def closePart(): Unit = {
      writer.close()
      if (rowsInPart == 0L) new File(tableDir, fileName).delete()
      else out += RegionMeta(fileName, rowsInPart,
        mins.map(KeyCodec.toHex).toSeq, maxs.map(KeyCodec.toHex).toSeq,
        r.bucket,
        stats = statCols.zip(trackers)
          .map { case (i, t) => schema.fields(i).name -> t.stat }.toMap)
    }

    val reader = new ParquetRowIO.RowReader(
      new File(tableDir, r.file).getPath, schema, Nil)
    try {
      openPart()
      var prevLead: Array[Byte] = null
      var row = reader.next()
      while (row != null) {
        val e0 = keyEnc(row, 0)
        if (rowsInPart >= rowsPer && prevLead != null &&
          KeyCodec.compare(e0, prevLead) != 0) {
          closePart(); openPart()
        }
        var d = 0
        while (d < keyIdx.length) {
          val e = if (d == 0) e0 else keyEnc(row, d)
          if (mins(d) == null || KeyCodec.compare(e, mins(d)) < 0) mins(d) = e
          if (maxs(d) == null || KeyCodec.compare(e, maxs(d)) > 0) maxs(d) = e
          d += 1
        }
        var c = 0
        while (c < statCols.length) {
          if (row.isNullAt(statCols(c))) trackers(c).nulls += 1
          else trackers(c).observe(row, statCols(c))
          c += 1
        }
        writer.write(row)
        rowsInPart += 1
        prevLead = e0
        row = reader.next()
      }
      closePart()
    } finally reader.close()
    out.toSeq
  }
}
