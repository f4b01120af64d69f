package graft.catalog

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier

import graft.codec.KeyCodec

/** Targeted region merging (`CALL graft.sys.merge`): adjacent small
  * regions — the fragmentation a streaming `foreachBatch` sink or
  * frequent small INSERTs leave behind — are k-way sort-merged into
  * single files, O(touched) IO. The other half of the region
  * lifecycle [[GraftSplit]] opens: split bounds a region's maximum
  * size under append, merge bounds the region COUNT under
  * fragmentation, and both cost only the regions they touch where
  * [[GraftCompact]] rewrites the whole table. (The reference leans on
  * HBase for both sides: region split at max filesize, and the
  * HFile compactions its region servers run per store, not per
  * table.)
  *
  * Candidates group greedily: regions sorted by min leading key
  * (within a fixed-split bucket, when the table has buckets) pack
  * into groups while the summed file size stays under
  * `target_bytes`; only groups of two or more merge. Each group
  * k-way merges by full composite key — the inputs are each
  * key-sorted, so the output is key-sorted with no shuffle and no
  * sort; overlapping inputs (the append-stream shape) interleave
  * correctly. On a `dedupKeys` table equal-key rows fold to the row
  * from the newest source region (the same keep-latest rule
  * compaction applies) — but ONLY for groups whose key envelope no
  * newer outside region overlaps ([[GraftSplit.precedenceSafe]]):
  * the merged output carries a fresh region id, and lifting a folded
  * group above an interleaved newer version elsewhere would invert
  * latest-wins. Unsafe groups are skipped (compaction folds them);
  * streaming-upsert litter — the case merge exists for — is the
  * newest data and passes.
  *
  * Commit protocol identical to [[GraftSplit]]: rewrite without the
  * lock (one Spark task per group), swap under the manifest lock with
  * an O(touched) delta; sources retire one compaction cycle with
  * `srcMaxId` lineage so tailing streams skip the merged data; races
  * with concurrent compaction/delete/cluster abandon cleanly.
  */
object GraftMerge {

  /** Merge adjacent regions of `table` whose summed size fits
    * `targetBytes`. Returns (groups merged, source regions consumed). */
  def merge(spark: SparkSession, catalogName: String, namespace: String,
      table: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"target_bytes must be positive: $targetBytes")
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array(namespace), table)
    val t = cat.loadTable(ident).asInstanceOf[GraftTable]
    val dirPath = t.tableDir.getPath
    val meta = t.meta
    val fold = TableMeta.dedupKeys(meta.properties)

    // phase 1: greedy adjacent grouping, per bucket, by min leading key
    val snapshot = TableMeta.loadRegions(t.tableDir)
    val groups: Seq[Seq[RegionMeta]] = snapshot.groupBy(_.bucket).values
      .flatMap { bucketRegions =>
        val sorted = bucketRegions.sortWith { (a, b) =>
          val c = KeyCodec.compare(KeyCodec.fromHex(a.mins.head),
            KeyCodec.fromHex(b.mins.head))
          if (c != 0) c < 0 else a.id < b.id
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[Seq[RegionMeta]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[RegionMeta]
        var curBytes = 0L
        sorted.foreach { r =>
          val len = new File(t.tableDir, r.file).length()
          if (cur.nonEmpty && curBytes + len > targetBytes) {
            if (cur.size >= 2) out += cur.toSeq
            cur = scala.collection.mutable.ArrayBuffer.empty[RegionMeta]
            curBytes = 0L
          }
          if (len <= targetBytes) { cur += r; curBytes += len }
          else { // an oversized region never joins a group
            if (cur.size >= 2) out += cur.toSeq
            cur = scala.collection.mutable.ArrayBuffer.empty[RegionMeta]
            curBytes = 0L
          }
        }
        if (cur.size >= 2) out += cur.toSeq
        out.toSeq
      }.toSeq
      // dedupKeys: the merged output's fresh id must not lift stale
      // versions above newer overlapping regions OUTSIDE the group,
      // and the intra-group fold must see ALL interleaved versions —
      // both hold exactly when every outside region overlapping the
      // group's envelope is older than the whole group
      // ([[GraftSplit.precedenceSafe]]). Streaming-upsert litter (the
      // case merge exists for) is the newest data, so its groups pass.
      .filter(g => !fold || GraftSplit.precedenceSafe(g, snapshot))
    if (groups.isEmpty) return (0, 0)

    // phase 2 (no lock): one task per group
    val results: Seq[(Seq[RegionMeta], RegionMeta)] = spark.sparkContext
      .parallelize(groups, groups.size)
      .map(g => g -> mergeGroup(dirPath, meta, g, fold))
      .collect().toSeq

    // phase 3 (under the lock): verify the snapshot still stands, swap
    TableMeta.withManifestLock(t.tableDir) {
      val (state, viewSeq) = TableMeta.commitView(t.tableDir)
      val present = state.regions.map(_.file).toSet
      if (!results.forall(_._1.forall(r => present.contains(r.file)))) {
        results.foreach { case (_, m) =>
          new File(t.tableDir, m.file).delete() }
        throw new IllegalStateException(
          "graft merge lost a race with a concurrent compaction, " +
            "cluster, or delete on the same regions; retry the CALL")
      }
      var next = state.nextId
      val outs = results.map { case (g, m) =>
        val srcMax = g.map(r => if (r.srcMaxId >= 0) r.srcMaxId else r.id).max
        val o = m.copy(id = next, srcMaxId = srcMax); next += 1; o
      }
      val sources = results.flatMap(_._1)
      TableMeta.writeDelta(t.tableDir, viewSeq,
        regions = outs,
        removeIds = sources.map(_.id).toSet,
        retiredAdd = sources,
        gen = state.gen + 1,
        op = "merge")
    }
    cat.invalidateTable(ident)
    (results.size, results.map(_._1.size).sum)
  }

  /** K-way merge one group of key-sorted region files into one sorted
    * file; on `fold`, equal-full-key rows keep the newest source
    * region's row (ties within a region: the later row). Tracks key
    * bounds + column stats like [[GraftSplit]]. Runs on an executor. */
  private def mergeGroup(dirPath: String, meta: TableMeta,
      group: Seq[RegionMeta], fold: Boolean): RegionMeta = {
    import org.apache.spark.sql.types._
    val tableDir = new File(dirPath)
    val schema = meta.schema
    val keyIdx = meta.keyCols.map(schema.fieldIndex).toArray
    val keyTypes = meta.keyTypes.toArray
    val pageLimit = meta.properties.get(TableMeta.PageRowLimitProp)
      .map(_.toInt).getOrElse(0)
    val blooms = TableMeta.bloomCols(meta.properties)
    val statCols = schema.fields.indices
      .filterNot(keyIdx.contains(_))
      .filter(i => ColStats.trackable(schema.fields(i).dataType)).toArray

    def encKey(row: InternalRow): Array[Array[Byte]] =
      Array.tabulate(keyIdx.length) { d =>
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
    def cmpKeys(a: Array[Array[Byte]], b: Array[Array[Byte]]): Int = {
      var d = 0
      while (d < a.length) {
        val c = KeyCodec.compare(a(d), b(d))
        if (c != 0) return c
        d += 1
      }
      0
    }

    val srcIds = group.map(_.id).toArray
    val readers = group.map(r => new ParquetRowIO.RowReader(
      new File(tableDir, r.file).getPath, schema, Nil)).toArray
    val heads = new Array[InternalRow](readers.length)
    val headKeys = new Array[Array[Array[Byte]]](readers.length)
    def advance(i: Int): Unit = {
      heads(i) = readers(i).next()
      headKeys(i) = if (heads(i) == null) null else encKey(heads(i))
    }

    val fileName =
      s"merge-${group.head.id}-${java.util.UUID.randomUUID()}.parquet"
    val writer = new ParquetRowIO.RowWriter(
      new File(tableDir, fileName).getPath, schema, pageLimit, blooms)
    val trackers = statCols.map(i => ColStats.tracker(schema.fields(i)))
    val mins = Array.fill[Array[Byte]](keyIdx.length)(null)
    val maxs = Array.fill[Array[Byte]](keyIdx.length)(null)
    var rows = 0L

    def flush(row: InternalRow, key: Array[Array[Byte]]): Unit = {
      var d = 0
      while (d < keyIdx.length) {
        if (mins(d) == null || KeyCodec.compare(key(d), mins(d)) < 0)
          mins(d) = key(d)
        if (maxs(d) == null || KeyCodec.compare(key(d), maxs(d)) > 0)
          maxs(d) = key(d)
        d += 1
      }
      var c = 0
      while (c < statCols.length) {
        if (row.isNullAt(statCols(c))) trackers(c).nulls += 1
        else trackers(c).observe(row, statCols(c))
        c += 1
      }
      writer.write(row)
      rows += 1
    }

    try {
      readers.indices.foreach(advance)
      // pending row for the fold: same-key emissions arrive in
      // ascending source-id order (the tie-break below), so each
      // replaces the last and the final one is the keep-latest winner
      var pendRow: InternalRow = null
      var pendKey: Array[Array[Byte]] = null
      var live = heads.count(_ != null)
      while (live > 0) {
        var pick = -1
        var i = 0
        while (i < heads.length) {
          if (heads(i) != null && (pick < 0 || {
            val c = cmpKeys(headKeys(i), headKeys(pick))
            c < 0 || (c == 0 && srcIds(i) < srcIds(pick))
          })) pick = i
          i += 1
        }
        val row = heads(pick); val key = headKeys(pick)
        if (!fold) flush(row, key)
        else {
          if (pendRow != null && cmpKeys(pendKey, key) != 0)
            flush(pendRow, pendKey)
          pendRow = row; pendKey = key // later same-key emission replaces
        }
        advance(pick)
        if (heads(pick) == null) live -= 1
      }
      if (fold && pendRow != null) flush(pendRow, pendKey)
    } finally {
      readers.foreach(_.close())
      writer.close()
    }
    RegionMeta(fileName, rows,
      mins.map(KeyCodec.toHex).toSeq, maxs.map(KeyCodec.toHex).toSeq,
      group.head.bucket,
      stats = statCols.zip(trackers)
        .map { case (i, t) => schema.fields(i).name -> t.stat }.toMap)
  }
}
