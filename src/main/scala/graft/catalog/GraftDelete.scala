package graft.catalog

import java.io.File

import org.apache.spark.sql.sources
import org.apache.spark.sql.types.DataType
import graft.codec.KeyCodec
import graft.prune.KeyRanges.{Iv, IvSet}

/** Region-aligned metadata-only DELETE.
  *
  * `DELETE FROM t WHERE log_id < cutoff` on a key-organized 100 TB
  * table should not rewrite data: when the predicate is EXACTLY a
  * leading-key-dimension interval set and every region falls fully
  * inside or fully outside it, the delete is a manifest edit — whole
  * regions drop with zero data IO (the Iceberg/Delta metadata-delete,
  * and the retention primitive every log-keyed table needs).
  *
  * Regions the predicate only PARTIALLY covers — the ≤2 boundary
  * regions of a contiguous range, regardless of table size — are
  * rewritten locally without the matching rows (copy-on-write), so the
  * total work of `DELETE WHERE k < cutoff` is two region files, not a
  * table scan. Predicates that are not exactly representable as
  * leading-key intervals are refused by `canDeleteWhere` (Spark then
  * raises its standard "cannot delete" analysis error) — an
  * over-approximation here would delete kept rows.
  *
  * Unlike the PRUNING translators ([[GraftFilters]]/[[graft.prune.KeyRanges]]),
  * which may over-approximate (⊤ on anything unknown, sound for
  * skipping), this translator must be exact.
  *
  * Deleted regions move to the manifest's retired list (files kept one
  * compaction cycle), so a tailing stream that already planned a batch
  * over them still reads its rows; stable region ids mean later
  * batches simply skip the gone ids. The manifest generation bumps so
  * pre-upgrade position-based stream checkpoints fail loudly instead
  * of mis-slicing the shifted region list.
  */
object GraftDelete {

  /** Exact leading-dimension interval set for the conjunction, or None
    * if any conjunct is not exactly representable. */
  def exactIntervals(filters: Seq[sources.Filter], meta: TableMeta)
      : Option[IvSet] = {
    val k0 = meta.keyCols.head.toLowerCase
    val dt0 = meta.keyTypes.head
    def enc(v: Any): Option[Array[Byte]] =
      ParquetRowIO.toInternal(dt0, v).flatMap { cv =>
        try Some(KeyCodec.encode(dt0, cv)) catch { case _: Exception => None }
      }
    // Signed-zero exactness: KeyCodec orders enc(-0.0) < enc(0.0) but
    // SQL comparison treats them equal, so a zero literal on a FLOAT/
    // DOUBLE key must map to the two-point byte range [enc(-0.0),
    // enc(0.0)], not the single encoding of whichever zero was written.
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    def isFpZero(v: Any): Boolean = (dt0, v) match {
      case (FloatType, f: java.lang.Float) => f.floatValue == 0.0f
      case (DoubleType, d: java.lang.Double) => d.doubleValue == 0.0d
      // an unfolded DECIMAL zero literal against an fp key also means
      // "both zeros" (BigDecimal cannot carry the sign bit)
      case (FloatType | DoubleType, bd: java.math.BigDecimal) =>
        bd.signum == 0
      case (FloatType | DoubleType, bd: BigDecimal) => bd.signum == 0
      case _ => false
    }
    def negZero: Option[Array[Byte]] =
      enc(if (dt0 == FloatType) java.lang.Float.valueOf(-0.0f)
          else java.lang.Double.valueOf(-0.0d))
    def posZero: Option[Array[Byte]] =
      enc(if (dt0 == FloatType) java.lang.Float.valueOf(0.0f)
          else java.lang.Double.valueOf(0.0d))
    def zeroPointIv: Option[IvSet] =
      for (lo <- negZero; hi <- posZero) yield List(Iv(Some(lo), true, Some(hi), true))
    def one(f: sources.Filter): Option[IvSet] = f match {
      case sources.AlwaysTrue() => Some(List(graft.prune.KeyRanges.full))
      case sources.AlwaysFalse() => Some(Nil)
      case sources.IsNotNull(c) if c.toLowerCase == k0 =>
        Some(List(graft.prune.KeyRanges.full)) // keys reject nulls
      case sources.EqualTo(c, v) if c.toLowerCase == k0 =>
        if (isFpZero(v)) zeroPointIv
        else enc(v).map(b => List(Iv(Some(b), true, Some(b), true)))
      case sources.GreaterThan(c, v) if c.toLowerCase == k0 =>
        // > 0.0 excludes BOTH zeros → open bound at the larger enc(+0.0)
        if (isFpZero(v)) posZero.map(b => List(Iv(Some(b), false, None, false)))
        else enc(v).map(b => List(Iv(Some(b), false, None, false)))
      case sources.GreaterThanOrEqual(c, v) if c.toLowerCase == k0 =>
        // >= 0.0 includes BOTH zeros → closed bound at enc(-0.0)
        if (isFpZero(v)) negZero.map(b => List(Iv(Some(b), true, None, false)))
        else enc(v).map(b => List(Iv(Some(b), true, None, false)))
      case sources.LessThan(c, v) if c.toLowerCase == k0 =>
        // < 0.0 excludes BOTH zeros → open bound at the smaller enc(-0.0)
        if (isFpZero(v)) negZero.map(b => List(Iv(None, false, Some(b), false)))
        else enc(v).map(b => List(Iv(None, false, Some(b), false)))
      case sources.LessThanOrEqual(c, v) if c.toLowerCase == k0 =>
        // <= 0.0 includes BOTH zeros → closed bound at enc(+0.0)
        if (isFpZero(v)) posZero.map(b => List(Iv(None, false, Some(b), true)))
        else enc(v).map(b => List(Iv(None, false, Some(b), true)))
      case sources.In(c, vs) if c.toLowerCase == k0 =>
        val encs = vs.toList.map { v =>
          if (isFpZero(v)) zeroPointIv.map(_.head)
          else enc(v).map(b => Iv(Some(b), true, Some(b), true))
        }
        if (encs.forall(_.isDefined)) Some(encs.flatten) else None
      // {s : s startsWith p} IS [p, successor(p)) in byte order —
      // exact, so `DELETE WHERE key LIKE '2023-%'` retention works
      case sources.StringStartsWith(c, p)
          if c.toLowerCase == k0 &&
            dt0 == org.apache.spark.sql.types.StringType =>
        val lo = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        Some(List(Iv(Some(lo), true, Option(KeyCodec.successor(lo)), false)))
      // keys reject nulls: IS NULL on the key matches nothing, exactly
      case sources.IsNull(c) if c.toLowerCase == k0 => Some(Nil)
      case sources.And(l, r) =>
        for (a <- one(l); b <- one(r))
          yield (for (x <- a; y <- b) yield x.intersect(y))
            .filterNot(_.isEmpty)
      case sources.Or(l, r) => for (a <- one(l); b <- one(r)) yield a ++ b
      case _ => None // not exactly representable
    }
    filters.toList.map(one) match {
      case Nil => Some(List(graft.prune.KeyRanges.full)) // DELETE all
      case cs if cs.forall(_.isDefined) =>
        Some(cs.flatten.reduce((a, b) =>
          (for (x <- a; y <- b) yield x.intersect(y)).filterNot(_.isEmpty)))
      case _ => None
    }
  }

  /** [mn,mx] (region dim-0 bounds, inclusive) fully inside ONE interval
    * of the set. Single-interval containment is deliberately
    * conservative: a range covered only by the union of two adjacent
    * intervals refuses rather than risking a gap. */
  private def contained(ivs: IvSet, mn: Array[Byte], mx: Array[Byte])
      : Boolean =
    ivs.exists { iv =>
      val okLo = iv.lo.forall { l =>
        val c = KeyCodec.compare(l, mn)
        c < 0 || (c == 0 && iv.loInc)
      }
      val okHi = iv.hi.forall { h =>
        val c = KeyCodec.compare(mx, h)
        c < 0 || (c == 0 && iv.hiInc)
      }
      okLo && okHi
    }

  def deleteWhere(tableDir: File, meta: TableMeta,
      filters: Array[sources.Filter]): Unit = {
    val ivs = exactIntervals(filters.toSeq, meta).getOrElse(
      throw new IllegalArgumentException(
        s"graft DELETE requires a predicate exactly expressible as " +
          s"${meta.keyCols.head} intervals; got " +
          filters.mkString(", ")))
    // a boundary rewrite re-stamps its KEPT rows with a fresh (higher)
    // region id; on a dedupKeys table that would lift a kept stale
    // version above a newer overlapping append (latest-wins orders by
    // _graft_region_id). Refuse exactly the unsafe rewrites — aligned
    // metadata deletes and rewrites of the newest overlapping region
    // stay available ([[GraftSplit.precedenceSafe]]).
    def guardDedupRewrite(strad: Seq[RegionMeta],
        all: Seq[RegionMeta], cleanup: () => Unit = () => ()): Unit =
      if (TableMeta.dedupKeys(meta.properties) &&
        strad.exists(r => !GraftSplit.precedenceSafe(Seq(r), all))) {
        cleanup()
        throw new UnsupportedOperationException(
          "graft DELETE on a 'graft.dedupKeys' table: the boundary " +
            "rewrite would re-stamp kept rows above newer versions of " +
            "the same keys (latest-wins orders by _graft_region_id). " +
            "Align the interval to region boundaries, or run " +
            "CALL graft.sys.compact first to fold versions.")
      }
    // phase 1 (under the lock): classify regions; if nothing straddles,
    // the whole delete is a metadata swap and we finish here
    val straddlers: Seq[RegionMeta] = TableMeta.withManifestLock(tableDir) {
      val (state, viewSeq) = TableMeta.commitView(tableDir)
      val (in, out) = partitionRegions(state.regions, ivs)
      val strad = straddlersOf(out, ivs)
      guardDedupRewrite(strad, state.regions)
      if (strad.isEmpty) {
        if (in.nonEmpty)
          // deleted regions retire (files kept one compaction cycle
          // for in-flight readers); generation bump invalidates
          // pre-upgrade position-based stream checkpoints. O(deleted)
          // delta segment, CAS'd at the view's seq.
          TableMeta.writeDelta(tableDir, viewSeq,
            removeIds = in.map(_.id).toSet,
            retiredAdd = in,
            gen = state.gen + 1,
            op = "delete")
        return
      }
      strad
    }
    // phase 2 (no lock): rewrite the boundary regions, dropping rows
    // inside the interval set. Straddlers of a contiguous range are
    // the <=2 boundary regions REGARDLESS of table size, so a
    // row-at-a-time local rewrite is the right cost model — the same
    // region-local work the reference's region server would do.
    val rewritten: Seq[(RegionMeta, RegionMeta)] = straddlers.flatMap(r =>
      rewriteRegion(tableDir, meta, r, ivs).map(r -> _))
    // phase 3 (under the lock): re-classify against the CURRENT state
    // (concurrent appends are carried forward untouched) and swap.
    TableMeta.withManifestLock(tableDir) {
      val (state, viewSeq) = TableMeta.commitView(tableDir)
      val present = state.regions.map(_.file).toSet
      if (!straddlers.forall(r => present.contains(r.file))) {
        // a concurrent compaction/delete replaced a region we rewrote —
        // our rewrite is stale; give up loudly rather than guess
        rewritten.foreach { case (_, rw) =>
          new File(tableDir, rw.file).delete() }
        throw new IllegalStateException(
          "graft DELETE lost a race with a concurrent compaction or " +
            "delete on the same regions; retry the DELETE")
      }
      val (in, out) = partitionRegions(state.regions, ivs)
      val stradNow = straddlersOf(out, ivs)
      guardDedupRewrite(stradNow, state.regions, () =>
        rewritten.foreach { case (_, rw) =>
          new File(tableDir, rw.file).delete() })
      // a region appended BETWEEN our phases may straddle the delete
      // range; we hold no rewrite for it, and retiring it unrewritten
      // would lose its kept rows — fail loudly instead. (A concurrent
      // append fully INSIDE the range is safe to drop: all its rows
      // match the predicate, the delete just ordered after the insert.)
      val processed = straddlers.map(_.file).toSet
      if (stradNow.exists(r => !processed.contains(r.file))) {
        rewritten.foreach { case (_, rw) =>
          new File(tableDir, rw.file).delete() }
        throw new IllegalStateException(
          "graft DELETE lost a race with a concurrent append into the " +
            "deleted key range; retry the DELETE")
      }
      val strad = stradNow.map(_.file).toSet
      val dropped = in ++ out.filter(r => strad.contains(r.file))
      // stamp fresh stable ids and mark each rewrite with its source id
      // (srcMaxId, like compaction rewrites): a tailing stream that
      // already consumed the original skips the rewrite instead of
      // re-reading the kept rows as new data, and the id counter stays
      // collision-free (an id-0 region would collide through the
      // legacy position-based id synthesis on the next manifest load)
      var next = state.nextId
      val outs = rewritten.map { case (src, rw) =>
        val o = rw.copy(id = next, srcMaxId = src.id); next += 1; o
      }
      // O(touched) delta segment, CAS'd at the view's seq: removes the
      // contained + straddling originals, adds the boundary rewrites
      TableMeta.writeDelta(tableDir, viewSeq,
        regions = outs,
        removeIds = dropped.map(_.id).toSet,
        retiredAdd = dropped,
        gen = state.gen + 1,
        op = "delete")
    }
  }

  private def partitionRegions(regions: Seq[RegionMeta], ivs: IvSet)
      : (Seq[RegionMeta], Seq[RegionMeta]) =
    regions.partition { r =>
      contained(ivs, KeyCodec.fromHex(r.mins.head),
        KeyCodec.fromHex(r.maxs.head))
    }

  private def straddlersOf(out: Seq[RegionMeta], ivs: IvSet)
      : Seq[RegionMeta] =
    out.filter(r =>
      ivs.exists(_.overlaps(KeyCodec.fromHex(r.mins.head),
        KeyCodec.fromHex(r.maxs.head))))

  /** Rewrite one boundary region without the rows whose leading key
    * falls in `ivs`; None if every row matched (region vanishes). The
    * new file keeps the region's sort (filtering preserves order), its
    * bucket, and recomputed key bounds + column stats. */
  private def rewriteRegion(tableDir: File, meta: TableMeta,
      r: RegionMeta, ivs: IvSet): Option[RegionMeta] = {
    val schema = meta.schema
    val keyIdx = meta.keyCols.map(schema.fieldIndex).toArray
    val keyTypes = meta.keyTypes.toArray
    val fileName =
      s"delete-rw-${r.id}-${java.util.UUID.randomUUID()}.parquet"
    val reader = new ParquetRowIO.RowReader(
      new File(tableDir, r.file).getPath, schema, Nil)
    val writer = new ParquetRowIO.RowWriter(
      new File(tableDir, fileName).getPath, schema,
      meta.properties.get(TableMeta.PageRowLimitProp)
        .map(_.toInt).getOrElse(0),
      TableMeta.bloomCols(meta.properties))
    val statCols = schema.fields.indices
      .filterNot(keyIdx.contains(_))
      .filter(i => ColStats.trackable(schema.fields(i).dataType)).toArray
    val trackers = statCols.map(i => ColStats.tracker(schema.fields(i)))
    val mins = Array.fill[Array[Byte]](keyIdx.length)(null)
    val maxs = Array.fill[Array[Byte]](keyIdx.length)(null)
    var rows = 0L
    def keyEnc(row: org.apache.spark.sql.catalyst.InternalRow, d: Int)
        : Array[Byte] = {
      import org.apache.spark.sql.types._
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
    try {
      var row = reader.next()
      while (row != null) {
        val e0 = keyEnc(row, 0)
        val matches = ivs.exists(_.overlaps(e0, e0)) // point membership
        if (!matches) {
          var d = 0
          while (d < keyIdx.length) {
            val e = if (d == 0) e0 else keyEnc(row, d)
            if (mins(d) == null || KeyCodec.compare(e, mins(d)) < 0)
              mins(d) = e
            if (maxs(d) == null || KeyCodec.compare(e, maxs(d)) > 0)
              maxs(d) = e
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
        row = reader.next()
      }
    } finally { reader.close(); writer.close() }
    if (rows == 0) { new File(tableDir, fileName).delete(); None }
    else Some(RegionMeta(fileName, rows,
      mins.map(KeyCodec.toHex).toSeq, maxs.map(KeyCodec.toHex).toSeq,
      r.bucket,
      stats = statCols.zip(trackers)
        .map { case (i, t) => schema.fields(i).name -> t.stat }.toMap))
  }
}
