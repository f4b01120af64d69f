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
  * Anything else is refused: `canDeleteWhere` rejects predicates that
  * are not exactly representable (Spark then raises its standard
  * "cannot delete" analysis error), and `deleteWhere` throws if a
  * region straddles the predicate boundary rather than silently
  * rewriting (compact to aligned boundaries first, or delete on the
  * region split points). Refusing partial matches is the V2 contract.
  *
  * Unlike the PRUNING translators ([[GraftFilters]]/[[graft.prune.KeyRanges]]),
  * which may over-approximate (⊤ on anything unknown, sound for
  * skipping), this translator must be exact — an over-approximation
  * here would delete rows the predicate kept.
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
    def one(f: sources.Filter): Option[IvSet] = f match {
      case sources.AlwaysTrue() => Some(List(graft.prune.KeyRanges.full))
      case sources.AlwaysFalse() => Some(Nil)
      case sources.IsNotNull(c) if c.toLowerCase == k0 =>
        Some(List(graft.prune.KeyRanges.full)) // keys reject nulls
      case sources.EqualTo(c, v) if c.toLowerCase == k0 =>
        enc(v).map(b => List(Iv(Some(b), true, Some(b), true)))
      case sources.GreaterThan(c, v) if c.toLowerCase == k0 =>
        enc(v).map(b => List(Iv(Some(b), false, None, false)))
      case sources.GreaterThanOrEqual(c, v) if c.toLowerCase == k0 =>
        enc(v).map(b => List(Iv(Some(b), true, None, false)))
      case sources.LessThan(c, v) if c.toLowerCase == k0 =>
        enc(v).map(b => List(Iv(None, false, Some(b), false)))
      case sources.LessThanOrEqual(c, v) if c.toLowerCase == k0 =>
        enc(v).map(b => List(Iv(None, false, Some(b), true)))
      case sources.In(c, vs) if c.toLowerCase == k0 =>
        val encs = vs.toList.map(enc)
        if (encs.forall(_.isDefined))
          Some(encs.flatten.map(b => Iv(Some(b), true, Some(b), true)))
        else None
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
    TableMeta.withManifestLock(tableDir) {
      val state = TableMeta.loadState(tableDir)
      val (in, out) = state.regions.partition { r =>
        contained(ivs, KeyCodec.fromHex(r.mins.head),
          KeyCodec.fromHex(r.maxs.head))
      }
      val straddlers = out.filter(r =>
        ivs.exists(_.overlaps(KeyCodec.fromHex(r.mins.head),
          KeyCodec.fromHex(r.maxs.head))))
      if (straddlers.nonEmpty)
        throw new IllegalArgumentException(
          "graft DELETE predicate does not align with region " +
            s"boundaries: ${straddlers.size} region(s) match only " +
            "partially (e.g. " + straddlers.head.file + "). Delete on " +
            "the region split points, or compact so boundaries align.")
      if (in.isEmpty) return
      // deleted regions retire (files kept one compaction cycle for
      // in-flight readers); generation bump invalidates pre-upgrade
      // position-based stream checkpoints
      TableMeta.saveState(tableDir, state.copy(
        gen = state.gen + 1,
        regions = out,
        retired = state.retired ++ in))
    }
  }
}
