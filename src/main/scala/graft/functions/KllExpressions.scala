package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketches as first-class SQL aggregates — the
  * percentile counterpart of Spark's built-in DataSketches HLL family
  * (`hll_sketch_agg`/`hll_union_agg`), which Spark 4 does not ship for
  * quantiles:
  *
  *   - `kll_sketch_agg(x[, k])`  → one serialized KLL(k) sketch
  *   - `kll_union_agg(sketch[, k])` → merge of stored sketches
  *   - `kll_get_quantile(sketch, p)` → the p-quantile estimate
  *
  * The point at 100 TB: percentile dashboards re-aggregate STORED
  * sketch partials (a few KB per group) instead of re-sorting the fact
  * table per query — the same summary-table move the materialized-view
  * hll partials make for COUNT(DISTINCT), extended to medians/p95s.
  * KLL guarantees normalized rank error ~1.65% at k=200 (the
  * DataSketches default) regardless of data size or distribution, and
  * sketches merge losslessly within that bound, so a partial built per
  * ingest batch serves any later rollup.
  *
  * KLL compaction is randomized, so two builds over the same data may
  * serialize different BYTES while both honor the rank-error bound —
  * faces gate on rank accuracy (the sketch-gate pattern), never on
  * sketch bytes. */
object KllExpressions {
  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  /** Declared k; <= 0 means "not given" (union adopts the first input
    * sketch's k, see KllUnionAgg). */
  def k: Int
  protected def bufferK: Int = if (k > 0) k else 200 // DataSketches default
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(bufferK)
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch)
      : KllDoublesSketch =
    // adopt-k mode: an untouched default buffer must not clamp a
    // higher-k partial down to k=200 — the populated side wins
    if (k <= 0 && b.isEmpty) o else { b.merge(o); b }
  override def eval(b: KllDoublesSketch): Any =
    if (b.isEmpty) null else b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // an empty sketch serializes/heapifies fine, but heapified sketches
    // are read-only for some size classes — merge into a fresh heap
    // instance so the buffer stays updatable. The fresh instance takes
    // the SERIALIZED sketch's k (== declared k when one was given) so a
    // round-trip never degrades accuracy.
    val in = KllExpressions.heapify(bytes)
    val fresh = KllDoublesSketch.newHeapInstance(
      if (in.getK > 0) in.getK else bufferK)
    if (!in.isEmpty) fresh.merge(in)
    fresh
  }
}

/** `kll_sketch_agg(x[, k])` — build a KLL(k) doubles sketch over a
  * numeric column (inputs implicit-cast to double; NULLs ignored). */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase with UnaryLike[Expression] {
  override def prettyName: String = "kll_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg expects DOUBLE input (cast numerics), got " +
        child.dataType.simpleString)
  override def update(b: KllDoublesSketch, row: InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** `kll_union_agg(sketch[, k])` — merge serialized KLL sketches (the
  * re-aggregation of stored partials; NULL partials ignored). With no
  * explicit k the union ADOPTS the k of the first non-empty input
  * sketch, so partials stored at k=400 keep k=400 accuracy; pass k only
  * to force a specific (possibly lower) resolution. */
case class KllUnionAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase with UnaryLike[Expression] {
  override def prettyName: String = "kll_union_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union_agg expects a BINARY serialized sketch, got " +
        child.dataType.simpleString)
  override def update(b: KllDoublesSketch, row: InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(row)
    if (v == null) return b
    val in = KllExpressions.heapify(v.asInstanceOf[Array[Byte]])
    if (in.isEmpty) return b
    if (k <= 0 && b.isEmpty && in.getK != b.getK) {
      // adopt-k: first real input sets the buffer's resolution
      val fresh = KllDoublesSketch.newHeapInstance(in.getK)
      fresh.merge(in)
      fresh
    } else { b.merge(in); b }
  }
  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllUnionAgg =
    copy(child = c)
}

/** `kll_get_quantile(sketch, p)` — the p-quantile estimate from a
  * serialized sketch (inclusive search criterion, the DataSketches
  * default); NULL sketch or empty sketch → NULL. At the SQL surface p
  * is cast from any numeric (an undecorated `0.5` literal parses as
  * DECIMAL(1,1) — the registration wraps it in a double cast) and must
  * lie in [0, 1]. */
case class KllGetQuantile(left: Expression, right: Expression)
    extends Expression with CodegenFallback
    with BinaryLike[Expression] {
  override def prettyName: String = "kll_get_quantile"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kll_get_quantile expects (BINARY sketch, DOUBLE p), got (" +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(row: InternalRow): Any = {
    val s = left.eval(row)
    val p = right.eval(row)
    if (s == null || p == null) return null
    val pd = p.asInstanceOf[Double]
    if (pd < 0.0 || pd > 1.0 || pd.isNaN)
      throw new IllegalArgumentException(
        s"kll_get_quantile: p must be in [0, 1], got $pd")
    val sk = KllExpressions.heapify(s.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(pd, QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): KllGetQuantile = copy(left = l, right = r)
}
