package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT percentiles without a global sort — the sketch-then-verify
  * pattern ([[TextOps.heavyHitters]]) applied to order statistics.
  *
  * `percentile()` (and the `agg_percentile` face) is exact but
  * materializes every group value in the aggregation buffer — the
  * 100-TB killer. `approx_percentile` is bounded-memory but
  * approximate. This face is BOTH: three bounded passes that return
  * exactly the k-th smallest element (k = ceil(p·n), DuckDB's
  * `quantile_disc` convention, verified against it by the driver's
  * oracle):
  *
  *  1. SKETCH — one `approx_percentile` pass (rank error ≤ E = n/acc,
  *     the contract Spark's KLL-style sketch publishes) nominates a
  *     value BRACKET [v_lo, v_hi] per target, at ranks p ∓ 3E/n.
  *  2. VERIFY — one aggregation computes the brackets' EXACT ranks;
  *     the sketch contract makes r_lo < k ≤ r_hi a theorem, and the
  *     code still checks it (a violated contract falls back to the
  *     exact-but-heavy percentile rather than answering wrong).
  *  3. REFINE — one pass emits only the ~6E rows inside each bracket;
  *     the answer is the (k − r_lo)-th smallest within its slice
  *     (tiny per-target window, never a corpus sort).
  *
  * Memory is O(E) per pass regardless of data size; the exchange in
  * pass 3 moves O(targets · E) rows. At 100 TB with accuracy 10⁴ the
  * refinement slice is ~0.06% of the data. */
object Quantiles {

  /** Exact `quantile_disc` for every p in `ps` over `df(valueCol)`
    * (doubles; NULLs ignored). Returns (p, value) rows. */
  def exactPercentiles(df: DataFrame, valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentile targets must be in (0, 1]; got $ps")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol)
    // Deliberately NOT repartitioned before the aggregations (r12:
    // measured): fanning the 600k-row value column out to 32 tasks
    // costs a 4.8 MB shuffle write + a 32-sketch final merge + GC that
    // together exceed the 3-task sketch update it parallelizes
    // (2.6 s vs 1.35 s end to end). The partial aggregation pipelines
    // with the scan; rows-per-split, not core count, is the right
    // grain here.
    val vdf = df.select(v)

    // pass 1: count + bracket sketch in ONE aggregation (the rank
    // error is E = n/accuracy, so the bracket HALF-WIDTH as a rank
    // fraction is just 3/accuracy — no pre-count needed). Clamped
    // targets mark the bracket side OPEN (no lower/upper filter) —
    // the slice stays bounded because k itself is then within 3E of
    // the data's edge.
    val eps = 3.0 / accuracy
    val pLo = ps.map(p => math.max(p - eps, 0.0))
    val pHi = ps.map(p => math.min(p + eps, 1.0))
    val sk = vdf.agg(
      count(v).as("n"),
      percentile_approx(v, lit(pLo.toArray), lit(accuracy)).as("lo"),
      percentile_approx(v, lit(pHi.toArray), lit(accuracy)).as("hi"))
      .head()
    val n = sk.getLong(0)
    val vLo = sk.getSeq[Double](1)
    val vHi = sk.getSeq[Double](2)
    val ks = ps.map(p => math.ceil(p * n).toLong)

    // open-sided targets: at the low edge the bracket's lower filter
    // is dropped (ranks 0), at the high edge the upper one (rank n)
    val openLo = ps.indices.map(i => pLo(i) <= 0.0)
    val openHi = ps.indices.map(i => pHi(i) >= 1.0)
    // pass 2+3 FUSED: exact bracket ranks AND the in-bracket slices in
    // ONE aggregation (r12: the old shape paid a third full scan +
    // shuffle + per-slice window for pass 3). The STRICT rank of v_lo
    // matters under heavy duplicates: when the target sits inside a
    // duplicated mass, v_lo IS that mass and the answer is v_lo itself
    // — detectable only as lt < k <= le. The collected slice is
    // O(targets · E) BY THE SKETCH CONTRACT (rank(v_hi) − rank(v_lo) ≤
    // ~8E even under duplicates, since both bracket ranks are within
    // 4E of k), so the collect_list is driver-bounded the same way the
    // k-sized gate reads are — never O(data).
    val inB: Seq[Column] = ps.indices.map { i =>
      val lo = if (openLo(i)) lit(true) else v > vLo(i)
      val hi = if (openHi(i)) lit(true) else v <= vHi(i)
      lo && hi
    }
    val rankCols: Seq[Column] = ps.indices.flatMap { i =>
      Seq(sum(when(v < vLo(i), 1L).otherwise(0L)).as(s"lt_$i"),
        sum(when(v <= vLo(i), 1L).otherwise(0L)).as(s"le_$i"),
        sum(when(v <= vHi(i), 1L).otherwise(0L)).as(s"he_$i"),
        collect_list(when(inB(i), v)).as(s"sl_$i"))
    }
    val ranks = vdf.agg(rankCols.head, rankCols.tail: _*).head()
    val lt = ps.indices.map(i => if (openLo(i)) 0L else ranks.getLong(4 * i))
    val le = ps.indices.map(i =>
      if (openLo(i)) 0L else ranks.getLong(4 * i + 1))
    val he = ps.indices.map(i =>
      if (openHi(i)) n else ranks.getLong(4 * i + 2))

    // per-target resolution: answered-by-v_lo / slice-pick / violated
    val direct = ps.indices.filter(i => lt(i) < ks(i) && ks(i) <= le(i))
    val sliced = ps.indices.filter(i => le(i) < ks(i) && ks(i) <= he(i))
    if ((direct ++ sliced).size != ps.size) {
      // sketch contract violated (kept as the correctness backstop,
      // unreachable while percentile_approx honors its rank error):
      // answer by the DEFINITION — global sort, k-th element. NOT
      // percentile(): that interpolates (quantile_cont), a different
      // statistic.
      val byRank = vdf.select(v.as("value"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("value").asc)))
        .filter(col("rn").isin(ks.distinct: _*))
        .collect().map(r => r.getLong(1) -> r.getDouble(0)).toMap
      import spark.implicits._
      return ps.indices
        .map(i => (ps(i), byRank(ks(i)))).toDF("p", "value")
    }

    val directRows = direct.map(i => (ps(i), vLo(i)))
    // resolve the sliced targets from the already-collected bracket
    // slices: the answer is the (k − r_lo)-th smallest inside the
    // slice — a sort of ≤ ~8E doubles on the driver, replacing the old
    // pass-3 scan + explode + per-slice window
    val slicedRows = sliced.map { i =>
      val slice = ranks.getSeq[Double](4 * i + 3).sorted
      (ps(i), slice((ks(i) - le(i) - 1).toInt))
    }
    import spark.implicits._
    (directRows ++ slicedRows).toDF("p", "value")
  }
}
