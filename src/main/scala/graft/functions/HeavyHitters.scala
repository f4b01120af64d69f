package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra-Gries heavy-hitters summary as a typed Spark [[Aggregator]]
  * (Misra & Gries 1982; mergeable form per Agarwal et al., "Mergeable
  * Summaries", PODS 2012 §3).
  *
  * The one-pass, bounded-memory answer to "which tokens dominate the
  * corpus?" — the boilerplate-detection primitive of a training-data
  * pipeline. An exact global token count needs a shuffle keyed by the
  * full vocabulary (billions of distinct tokens at 100 TB); this
  * summary keeps at most `k` counters per partition, merges
  * associatively in O(k log k), and GUARANTEES that every token with
  * true frequency > N/(k+1) survives to the final summary. The scale
  * shape is therefore: one map-side pass (no token ever crosses the
  * wire), a k-sized merge tree, then an exact verification count
  * restricted to the ≤ k candidates — a semi-join instead of a
  * vocabulary-wide aggregation.
  *
  * Input rows are word arrays (one document per row). Each document is
  * counted locally, then folded into the running summary with the
  * mergeable-MG step: sum counts, and if more than `k` keys remain,
  * subtract the (k+1)-th largest count from every key and drop the
  * non-positive ones. Each subtraction of `v` accounts `v` against at
  * least k+1 distinct keys, so total undercount ≤ N/(k+1) — the same
  * bound as the sequential algorithm, independent of merge order (and
  * therefore of Spark's partitioning and task scheduling).
  *
  * Heracles has no sketch surface; this extends the engine the same
  * way approx_count_distinct (HLL) does, but with a *verifiable*
  * output: downstream exact verification makes the whole pipeline
  * hash-checkable against a SQL oracle (see TextOps.heavyHitters).
  */
class MisraGries(k: Int)
    extends Aggregator[Seq[String], Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  /** Fold one document into the summary: local exact count (O(words)),
    * then one mergeable-MG combine (O((k + distinct) log)). */
  override def reduce(b: Map[String, Long], words: Seq[String]): Map[String, Long] = {
    val local = mutable.HashMap.empty[String, Long]
    words.foreach { w =>
      if (w.nonEmpty) local.update(w, local.getOrElse(w, 0L) + 1L)
    }
    combine(b, local)
  }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    b2.foreach { case (w, c) => m.update(w, c) }
    combine(b1, m)
  }

  /** Sum `add` into `base`; if the union exceeds k keys, subtract the
    * (k+1)-th largest count from all and keep the strictly positive. */
  private def combine(base: Map[String, Long], add: mutable.HashMap[String, Long]): Map[String, Long] = {
    base.foreach { case (w, c) => add.update(w, add.getOrElse(w, 0L) + c) }
    if (add.size <= k) add.toMap
    else {
      val kth = add.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)(k)
      add.iterator
        .filter { case (_, c) => c > kth }
        .map { case (w, c) => (w, c - kth) }
        .toMap
    }
  }

  /** Candidate tokens, sorted for determinism. The counts are
    * UNDER-estimates (by up to N/(k+1)) — callers re-count exactly. */
  override def finish(b: Map[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
