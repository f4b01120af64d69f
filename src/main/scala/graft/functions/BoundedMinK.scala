package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-smallest summary: keeps the k smallest (key, id)
  * pairs seen, as a typed [[Aggregator]] usable under groupBy.
  *
  * The scale shape behind fixed-count-per-stratum sampling: the
  * window formulation (`row_number() OVER (PARTITION BY stratum
  * ORDER BY hash)`) shuffles and SORTS every corpus row to keep 25 of
  * them; this summary is a k-bounded buffer with map-side partial
  * aggregation — each task forwards at most k pairs per stratum, so
  * the exchange moves O(strata·k·tasks) rows instead of the corpus,
  * and nothing is ever globally sorted. Answers are identical to the
  * window query (same total order: key, then id), which is exactly
  * what the DuckDB oracle replays.
  */
class BoundedMinK(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    if (b.length == k && ordGte(x, b.last)) b
    else ((b :+ x).sorted.take(k))

  override def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (b1 ++ b2).sorted.take(k)

  private def ordGte(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 >= b._2)

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
