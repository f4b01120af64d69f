package graft.catalog

/** Deterministic region-level (cluster) sampling for profiling reads.
  *
  * `spark.read.option("graft.sampleRegions", spec).table(t)` reads a
  * region SUBSET chosen by region id — IO shrinks with the sample, no
  * data file outside the subset is opened, and every downstream scan
  * feature (stat pruning, pushdown, key-grouped partitioning)
  * composes because the subset rides the same pinned-region seam as
  * time travel and CDC reads.
  *
  * Two spec forms, both deterministic and repeatable:
  *  - `"m/n"` — keep regions with id % n < m (an m/n fraction);
  *  - `"k:n"` — keep the single residue class id % n == k (shard k of
  *    n). The n shards are disjoint and their union is the whole
  *    table, so complementary profiling jobs can split a corpus
  *    without coordination — and the property is testable as
  *    union(shards 0..n-1) == full scan.
  *
  * This is CLUSTER sampling (whole sorted key ranges), the 100-TB
  * profiling move: estimating corpus statistics from 1% of regions
  * reads 1% of the bytes. It is NOT row-level Bernoulli sampling —
  * region contents are key-clustered, so per-row statistics from a
  * region sample carry cluster bias exactly like any block sample
  * (the caller's trade to make; TABLESAMPLE row semantics remain
  * available as a post-scan `sample()`).
  */
object GraftSample {
  val OptionKey = "graft.sampleRegions"

  private val Frac = """(\d+)/(\d+)""".r
  private val Shard = """(\d+):(\d+)""".r

  /** Parse a spec into the region-id keep predicate. */
  def parse(spec: String): Long => Boolean = spec.trim match {
    case Frac(m, n) =>
      val (mi, ni) = (m.toLong, n.toLong)
      require(ni > 0 && mi <= ni,
        s"$OptionKey fraction must be m/n with 0 <= m <= n; got '$spec'")
      id => java.lang.Long.remainderUnsigned(id, ni) < mi
    case Shard(k, n) =>
      val (ki, ni) = (k.toLong, n.toLong)
      require(ni > 0 && ki < ni,
        s"$OptionKey shard must be k:n with 0 <= k < n; got '$spec'")
      id => java.lang.Long.remainderUnsigned(id, ni) == ki
    case other =>
      throw new IllegalArgumentException(
        s"$OptionKey must be 'm/n' (fraction) or 'k:n' (shard); " +
          s"got '$other'")
  }
}
