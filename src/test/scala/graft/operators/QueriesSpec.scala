package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Smoke spec over the whole driver-facing query inventory: every
  * registered operator runs at sf0.001 and returns the expected shape.
  * (Exact value parity vs DuckDB is the driver's gate, replicated by
  * tools/check.py.) */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // queries that legitimately return zero rows at tiny scale
  private val mayBeEmpty = Set("except", "text_jaccard_pairs",
    "dedup_minhash_pairs", "join_anti", "subquery_not_exists",
    "text_ngram_jaccard", "dedup_simhash_pairs",
    "dedup_clusters") // subset of dedup_minhash_pairs (higher minEst)

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs and returns a sane shape") {
      val df = fn(spark, TestSpark.sfDir)
      val n = df.count()
      assert(df.schema.fields.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("approx_count_distinct lands within its rsd of exact counts") {
    // the one sketch query has no SQL oracle; gate its error bound
    // semantically instead (default rsd 0.05, explicit 0.01 — allow 4
    // standard deviations so the gate is deterministic-data tight but
    // not flaky on re-generated corpora)
    val r = Relational.aggApproxDistinct(spark, TestSpark.sfDir)
      .collect().head
    val exact = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .selectExpr("count(DISTINCT l_partkey)", "count(DISTINCT l_orderkey)")
      .collect().head
    def within(approx: Long, truth: Long, rsd: Double): Unit =
      assert(math.abs(approx - truth) <= truth * rsd * 4 + 1,
        s"approx=$approx exact=$truth rsd=$rsd")
    within(r.getLong(0), exact.getLong(0), 0.05)
    within(r.getLong(1), exact.getLong(1), 0.01)
  }
}
