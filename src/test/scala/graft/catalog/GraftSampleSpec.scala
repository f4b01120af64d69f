package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Deterministic region sampling (`graft.sampleRegions` read option):
  * shards are disjoint, union to the full table, actually reduce the
  * partitions a scan schedules (IO reduction, not post-filtering),
  * repeat identically, and compose with pushdown. */
class GraftSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val fqn: String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.smp")
    val t = "graft.smp.orders_s"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES('keyCols'='k', 'numRegions'='8')")
    spark.sql(s"INSERT INTO $t SELECT id, id * 1.5 FROM range(4000)")
    t
  }

  private def read(spec: String) =
    spark.read.option(GraftSample.OptionKey, spec).table(fqn)

  test("k:n shards are disjoint and union to the full table") {
    val full = spark.table(fqn).count()
    val shardCounts = (0 until 4).map(k => read(s"$k:4").count())
    assert(shardCounts.sum == full, s"shards $shardCounts must sum to $full")
    val overlap = read("0:4").intersect(read("1:4")).count()
    assert(overlap == 0)
  }

  test("sampling reduces scheduled partitions, not just rows") {
    val full = spark.table(fqn).rdd.getNumPartitions
    val shard = read("0:4").rdd.getNumPartitions
    assert(full == 8, s"fixture should scan 8 regions, got $full")
    assert(shard == 2, s"0:4 over 8 regions must schedule 2, got $shard")
    val frac = read("2/8").rdd.getNumPartitions
    assert(frac == 2, s"2/8 over 8 regions must schedule 2, got $frac")
  }

  test("a sampled read is deterministic across repeats") {
    val a = read("1:4").collect().map(_.getLong(0)).sorted.toSeq
    val b = read("1:4").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("sampling composes with key pushdown") {
    import org.apache.spark.sql.functions._
    val got = read("0:2").filter(col("k") < 100)
      .agg(count(lit(1))).head().getLong(0)
    val want = spark.table(fqn).filter(col("k") < 100)
      .withColumn("r", col("k")) // full read for reference
      .count()
    assert(got <= want)
    // the sampled+filtered rows are exactly the full filtered rows in
    // even regions: check against the complement shard
    val other = read("1:2").filter(col("k") < 100)
      .agg(count(lit(1))).head().getLong(0)
    assert(got + other == want)
  }

  test("malformed specs refuse loudly") {
    val e1 = intercept[Exception] { read("nope").count() }
    assert(e1.getMessage.contains(GraftSample.OptionKey))
    val e2 = intercept[Exception] { read("5:4").count() }
    assert(e2.getMessage.contains("0 <= k < n"))
    val e3 = intercept[Exception] { read("9/8").count() }
    assert(e3.getMessage.contains("0 <= m <= n"))
  }
}
