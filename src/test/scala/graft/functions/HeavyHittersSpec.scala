package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Misra-Gries sketch semantics: the mergeable-summary guarantee
  * (every token above N/(k+1) survives, whatever the partitioning),
  * the memory bound, and the sketch-then-verify face's equality with
  * the brute-force full-vocabulary aggregation. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exactCounts(rows: Seq[Seq[String]]): Map[String, Long] =
    rows.flatten.filter(_.nonEmpty).groupBy(identity).view
      .mapValues(_.size.toLong).toMap

  test("MG summary is a superset of true heavy hitters at every partitioning") {
    // adversarial mix: a few genuinely heavy tokens buried in a long
    // tail of singletons, deterministic pseudo-random layout
    val k = 16
    val rows: Seq[Seq[String]] = (0 until 500).map { i =>
      val heavy = Seq.fill(3)(s"h${i % 4}")
      val tail = Seq(s"t${(i * 2654435761L) % 10000}", s"u${(i * 40503L) % 7919}")
      heavy ++ tail
    }
    val n = rows.iterator.map(_.count(_.nonEmpty)).sum.toLong
    val truth = exactCounts(rows).filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(truth.nonEmpty, "fixture must contain real heavy hitters")
    for (parts <- Seq(1, 3, 8)) {
      val cands = rows.toDS().repartition(parts)
        .select(new MisraGries(k).toColumn).head().toSet
      assert(cands.size <= k, s"summary exceeded k at parts=$parts")
      val missed = truth -- cands
      assert(missed.isEmpty, s"dropped heavy hitters $missed at parts=$parts")
    }
  }

  test("reduce/merge keep at most k counters") {
    val mg = new MisraGries(4)
    var b = mg.zero
    (0 until 200).foreach { i =>
      b = mg.reduce(b, Seq(s"w${i % 37}", s"w${i % 11}", "always"))
      assert(b.size <= 4)
    }
    val merged = mg.merge(b, mg.reduce(mg.zero, (0 until 50).map(i => s"x$i")))
    assert(merged.size <= 4)
    // "always" appears in every row (200 of ~600 tokens > N/5) → must survive
    assert(b.contains("always"))
  }

  test("sketch-then-verify face equals the brute-force heavy-hitter query") {
    val face = graft.operators.TextOps.queries("text_heavy_hitters")(
      spark, TestSpark.sfDir)
    val tok = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val n = tok.count()
    val brute = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 64 > n)
      .withColumn("n_tokens", lit(n))
      .orderBy(col("cnt").desc, col("w").asc)
    val a = face.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = brute.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq, s"face=${a.toSeq} brute=${b.toSeq}")
  }

  test("BoundedMinK equals the window row_number sample at every partitioning") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .withColumn("h", pmod(col("doc_id") * lit(2654435761L), lit(1000000007L)))
    val expect = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h").asc, col("doc_id").asc)))
      .filter(col("rk") <= 25)
      .select(col("lang"), col("rk"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    for (parts <- Seq(1, 5)) {
      val kSmall = udaf(new BoundedMinK(25))
      val got = docs.repartition(parts)
        .groupBy(col("lang"))
        .agg(kSmall(col("h"), col("doc_id")).as("picks"))
        .select(col("lang"), posexplode(col("picks")))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rk"),
          col("col._2").as("doc_id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
      assert(got.toSeq == expect.toSeq, s"mismatch at parts=$parts")
    }
  }

  test("BoundedMinK buffer never exceeds k") {
    val agg = new BoundedMinK(4)
    var b = agg.zero
    (100L to 1L by -1L).foreach { i => b = agg.reduce(b, (i, i)); assert(b.length <= 4) }
    assert(b.map(_._1) == Seq(1L, 2L, 3L, 4L))
    val m = agg.merge(b, agg.reduce(agg.zero, (0L, 0L)))
    assert(m.map(_._1) == Seq(0L, 1L, 2L, 3L))
  }
}
