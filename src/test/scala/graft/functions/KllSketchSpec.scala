package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** KLL quantile sketch surface: accuracy of build/readout, lossless-
  * within-bound merge of stored partials, NULL semantics, and the SQL
  * registration. KLL compaction is randomized, so every assertion is
  * a RANK-tolerance gate (k=200 ⇒ normalized rank error ~1.65% at
  * 99% confidence; 5% is a never-flakes envelope), never a byte or
  * exact-value compare. */
class KllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sketch quantiles land within rank tolerance of exact") {
    val df = spark.sql(
      """SELECT kll_get_quantile(kll_sketch_agg(CAST(id AS DOUBLE)), 0.5D)
        |         AS p50,
        |       kll_get_quantile(kll_sketch_agg(CAST(id AS DOUBLE)), 0.95D)
        |         AS p95
        |FROM range(100000)""".stripMargin).collect()(0)
    // uniform 0..99999: value tolerance == rank tolerance * 100000
    assert(math.abs(df.getDouble(0) - 50000.0) <= 5000.0)
    assert(math.abs(df.getDouble(1) - 95000.0) <= 5000.0)
  }

  test("union of per-group partials matches a direct whole-data sketch " +
      "within tolerance") {
    spark.sql(
      """SELECT id % 16 AS g, kll_sketch_agg(CAST(id AS DOUBLE)) AS sk
        |FROM range(100000) GROUP BY id % 16""".stripMargin)
      .createOrReplaceTempView("kll_parts")
    val merged = spark.sql(
      "SELECT kll_get_quantile(kll_union_agg(sk), 0.5D) FROM kll_parts")
      .collect()(0).getDouble(0)
    assert(math.abs(merged - 50000.0) <= 5000.0,
      s"merged median drifted: $merged")
  }

  test("NULL semantics: null inputs ignored, empty sketch reads NULL") {
    val r = spark.sql(
      """SELECT kll_get_quantile(
        |         kll_sketch_agg(CAST(NULL AS DOUBLE)), 0.5D) AS q,
        |       kll_get_quantile(CAST(NULL AS BINARY), 0.5D) AS qn
        |FROM range(10)""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("non-default k is honored (larger k, tighter estimates allowed)") {
    val v = spark.sql(
      """SELECT kll_get_quantile(
        |  kll_sketch_agg(CAST(id AS DOUBLE), 400), 0.5D)
        |FROM range(100000)""".stripMargin).collect()(0).getDouble(0)
    assert(math.abs(v - 50000.0) <= 3000.0)
  }

  test("kll_union_agg without k adopts the stored sketches' k") {
    spark.sql(
      """SELECT id % 4 AS g, kll_sketch_agg(CAST(id AS DOUBLE), 400) AS sk
        |FROM range(50000) GROUP BY id % 4""".stripMargin)
      .createOrReplaceTempView("kll_k400_parts")
    // round-trip through BINARY and the no-k union: the merged sketch
    // must report k=400, not the k=200 default (silent degradation)
    val bytes = spark.sql(
      "SELECT kll_union_agg(sk) FROM kll_k400_parts")
      .collect()(0).getAs[Array[Byte]](0)
    assert(KllExpressions.heapify(bytes).getK == 400,
      "no-k union degraded stored k=400 partials")
  }

  test("p accepts an undecorated decimal literal and rejects " +
      "out-of-range") {
    // 0.5 parses as DECIMAL(1,1): the registration's double cast must
    // make this analyzable (ADVICE r11)
    val v = spark.sql(
      """SELECT kll_get_quantile(kll_sketch_agg(CAST(id AS DOUBLE)), 0.5)
        |FROM range(1000)""".stripMargin).collect()(0).getDouble(0)
    assert(v >= 0 && v <= 999)
    val e = intercept[Exception] {
      spark.sql(
        """SELECT kll_get_quantile(kll_sketch_agg(CAST(id AS DOUBLE)),
          |                        1.5D)
          |FROM range(10)""".stripMargin).collect()
    }
    assert(e.getMessage != null)
  }

  test("k is validated at registration with a named error") {
    val e = intercept[Exception] {
      spark.sql(
        """SELECT kll_sketch_agg(CAST(id AS DOUBLE), 4) FROM range(10)"""
      ).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("[8, 65535]")),
      s"expected a range-named error, got: ${msgs(e).mkString(" | ")}")
  }
}
