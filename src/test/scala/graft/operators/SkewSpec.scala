package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Skew handling: salted join/aggregation equivalence with the plain
  * shapes, and AQE's runtime skew-join split engaging on a skewed
  * shuffle join (the two 100 TB answers to hot keys). */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 90% of fact rows hit one hot key
  private lazy val fact = {
    import spark.implicits._
    (0 until 20000).map { i =>
      (if (i % 10 == 0) (i % 100).toLong else 7L, i.toLong)
    }.toDF("k", "v")
  }
  private lazy val dim = {
    import spark.implicits._
    (0L until 100L).map(k => (k, s"d$k")).toDF("k", "name")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("salted join equals the plain join on a 90%-hot-key fact") {
    val plain = fact.join(dim, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "v", "name")
    assert(sortedRows(salted) == sortedRows(plain))
    // the dim side was replicated per salt, the fact side only salted
    assert(salted.columns.toSeq == Seq("k", "v", "name"))
  }

  test("salted aggregation equals the plain aggregation") {
    val plain = fact.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Skew.saltedAgg(fact, "k", saltFactor = 8,
      partial = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      merge = Seq(sum("pn").as("n"), sum("ps").as("s")))
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // both sides big enough to shuffle; fact is 90% one key
      val bigFact = fact.withColumn("pad", lit("x" * 64))
      val bigDim = dim.crossJoin(
        spark.range(200).select(col("id").as("rep")))
        .withColumn("pad2", lit("y" * 64))
      val joined = bigFact.join(bigDim, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkew=true") ||
        plan.contains("skewed"), s"AQE skew split did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
