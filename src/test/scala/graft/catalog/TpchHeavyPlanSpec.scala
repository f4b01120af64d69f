package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CatalogQueries

/** Plan-shape evidence for the heavy TPC-H shapes (Q18 semi-join +
  * agg, Q21 exists/not-exists double self-correlation).
  *
  * At test scale AQE broadcasts everything (the right call); to prove
  * the 100-TB plan — where no fact side fits in memory — broadcasts
  * are disabled and the asserts pin the storage-partitioned property:
  * orders_t and lineitem_w_t share byte-identical orderkey splits, so
  * every join on the leading key (fact-fact, fact-self semi, fact-self
  * anti) must plan with NO shuffle Exchange on the orderkey. Only the
  * dim join (non-key column) and the final aggregation may shuffle. */
class TpchHeavyPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planNoBroadcast(name: String): String = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = CatalogQueries.queries(name)(spark, TestSpark.sfDir)
      df.collect()
      df.queryExecution.executedPlan.toString
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  private def orderkeyShuffles(plan: String): Seq[String] =
    plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("l_orderkey") || l.contains("o_orderkey"))).toSeq

  test("q18: no shuffle on the orderkey — fact joins and the semi " +
      "join ride the storage partitioning") {
    val plan = planNoBroadcast("catalog_tpch_q18")
    assert(plan.contains("TakeOrderedAndProject"), "top-100 shape")
    val bad = orderkeyShuffles(plan)
    assert(bad.isEmpty,
      s"orderkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("q10: the fact-fact join rides the orderkey storage " +
      "partitioning; top-20 plans as TakeOrderedAndProject") {
    val plan = planNoBroadcast("catalog_tpch_q10")
    assert(plan.contains("TakeOrderedAndProject"), "top-20 shape")
    val bad = orderkeyShuffles(plan)
    assert(bad.isEmpty,
      s"orderkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("q17: per-part avg, threshold join, AND the part-dim join all " +
      "ride the partkey storage partitioning — zero partkey Exchange") {
    val plan = planNoBroadcast("catalog_tpch_q17")
    val bad = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("l_partkey") || l.contains("p_partkey"))).toSeq
    assert(bad.isEmpty,
      s"partkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("q6: pure scan+aggregate — the shipdate/discount/quantity " +
      "filters reach the scan and no hash Exchange exists at all") {
    val plan = planNoBroadcast("catalog_tpch_q6")
    assert(plan.contains("l_shipdate"), s"pushed date filter:\n$plan")
    val bad = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(bad.isEmpty,
      s"hash shuffles in a scan+agg:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("q8: the 8-table star keeps the fact-fact join exchange-free " +
      "on the orderkey (dims may shuffle, the facts must not)") {
    val plan = planNoBroadcast("catalog_tpch_q8")
    val bad = orderkeyShuffles(plan)
    assert(bad.isEmpty,
      s"orderkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("q9: part+supplier+nation hang off the fact with zero " +
      "orderkey Exchange") {
    val plan = planNoBroadcast("catalog_tpch_q9")
    val bad = orderkeyShuffles(plan)
    assert(bad.isEmpty,
      s"orderkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("q21: both correlations fold into ONE shuffle-free fact pass") {
    val plan = planNoBroadcast("catalog_tpch_q21")
    val bad = orderkeyShuffles(plan)
    assert(bad.isEmpty,
      s"orderkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
    // the single-pass rewrite: exactly ONE lineitem scan (the EXISTS
    // form read the fact three times — semi + anti + probe), with the
    // per-(order,supplier) and per-order aggregations stacked above it
    // exchange-free, and the orders join storage-partitioned. AQE's
    // toString repeats the tree (final + initial), so count within the
    // final rendering only.
    val finalPlan = plan.indexOf("== Initial Plan ==") match {
      case -1 => plan
      case i => plan.substring(0, i)
    }
    assert(finalPlan.linesIterator
      .count(l => l.contains("BatchScan") && l.contains("lineitem_w_t"))
      == 1, s"expected a single fact scan:\n$plan")
    assert(!plan.contains("LeftSemi") && !plan.contains("LeftAnti"),
      s"correlations should be pre-aggregated, not joined:\n$plan")
  }

  test("q4: the correlated EXISTS plans as a storage-partitioned semi " +
      "join carrying the non-equi residual — zero orderkey Exchange") {
    val plan = planNoBroadcast("catalog_tpch_q4")
    assert(plan.contains("LeftSemi"), s"expected a semi join:\n$plan")
    // the ship-after-order correlation must ride the join as a
    // residual, not a post-join filter over a wider join
    assert(plan.contains("l_shipdate") && plan.contains("o_orderdate"))
    val bad = orderkeyShuffles(plan)
    assert(bad.isEmpty,
      s"orderkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("q7: the fact-fact join rides the orderkey storage " +
      "partitioning; dims join without touching the fact layout") {
    val plan = planNoBroadcast("catalog_tpch_q7")
    val bad = orderkeyShuffles(plan)
    assert(bad.isEmpty,
      s"orderkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("q19: the OR-of-triples join rides the partkey storage " +
      "partitioning — zero partkey Exchange") {
    val plan = planNoBroadcast("catalog_tpch_q19")
    val bad = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("l_partkey") || l.contains("p_partkey"))).toSeq
    assert(bad.isEmpty,
      s"partkey shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
  }

  test("catalog window: partitionBy on the leading key plans with NO " +
      "Exchange at all") {
    val df = CatalogQueries
      .queries("catalog_window_rank")(spark, graft.TestSpark.sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val bad = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(bad.isEmpty,
      s"window shuffles present:\n${bad.mkString("\n")}\n\nplan:\n$plan")
    assert(plan.contains("Window"), s"expected a Window exec:\n$plan")
  }
}
