package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Materialized join view: the incremental refresh (ΔL ⋈ R_new ∪
  * L_old ⋈ ΔR over the two bases' CDC deltas) must equal a
  * from-scratch rebuild exactly — plus the append-only refusal
  * contract and the no-op fast path. Value parity of the driver face
  * is covered by the DuckDB oracle gate (catalog_mview_join). */
class MviewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fresh(tag: String): (String, String, String) = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mvj")
    val (o, c) = (s"graft.mvj.ord_$tag", s"graft.mvj.cst_$tag")
    val mv = s"graft.mvj.ord_${tag}_mvj_x"
    Seq(mv, o, c).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql(s"""CREATE TABLE $o (ok BIGINT, ck BIGINT, amt BIGINT)
                 |TBLPROPERTIES('keyCols'='ok', 'numRegions'='2')"""
      .stripMargin)
    spark.sql(s"""CREATE TABLE $c (ck BIGINT, seg STRING)
                 |TBLPROPERTIES('keyCols'='ck', 'numRegions'='2')"""
      .stripMargin)
    (o, c, mv)
  }

  private def rows(t: String): Set[(Long, Long, Long, String)] =
    spark.sql(s"SELECT ok, ck, amt, seg FROM $t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

  test("incremental refresh over both sides' deltas equals a rebuild") {
    val (o, c, mv) = fresh("inc")
    spark.sql(s"INSERT INTO $o VALUES (1, 10, 100), (2, 20, 200)")
    spark.sql(s"INSERT INTO $c VALUES (10, 'a'), (30, 'c')")
    spark.sql(s"CALL graft.sys.mview_join(left => 'mvj.ord_inc', " +
      "right => 'mvj.cst_inc', name => 'x', on => 'ck=ck')").collect()
    // both sides move: a new order hitting an old customer, a new
    // customer backfilling an old order, and a new-new pair
    spark.sql(s"INSERT INTO $o VALUES (3, 30, 300), (4, 20, 400)")
    spark.sql(s"INSERT INTO $c VALUES (20, 'b')")
    spark.sql("CALL graft.sys.mview_join_refresh(" +
      "view => 'mvj.ord_inc_mvj_x')").collect()
    val expect = Set((1L, 10L, 100L, "a"), (2L, 20L, 200L, "b"),
      (3L, 30L, 300L, "c"), (4L, 20L, 400L, "b"))
    assert(rows(mv) === expect)
    // a second refresh with no base movement appends nothing
    val before = spark.table(mv).count()
    val r = spark.sql("CALL graft.sys.mview_join_refresh(" +
      "view => 'mvj.ord_inc_mvj_x')").collect()(0)
    assert(r.getString(1) === "0")
    assert(spark.table(mv).count() === before)
  }

  test("a row-removing rewrite on either base refuses toward rebuild") {
    val (o, c, mv) = fresh("rw")
    spark.sql(s"INSERT INTO $o VALUES (1, 10, 100)")
    spark.sql(s"INSERT INTO $c VALUES (10, 'a')")
    spark.sql(s"CALL graft.sys.mview_join(left => 'mvj.ord_rw', " +
      "right => 'mvj.cst_rw', name => 'x', on => 'ck=ck')").collect()
    spark.sql(s"DELETE FROM $o WHERE ok = 1")
    val e = intercept[Exception](spark.sql(
      "CALL graft.sys.mview_join_refresh(view => 'mvj.ord_rw_mvj_x')")
      .collect())
    assert(e.getMessage.contains("rebuild with CALL graft.sys.mview_join"),
      e.getMessage)
    assert(spark.table(mv).count() === 1) // view untouched by the refusal
  }

  test("column name collisions between the sides refuse at build") {
    val (_, _, _) = fresh("col")
    // a second 'amt' on the right collides with the left's
    spark.sql("DROP TABLE IF EXISTS graft.mvj.cst2_col")
    spark.sql("""CREATE TABLE graft.mvj.cst2_col (ck BIGINT, amt BIGINT)
                |TBLPROPERTIES('keyCols'='ck', 'numRegions'='2')"""
      .stripMargin)
    val e = intercept[Exception](spark.sql(
      "CALL graft.sys.mview_join(left => 'mvj.ord_col', " +
        "right => 'mvj.cst2_col', name => 'x', on => 'ck=ck')").collect())
    assert(e.getMessage.contains("collision"), e.getMessage)
  }
}
