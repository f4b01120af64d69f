package graft.catalog

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Crash-safety of the mview refresh write protocol
  * ([[TableMeta.MviewPendingProp]]): a refresh killed at ANY point
  * between its write-ahead intent and its watermark advance must
  * neither lose nor double-count the delta — at read time (the
  * rewrite's effective watermark) and at the next refresh call
  * (recoverPending). Each crash state is reconstructed mechanically
  * by rewinding the view's properties to what the killed process
  * would have left behind. */
class MviewCrashRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def warehouse: String =
    spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def dir(ns: String, t: String): File =
    new File(new File(warehouse, ns), t)

  private def setProp(fqn: String, k: String, v: String): Unit =
    spark.sql(s"ALTER TABLE $fqn SET TBLPROPERTIES('$k'='$v')")

  // ---------------------------------------------------------------
  // single-base mview
  // ---------------------------------------------------------------

  private def freshAgg(tag: String): (String, String) = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mvc")
    val t = s"graft.mvc.t_$tag"
    val mv = s"graft.mvc.t_${tag}_mv_g"
    Seq(mv, t).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    spark.sql(s"""CREATE TABLE $t (k BIGINT, g STRING, x BIGINT)
                 |TBLPROPERTIES('keyCols'='k', 'numRegions'='2')"""
      .stripMargin)
    (t, mv)
  }

  private def agg(t: String): Seq[String] =
    spark.sql(s"""SELECT g, count(*) AS c, sum(x) AS s, min(x) AS lo,
                 |       max(x) AS hi FROM $t GROUP BY g""".stripMargin)
      .collect().map(_.toString).sorted.toSeq

  private def direct(t: String): Seq[String] = {
    spark.conf.set("spark.graft.accel.mviewRewrite", "false")
    try agg(t)
    finally spark.conf.set("spark.graft.accel.mviewRewrite", "true")
  }

  test("killed after the partials INSERT, before the watermark " +
      "advance: reads use the intent's target, refresh recovers " +
      "without re-appending") {
    val (t, mv) = freshAgg("postins")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10), (2,'b',20)")
    spark.sql("CALL graft.sys.mview(table => 'mvc.t_postins', " +
      "name => 'g', group_by => 'g', aggs => 'sum:x;count:*;min:x;max:x')")
      .collect()
    spark.sql(s"INSERT INTO $t VALUES (3,'a',5), (4,'c',40)")
    val mvDir = dir("mvc", "t_postins_mv_g")
    val wmOld = TableMeta.load(mvDir).properties(TableMeta.MviewVersionProp)
    val vBefore = TableMeta.currentVersion(mvDir)
    spark.sql("CALL graft.sys.mview_refresh(table => 'mvc.t_postins', " +
      "name => 'g')").collect()
    assert(TableMeta.currentVersion(mvDir) > vBefore) // partials landed
    val wmNew = TableMeta.load(mvDir).properties(TableMeta.MviewVersionProp)
    // rewind to the crash state: watermark stale, intent present,
    // partials already appended
    setProp(mv, TableMeta.MviewVersionProp, wmOld)
    setProp(mv, TableMeta.MviewPendingProp, s"$wmNew:$vBefore")
    // read-time: the effective watermark is the intent's target — the
    // already-appended delta must NOT be unioned a second time
    assert(agg(t) === direct(t))
    // refresh-time: recovery advances the watermark and appends nothing
    val rowsBefore = spark.table(mv).count()
    val r = spark.sql("CALL graft.sys.mview_refresh(" +
      "table => 'mvc.t_postins', name => 'g')").collect()(0)
    assert(r.getString(1) === "0")
    assert(spark.table(mv).count() === rowsBefore)
    val p = TableMeta.load(mvDir).properties
    assert(p(TableMeta.MviewVersionProp) === wmNew)
    assert(!p.contains(TableMeta.MviewPendingProp))
    assert(agg(t) === direct(t))
  }

  test("killed after the intent, before the partials INSERT: the " +
      "intent is rolled back and the delta applied exactly once") {
    val (t, mv) = freshAgg("preins")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10), (2,'b',20)")
    spark.sql("CALL graft.sys.mview(table => 'mvc.t_preins', " +
      "name => 'g', group_by => 'g', aggs => 'sum:x;count:*;min:x;max:x')")
      .collect()
    spark.sql(s"INSERT INTO $t VALUES (3,'a',5)")
    val mvDir = dir("mvc", "t_preins_mv_g")
    val base = dir("mvc", "t_preins")
    val now = TableMeta.currentVersion(base)
    // crash state: intent written, insert never ran
    setProp(mv, TableMeta.MviewPendingProp,
      s"$now:${TableMeta.currentVersion(mvDir)}")
    // read-time: content matches the stamped watermark exactly — the
    // stale-repair union stays correct
    assert(agg(t) === direct(t))
    // refresh-time: the intent clears and the delta lands exactly once
    val rowsBefore = spark.table(mv).count()
    val r = spark.sql("CALL graft.sys.mview_refresh(" +
      "table => 'mvc.t_preins', name => 'g')").collect()(0)
    assert(r.getString(1).toLong > 0)
    assert(spark.table(mv).count() > rowsBefore)
    val p = TableMeta.load(mvDir).properties
    assert(p(TableMeta.MviewVersionProp).toLong === now)
    assert(!p.contains(TableMeta.MviewPendingProp))
    assert(agg(t) === direct(t))
    // idempotence: one more refresh is a no-op
    val r2 = spark.sql("CALL graft.sys.mview_refresh(" +
      "table => 'mvc.t_preins', name => 'g')").collect()(0)
    assert(r2.getString(1) === "0")
    assert(agg(t) === direct(t))
  }

  // ---------------------------------------------------------------
  // materialized join view
  // ---------------------------------------------------------------

  test("join view killed after the delta INSERT, before the watermark " +
      "advance: refresh recovers without re-appending") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mvc")
    val (o, c) = ("graft.mvc.jo", "graft.mvc.jc")
    val mv = "graft.mvc.jo_mvj_x"
    Seq(mv, o, c).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    spark.sql(s"""CREATE TABLE $o (ok BIGINT, ck BIGINT, amt BIGINT)
                 |TBLPROPERTIES('keyCols'='ok', 'numRegions'='2')"""
      .stripMargin)
    spark.sql(s"""CREATE TABLE $c (ck BIGINT, seg STRING)
                 |TBLPROPERTIES('keyCols'='ck', 'numRegions'='2')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $o VALUES (1,10,100), (2,20,200)")
    spark.sql(s"INSERT INTO $c VALUES (10,'a'), (30,'c')")
    spark.sql("CALL graft.sys.mview_join(left => 'mvc.jo', " +
      "right => 'mvc.jc', name => 'x', on => 'ck=ck')").collect()
    val mvDir = dir("mvc", "jo_mvj_x")
    val p0 = TableMeta.load(mvDir).properties
    val (wL0, wR0) = (p0(TableMeta.MviewJoinLeftVerProp),
      p0(TableMeta.MviewJoinRightVerProp))
    spark.sql(s"INSERT INTO $o VALUES (3,30,300)")
    spark.sql(s"INSERT INTO $c VALUES (20,'b')")
    val vBefore = TableMeta.currentVersion(mvDir)
    spark.sql("CALL graft.sys.mview_join_refresh(view => 'mvc.jo_mvj_x')")
      .collect()
    assert(TableMeta.currentVersion(mvDir) > vBefore)
    val p1 = TableMeta.load(mvDir).properties
    val (wL1, wR1) = (p1(TableMeta.MviewJoinLeftVerProp),
      p1(TableMeta.MviewJoinRightVerProp))
    // rewind to the crash state
    setProp(mv, TableMeta.MviewJoinLeftVerProp, wL0)
    setProp(mv, TableMeta.MviewJoinRightVerProp, wR0)
    setProp(mv, TableMeta.MviewPendingProp, s"$wL1;$wR1:$vBefore")
    val rowsBefore = spark.table(mv).count()
    val r = spark.sql("CALL graft.sys.mview_join_refresh(" +
      "view => 'mvc.jo_mvj_x')").collect()(0)
    assert(r.getString(1) === "0")
    assert(spark.table(mv).count() === rowsBefore)
    val p2 = TableMeta.load(mvDir).properties
    assert(p2(TableMeta.MviewJoinLeftVerProp) === wL1)
    assert(p2(TableMeta.MviewJoinRightVerProp) === wR1)
    assert(!p2.contains(TableMeta.MviewPendingProp))
    // content equals the direct join exactly
    val direct = spark.sql(
      s"""SELECT l.ok, l.ck, l.amt, r.seg FROM $o l
         |JOIN $c r ON l.ck = r.ck""".stripMargin)
    val view = spark.table(mv).select("ok", "ck", "amt", "seg")
    assert(view.exceptAll(direct).isEmpty && direct.exceptAll(view).isEmpty)
  }

  test("join view killed after the intent, before the delta INSERT: " +
      "the intent rolls back and the delta lands exactly once") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mvc")
    val (o, c) = ("graft.mvc.ko", "graft.mvc.kc")
    val mv = "graft.mvc.ko_mvj_x"
    Seq(mv, o, c).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    spark.sql(s"""CREATE TABLE $o (ok BIGINT, ck BIGINT, amt BIGINT)
                 |TBLPROPERTIES('keyCols'='ok', 'numRegions'='2')"""
      .stripMargin)
    spark.sql(s"""CREATE TABLE $c (ck BIGINT, seg STRING)
                 |TBLPROPERTIES('keyCols'='ck', 'numRegions'='2')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $o VALUES (1,10,100)")
    spark.sql(s"INSERT INTO $c VALUES (10,'a')")
    spark.sql("CALL graft.sys.mview_join(left => 'mvc.ko', " +
      "right => 'mvc.kc', name => 'x', on => 'ck=ck')").collect()
    spark.sql(s"INSERT INTO $o VALUES (2,10,200)")
    val mvDir = dir("mvc", "ko_mvj_x")
    val vL = TableMeta.currentVersion(dir("mvc", "ko"))
    val vR = TableMeta.currentVersion(dir("mvc", "kc"))
    setProp(mv, TableMeta.MviewPendingProp,
      s"$vL;$vR:${TableMeta.currentVersion(mvDir)}")
    val r = spark.sql("CALL graft.sys.mview_join_refresh(" +
      "view => 'mvc.ko_mvj_x')").collect()(0)
    assert(r.getString(1).toLong === 1L)
    val direct = spark.sql(
      s"""SELECT l.ok, l.ck, l.amt, r.seg FROM $o l
         |JOIN $c r ON l.ck = r.ck""".stripMargin)
    val view = spark.table(mv).select("ok", "ck", "amt", "seg")
    assert(view.exceptAll(direct).isEmpty && direct.exceptAll(view).isEmpty)
    assert(!TableMeta.load(mvDir).properties
      .contains(TableMeta.MviewPendingProp))
  }

  test("a maintenance commit after a pre-INSERT crash does not fool " +
      "recovery into skipping the delta") {
    val (t, mv) = freshAgg("compact")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10), (2,'b',20)")
    spark.sql("CALL graft.sys.mview(table => 'mvc.t_compact', " +
      "name => 'g', group_by => 'g', aggs => 'sum:x;count:*;min:x;max:x')")
      .collect()
    spark.sql(s"INSERT INTO $t VALUES (3,'a',5), (4,'c',40)")
    val mvDir = dir("mvc", "t_compact_mv_g")
    val base = dir("mvc", "t_compact")
    val now = TableMeta.currentVersion(base)
    // crash state: intent written, the partials INSERT never ran
    setProp(mv, TableMeta.MviewPendingProp,
      s"$now:${TableMeta.currentVersion(mvDir)}")
    // an operator compacts the VIEW before the next refresh — the
    // manifest version bumps without any delta rows landing; a bare
    // version comparison would call the insert "landed" and advance
    // the watermark past a delta that was never applied
    spark.sql("CALL graft.sys.compact(table => 'mvc.t_compact_mv_g', " +
      "target_regions => 1)").collect()
    val r = spark.sql("CALL graft.sys.mview_refresh(" +
      "table => 'mvc.t_compact', name => 'g')").collect()(0)
    assert(r.getString(1).toLong > 0,
      "the delta must be applied, not skipped")
    assert(agg(t) === direct(t))
    assert(!TableMeta.load(mvDir).properties
      .contains(TableMeta.MviewPendingProp))
  }

  test("a malformed refresh intent disables the mview acceleration " +
      "instead of serving a wrong answer") {
    val (t, mv) = freshAgg("badpend")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10)")
    spark.sql("CALL graft.sys.mview(table => 'mvc.t_badpend', " +
      "name => 'g', group_by => 'g', aggs => 'sum:x;count:*')").collect()
    setProp(mv, TableMeta.MviewPendingProp, "not-a-version")
    // the base scan answers (correct by construction)
    assert(agg(t) === direct(t))
  }
}
