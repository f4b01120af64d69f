package graft.catalog

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized-interleaving property for the materialized join view:
  * under ANY sequence of left/right appends with refreshes at random
  * points, the view equals the direct join of its bases after a final
  * refresh (Δ(L⋈R) = ΔL⋈R_new ∪ L_old⋈ΔR applied per refresh,
  * composed across arbitrarily many refresh windows). Fixed seed —
  * deterministic replay. Closes the gap the driver board exposed
  * between MviewJoinSpec's fixed two-batch scenario and arbitrary
  * batch interleavings (the GraftChangesSpec CDC-fuzz pattern). */
class MviewJoinFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("view == direct join under random append/refresh interleavings") {
    val rnd = new Random(20260816L)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mvjf")
    (0 until 5).foreach { round =>
      val (o, c) = (s"graft.mvjf.o_$round", s"graft.mvjf.c_$round")
      val mv = s"graft.mvjf.o_${round}_mvj_f"
      Seq(mv, o, c).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.sql(s"""CREATE TABLE $o (ok BIGINT, ck BIGINT, amt BIGINT)
                   |TBLPROPERTIES('keyCols'='ok', 'numRegions'='2')"""
        .stripMargin)
      spark.sql(s"""CREATE TABLE $c (ck BIGINT, seg STRING)
                   |TBLPROPERTIES('keyCols'='ck', 'numRegions'='2')"""
        .stripMargin)
      var nextOk = 0L
      var nextCk = 0L
      def insertLeft(): Unit = {
        val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
          nextOk += 1
          // order keys reference a window around the customers that
          // exist OR will exist, so deltas hit old, new and absent
          // customers
          s"($nextOk, ${rnd.nextInt(12)}, ${rnd.nextInt(1000)})"
        }
        spark.sql(s"INSERT INTO $o VALUES ${rows.mkString(", ")}")
      }
      def insertRight(): Unit = {
        val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
          nextCk += 1
          s"($nextCk, 'seg${rnd.nextInt(4)}')"
        }
        spark.sql(s"INSERT INTO $c VALUES ${rows.mkString(", ")}")
      }
      def refresh(): Unit =
        spark.sql(s"CALL graft.sys.mview_join_refresh(" +
          s"view => 'mvjf.o_${round}_mvj_f')").collect()
      // seed both sides, build the view, then a random op sequence
      insertLeft(); insertRight()
      spark.sql(s"CALL graft.sys.mview_join(left => 'mvjf.o_$round', " +
        s"right => 'mvjf.c_$round', name => 'f', on => 'ck=ck')")
        .collect()
      (0 until 6 + rnd.nextInt(5)).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => insertLeft()
          case 1 => insertRight()
          case 2 => insertLeft(); insertRight()
          case _ => refresh()
        }
      }
      refresh()
      val direct = spark.sql(
        s"""SELECT l.ok, l.ck, l.amt, r.seg FROM $o l
           |JOIN $c r ON l.ck = r.ck""".stripMargin)
      val view = spark.table(mv).select("ok", "ck", "amt", "seg")
      assert(view.exceptAll(direct).isEmpty &&
        direct.exceptAll(view).isEmpty,
        s"round $round: view diverged from the direct join")
      Seq(mv, o, c).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
