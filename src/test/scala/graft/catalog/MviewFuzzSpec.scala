package graft.catalog

import java.io.File

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized-interleaving property for the SINGLE-base materialized
  * view (the join-view counterpart is [[MviewJoinFuzzSpec]]): under any
  * sequence of appends, refreshes, and refresh CRASHES (intent written
  * but insert lost, and insert landed but watermark lost — the two
  * windows of the pending-intent protocol), the rewrite-accelerated
  * answers equal the base recomputation, and the stored KLL/HLL sketch
  * partials merge across the randomized batch boundaries to estimates
  * within their published error bounds. Fixed seed — deterministic
  * replay. */
class MviewFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def warehouse: String =
    spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def dir(ns: String, t: String): File =
    new File(new File(warehouse, ns), t)

  private def setProp(fqn: String, k: String, v: String): Unit =
    spark.sql(s"ALTER TABLE $fqn SET TBLPROPERTIES('$k'='$v')")

  test("mview == base recompute under random append/refresh/crash " +
      "interleavings; sketch partials merge within bounds") {
    val rnd = new Random(20260817L)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mvf")
    (0 until 4).foreach { round =>
      val short = s"mvf.t_$round"
      val t = s"graft.$short"
      val mv = s"graft.mvf.t_${round}_mv_g"
      val mvDir = dir("mvf", s"t_${round}_mv_g")
      val baseDir = dir("mvf", s"t_$round")
      Seq(mv, t).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
      spark.sql(s"""CREATE TABLE $t (k BIGINT, g STRING, x BIGINT)
                   |TBLPROPERTIES('keyCols'='k', 'numRegions'='2')"""
        .stripMargin)
      var nextK = 0L
      def insert(): Unit = {
        val rows = (0 until 1 + rnd.nextInt(5)).map { _ =>
          nextK += 1
          val g = s"g${rnd.nextInt(4)}"
          // x occasionally NULL: count(*) vs the sketches' null-skip
          // must stay coherent across refresh boundaries
          val x = if (rnd.nextInt(9) == 0) "NULL"
                  else rnd.nextInt(1000).toString
          s"($nextK, '$g', $x)"
        }
        spark.sql(s"INSERT INTO $t VALUES ${rows.mkString(", ")}")
      }
      def refresh(): Unit =
        spark.sql(s"CALL graft.sys.mview_refresh(table => '$short', " +
          "name => 'g')").collect()
      // crash flavor A: intent written, the partials INSERT never ran.
      // A REAL refresh recovers any prior pending intent before writing
      // its own — so only simulate this crash from a clean state, or
      // the fabricated overwrite would encode an unreachable state
      // (prior landed partials + an intent whose recorded version is
      // already past them → recovery re-derives and double-counts).
      def crashPreInsert(): Unit =
        if (!TableMeta.load(mvDir).properties
            .contains(TableMeta.MviewPendingProp))
          setProp(mv, TableMeta.MviewPendingProp,
            s"${TableMeta.currentVersion(baseDir)}:" +
              s"${TableMeta.currentVersion(mvDir)}")
      // crash flavor B: partials landed, watermark advance lost —
      // run a real refresh, then rewind to the crashed state
      def crashPostInsert(): Unit = {
        val wmOld =
          TableMeta.load(mvDir).properties(TableMeta.MviewVersionProp)
        val vBefore = TableMeta.currentVersion(mvDir)
        refresh()
        val wmNew =
          TableMeta.load(mvDir).properties(TableMeta.MviewVersionProp)
        if (TableMeta.currentVersion(mvDir) > vBefore && wmNew != wmOld) {
          setProp(mv, TableMeta.MviewVersionProp, wmOld)
          setProp(mv, TableMeta.MviewPendingProp, s"$wmNew:$vBefore")
        }
      }
      def exactParity(): Unit = {
        def rows() = spark.sql(
          s"""SELECT g, count(*) AS c, sum(x) AS s, min(x) AS lo,
             |       max(x) AS hi FROM $t GROUP BY g""".stripMargin)
          .collect().map(_.toString).sorted.toSeq
        val on = rows()
        spark.conf.set("spark.graft.accel.mviewRewrite", "false")
        val off = try rows()
          finally spark.conf.set("spark.graft.accel.mviewRewrite", "true")
        assert(on === off,
          s"round $round: rewrite diverged from base recompute")
      }

      insert()
      spark.sql(s"CALL graft.sys.mview(table => '$short', name => 'g', " +
        "group_by => 'g', aggs => " +
        "'sum:x;count:*;min:x;max:x;hll:x;kll:x')").collect()
      (0 until 7 + rnd.nextInt(4)).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 | 1 => insert()
          case 2     => insert(); insert()
          case 3     => refresh(); exactParity()
          case 4     => crashPreInsert(); exactParity()
          case _     => crashPostInsert(); exactParity()
        }
      }
      refresh()
      exactParity()

      // sketch partials: merged across every randomized batch boundary
      // (and through the crash-recovery paths), the estimates must hit
      // their bounds vs the exact recomputation per group
      val est = spark.sql(
        s"""SELECT g,
           |       CAST(hll_sketch_estimate(hll_union_agg(hll_x))
           |            AS DOUBLE) AS nd,
           |       kll_get_quantile(kll_union_agg(kll_x), 0.5D) AS med
           |FROM $mv GROUP BY g""".stripMargin)
        .collect().map(r => r.getString(0) ->
          (Option(r.get(1)).fold(0.0)(_.asInstanceOf[Double]),
            Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap
      val exact = spark.sql(
        s"""SELECT g, count(DISTINCT x) AS nd, sort_array(collect_list(x))
           |FROM $t WHERE x IS NOT NULL GROUP BY g""".stripMargin)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getSeq[Long](2))).toMap
      exact.foreach { case (g, (nd, sorted)) =>
        val (ndEst, medEst) = est(g)
        assert(math.abs(ndEst - nd) <= math.max(1.0, 0.05 * nd),
          s"round $round group $g: HLL estimate $ndEst vs exact $nd")
        val med = medEst.getOrElse(fail(s"group $g: NULL kll median"))
        // rank gate, not value: the estimate's rank in the exact
        // sorted values must sit within 5% of the 0.5 target (KLL
        // k=200 guarantees ~1.65%; these groups are far below k, so
        // the merged sketch is lossless — the slack covers ties)
        val n = sorted.size
        val below = sorted.count(_ <= med).toDouble
        assert(med >= sorted.head && med <= sorted.last &&
          math.abs(below / n - 0.5) <= 0.05 + 1.0 / n,
          s"round $round group $g: KLL median $med rank ${below / n}")
      }
      Seq(mv, t).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }
}
