package graft.catalog

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized table-lifecycle property: arbitrary interleavings of
  * INSERT batches, range DELETEs (metadata drops + boundary rewrites),
  * compactions, row-level UPDATEs (group-based region rewrites), and
  * bounded MERGEs against an in-memory map model. This is the op mix
  * a long-lived 100 TB table actually sees; the invariants are that
  * contents always equal the model and that the manifest stays
  * self-consistent (unique stable ids, live files on disk, stats on
  * every region). */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("random insert/delete/compact/update/merge sequence matches " +
      "the map model") {
    Seq(20260813L, 4242L).foreach(run)
  }

  test("caught-up tailing stream sees every appended row exactly once " +
      "across random deletes and compactions") {
    val rnd = new Random(777L)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.life")
    spark.sql("DROP TABLE IF EXISTS graft.life.s")
    spark.sql(
      """CREATE TABLE graft.life.s (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='3')""".stripMargin)
    var appended = Set.empty[Long]
    var nextBase = 0L
    val q = spark.readStream.table("graft.life.s")
      .writeStream.format("memory").queryName("life_tail")
      .outputMode("append").start()
    try {
      (1 to 10).foreach { step =>
        rnd.nextInt(4) match {
          case 0 | 1 =>
            val n = 50 + rnd.nextInt(150)
            spark.sql(s"""INSERT INTO graft.life.s
              SELECT id, id * 1.0 FROM range($nextBase, ${nextBase + n})""")
            appended ++= (nextBase until nextBase + n)
            nextBase += n
          case 2 =>
            if (appended.nonEmpty) {
              val lo = rnd.nextInt(nextBase.toInt.max(1)).toLong
              spark.sql(s"DELETE FROM graft.life.s " +
                s"WHERE k >= $lo AND k <= ${lo + rnd.nextInt(200)}")
            }
          case 3 =>
            GraftCompact.compact(spark, "graft", "life", "s",
              1 + rnd.nextInt(2))
        }
        // the stream stays caught up, so it reads live originals only:
        // each appended key exactly once — deletes never retract from
        // the log, rewrites (srcMaxId-marked) never re-emit
        q.processAllAvailable()
        val seen = spark.table("life_tail").select("k").collect()
          .map(_.getLong(0))
        assert(seen.length == seen.distinct.length,
          s"step $step: stream emitted duplicates")
        assert(seen.toSet == appended,
          s"step $step: stream saw ${seen.length} keys, " +
            s"appended ${appended.size}")
      }
    } finally q.stop()
    spark.sql("DROP TABLE graft.life.s")
  }

  private def run(seed: Long): Unit = {
    val rnd = new Random(seed)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.life")
    spark.sql("DROP TABLE IF EXISTS graft.life.t")
    spark.sql(
      """CREATE TABLE graft.life.t (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='3')""".stripMargin)
    var model = Map.empty[Long, Double]
    var nextBase = 0L
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    def tdir = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("life"), "t")).asInstanceOf[GraftTable].tableDir

    (1 to 18).foreach { step =>
      rnd.nextInt(6) match {
        case 0 | 1 => // append a fresh batch (disjoint keys)
          val n = 100 + rnd.nextInt(300)
          spark.sql(s"""INSERT INTO graft.life.t
            SELECT id, id * 1.0 FROM range($nextBase, ${nextBase + n})""")
          model ++= (nextBase until nextBase + n).map(k => k -> k.toDouble)
          nextBase += n + rnd.nextInt(50)
        case 2 => // delete a random range (may straddle regions)
          if (model.nonEmpty) {
            val lo = model.keys.toSeq(rnd.nextInt(model.size))
            val hi = lo + rnd.nextInt(400)
            spark.sql(
              s"DELETE FROM graft.life.t WHERE k >= $lo AND k <= $hi")
            model = model.filterNot { case (k, _) => k >= lo && k <= hi }
          }
        case 3 => // compact into a few regions
          GraftCompact.compact(spark, "graft", "life", "t",
            1 + rnd.nextInt(3))
        case 4 => // row-level UPDATE over a random range
          if (model.nonEmpty) {
            val lo = model.keys.toSeq(rnd.nextInt(model.size))
            val hi = lo + rnd.nextInt(400)
            spark.sql(s"UPDATE graft.life.t SET v = v + 1000 " +
              s"WHERE k >= $lo AND k <= $hi")
            model = model.map { case (k, v) =>
              k -> (if (k >= lo && k <= hi) v + 1000 else v) }
          }
        case 5 => // bounded MERGE: matched update + not-matched insert
          // half the merges start inside the live key space so both
          // branches fire; model ++= is correct either way (matched
          // rows update to s.v, unmatched insert s.v — same mapping)
          val lo =
            if (model.nonEmpty && rnd.nextBoolean())
              model.keys.toSeq(rnd.nextInt(model.size))
            else nextBase + rnd.nextInt(200)
          val n = 50 + rnd.nextInt(100)
          val hi = lo + n - 1
          spark.sql(s"SELECT id AS k, -id * 1.0 AS v " +
            s"FROM range($lo, ${lo + n})")
            .createOrReplaceTempView("life_src")
          spark.sql(
            s"""MERGE INTO graft.life.t t USING life_src s
               |ON t.k = s.k AND t.k >= $lo AND t.k <= $hi
               |WHEN MATCHED THEN UPDATE SET v = s.v
               |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
              .stripMargin)
          model ++= (lo until lo + n).map(k => k -> -k.toDouble)
          nextBase = (hi + 1) max nextBase
      }
      // contents == model (all values are integer-valued doubles, so
      // the sums are IEEE-exact in any order)
      val got = spark.sql(
        """SELECT count(*) AS c, coalesce(sum(k), 0) AS s,
          |coalesce(sum(v), 0.0) AS sv FROM graft.life.t""".stripMargin)
        .head()
      assert(got.getLong(0) == model.size.toLong,
        s"step $step: count ${got.getLong(0)} != ${model.size}")
      assert(got.getLong(1) == model.keys.sum, s"step $step: key sum")
      assert(got.getDouble(2) == model.values.sum,
        s"step $step: value sum ${got.getDouble(2)} != ${model.values.sum}")
      // manifest self-consistency
      val st = TableMeta.loadState(tdir)
      val ids = (st.regions ++ st.retired).map(_.id)
      assert(ids.distinct.size == ids.size, s"step $step: duplicate ids")
      assert(st.regions.forall(r =>
        new java.io.File(tdir, r.file).isFile),
        s"step $step: missing live region file")
      assert(st.regions.forall(r => r.rows > 0 && r.stats.nonEmpty),
        s"step $step: empty or stat-less live region")
    }
    spark.sql("DROP TABLE graft.life.t")
  }
}
