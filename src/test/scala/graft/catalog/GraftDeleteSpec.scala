package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Region-aligned metadata-only DELETE ([[GraftDelete]]): whole
  * regions drop from the manifest with zero data IO; anything that
  * would partially match a region refuses loudly. */
class GraftDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def build(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.del")
    val fqn = s"graft.del.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    // fixed splits → regions at exactly 100/200/300
    spark.sql(
      s"""CREATE TABLE $fqn (k BIGINT, v DOUBLE)
         |TBLPROPERTIES('keyCols'='k', 'regionSplits'='100;200;300')"""
        .stripMargin)
    spark.sql(
      s"INSERT INTO $fqn SELECT id, id * 1.0 FROM range(400)")
    fqn
  }

  private def tableDir(name: String): java.io.File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("del"), name)).asInstanceOf[GraftTable].tableDir
  }

  test("split-aligned DELETE drops whole regions, no data IO") {
    val fqn = build("aligned")
    val before = TableMeta.loadRegions(tableDir("aligned"))
    assert(before.size == 4)
    val files = before.map(_.file).toSet
    spark.sql(s"DELETE FROM $fqn WHERE k < 100")
    assert(spark.table(fqn).count() == 300L)
    assert(spark.sql(s"SELECT min(k) FROM $fqn").head().getLong(0) == 100L)
    val after = TableMeta.loadRegions(tableDir("aligned"))
    assert(after.size == 3)
    // surviving region files are the ORIGINAL files — nothing rewritten
    assert(after.map(_.file).toSet.subsetOf(files))
    // deleted region retires (file kept one compaction cycle)
    val st = TableMeta.loadState(tableDir("aligned"))
    assert(st.retired.size == 1)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("DELETE with IN on split points and compound ranges") {
    val fqn = build("ranges")
    // two whole regions via an exact interval union
    spark.sql(s"DELETE FROM $fqn WHERE k >= 100 AND k < 200 OR k >= 300")
    assert(spark.table(fqn).count() == 200L)
    assert(spark.sql(s"SELECT collect_set(CAST(k / 100 AS INT)) FROM $fqn")
      .head().getSeq[Int](0).toSet == Set(0, 2))
    spark.sql(s"DROP TABLE $fqn")
  }

  test("boundary-straddling DELETE rewrites only the boundary region") {
    val fqn = build("straddle")
    val before = TableMeta.loadRegions(tableDir("straddle"))
    val untouchedFiles = before.filter(_.mins.head.nonEmpty)
      .map(_.file).toSet
    spark.sql(s"DELETE FROM $fqn WHERE k < 150")
    assert(spark.table(fqn).count() == 250L)
    assert(spark.sql(s"SELECT min(k) FROM $fqn").head().getLong(0) == 150L)
    val after = TableMeta.loadRegions(tableDir("straddle"))
    // region [0,100) dropped by metadata; [100,200) rewritten; the two
    // upper regions keep their ORIGINAL files — no table-wide rewrite
    assert(after.size == 3)
    val rewritten = after.filterNot(r => untouchedFiles.contains(r.file))
    assert(rewritten.size == 1 &&
      rewritten.head.file.startsWith("delete-rw-"))
    assert(rewritten.head.rows == 50L)
    // rewritten region carries fresh column stats
    assert(rewritten.head.stats.nonEmpty)
    // originals (dropped + replaced) retire for one cycle
    assert(TableMeta.loadState(tableDir("straddle")).retired.size == 2)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("DELETE strictly inside one region rewrites just that region") {
    val fqn = build("inside")
    spark.sql(s"DELETE FROM $fqn WHERE k >= 120 AND k < 130")
    assert(spark.table(fqn).count() == 390L)
    assert(spark.sql(
      s"SELECT count(*) FROM $fqn WHERE k BETWEEN 100 AND 199")
      .head().getLong(0) == 90L)
    val after = TableMeta.loadRegions(tableDir("inside"))
    assert(after.size == 4)
    assert(after.count(_.file.startsWith("delete-rw-")) == 1)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("non-key / inexact predicates leave the metadata path and " +
      "route to the row-level rewrite") {
    val fqn = build("nonkey")
    // canDeleteWhere refuses (not an exact key interval) — Spark falls
    // back to the group-based rewrite ([[GraftRowLevelOperation]])
    // instead of failing, and the answer is exact
    assert(!GraftDelete.exactIntervals(
      Seq(org.apache.spark.sql.sources.GreaterThan("v", 50.0)),
      TableMeta.load(tableDir("nonkey"))).isDefined)
    spark.sql(s"DELETE FROM $fqn WHERE v > 50.0")
    assert(spark.table(fqn).count() == 51L)
    assert(spark.sql(s"SELECT max(v) FROM $fqn").head().getDouble(0) <= 50.0)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("TRUNCATE via DELETE-all empties the table, files retire") {
    val fqn = build("trunc")
    spark.sql(s"DELETE FROM $fqn")
    assert(spark.table(fqn).count() == 0L)
    assert(TableMeta.loadRegions(tableDir("trunc")).isEmpty)
    assert(TableMeta.loadState(tableDir("trunc")).retired.size == 4)
    // table stays writable after truncate
    spark.sql(s"INSERT INTO $fqn VALUES (5, 5.0)")
    assert(spark.table(fqn).count() == 1L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("TRUNCATE TABLE statement routes through the metadata delete") {
    val fqn = build("trunc_sql")
    spark.sql(s"TRUNCATE TABLE $fqn")
    assert(spark.table(fqn).count() == 0L)
    assert(TableMeta.loadRegions(tableDir("trunc_sql")).isEmpty)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("randomized delete sequence matches a set model (rewrites of rewrites)") {
    val rnd = new scala.util.Random(20260813)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.del")
    spark.sql("DROP TABLE IF EXISTS graft.del.rand")
    spark.sql(
      """CREATE TABLE graft.del.rand (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='4')""".stripMargin)
    spark.sql(
      "INSERT INTO graft.del.rand SELECT id, id * 1.0 FROM range(2000)")
    var model = (0L until 2000L).toSet
    (1 to 6).foreach { i =>
      val (whereSql, pred): (String, Long => Boolean) = rnd.nextInt(4) match {
        case 0 =>
          val c = rnd.nextInt(2000); (s"k < $c", _ < c)
        case 1 =>
          val c = rnd.nextInt(2000); (s"k >= $c", _ >= c)
        case 2 =>
          val a = rnd.nextInt(2000); val b = a + rnd.nextInt(500)
          (s"k >= $a AND k <= $b", k => k >= a && k <= b)
        case 3 =>
          val vs = Seq.fill(5)(rnd.nextInt(2000).toLong)
          (s"k IN (${vs.mkString(",")})", vs.toSet.contains)
      }
      spark.sql(s"DELETE FROM graft.del.rand WHERE $whereSql")
      model = model.filterNot(pred)
      val got = spark.sql(
        "SELECT count(*) AS c, coalesce(sum(k), 0) AS s FROM graft.del.rand")
        .head()
      assert(got.getLong(0) == model.size.toLong,
        s"round $i ($whereSql): count ${got.getLong(0)} != ${model.size}")
      assert(got.getLong(1) == model.sum,
        s"round $i ($whereSql): sum mismatch")
    }
    spark.sql("DROP TABLE graft.del.rand")
  }

  test("tailing stream does not re-read rows kept by a boundary rewrite") {
    val fqn = build("stream_rw")
    val q = spark.readStream.table(fqn)
      .writeStream.format("memory").queryName("del_rw_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("del_rw_tail").count() == 400L)
      // straddling delete: region [100,200) rewritten with 50 kept rows
      spark.sql(s"DELETE FROM $fqn WHERE k < 150")
      spark.sql(s"INSERT INTO $fqn SELECT id, id * 1.0 FROM range(400, 420)")
      q.processAllAvailable()
      // only the 20 new rows arrive — the rewrite (srcMaxId-marked) is
      // NOT re-served to a stream that already consumed its original
      assert(spark.table("del_rw_tail").count() == 420L)
    } finally q.stop()
    spark.sql(s"DROP TABLE $fqn")
  }

  test("dedupKeys: precedence-unsafe boundary rewrite refuses loudly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.del")
    spark.sql("DROP TABLE IF EXISTS graft.del.dedup_rw")
    spark.sql(
      """CREATE TABLE graft.del.dedup_rw (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'regionSplits'='100;200;300',
        |              'graft.dedupKeys'='true')""".stripMargin)
    spark.sql("INSERT INTO graft.del.dedup_rw " +
      "SELECT id, 1.0 FROM range(400)")
    // newer version of k=150 in a later region: rewriting the [100,200)
    // boundary region would re-stamp its kept stale k=150 above it
    spark.sql("INSERT INTO graft.del.dedup_rw VALUES (150, 2.0)")
    val e = intercept[UnsupportedOperationException] {
      spark.sql("DELETE FROM graft.del.dedup_rw WHERE k < 120")
    }
    assert(e.getMessage.contains("_graft_region_id"))
    // the newer version still wins and nothing was deleted
    assert(spark.table("graft.del.dedup_rw").count() == 401L)
    // region-ALIGNED deletes stay available on dedupKeys tables
    spark.sql("DELETE FROM graft.del.dedup_rw WHERE k < 100")
    assert(spark.table("graft.del.dedup_rw").count() == 301L)
    // and a straddling delete of a range only the NEWEST region
    // overlaps is precedence-safe, so it is allowed... (the [300,400)
    // region is the highest-id region covering its range)
    spark.sql("DELETE FROM graft.del.dedup_rw WHERE k >= 350")
    assert(spark.table("graft.del.dedup_rw").count() == 251L)
    spark.sql("DROP TABLE graft.del.dedup_rw")
  }

  test("DELETE racing a concurrent INSERT loses neither (manifest lock)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.del")
    spark.sql("DROP TABLE IF EXISTS graft.del.race")
    spark.sql(
      """CREATE TABLE graft.del.race (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'regionSplits'='250;500;750')"""
        .stripMargin)
    spark.sql(
      "INSERT INTO graft.del.race SELECT id, id * 1.0 FROM range(1000)")
    val inserter = new Thread(() => {
      spark.sql(
        """INSERT INTO graft.del.race
          |SELECT id, id * 1.0 FROM range(2000, 2100)""".stripMargin)
    })
    inserter.start()
    spark.sql("DELETE FROM graft.del.race WHERE k < 250")
    inserter.join()
    // neither the delete nor the concurrent append lost its commit
    assert(spark.table("graft.del.race").count() == 750L + 100L)
    val mm = spark.sql(
      "SELECT min(k), max(k) FROM graft.del.race").head()
    assert(mm.getLong(0) == 250L && mm.getLong(1) == 2099L)
    spark.sql("DROP TABLE graft.del.race")
  }

  test("exactIntervals is EXACT: interval membership == predicate truth " +
      "(2000 random scenarios)") {
    // the catastrophic direction for DELETE is over-approximation
    // (dropping kept rows), so unlike the pruning property this checks
    // EQUIVALENCE, not one-sided soundness
    import org.apache.spark.sql.sources
    import org.apache.spark.sql.types._
    import graft.codec.KeyCodec
    val rnd = new scala.util.Random(99L)
    val meta = TableMeta(
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))),
      Seq("k"), Map.empty)
    def leaf(): sources.Filter = {
      val v = rnd.nextInt(100).toLong - 50
      rnd.nextInt(6) match {
        case 0 => sources.EqualTo("k", v)
        case 1 => sources.GreaterThan("k", v)
        case 2 => sources.GreaterThanOrEqual("k", v)
        case 3 => sources.LessThan("k", v)
        case 4 => sources.LessThanOrEqual("k", v)
        case 5 => sources.In("k",
          Array.fill(1 + rnd.nextInt(3))(rnd.nextInt(100).toLong - 50: Any))
      }
    }
    def pred(depth: Int): sources.Filter =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else if (rnd.nextBoolean()) sources.And(pred(depth - 1), pred(depth - 1))
      else sources.Or(pred(depth - 1), pred(depth - 1))
    def eval(f: sources.Filter, k: Long): Boolean = f match {
      case sources.And(l, r) => eval(l, k) && eval(r, k)
      case sources.Or(l, r) => eval(l, k) || eval(r, k)
      case sources.EqualTo(_, v) => k == v.asInstanceOf[Long]
      case sources.GreaterThan(_, v) => k > v.asInstanceOf[Long]
      case sources.GreaterThanOrEqual(_, v) => k >= v.asInstanceOf[Long]
      case sources.LessThan(_, v) => k < v.asInstanceOf[Long]
      case sources.LessThanOrEqual(_, v) => k <= v.asInstanceOf[Long]
      case sources.In(_, vs) => vs.contains(k)
      case other => fail(s"unexpected $other")
    }
    (1 to 2000).foreach { i =>
      val p = pred(3)
      val conjuncts: Seq[sources.Filter] =
        if (rnd.nextBoolean()) Seq(p) else Seq(p, leaf())
      GraftDelete.exactIntervals(conjuncts, meta).foreach { ivs =>
        (-60L to 60L).foreach { k =>
          val enc = KeyCodec.encode(LongType, k)
          val inSet = ivs.exists(_.overlaps(enc, enc))
          val truth = conjuncts.forall(eval(_, k))
          assert(inSet == truth,
            s"scenario $i: k=$k inSet=$inSet truth=$truth under " +
              s"$conjuncts (ivs=$ivs)")
        }
      }
    }
  }

  test("prefix DELETE on a string key (LIKE 'p%') is exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.del")
    spark.sql("DROP TABLE IF EXISTS graft.del.pfx")
    spark.sql(
      """CREATE TABLE graft.del.pfx (day STRING, n BIGINT)
        |TBLPROPERTIES('keyCols'='day', 'numRegions'='4')""".stripMargin)
    // date-prefixed string keys, the classic log layout
    spark.sql(
      """INSERT INTO graft.del.pfx
        |SELECT concat('2023-', lpad(CAST(id % 12 + 1 AS STRING), 2, '0'),
        |              '-', lpad(CAST(id AS STRING), 4, '0')), id
        |FROM range(1200)""".stripMargin)
    spark.sql("DELETE FROM graft.del.pfx WHERE day LIKE '2023-01%'")
    assert(spark.table("graft.del.pfx").count() == 1100L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.del.pfx WHERE day LIKE '2023-01%'")
      .head().getLong(0) == 0L)
    // other months intact
    assert(spark.sql(
      "SELECT count(*) FROM graft.del.pfx WHERE day LIKE '2023-02%'")
      .head().getLong(0) == 100L)
    spark.sql("DROP TABLE graft.del.pfx")
  }

  test("signed zeros on an fp key: DELETE treats -0.0 = 0.0 like SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.del")
    spark.sql("DROP TABLE IF EXISTS graft.del.fpz")
    spark.sql(
      """CREATE TABLE graft.del.fpz (k DOUBLE, n BIGINT)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='2')""".stripMargin)
    // KeyCodec orders enc(-0.0) < enc(0.0); SQL says they are equal
    spark.sql(
      """INSERT INTO graft.del.fpz VALUES
        |(-2.0D, 1), (-1.0D, 2), (CAST('-0.0' AS DOUBLE), 3),
        |(0.0D, 4), (1.0D, 5), (2.0D, 6)""".stripMargin)
    // k < 0.0 must KEEP the -0.0 row (SQL: -0.0 < 0.0 is false)
    spark.sql("DELETE FROM graft.del.fpz WHERE k < 0.0D")
    assert(spark.table("graft.del.fpz").count() == 4L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.del.fpz WHERE CAST(k AS STRING) = '-0.0'")
      .head().getLong(0) == 1L, "-0.0 row was wrongly deleted by k < 0.0")
    // k = 0.0 must delete BOTH zeros
    spark.sql("DELETE FROM graft.del.fpz WHERE k = 0.0D")
    val left = spark.table("graft.del.fpz").orderBy("k").collect()
    assert(left.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0))
    spark.sql("DROP TABLE graft.del.fpz")
  }

  test("signed-zero translator cases cover every comparison operator") {
    import org.apache.spark.sql.sources
    import org.apache.spark.sql.types._
    import graft.codec.KeyCodec
    val meta = TableMeta(
      StructType(Seq(StructField("k", DoubleType), StructField("v", LongType))),
      Seq("k"), Map.empty)
    val nz = KeyCodec.encode(DoubleType, -0.0d)
    val pz = KeyCodec.encode(DoubleType, 0.0d)
    def members(f: sources.Filter): (Boolean, Boolean) = {
      val ivs = GraftDelete.exactIntervals(Seq(f), meta).get
      (ivs.exists(_.overlaps(nz, nz)), ivs.exists(_.overlaps(pz, pz)))
    }
    // (in(-0.0), in(+0.0)) per operator — SQL treats the zeros equal
    assert(members(sources.EqualTo("k", 0.0d)) == ((true, true)))
    assert(members(sources.EqualTo("k", -0.0d)) == ((true, true)))
    assert(members(sources.LessThan("k", 0.0d)) == ((false, false)))
    assert(members(sources.LessThanOrEqual("k", -0.0d)) == ((true, true)))
    assert(members(sources.GreaterThan("k", -0.0d)) == ((false, false)))
    assert(members(sources.GreaterThanOrEqual("k", 0.0d)) == ((true, true)))
    assert(members(sources.In("k", Array(0.0d, 5.0d))) == ((true, true)))
    // non-zero bounds keep the zeros on the right side of the fence
    assert(members(sources.LessThan("k", 1.0d)) == ((true, true)))
    assert(members(sources.GreaterThan("k", -1.0d)) == ((true, true)))
    // NaN is exact WITHOUT special-casing: doubleToLongBits
    // canonicalizes every NaN at write AND in the translator, and the
    // canonical NaN encodes above +Infinity — matching Spark's
    // ordering (NaN largest, NaN = NaN)
    val nan = KeyCodec.encode(DoubleType, Double.NaN)
    val inf = KeyCodec.encode(DoubleType, Double.PositiveInfinity)
    def in(f: sources.Filter, enc: Array[Byte]): Boolean =
      GraftDelete.exactIntervals(Seq(f), meta).get
        .exists(_.overlaps(enc, enc))
    assert(in(sources.EqualTo("k", Double.NaN), nan))
    assert(!in(sources.EqualTo("k", Double.NaN), inf))
    // NaN > 5.0 is TRUE in Spark SQL: the open (5.0, inf) interval
    // must include the NaN encoding
    assert(in(sources.GreaterThan("k", 5.0d), nan))
    // nothing sorts above NaN
    assert(!in(sources.GreaterThan("k", Double.NaN), nan))
    // every non-NaN is < NaN; NaN itself is not
    assert(in(sources.LessThan("k", Double.NaN), inf))
    assert(!in(sources.LessThan("k", Double.NaN), nan))
  }

  test("key-grouped exchange-free plans survive a boundary rewrite") {
    val fqn = build("kg")
    spark.sql(s"DELETE FROM $fqn WHERE k < 150") // rewrites [100,200)
    val q = spark.sql(
      s"SELECT k, count(*) AS c FROM $fqn GROUP BY k")
    assert(q.collect().length == 250)
    val plan = q.queryExecution.executedPlan.toString
    // the rewritten region keeps its bucket, so the scan still reports
    // KeyGroupedPartitioning and the GROUP BY needs no shuffle
    assert(!plan.contains("Exchange"),
      s"expected exchange-free key groupBy after rewrite:\n$plan")
    spark.sql(s"DROP TABLE $fqn")
  }

  test("CALL graft.sys.vacuum purges retired files after a delete") {
    val fqn = build("vac")
    spark.sql(s"DELETE FROM $fqn WHERE k < 100")
    val st = TableMeta.loadState(tableDir("vac"))
    assert(st.retired.size == 1)
    val retiredFile = new java.io.File(tableDir("vac"), st.retired.head.file)
    assert(retiredFile.isFile)
    // crash artifact: a writeAtomic that died between write and move.
    // The sweep is AGE-GATED (a lock-free `cas` committer may own a
    // fresh in-flight tmp), so a real crash leftover is old — backdate
    // it past the gate; a fresh tmp must survive the sweep.
    val orphanTmp = new java.io.File(tableDir("vac"),
      TableMeta.RegionsFile + ".tmp")
    java.nio.file.Files.write(orphanTmp.toPath, "{}".getBytes)
    orphanTmp.setLastModified(System.currentTimeMillis() - 7200_000L)
    val freshTmp = new java.io.File(tableDir("vac"),
      TableMeta.RegionsFile + ".inflight.tmp")
    java.nio.file.Files.write(freshTmp.toPath, "{}".getBytes)
    val out = spark.sql("CALL graft.sys.vacuum(table => 'del.vac')")
      .collect()
    assert(out.head.getString(0) == "2") // retired file + OLD orphan tmp
    assert(!retiredFile.isFile)
    assert(!orphanTmp.isFile, "vacuum must sweep old .tmp crash leftovers")
    assert(freshTmp.isFile,
      "a fresh tmp (possibly a live lock-free writer's) must survive")
    freshTmp.delete()
    assert(TableMeta.loadState(tableDir("vac")).retired.isEmpty)
    assert(spark.table(fqn).count() == 300L) // live data untouched
    spark.sql(s"DROP TABLE $fqn")
  }

  test("tailing stream skips deleted region ids without failing") {
    val fqn = build("stream")
    val q = spark.readStream.table(fqn)
      .writeStream.format("memory").queryName("del_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("del_tail").count() == 400L)
      spark.sql(s"DELETE FROM $fqn WHERE k < 100")
      spark.sql(s"INSERT INTO $fqn SELECT id, id * 1.0 FROM range(400, 450)")
      q.processAllAvailable() // deleted ids just vanish from the log
      assert(spark.table("del_tail").count() == 450L)
    } finally q.stop()
    spark.sql(s"DROP TABLE $fqn")
  }
}
