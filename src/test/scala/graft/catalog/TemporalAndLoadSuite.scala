package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Reference golden behaviors for temporal key columns and nullable
  * CSV bulk load (/root/reference HBaseBasicOperationSuite.scala:41-81,
  * HBaseBulkLoadIntoTableSuite.scala:173-277). Each single-row INSERT
  * commits its own region file, so these also exercise manifest growth
  * across commits and scans that merge many tiny regions. */
class TemporalAndLoadSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("DateType key: range predicates and order by over encoded dates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.date_table")
    spark.sql(
      """CREATE TABLE graft.op.date_table (c1 DATE, c2 DATE)
        |TBLPROPERTIES('keyCols'='c1', 'nonKeyCols'='c2,f,c')""".stripMargin)
    spark.sql("INSERT INTO graft.op.date_table VALUES " +
      "(DATE'2010-12-31', DATE'2010-01-01')")
    spark.sql("INSERT INTO graft.op.date_table VALUES " +
      "(DATE'2011-12-31', DATE'2011-01-01')")
    spark.sql("INSERT INTO graft.op.date_table VALUES " +
      "(DATE'2012-12-31', DATE'2012-01-01')")

    val r1 = spark.sql("SELECT * FROM graft.op.date_table " +
      "WHERE c1 < CAST('2012-12-31' AS DATE) ORDER BY c2 DESC").collect()
    assert(r1.length == 2)

    val r2 = spark.sql(
      "SELECT date_format(c1, 'yyyy-MM-dd') AS d1, " +
        "date_format(c2, 'yyyy-MM-dd') AS d2 FROM graft.op.date_table " +
        "WHERE c2 < CAST('2012-01-01' AS DATE) ORDER BY c2 DESC").collect()
    assert(r2.length == 2)
    assert(r2(0).getString(0) == "2011-12-31" &&
      r2(0).getString(1) == "2011-01-01")
    assert(r2(1).getString(0) == "2010-12-31" &&
      r2(1).getString(1) == "2010-01-01")
    spark.sql("DROP TABLE graft.op.date_table")
  }

  test("TimestampType key: range predicates and order by over µs keys") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.ts_table")
    spark.sql(
      """CREATE TABLE graft.op.ts_table (c1 TIMESTAMP, c2 TIMESTAMP)
        |TBLPROPERTIES('keyCols'='c1', 'nonKeyCols'='c2,f,c')""".stripMargin)
    Seq("2009", "2010", "2011").foreach { y =>
      spark.sql(s"INSERT INTO graft.op.ts_table VALUES " +
        s"(TIMESTAMP'$y-08-07 03:14:15', TIMESTAMP'$y-08-07 13:14:15')")
    }
    val r1 = spark.sql("SELECT * FROM graft.op.ts_table " +
      "WHERE c1 < CAST('2011-08-07 03:14:15' AS TIMESTAMP) " +
      "ORDER BY c2 DESC").collect()
    assert(r1.length == 2)
    val r2 = spark.sql(
      "SELECT date_format(c1, 'yyyy-MM-dd HH:mm:ss') AS t1, " +
        "date_format(c2, 'yyyy-MM-dd HH:mm:ss') AS t2 " +
        "FROM graft.op.ts_table " +
        "WHERE c2 < CAST('2011-08-07 13:14:15' AS TIMESTAMP) " +
        "ORDER BY c2 DESC").collect()
    assert(r2.length == 2)
    assert(r2(0).getString(0) == "2010-08-07 03:14:15")
    assert(r2(0).getString(1) == "2010-08-07 13:14:15")
    assert(r2(1).getString(0) == "2009-08-07 03:14:15")
    assert(r2(1).getString(1) == "2009-08-07 13:14:15")
    spark.sql("DROP TABLE graft.op.ts_table")
  }

  test("non-UTC session zone: columnar catalog scan keeps the instant") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.ts_zone")
    spark.sql(
      """CREATE TABLE graft.op.ts_zone (k INT, t TIMESTAMP)
        |TBLPROPERTIES('keyCols'='k', 'nonKeyCols'='t,f,c')""".stripMargin)
    // instant fixed under UTC, then re-read under a half-hour-offset
    // zone: TIMESTAMP is instant-typed, so a read-path zone bug in the
    // columnar reader shifts unix_micros / the rendered wall clock
    spark.sql("INSERT INTO graft.op.ts_zone VALUES " +
      "(1, TIMESTAMP'2020-06-01 00:00:00')")
    val utcMicros = spark.sql(
      "SELECT unix_micros(t) FROM graft.op.ts_zone").collect()(0).getLong(0)
    val prevZone = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val r = spark.sql(
        "SELECT unix_micros(t) AS us, " +
          "date_format(t, 'yyyy-MM-dd HH:mm:ss') AS w " +
          "FROM graft.op.ts_zone").collect()(0)
      assert(r.getLong(0) == utcMicros) // same instant
      assert(r.getString(1) == "2020-06-01 05:30:00") // +05:30 wall clock
    } finally spark.conf.set("spark.sql.session.timeZone", prevZone)
    spark.sql("DROP TABLE graft.op.ts_zone")
  }

  test("compaction rewrites many small appends into few sorted regions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.many_appends")
    spark.sql(
      """CREATE TABLE graft.op.many_appends (k INT, v STRING)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    // five separate commits -> five overlapping single-row-ish regions
    (1 to 5).foreach { i =>
      spark.sql(s"INSERT INTO graft.op.many_appends VALUES " +
        s"($i, 'a$i'), (${i + 100}, 'b$i')")
    }
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    def regions(): Seq[RegionMeta] = TableMeta.loadRegions(
      cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("op"), "many_appends")).asInstanceOf[GraftTable].tableDir)
    assert(regions().size >= 5)

    GraftCompact.compact(spark, "graft", "op", "many_appends", 2)
    val after = regions()
    assert(after.size == 2, s"got ${after.size} regions")
    assert(spark.table("graft.op.many_appends").count() == 10)
    // disjoint and sorted after compaction
    val sorted = after.sortBy(_.mins.head)
    assert(sorted(0).maxs.head <= sorted(1).mins.head)
    // data intact, point query correct
    assert(spark.sql(
      "SELECT v FROM graft.op.many_appends WHERE k = 103")
      .collect().head.getString(0) == "b3")
    spark.sql("DROP TABLE graft.op.many_appends")
  }

  test("failed insert aborts cleanly: manifest and files untouched") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.abort_t")
    spark.sql(
      """CREATE TABLE graft.op.abort_t (k INT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.op.abort_t VALUES (1, 1.0), (2, 2.0)")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val dir = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("op"), "abort_t")).asInstanceOf[GraftTable].tableDir
    def files(): Set[String] =
      dir.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val before = files()
    val regionsBefore = TableMeta.loadRegions(dir)
    spark.udf.register("graft_boom",
      (x: Int) => { if (x > 5) throw new RuntimeException("boom"); x })
    intercept[Exception] {
      spark.sql("INSERT INTO graft.op.abort_t " +
        "SELECT graft_boom(id + 4), CAST(id AS DOUBLE) " +
        "FROM range(0, 10)")
    }
    assert(files() == before, "aborted write left stray region files")
    assert(TableMeta.loadRegions(dir) == regionsBefore)
    assert(spark.table("graft.op.abort_t").count() == 2)
    spark.sql("DROP TABLE graft.op.abort_t")
  }

  test("concurrent inserts both commit (manifest lock, no lost update)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.conc_t")
    spark.sql(
      """CREATE TABLE graft.op.conc_t (k INT, v INT)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until 4).map { i =>
      Future {
        spark.sql(s"INSERT INTO graft.op.conc_t " +
          s"SELECT CAST(id AS INT), $i FROM range(${i * 100}, ${i * 100 + 50})")
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    assert(spark.table("graft.op.conc_t").count() == 200)
    assert(spark.sql("SELECT count(DISTINCT v) FROM graft.op.conc_t")
      .collect().head.getLong(0) == 4)
    spark.sql("DROP TABLE graft.op.conc_t")
  }

  test("nullable CSV bulk load backfills short lines with nulls") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.tb_null")
    spark.sql(
      """CREATE TABLE graft.op.tb_null (
        |  col1 STRING, col2 TINYINT, col3 SMALLINT, col4 INT)
        |TBLPROPERTIES('keyCols'='col1')""".stripMargin)
    GraftBulkLoad.loadCsv(spark,
      "/root/reference/src/test/resources/loadNullableData.txt",
      "graft.op.tb_null")
    val rows = spark.sql(
      "SELECT * FROM graft.op.tb_null ORDER BY col1").collect()
    assert(rows.length == 4)
    assert(rows(0).getString(0) == "row1" && rows(0).isNullAt(1) &&
      rows(0).getShort(2) == 8 && rows(0).getInt(3) == 101)
    assert(rows(1).getByte(1) == 2 && rows(1).isNullAt(2) &&
      rows(1).getInt(3) == 102)
    assert(rows(2).getShort(2) == 10 && rows(2).isNullAt(3))
    assert(rows(3).getString(0) == "row4" && rows(3).isNullAt(1) &&
      rows(3).isNullAt(2) && rows(3).isNullAt(3))
    // IS NULL over loaded nulls
    assert(spark.sql("SELECT count(*) FROM graft.op.tb_null " +
      "WHERE col2 IS NULL").collect().head.getLong(0) == 2)
    spark.sql("DROP TABLE graft.op.tb_null")
  }

  test("CALL graft.sys.load_csv replays the reference bulk-load golden") {
    // the reference's `LOAD DATA LOCAL INPATH ... INTO TABLE testblk`
    // (HBaseBulkLoadIntoTableSuite "load data into hbase"), via the
    // SQL-visible procedure form
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.testblk")
    spark.sql(
      """CREATE TABLE graft.op.testblk (col1 STRING, col2 STRING, col3 STRING)
        |TBLPROPERTIES('keyCols'='col1',
        |              'nonKeyCols'='col2,cf1,a;col3,cf1,b')""".stripMargin)
    spark.sql("CALL graft.sys.load_csv(table => 'op.testblk', " +
      "path => '/root/reference/src/test/resources/loadData.txt')")
    // graft loads append (documented divergence from HBase Put-upsert:
    // SURVEY §; the fixture carries row5 twice) — golden answer on read
    val rows = spark.sql(
      "SELECT DISTINCT * FROM graft.op.testblk ORDER BY col1").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq == Seq(("row4", "4", "8"), ("row5", "5", "10"),
        ("row6", "6", "12")))
    spark.sql("DROP TABLE graft.op.testblk")
  }

  test("LOAD DATA INPATH statement runs the graft bulk load verbatim") {
    // the reference's literal statement, pasted unchanged
    // (HBaseBulkLoadIntoTableSuite:112) — resolved into the bulk load
    // by GraftLoadDataRule instead of failing "not supported for v2"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.testblk_stmt")
    spark.sql(
      """CREATE TABLE graft.op.testblk_stmt
        |  (col1 STRING, col2 STRING, col3 STRING)
        |TBLPROPERTIES('keyCols'='col1')""".stripMargin)
    spark.sql(
      """LOAD DATA LOCAL INPATH
        |'/root/reference/src/test/resources/loadData.txt'
        |INTO TABLE graft.op.testblk_stmt""".stripMargin)
    val rows = spark.sql(
      "SELECT DISTINCT * FROM graft.op.testblk_stmt ORDER BY col1")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq == Seq(("row4", "4", "8"), ("row5", "5", "10"),
        ("row6", "6", "12")))
    // OVERWRITE refuses loudly (appends only, like the reference)
    val e = intercept[Exception] {
      spark.sql(
        """LOAD DATA LOCAL INPATH
          |'/root/reference/src/test/resources/loadData.txt'
          |OVERWRITE INTO TABLE graft.op.testblk_stmt""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("overwrite"))
    spark.sql("DROP TABLE graft.op.testblk_stmt")
  }

  test("CALL load_csv honors the delimiter argument") {
    val f = java.io.File.createTempFile("graft_load_delim", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      "a|1\nb|2\n".getBytes("UTF-8"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.delim_t")
    spark.sql(
      """CREATE TABLE graft.op.delim_t (k STRING, v INT)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    spark.sql("CALL graft.sys.load_csv(table => 'op.delim_t', " +
      s"path => '${f.getPath}', delimiter => '|')")
    val rows = spark.sql("SELECT * FROM graft.op.delim_t ORDER BY k")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("b", 2)))
    spark.sql("DROP TABLE graft.op.delim_t")
  }

  test("CALL graft.sys.compact rewrites regions via SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.compact_sql")
    spark.sql(
      """CREATE TABLE graft.op.compact_sql (k INT, v INT)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.op.compact_sql VALUES (1, 1), (2, 2)")
    spark.sql("INSERT INTO graft.op.compact_sql VALUES (3, 3), (4, 4)")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val dir = cat.loadTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("op"), "compact_sql"))
      .asInstanceOf[GraftTable].tableDir
    assert(TableMeta.loadRegions(dir).size == 2)
    spark.sql("CALL graft.sys.compact(table => 'op.compact_sql', " +
      "target_regions => 1)")
    assert(TableMeta.loadRegions(dir).size == 1)
    assert(spark.sql("SELECT sum(v) FROM graft.op.compact_sql")
      .collect().head.getLong(0) == 10L)
    spark.sql("DROP TABLE graft.op.compact_sql")
  }

  test("dedupKeys: insert-twice folds to latest row per key at compaction") {
    // the reference's HBaseInsertTableSuite pattern: INSERT the same
    // keys twice, expect the second write to win (Put upsert)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.ups")
    spark.sql(
      """CREATE TABLE graft.op.ups (k INT, v INT, tag STRING)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='2',
        |              'graft.dedupKeys'='true')""".stripMargin)
    spark.sql(
      """INSERT INTO graft.op.ups
        |SELECT id, CAST(id AS INT), 'base' FROM range(100)""".stripMargin)
    // second batch updates the even keys and adds two new ones
    spark.sql(
      """INSERT INTO graft.op.ups
        |SELECT id, CAST(id * 10 AS INT), 'upd' FROM range(0, 104, 2)"""
        .stripMargin)
    // pre-compaction: appends visible as-is (documented divergence)
    assert(spark.table("graft.op.ups").count() == 152L)
    spark.sql("CALL graft.sys.compact(table => 'op.ups', " +
      "target_regions => 2)")
    val rows = spark.table("graft.op.ups").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(rows.length == 102, "one row per key after the fold")
    rows.foreach { case (k, v, tag) =>
      if (k % 2 == 0) assert(v == k * 10 && tag == "upd", s"key $k")
      else assert(v == k && tag == "base", s"key $k")
    }
    // a third write + compact folds again (updates of updates)
    spark.sql("INSERT INTO graft.op.ups VALUES (0, -1, 'final')")
    spark.sql("CALL graft.sys.compact(table => 'op.ups', " +
      "target_regions => 1)")
    val k0 = spark.sql("SELECT v, tag FROM graft.op.ups WHERE k = 0")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(k0 == Seq((-1, "final")))
    assert(spark.table("graft.op.ups").count() == 102L)
    spark.sql("DROP TABLE graft.op.ups")
  }

  test("randomized upsert lifecycle matches a latest-per-key log model") {
    // property: any interleaving of upsert batches (unique keys within
    // a batch), range deletes, and fold compactions on a dedupKeys
    // table matches a driver-side append-log model where compaction
    // keeps the newest version per key (insert order = region id
    // order) and DELETE removes every version of the keys in range
    val rnd = new scala.util.Random(20260814L)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    for (scenario <- 1 to 3) {
      val t = s"upslife_$scenario"
      spark.sql(s"DROP TABLE IF EXISTS graft.op.$t")
      spark.sql(
        s"""CREATE TABLE graft.op.$t (k BIGINT, v BIGINT)
           |TBLPROPERTIES('keyCols'='k', 'numRegions'='2',
           |              'graft.dedupKeys'='true')""".stripMargin)
      // log of (key, value, seq); visible rows = whole log until a
      // fold, which collapses to max-seq per key
      var log = Vector.empty[(Long, Long, Int)]
      var seq = 0
      def check(tag: String): Unit = {
        val got = spark.sql(
          s"SELECT count(*), coalesce(sum(v), 0) FROM graft.op.$t").head()
        assert(got.getLong(0) == log.size.toLong,
          s"$tag: count ${got.getLong(0)} != model ${log.size}")
        assert(got.getLong(1) == log.map(_._2).sum,
          s"$tag: value sum mismatch")
      }
      (1 to 8).foreach { step =>
        rnd.nextInt(3) match {
          case 0 => // upsert batch: unique keys, values encode the seq
            seq += 1
            val keys = rnd.shuffle((0L until 50L).toList)
              .take(5 + rnd.nextInt(10))
            val vals = keys.map(k => (k, k * 1000 + seq))
            spark.sql(s"INSERT INTO graft.op.$t VALUES " +
              vals.map { case (k, v) => s"($k, $v)" }.mkString(", "))
            log = log ++ vals.map { case (k, v) => (k, v, seq) }
          case 1 => // range delete: every version of the keys in range
            val a = rnd.nextInt(50); val b = a + rnd.nextInt(20)
            spark.sql(s"DELETE FROM graft.op.$t WHERE k >= $a AND k <= $b")
            log = log.filterNot { case (k, _, _) => k >= a && k <= b }
          case 2 => // fold: newest version per key wins
            GraftCompact.compact(spark, "graft", "op", t, 2)
            log = log.groupBy(_._1).valuesIterator
              .map(_.maxBy(_._3)).toVector
        }
        check(s"scenario $scenario step $step")
      }
      // end state after one final fold: exact map equality
      GraftCompact.compact(spark, "graft", "op", t, 1)
      log = log.groupBy(_._1).valuesIterator.map(_.maxBy(_._3)).toVector
      val rows = spark.table(s"graft.op.$t").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows == log.map(e => e._1 -> e._2).toMap,
        s"scenario $scenario final fold state diverged")
      spark.sql(s"DROP TABLE graft.op.$t")
    }
  }

  test("compaction without dedupKeys keeps duplicate keys (append model)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.op")
    spark.sql("DROP TABLE IF EXISTS graft.op.nups")
    spark.sql(
      """CREATE TABLE graft.op.nups (k INT, v INT)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.op.nups VALUES (1, 1), (2, 2)")
    spark.sql("INSERT INTO graft.op.nups VALUES (1, 10)")
    spark.sql("CALL graft.sys.compact(table => 'op.nups', " +
      "target_regions => 1)")
    assert(spark.table("graft.op.nups").count() == 3L)
    spark.sql("DROP TABLE graft.op.nups")
  }

  test("unknown procedure fails with the available list") {
    val e = intercept[Exception] {
      spark.sql("CALL graft.sys.nope()")
    }
    // Spark wraps the catalog error in FAILED_TO_LOAD_ROUTINE; our
    // message (with the available procedure list) is in the cause chain
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(msgs.contains("nope") &&
      (msgs.contains("load_csv") || msgs.contains("FAILED_TO_LOAD")))
  }
}
