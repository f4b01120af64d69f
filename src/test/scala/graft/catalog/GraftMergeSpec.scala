package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Targeted region merging ([[GraftMerge]], `CALL graft.sys.merge`):
  * fragmented tables defragment O(touched), sort and answers
  * preserved, upsert fold applied, tailing streams unaffected. */
class GraftMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tableDir(name: String): java.io.File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("mrg"), name)).asInstanceOf[GraftTable].tableDir
  }

  test("merge defragments append litter; answers and order survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mrg")
    spark.sql("DROP TABLE IF EXISTS graft.mrg.frag")
    spark.sql(
      """CREATE TABLE graft.mrg.frag (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='1')""".stripMargin)
    // 8 small appends -> 8 disjoint single-region commits
    (0 until 8).foreach { i =>
      spark.sql(s"INSERT INTO graft.mrg.frag " +
        s"SELECT id, id * 1.0 FROM range(${i * 100}, ${i * 100 + 100})")
    }
    val dir = tableDir("frag")
    val before = TableMeta.loadRegions(dir)
    assert(before.size == 8)
    val total = before.map(r =>
      new java.io.File(dir, r.file).length()).sum
    val res = spark.sql(
      s"CALL graft.sys.merge(table => 'mrg.frag', " +
        s"target_bytes => ${total / 2}L)").head()
    assert(res.getString(0).toInt >= 2, "at least two groups merged")
    val after = TableMeta.loadRegions(dir)
    assert(after.size < before.size)
    assert(spark.table("graft.mrg.frag").count() == 800L)
    assert(spark.sql(
      "SELECT sum(v) FROM graft.mrg.frag").head().getDouble(0)
      == (0 until 800).map(_.toDouble).sum)
    // merged regions carry lineage and fresh column stats
    assert(after.filter(_.srcMaxId >= 0).forall(_.stats.contains("v")))
    // sources retired for tailing streams
    assert(TableMeta.loadState(dir).retired.nonEmpty)
    spark.sql("DROP TABLE graft.mrg.frag")
  }

  test("overlapping regions interleave into one sorted region") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mrg")
    spark.sql("DROP TABLE IF EXISTS graft.mrg.overlap")
    spark.sql(
      """CREATE TABLE graft.mrg.overlap (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='1')""".stripMargin)
    // evens then odds: two fully-overlapping key ranges
    spark.sql("INSERT INTO graft.mrg.overlap " +
      "SELECT id * 2, id * 1.0 FROM range(500)")
    spark.sql("INSERT INTO graft.mrg.overlap " +
      "SELECT id * 2 + 1, id * 1.0 FROM range(500)")
    val dir = tableDir("overlap")
    assert(TableMeta.loadRegions(dir).size == 2)
    spark.sql("CALL graft.sys.merge(table => 'mrg.overlap', " +
      "target_bytes => 104857600L)")
    val after = TableMeta.loadRegions(dir)
    assert(after.size == 1, s"expected 1 merged region, got ${after.size}")
    assert(spark.table("graft.mrg.overlap").count() == 1000L)
    // the merged file is genuinely key-sorted: a raw sequential read
    // of the region file yields ascending keys
    val reader = new ParquetRowIO.RowReader(
      new java.io.File(dir, after.head.file).getPath,
      spark.table("graft.mrg.overlap").schema, Nil)
    var prev = Long.MinValue
    var row = reader.next()
    while (row != null) {
      val k = row.getLong(0)
      assert(k > prev, s"merge broke the region sort at key $k")
      prev = k
      row = reader.next()
    }
    reader.close()
    spark.sql("DROP TABLE graft.mrg.overlap")
  }

  test("merge on a dedupKeys table folds equal keys to the newest row") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mrg")
    spark.sql("DROP TABLE IF EXISTS graft.mrg.upsert")
    spark.sql(
      """CREATE TABLE graft.mrg.upsert (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='1',
        |              'graft.dedupKeys'='true')""".stripMargin)
    spark.sql("INSERT INTO graft.mrg.upsert " +
      "SELECT id, 1.0 FROM range(300)")
    spark.sql("INSERT INTO graft.mrg.upsert " +
      "SELECT id, 2.0 FROM range(100, 200)") // overwrite the middle third
    val dir = tableDir("upsert")
    assert(TableMeta.loadRegions(dir).size == 2)
    spark.sql("CALL graft.sys.merge(table => 'mrg.upsert', " +
      "target_bytes => 104857600L)")
    assert(TableMeta.loadRegions(dir).size == 1)
    // physically folded: 300 rows remain, middle third at v=2.0
    assert(TableMeta.loadRegions(dir).head.rows == 300L)
    val byV = spark.sql(
      """SELECT v, count(*) AS n FROM graft.mrg.upsert
        |GROUP BY v ORDER BY v""".stripMargin)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(byV == Seq((1.0, 200L), (2.0, 100L)))
    spark.sql("DROP TABLE graft.mrg.upsert")
  }

  test("merge is a no-op when every region exceeds the target") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mrg")
    spark.sql("DROP TABLE IF EXISTS graft.mrg.noop")
    spark.sql(
      """CREATE TABLE graft.mrg.noop (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='2')""".stripMargin)
    spark.sql(
      "INSERT INTO graft.mrg.noop SELECT id, id * 1.0 FROM range(1000)")
    val r = spark.sql("CALL graft.sys.merge(table => 'mrg.noop', " +
      "target_bytes => 16L)").head()
    assert(r.getString(0).toInt == 0 && r.getString(1).toInt == 0)
    assert(TableMeta.loadRegions(tableDir("noop")).size == 2)
    spark.sql("DROP TABLE graft.mrg.noop")
  }

  test("tailing stream does not re-read rows consumed by a merge") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mrg")
    spark.sql("DROP TABLE IF EXISTS graft.mrg.stream")
    spark.sql(
      """CREATE TABLE graft.mrg.stream (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='1')""".stripMargin)
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO graft.mrg.stream " +
        s"SELECT id, id * 1.0 FROM range(${i * 100}, ${i * 100 + 100})")
    }
    val q = spark.readStream.table("graft.mrg.stream")
      .writeStream.format("memory").queryName("merge_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("merge_tail").count() == 400L)
      spark.sql("CALL graft.sys.merge(table => 'mrg.stream', " +
        "target_bytes => 104857600L)")
      spark.sql("INSERT INTO graft.mrg.stream " +
        "SELECT id, id * 1.0 FROM range(400, 450)")
      q.processAllAvailable()
      // only the 50 appended rows arrive: the merged region is a
      // srcMaxId-marked rewrite of data the stream already consumed
      assert(spark.table("merge_tail").count() == 450L)
    } finally q.stop()
    spark.sql("DROP TABLE graft.mrg.stream")
  }
}
