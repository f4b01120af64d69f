package graft.catalog

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `CALL graft.sys.clone`: zero-copy table snapshots via hard-linked
  * region files — independent manifests, independent retention, shared
  * bytes. The pin-the-training-corpus operation. */
class GraftCloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tableDir(ns: String, name: String): File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array(ns), name)).asInstanceOf[GraftTable].tableDir
  }

  private def ks(fqn: String): Seq[Long] =
    spark.sql(s"SELECT k FROM $fqn ORDER BY k").collect()
      .map(_.getLong(0)).toSeq

  private def mk(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    val fqn = s"graft.cl.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(s"CREATE TABLE $fqn (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k', 'numRegions'='2')")
    fqn
  }

  test("clone is an independent zero-copy snapshot: same rows, linked " +
      "files, mutations do not propagate either way") {
    val src = mk("src1")
    spark.sql(s"DROP TABLE IF EXISTS graft.cl.dst1")
    spark.sql(s"INSERT INTO $src SELECT id, concat('a', id) FROM range(20)")
    val out = spark.sql("CALL graft.sys.clone(table => 'cl.src1', " +
      "target => 'cl.dst1')").collect().head
    assert(out.getString(1) == "cl.dst1")

    assert(ks("graft.cl.dst1") == (0L until 20L))
    // zero-copy: same inode behind both directory entries
    val sd = tableDir("cl", "src1"); val dd = tableDir("cl", "dst1")
    val srcFile = sd.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dstFile = new File(dd, srcFile.getName)
    assert(dstFile.isFile)
    def inode(f: File): Any = java.nio.file.Files.getAttribute(
      f.toPath, "unix:ino")
    assert(inode(srcFile) == inode(dstFile), "hard link, not a copy")

    // divergence: source append invisible to clone; clone append
    // invisible to source
    spark.sql(s"INSERT INTO $src SELECT id, 'b' FROM range(20, 25)")
    spark.sql("INSERT INTO graft.cl.dst1 SELECT id, 'c' FROM range(100, 103)")
    assert(ks(src) == (0L until 25L))
    assert(ks("graft.cl.dst1") == ((0L until 20L) ++ (100L until 103L)))
  }

  test("clone at a version pins the historical region set") {
    val src = mk("src2")
    spark.sql(s"DROP TABLE IF EXISTS graft.cl.dst2")
    spark.sql(s"INSERT INTO $src SELECT id, 'a' FROM range(10)")
    val v1 = TableMeta.currentVersion(tableDir("cl", "src2"))
    spark.sql(s"INSERT INTO $src SELECT id, 'b' FROM range(10, 20)")
    spark.sql("CALL graft.sys.clone(table => 'cl.src2', " +
      s"target => 'cl.dst2', version => $v1)").collect()
    assert(ks("graft.cl.dst2") == (0L until 10L))
    assert(ks(src) == (0L until 20L))
  }

  test("vacuum of the source never breaks a clone (independent names " +
      "on shared inodes)") {
    val src = mk("src3")
    spark.sql(s"DROP TABLE IF EXISTS graft.cl.dst3")
    spark.sql(s"INSERT INTO $src SELECT id, 'a' FROM range(10)")
    spark.sql("CALL graft.sys.clone(table => 'cl.src3', " +
      "target => 'cl.dst3')").collect()
    // retire the source's originals via compaction, then vacuum them
    spark.sql("CALL graft.sys.compact(table => 'cl.src3', " +
      "target_regions => 1)")
    spark.sql("CALL graft.sys.vacuum(table => 'cl.src3')").collect()
    assert(ks("graft.cl.dst3") == (0L until 10L), "clone reads fine")
    assert(ks(src) == (0L until 10L))
  }

  test("dedupKeys latest-wins order survives the clone (region ids " +
      "preserved)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    spark.sql("DROP TABLE IF EXISTS graft.cl.src4")
    spark.sql("DROP TABLE IF EXISTS graft.cl.dst4")
    spark.sql("CREATE TABLE graft.cl.src4 (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k', 'graft.dedupKeys'='true')")
    spark.sql("INSERT INTO graft.cl.src4 SELECT id, 'old' FROM range(5)")
    spark.sql("INSERT INTO graft.cl.src4 SELECT id, 'new' FROM range(5)")
    spark.sql("CALL graft.sys.clone(table => 'cl.src4', " +
      "target => 'cl.dst4')").collect()
    // fold the clone: latest-wins must keep the SECOND batch
    spark.sql("CALL graft.sys.compact(table => 'cl.dst4', " +
      "target_regions => 1)")
    val vs = spark.sql("SELECT DISTINCT v FROM graft.cl.dst4")
      .collect().map(_.getString(0)).toSeq
    assert(vs == Seq("new"), s"latest-wins inverted: $vs")
  }

  test("CREATE TABLE ... CLONE statement face (Delta syntax) works, " +
      "with and without VERSION AS OF") {
    val src = mk("src6")
    Seq("dst6a", "dst6b").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.cl.$t"))
    spark.sql(s"INSERT INTO $src SELECT id, 'a' FROM range(8)")
    val v1 = TableMeta.currentVersion(tableDir("cl", "src6"))
    spark.sql(s"INSERT INTO $src SELECT id, 'b' FROM range(8, 12)")

    spark.sql("CREATE TABLE graft.cl.dst6a CLONE graft.cl.src6")
    assert(ks("graft.cl.dst6a") == (0L until 12L))
    spark.sql(
      s"CREATE TABLE graft.cl.dst6b CLONE graft.cl.src6 VERSION AS OF $v1")
    assert(ks("graft.cl.dst6b") == (0L until 8L))
    // normal CREATE TABLE statements still parse through the delegate
    spark.sql("DROP TABLE IF EXISTS graft.cl.plain")
    spark.sql("CREATE TABLE graft.cl.plain (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql("DROP TABLE graft.cl.plain")
  }

  test("a stream tailing a clone reads everything from scratch " +
      "(srcMaxId cleared), even when the source was compacted") {
    val src = mk("src7")
    spark.sql(s"DROP TABLE IF EXISTS graft.cl.dst7")
    spark.sql(s"INSERT INTO $src SELECT id, 'a' FROM range(10)")
    spark.sql(s"INSERT INTO $src SELECT id, 'b' FROM range(10, 20)")
    // compaction rewrites carry srcMaxId in the SOURCE; the clone must
    // clear it or a fresh tail of the clone would skip this data
    spark.sql("CALL graft.sys.compact(table => 'cl.src7', " +
      "target_regions => 1)")
    spark.sql("CREATE TABLE graft.cl.dst7 CLONE graft.cl.src7")
    val q = spark.readStream.table("graft.cl.dst7")
      .writeStream.format("memory").queryName("clone_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM clone_tail").head()
        .getLong(0) == 20L, "fresh tail of the clone sees all rows")
      spark.sql("INSERT INTO graft.cl.dst7 VALUES (100, 'c')")
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM clone_tail").head()
        .getLong(0) == 21L)
    } finally q.stop()
  }

  test("cloning a fixed-split (bucketed) table preserves buckets and " +
      "the exchange-free key-grouped plan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    Seq("src8", "dst8").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.cl.$t"))
    spark.sql("CREATE TABLE graft.cl.src8 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('keyCols'='k', 'regionSplits'='100;200;300')")
    spark.sql("INSERT INTO graft.cl.src8 SELECT id, id FROM range(400)")
    spark.sql("CREATE TABLE graft.cl.dst8 CLONE graft.cl.src8")
    val agg = spark.sql(
      "SELECT k, sum(v) FROM graft.cl.dst8 GROUP BY k")
    agg.collect()
    val hasExchange = agg.queryExecution.executedPlan.toString
      .contains("Exchange")
    assert(!hasExchange,
      "key-grouped aggregation on the clone must stay exchange-free")
    assert(spark.table("graft.cl.dst8").count() == 400L)
  }

  test("VACUUM statement face runs the vacuum procedure") {
    val src = mk("src9")
    spark.sql(s"INSERT INTO $src SELECT id, 'a' FROM range(10)")
    spark.sql("CALL graft.sys.compact(table => 'cl.src9', " +
      "target_regions => 1)")
    spark.sql(s"VACUUM $src") // retired originals purged
    assert(ks(src) == (0L until 10L))
  }

  test("clone onto an existing table refuses; failed clone leaves no " +
      "debris") {
    val src = mk("src5")
    spark.sql(s"INSERT INTO $src SELECT id, 'a' FROM range(5)")
    intercept[Exception] {
      spark.sql("CALL graft.sys.clone(table => 'cl.src5', " +
        "target => 'cl.src5')").collect()
    }
    // a version beyond history fails AND drops the half-made target
    intercept[Exception] {
      spark.sql("CALL graft.sys.clone(table => 'cl.src5', " +
        "target => 'cl.dst5', version => 99999)").collect()
    }
    val tables = spark.sql("SHOW TABLES IN graft.cl").collect()
      .map(_.getString(1)).toSet
    assert(!tables.contains("dst5"), "failed clone left a table behind")
  }
}
