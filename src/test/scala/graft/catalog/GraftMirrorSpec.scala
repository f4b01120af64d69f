package graft.catalog

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `CALL graft.sys.mirror`: clone bootstrap, O(delta) incremental
  * sync, version-level idempotence, and the append-only refusals. */
class GraftMirrorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(fqn: String): Seq[(Long, String)] =
    spark.sql(s"SELECT k, v FROM $fqn ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private def tableDir(ns: String, name: String): File =
    spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array(ns), name)).asInstanceOf[GraftTable].tableDir

  private def fresh(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mir")
    val fqn = s"graft.mir.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    fqn
  }

  test("bootstrap clones, sync applies exactly the delta, no-op is zero") {
    val src = fresh("src1"); val tgt = fresh("tgt1")
    spark.sql(s"CREATE TABLE $src (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql(s"INSERT INTO $src SELECT id, 'a' FROM range(100)")
    val boot = spark.sql(
      "CALL graft.sys.mirror(source => 'mir.src1', target => 'mir.tgt1')")
      .head()
    assert(boot.getString(1).toLong == 100)
    assert(rows(tgt) == rows(src))
    // incremental: one appended batch moves O(delta) regions
    val regionsBefore = TableMeta.loadRegions(tableDir("mir", "tgt1")).size
    spark.sql(s"INSERT INTO $src SELECT id, 'b' FROM range(100, 130)")
    val sync = spark.sql(
      "CALL graft.sys.mirror(source => 'mir.src1', target => 'mir.tgt1')")
      .head()
    assert(sync.getString(1).toLong == 30, s"delta rows: $sync")
    assert(rows(tgt) == rows(src))
    val regionsAfter = TableMeta.loadRegions(tableDir("mir", "tgt1")).size
    assert(regionsAfter <= regionsBefore + 8,
      s"sync must append O(delta) regions, went $regionsBefore -> " +
        s"$regionsAfter")
    // already-applied version is a no-op
    val again = spark.sql(
      "CALL graft.sys.mirror(source => 'mir.src1', target => 'mir.tgt1')")
      .head()
    assert(again.getString(1).toLong == 0)
  }

  test("in-place rewrite since the watermark refuses; fresh bootstrap heals") {
    val src = fresh("src2"); fresh("tgt2")
    spark.sql(s"CREATE TABLE $src (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql(s"INSERT INTO $src SELECT id, 'a' FROM range(50)")
    spark.sql(
      "CALL graft.sys.mirror(source => 'mir.src2', target => 'mir.tgt2')")
    spark.sql(s"UPDATE $src SET v = 'z' WHERE k = 7")
    val e = intercept[Exception] {
      spark.sql(
        "CALL graft.sys.mirror(source => 'mir.src2', target => 'mir.tgt2')")
    }
    assert(e.getMessage.contains("in-place rewrite"))
    spark.sql("DROP TABLE graft.mir.tgt2")
    spark.sql(
      "CALL graft.sys.mirror(source => 'mir.src2', target => 'mir.tgt2')")
    assert(rows("graft.mir.tgt2") == rows(src))
  }

  test("dedupKeys sources and non-mirror targets refuse") {
    val src = fresh("src3")
    spark.sql(s"CREATE TABLE $src (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k', 'graft.dedupKeys'='true')")
    spark.sql(s"INSERT INTO $src VALUES (1, 'a')")
    val e1 = intercept[Exception] {
      spark.sql(
        "CALL graft.sys.mirror(source => 'mir.src3', target => 'mir.tgt3')")
    }
    assert(e1.getMessage.contains("dedupKeys"))
    val src4 = fresh("src4"); val other = fresh("other4")
    spark.sql(s"CREATE TABLE $src4 (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql(s"CREATE TABLE $other (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k')")
    val e2 = intercept[Exception] {
      spark.sql(
        "CALL graft.sys.mirror(source => 'mir.src4', target => 'mir.other4')")
    }
    assert(e2.getMessage.contains("not a mirror of"))
  }
}
