package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Iceberg-style metadata tables: `graft.ns.t.history` and
  * `graft.ns.t.manifest` resolve to read-only SQL relations over the
  * commit log / region manifest — joinable and filterable, unlike the
  * CALL procedures' result sets. */
class MetaTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.meta")
    spark.sql("DROP TABLE IF EXISTS graft.meta.t")
    spark.sql(
      """CREATE TABLE graft.meta.t (k BIGINT, v DOUBLE)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='4')""".stripMargin)
    spark.sql(
      "INSERT INTO graft.meta.t SELECT id, id * 1.0 FROM range(1000)")
    spark.sql(
      "INSERT INTO graft.meta.t SELECT id + 1000, id * 1.0 FROM range(500)")
  }

  test("history metadata table lists commits with op and row counts") {
    setup()
    val h = spark.sql(
      """SELECT version, op, regions_added, rows_added
        |FROM graft.meta.t.history ORDER BY version""".stripMargin)
      .collect()
    assert(h.length >= 3) // create/swap + two appends
    val appends = h.filter(_.getString(1) == "append")
    assert(appends.length == 2)
    assert(appends.map(_.getLong(3)).sorted.toSeq == Seq(500L, 1000L))
    // composable: aggregate over it like any relation
    val total = spark.sql(
      """SELECT sum(rows_added) AS r FROM graft.meta.t.history
        |WHERE op = 'append'""".stripMargin).collect()(0).getLong(0)
    assert(total == 1500L)
  }

  test("manifest metadata table exposes regions, bytes, key bounds") {
    setup()
    val m = spark.sql(
      """SELECT id, file, rows, bytes, src_max_id, min_key, max_key
        |FROM graft.meta.t.manifest""".stripMargin).collect()
    assert(m.map(_.getLong(2)).sum == 1500L, "manifest rows sum to table")
    assert(m.forall(_.getLong(3) > 0L), "every region has real file bytes")
    assert(m.forall(_.getLong(4) == -1L), "appends are originals")
    // the operator query split/merge feeds on: small regions by bytes
    val small = spark.sql(
      """SELECT count(*) AS c FROM graft.meta.t.manifest
        |WHERE rows < 400""".stripMargin).collect()(0).getLong(0)
    assert(small >= 1)
    // joins against data tables work (metadata is a plain relation)
    val joined = spark.sql(
      """SELECT count(*) AS c
        |FROM graft.meta.t d
        |JOIN graft.meta.t.manifest r ON d._graft_region_id = r.id"""
        .stripMargin).collect()(0).getLong(0)
    assert(joined == 1500L)
  }

  test("unknown metadata kinds and missing bases still refuse loudly") {
    setup()
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.meta.t.nosuchkind").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.meta.nosuchtable.history").collect()
    }
  }
}
