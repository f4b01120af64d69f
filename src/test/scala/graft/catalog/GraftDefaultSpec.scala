package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Column DEFAULT values (ANSI DDL via Spark 4.1's DSv2
  * `SUPPORT_COLUMN_DEFAULT_VALUE`): declared at CREATE TABLE, filled by
  * the analyzer for omitted columns and the DEFAULT keyword, altered
  * with `ALTER COLUMN … SET/DROP DEFAULT`. The default lives in the
  * column metadata of the stored schema, so it round-trips the table
  * meta like any other schema fact. ADD COLUMN with DEFAULT is refused:
  * existing region files would read the new column as NULL, silently
  * disagreeing with the declared default. */
class GraftDefaultSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ns(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dflt")

  test("CREATE TABLE with DEFAULT fills omitted columns and the " +
      "DEFAULT keyword; explicit values win") {
    ns()
    spark.sql("DROP TABLE IF EXISTS graft.dflt.t1")
    spark.sql("CREATE TABLE graft.dflt.t1 (k BIGINT, qty BIGINT DEFAULT 7, " +
      "status STRING DEFAULT 'new') TBLPROPERTIES('keyCols'='k')")
    spark.sql("INSERT INTO graft.dflt.t1 (k) VALUES (1)")
    spark.sql("INSERT INTO graft.dflt.t1 (k, qty) VALUES (2, 99)")
    spark.sql("INSERT INTO graft.dflt.t1 VALUES (3, DEFAULT, DEFAULT)")
    spark.sql("INSERT INTO graft.dflt.t1 VALUES (4, 5, 'old')")
    val rows = spark.table("graft.dflt.t1").orderBy("k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq((1L, 7L, "new"), (2L, 99L, "new"),
        (3L, 7L, "new"), (4L, 5L, "old")))
  }

  test("defaults survive a catalog cache drop (stored in table meta, " +
      "not the session)") {
    ns()
    spark.sql("DROP TABLE IF EXISTS graft.dflt.t2")
    spark.sql("CREATE TABLE graft.dflt.t2 (k BIGINT, v BIGINT DEFAULT 42) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql("REFRESH TABLE graft.dflt.t2")
    spark.sql("INSERT INTO graft.dflt.t2 (k) VALUES (1)")
    assert(spark.sql("SELECT v FROM graft.dflt.t2 WHERE k = 1")
      .collect().head.getLong(0) == 42L)
  }

  test("ALTER COLUMN SET DEFAULT changes future inserts; DROP DEFAULT " +
      "restores NULL fill") {
    ns()
    spark.sql("DROP TABLE IF EXISTS graft.dflt.t3")
    spark.sql("CREATE TABLE graft.dflt.t3 (k BIGINT, v BIGINT DEFAULT 1) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql("INSERT INTO graft.dflt.t3 (k) VALUES (1)")
    spark.sql("ALTER TABLE graft.dflt.t3 ALTER COLUMN v SET DEFAULT 2")
    spark.sql("INSERT INTO graft.dflt.t3 (k) VALUES (2)")
    spark.sql("ALTER TABLE graft.dflt.t3 ALTER COLUMN v DROP DEFAULT")
    spark.sql("INSERT INTO graft.dflt.t3 (k) VALUES (3)")
    val got = spark.table("graft.dflt.t3").orderBy("k")
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    assert(got.toSeq == Seq(Some(1L), Some(2L), None))
  }

  test("ADD COLUMN with DEFAULT is refused (old regions would read " +
      "NULL, not the default); plain ADD COLUMN still works") {
    ns()
    spark.sql("DROP TABLE IF EXISTS graft.dflt.t4")
    spark.sql("CREATE TABLE graft.dflt.t4 (k BIGINT) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql("INSERT INTO graft.dflt.t4 VALUES (1)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.dflt.t4 ADD COLUMN v BIGINT DEFAULT 5") }
    assert(exists(e, _.contains("DEFAULT")), s"got: ${e.getMessage}")
    spark.sql("ALTER TABLE graft.dflt.t4 ADD COLUMN w BIGINT")
    assert(spark.table("graft.dflt.t4").columns.contains("w"))
  }

  test("non-foldable default expressions are refused at DDL time") {
    ns()
    spark.sql("DROP TABLE IF EXISTS graft.dflt.bad")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.dflt.bad (k BIGINT, " +
        "v DOUBLE DEFAULT rand()) TBLPROPERTIES('keyCols'='k')") }
    assert(exists(e, m => m.contains("DEFAULT") || m.contains("fold")),
      s"got: ${e.getMessage}")
  }

  private def exists(e: Throwable, p: String => Boolean): Boolean = {
    var t: Throwable = e
    while (t != null) {
      if (t.getMessage != null && p(t.getMessage)) return true
      t = t.getCause
    }
    false
  }
}
