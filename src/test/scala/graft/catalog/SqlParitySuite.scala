package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.TestSpark

/** Distinctive goldens from the reference's port of Spark's
  * SQLQuerySuite (/root/reference HBaseSQLQuerySuite.scala), run over a
  * graft-stored table instead of temp views: function parsing, implicit
  * casts, extreme literals, and expression-sign chains must behave
  * identically above our scan. (Spark-4 semantic drifts the SURVEY
  * flags — ANSI mode, decimal promotion — are asserted with Spark-4's
  * documented behavior.) */
class SqlParitySuite extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  override def beforeAll(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.parity")
    spark.sql("DROP TABLE IF EXISTS graft.parity.kv")
    spark.sql(
      """CREATE TABLE graft.parity.kv (k INT, v STRING)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='2')""".stripMargin)
    val rows = (1 to 100).map(i => s"($i, '$i')").mkString(", ")
    spark.sql(s"INSERT INTO graft.parity.kv VALUES $rows")
    spark.sql("SELECT * FROM graft.parity.kv").createOrReplaceTempView("kv")
  }

  override def afterAll(): Unit =
    spark.sql("DROP TABLE IF EXISTS graft.parity.kv")

  private def one(sql: String): Any = spark.sql(sql).collect().head.get(0)

  test("ABS / SQRT with implicit string cast (HBaseSQLQuerySuite:69,100-112)") {
    assert(one("SELECT ABS(-5) FROM kv WHERE k = 1") == 5)
    assert(one("SELECT SQRT(4.0) FROM kv WHERE k = 1") == 2.0)
    // v is a STRING; SQRT coerces it (reference golden: sum over casts)
    assert(one("SELECT SQRT(CAST(v AS DOUBLE)) FROM kv WHERE k = 4") == 2.0)
  }

  test("SUBSTR parsing and semantics (HBaseSQLQuerySuite:114-127)") {
    assert(one("SELECT SUBSTR('abcdef', 2) FROM kv WHERE k = 1") == "bcdef")
    assert(one("SELECT SUBSTRING('abcdef', 2, 3) FROM kv WHERE k = 1") == "bcd")
  }

  test("cast boolean to string (HBaseSQLQuerySuite:710-715)") {
    assert(one("SELECT CAST(TRUE AS STRING) FROM kv WHERE k = 1") == "true")
    assert(one("SELECT CAST(FALSE AS STRING) FROM kv WHERE k = 1") == "false")
  }

  test("string literal to date/timestamp casts (HBaseSQLQuerySuite:129-155)") {
    assert(one("SELECT CAST('2010-12-31' AS DATE) FROM kv WHERE k = 1")
      .toString == "2010-12-31")
    assert(one(
      "SELECT date_format(CAST('2009-08-07 03:14:15' AS TIMESTAMP), " +
        "'yyyy-MM-dd HH:mm:ss') FROM kv WHERE k = 1") == "2009-08-07 03:14:15")
  }

  test("Long.MinValue literal survives (HBaseSQLQuerySuite:781-790)") {
    assert(one(s"SELECT ${Long.MinValue}L FROM kv WHERE k = 1") == Long.MinValue)
    assert(one(s"SELECT k + ${Long.MaxValue - 1000}L FROM kv WHERE k = 1") ==
      Long.MaxValue - 999)
  }

  test("sign applied to expression chains (HBaseSQLQuerySuite:828-909)") {
    assert(one("SELECT -(-k) FROM kv WHERE k = 7") == 7)
    assert(one("SELECT -(+(-k)) FROM kv WHERE k = 7") == 7)
    assert(one("SELECT -k + 10 FROM kv WHERE k = 7") == 3)
  }

  test("auto integer/float cast in comparisons (HBaseSQLQuerySuite:810-826)") {
    assert(one("SELECT count(*) FROM kv WHERE k > 96.5") == 4L)
    assert(one("SELECT count(*) FROM kv WHERE k = 50.0") == 1L)
  }

  test("mixed-case keywords and qualified names (HBaseSQLQuerySuite:441-483)") {
    assert(one("SeleCT CouNT(*) FrOM kv WhERe k > 90") == 10L)
    assert(one("SELECT kv.v FROM kv WHERE kv.k = 42") == "42")
  }

  test("bitwise operators over stored ints (HBaseSQLQuerySuite:928-942)") {
    assert(one("SELECT k & 3 FROM kv WHERE k = 7") == 3)
    assert(one("SELECT k | 8 FROM kv WHERE k = 7") == 15)
    assert(one("SELECT k ^ 5 FROM kv WHERE k = 7") == 2)
    assert(one("SELECT ~k FROM kv WHERE k = 7") == -8)
  }

  test("aggregates with HAVING and renamed group expression " +
      "(HBaseSQLQuerySuite:741-746)") {
    val rows = spark.sql(
      """SELECT (k % 10) AS bucket, count(*) AS cnt FROM kv
        |GROUP BY k % 10 HAVING count(*) = 10
        |ORDER BY bucket""".stripMargin).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).forall(_ == 10L))
  }
}
