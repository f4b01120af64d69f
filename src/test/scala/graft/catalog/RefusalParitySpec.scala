package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Negative-path parity with the reference catalog: every API the
  * reference refuses with `UnsupportedOperationException`
  * (HBaseCatalog.scala:257-290 alterDatabase/setCurrentDatabase,
  * :434-444 rename/alterTable, :665-775 partition + function APIs)
  * must refuse LOUDLY here too — through the user-visible SQL
  * surface, with a message that says what to do instead where one
  * exists. A silent no-op or a generic planner error would let a
  * user believe the operation happened.
  *
  * Two deliberate non-parity notes, documented rather than asserted:
  * `USE graft.ns` (the reference's setCurrentDatabase refusal) is
  * session-catalog plumbing in DSv2 and works fine; CREATE FUNCTION
  * routes to Spark's analyzer before any catalog sees it, so the
  * refusal is Spark's (asserted below as "not supported", whoever
  * raises it).
  */
class RefusalParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ensureFixture(): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.refuse")
    spark.sql("DROP TABLE IF EXISTS graft.refuse.t")
    spark.sql(
      """CREATE TABLE graft.refuse.t (k BIGINT, v STRING)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='2')""".stripMargin)
    "graft.refuse.t"
  }

  private def refusal(sql: String): Throwable = {
    val e = intercept[Throwable](spark.sql(sql).collect())
    // unwrap the analyzer/driver wrapping to the root message
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .find(c => c.isInstanceOf[UnsupportedOperationException] ||
        c.getMessage != null)
      .getOrElse(e)
  }

  test("ALTER TABLE RENAME refuses (reference: doRenameTable)") {
    val t = ensureFixture()
    val e = refusal(s"ALTER TABLE $t RENAME TO graft.refuse.t2")
    assert(e.getMessage.toLowerCase.contains("rename"),
      s"got: ${e.getMessage}")
    // and nothing moved
    assert(spark.sql("SHOW TABLES IN graft.refuse").collect()
      .map(_.getString(1)).toSet == Set("t"))
  }

  test("ALTER NAMESPACE refuses (reference: alterDatabase)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.refuse")
    val e = refusal(
      "ALTER NAMESPACE graft.refuse SET PROPERTIES ('a'='b')")
    assert(e.getMessage.toLowerCase.contains("alternamespace") ||
      e.getMessage.toLowerCase.contains("not supported"),
      s"got: ${e.getMessage}")
  }

  test("PARTITIONED BY refuses at CREATE, directing to keyCols " +
      "(reference: createPartitions & co)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.refuse")
    spark.sql("DROP TABLE IF EXISTS graft.refuse.p")
    val e = refusal(
      """CREATE TABLE graft.refuse.p (k BIGINT, v STRING)
        |PARTITIONED BY (v)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    assert(e.getMessage.contains("keyCols"), s"got: ${e.getMessage}")
  }

  test("partition DDL on a key-organized table refuses " +
      "(reference: loadPartition/dropPartitions & co)") {
    val t = ensureFixture()
    val add = refusal(s"ALTER TABLE $t ADD PARTITION (v='x')")
    assert(add.getMessage.toLowerCase.contains("partition"),
      s"got: ${add.getMessage}")
    val show = refusal(s"SHOW PARTITIONS $t")
    assert(show.getMessage.toLowerCase.contains("partition"),
      s"got: ${show.getMessage}")
  }

  test("CREATE / DROP FUNCTION in the graft catalog refuses " +
      "(reference: doCreateFunction/doDropFunction)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.refuse")
    val c = refusal("CREATE FUNCTION graft.refuse.f AS 'java.lang.String'")
    assert(c.getMessage.toLowerCase.contains("not supported") ||
      c.getMessage.toLowerCase.contains("unsupported") ||
      c.getMessage.toLowerCase.contains("catalog"),
      s"got: ${c.getMessage}")
    val d = refusal("DROP FUNCTION graft.refuse.f")
    assert(d.getMessage.toLowerCase.contains("not supported") ||
      d.getMessage.toLowerCase.contains("unsupported") ||
      d.getMessage.toLowerCase.contains("undefined") ||
      d.getMessage.toLowerCase.contains("cannot"),
      s"got: ${d.getMessage}")
  }

  test("read-only function catalog still serves its region functions " +
      "and reports unknown ones as missing, not as a crash") {
    val e = intercept[Throwable](
      spark.sql("SELECT graft.refuse.no_such_fn(1)").collect())
    val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).find(_ != null).getOrElse("")
    assert(msg.toLowerCase.contains("function") ||
      msg.toLowerCase.contains("resolve"), s"got: $msg")
  }
}
