package graft.catalog

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** `INSERT OVERWRITE` — atomic truncate-swap commit
  * ([[TableMeta.overwriteRegions]]): replaces the live region set,
  * retires the displaced regions, bumps the generation. */
class OverwriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mk(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    val fqn = s"graft.ow.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(s"CREATE TABLE $fqn (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('keyCols'='k', 'numRegions'='2')")
    fqn
  }

  private def dir(name: String): File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("ow"), name))
      .asInstanceOf[GraftTable].tableDir
  }

  test("INSERT OVERWRITE replaces the contents atomically; appends " +
      "continue; time travel still reads the pre-overwrite state") {
    val fqn = mk("basic")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(100)")
    val v1 = TableMeta.currentVersion(dir("basic"))
    spark.sql(s"INSERT OVERWRITE $fqn SELECT id, id * 10 " +
      "FROM range(1000, 1050)")
    assert(spark.table(fqn).count() == 50L)
    assert(spark.sql(s"SELECT v FROM $fqn WHERE k = 1000")
      .collect().head.getLong(0) == 10000L)
    // further writes append normally
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(2000, 2010)")
    assert(spark.table(fqn).count() == 60L)
    // the displaced state stays time-travel readable
    val old = spark.read.option("versionAsOf", v1).table(fqn)
    assert(old.count() == 100L)
  }

  test("displaced regions retire (files kept for in-flight readers) " +
      "and the generation bumps") {
    val fqn = mk("retire")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(40)")
    val genBefore = TableMeta.loadState(dir("retire")).gen
    val liveBefore = TableMeta.loadState(dir("retire")).regions
    spark.sql(s"INSERT OVERWRITE $fqn SELECT id, id FROM range(5)")
    val st = TableMeta.loadState(dir("retire"))
    assert(st.gen == genBefore + 1, "generation bump on overwrite")
    assert(liveBefore.map(_.file).toSet.subsetOf(
      st.retired.map(_.file).toSet), "displaced regions retired")
    liveBefore.foreach(r =>
      assert(new File(dir("retire"), r.file).isFile,
        "retired files kept one cycle"))
  }

  test("DataFrame overwrite face works; filtered overwrite refuses") {
    val fqn = mk("df")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(30)")
    spark.range(5, 10).selectExpr("id AS k", "id AS v")
      .writeTo(fqn).overwrite(lit(true))
    assert(spark.table(fqn).count() == 5L)
    val e = intercept[Exception] {
      spark.range(0, 5).selectExpr("id AS k", "id AS v")
        .writeTo(fqn).overwrite(col("k") > 2)
    }
    assert(e.getMessage.contains("predicate") ||
      e.getMessage.contains("OVERWRITE"))
  }

  test("a CDC range across an overwrite delivers exactly the " +
      "overwrite's new rows as appends (deletes are never delivered, " +
      "consistent with DELETE)") {
    val fqn = mk("cdc")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(20)")
    val v1 = TableMeta.currentVersion(dir("cdc"))
    spark.sql(s"INSERT OVERWRITE $fqn SELECT id, id FROM range(100, 110)")
    val got = spark.read.option("changesFromVersion", v1).table(fqn)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (100L until 110L).toSeq,
      "the new region set is the appended delta; displaced rows are " +
        "a delete, which CDC does not deliver")
  }
}
