package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Delta-syntax maintenance statement faces lowered onto the graft
  * procedures by the delegating parser: RESTORE TABLE, DESCRIBE
  * HISTORY, OPTIMIZE [ZORDER BY]. (CREATE TABLE ... CLONE is covered
  * in GraftCloneSpec.) */
class StatementFacesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mk(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stmt")
    val fqn = s"graft.stmt.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(s"CREATE TABLE $fqn (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('keyCols'='k', 'numRegions'='2')")
    fqn
  }

  private def regionCount(name: String): Int = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val dir = cat.loadTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("stmt"), name))
      .asInstanceOf[GraftTable].tableDir
    TableMeta.loadRegions(dir).size
  }

  test("DESCRIBE HISTORY returns the commit log; RESTORE TABLE rolls " +
      "back to a version") {
    val fqn = mk("hist")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(10)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(10, 20)")
    val hist = spark.sql(s"DESCRIBE HISTORY $fqn").collect()
    assert(hist.length >= 2)
    assert(hist.forall(_.schema.fieldNames.contains("operation")))
    val appends = hist.filter(_.getAs[String]("operation") == "append")
    assert(appends.length == 2)
    val v1 = appends.map(_.getAs[String]("version").toLong).min

    spark.sql(s"RESTORE TABLE $fqn TO VERSION AS OF $v1")
    assert(spark.table(fqn).count() == 10L, "restored to batch 1")
  }

  test("OPTIMIZE merges small regions; OPTIMIZE ZORDER BY clusters") {
    val fqn = mk("opt")
    // four tiny appends -> small-region litter
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO $fqn SELECT id, id FROM range(${i * 10}, ${i * 10 + 10})"))
    val before = regionCount("opt")
    spark.sql(s"OPTIMIZE $fqn")
    assert(regionCount("opt") < before, "small regions merged")
    assert(spark.table(fqn).count() == 40L)

    spark.sql(s"OPTIMIZE $fqn ZORDER BY (v)")
    val props = spark.sql(s"SHOW TBLPROPERTIES $fqn").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.clusteredBy").exists(_.contains("v")))
    assert(spark.table(fqn).count() == 40L)
  }

  test("DESCRIBE DETAIL reports manifest-level facts without data IO") {
    val fqn = mk("detail")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(100)")
    val r = spark.sql(s"DESCRIBE DETAIL $fqn").collect().head
    assert(r.getAs[String]("format") == "graft")
    assert(r.getAs[String]("key_cols") == "k")
    assert(r.getAs[String]("num_rows") == "100")
    assert(r.getAs[String]("num_regions").toInt >= 1)
    assert(r.getAs[String]("size_bytes").toLong > 0)
    assert(r.getAs[String]("version").toLong >= 1)
  }

  test("statements on non-graft identifiers fall through to the stock " +
      "parser (and fail there, not here)") {
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE not_a_graft_table ZORDER BY (x)")
    }
    // resolves through the graft current-catalog rules only when the
    // identifier lands in a graft catalog; a bare name under the
    // default session catalog is not one
    assert(e != null)
  }
}
