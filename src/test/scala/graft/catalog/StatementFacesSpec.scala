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

  test("CREATE MATERIALIZED VIEW ... AS SELECT builds the partial " +
      "table; the rewrite answers from it; REFRESH appends the delta") {
    val fqn = mk("mvsql")
    spark.sql(s"INSERT INTO $fqn SELECT id, id % 7 FROM range(100)")
    spark.sql("CREATE MATERIALIZED VIEW by_v AS " +
      s"SELECT v, count(*), sum(k), approx_count_distinct(k) FROM $fqn " +
      "GROUP BY v")
    assert(spark.table(s"${fqn}_mv_by_v").count() > 0,
      "materialized table exists")
    val direct = spark.sql(
      s"SELECT v, sum(k) AS s FROM $fqn GROUP BY v")
    assert(direct.queryExecution.optimizedPlan.toString
      .contains("_mv_by_v"), "transparent rewrite reads the mview:\n" +
      direct.queryExecution.optimizedPlan)
    val before = direct.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    spark.sql(s"INSERT INTO $fqn SELECT id, id % 7 FROM range(100, 150)")
    spark.sql(s"REFRESH MATERIALIZED VIEW ${fqn}_mv_by_v")
    val after = spark.sql(
      s"SELECT v, sum(k) AS s FROM $fqn GROUP BY v")
    assert(after.queryExecution.optimizedPlan.toString
      .contains("_mv_by_v"), "rewrite still fresh after REFRESH")
    val got = after.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.values.sum == (0L until 150L).sum)
    assert(got.keySet == before.keySet)
  }

  test("CREATE MATERIALIZED VIEW refuses unsupported shapes with the " +
      "supported one spelled out") {
    val fqn = mk("mvbad")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(5)")
    val e1 = intercept[Exception] {
      spark.sql("CREATE MATERIALIZED VIEW x AS " +
        s"SELECT v % 2, count(*) FROM $fqn GROUP BY v % 2") }
    assert(e1.getMessage.contains("plain column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CREATE MATERIALIZED VIEW x AS " +
        s"SELECT v, avg(k) FROM $fqn GROUP BY v") }
    assert(e2.getMessage.contains("supported aggregate"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("CREATE MATERIALIZED VIEW x AS " +
        s"SELECT v, count(*) FROM $fqn JOIN $fqn USING (k) GROUP BY v") }
    assert(e3.getMessage.contains("single GROUP BY"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql(s"REFRESH MATERIALIZED VIEW $fqn") }
    assert(e4.getMessage.contains("_mv_"), e4.getMessage)
  }
}
