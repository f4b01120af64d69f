package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Persistent SQL views over the graft catalog (parser seam +
  * GraftViewSubstitution): create/select/replace/drop lifecycle,
  * late binding, nesting, context pinning, and the refusals (temp
  * capture, self-reference, writes, name collisions). */
class GraftViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val fqn: String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vw")
    val t = "graft.vw.base"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, grp STRING, v DOUBLE) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, concat('g', id % 3), id * 1.0 " +
      "FROM range(100)")
    t
  }

  test("create / select through / or-replace / drop lifecycle") {
    fqn
    spark.sql("DROP VIEW IF EXISTS graft.vw.v_small")
    spark.sql(s"CREATE VIEW graft.vw.v_small AS " +
      s"SELECT k, v FROM $fqn WHERE k < 10")
    assert(spark.sql("SELECT count(*) FROM graft.vw.v_small")
      .head().getLong(0) == 10)
    // views compose with further SQL (filter + agg over the view)
    assert(spark.sql("SELECT sum(v) FROM graft.vw.v_small WHERE k >= 5")
      .head().getDouble(0) == (5 to 9).sum.toDouble)
    // qualification through the view alias works
    assert(spark.sql(
      "SELECT v_small.k FROM graft.vw.v_small WHERE v_small.k = 3")
      .head().getLong(0) == 3)
    spark.sql(s"CREATE OR REPLACE VIEW graft.vw.v_small AS " +
      s"SELECT k FROM $fqn WHERE k < 5")
    assert(spark.sql("SELECT count(*) FROM graft.vw.v_small")
      .head().getLong(0) == 5)
    spark.sql("DROP VIEW graft.vw.v_small")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.vw.v_small").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"))
    // second DROP without IF EXISTS refuses; with IF EXISTS is silent
    assertThrows[Exception] { spark.sql("DROP VIEW graft.vw.v_small") }
    spark.sql("DROP VIEW IF EXISTS graft.vw.v_small")
  }

  test("views are late-binding: new base rows show through") {
    fqn
    spark.sql("DROP VIEW IF EXISTS graft.vw.v_all")
    spark.sql(s"CREATE VIEW graft.vw.v_all AS SELECT k FROM $fqn")
    val before = spark.sql("SELECT count(*) FROM graft.vw.v_all")
      .head().getLong(0)
    spark.sql(s"INSERT INTO $fqn VALUES (1000, 'gx', 1.0)")
    val after = spark.sql("SELECT count(*) FROM graft.vw.v_all")
      .head().getLong(0)
    assert(after == before + 1)
    spark.sql("DROP VIEW graft.vw.v_all")
  }

  test("views nest and SHOW VIEWS lists them") {
    fqn
    spark.sql("DROP VIEW IF EXISTS graft.vw.v_outer")
    spark.sql("DROP VIEW IF EXISTS graft.vw.v_inner")
    spark.sql(s"CREATE VIEW graft.vw.v_inner AS " +
      s"SELECT k, grp FROM $fqn WHERE k < 50")
    spark.sql("CREATE VIEW graft.vw.v_outer AS " +
      "SELECT grp, count(*) AS n FROM graft.vw.v_inner GROUP BY grp")
    val rows = spark.sql(
      "SELECT grp, n FROM graft.vw.v_outer ORDER BY grp").collect()
    assert(rows.map(_.getLong(1)).sum == 50)
    val listed = spark.sql("SHOW VIEWS IN graft.vw").collect()
      .map(_.getString(1)).toSet
    assert(listed == Set("v_inner", "v_outer"))
    spark.sql("DROP VIEW graft.vw.v_outer")
    spark.sql("DROP VIEW graft.vw.v_inner")
  }

  test("stored relative references are pinned to the creation context") {
    fqn
    spark.sql("DROP VIEW IF EXISTS graft.vw.v_rel")
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name
    spark.sql("USE graft.vw")
    try {
      // 1-part base reference, resolvable only in the creation context
      spark.sql("CREATE VIEW v_rel AS SELECT k FROM base WHERE k < 7")
      spark.sql(s"USE spark_catalog.default")
      assert(spark.sql("SELECT count(*) FROM graft.vw.v_rel")
        .head().getLong(0) == 7)
    } finally {
      spark.sql(s"USE $prevCat.default")
      spark.catalog.setCurrentCatalog(prevCat)
      spark.sql("DROP VIEW IF EXISTS graft.vw.v_rel")
    }
  }

  test("refusals: temp capture, self-reference, writes, collisions") {
    fqn
    spark.range(3).createOrReplaceTempView("tmp_vw_probe")
    val e1 = intercept[Exception] {
      spark.sql("CREATE VIEW graft.vw.v_bad AS SELECT * FROM tmp_vw_probe")
    }
    assert(e1.getMessage.contains("TEMPORARY"))
    spark.sql("DROP VIEW IF EXISTS graft.vw.v_self")
    spark.sql(s"CREATE VIEW graft.vw.v_self AS SELECT k FROM $fqn")
    val e2 = intercept[Exception] {
      spark.sql("CREATE OR REPLACE VIEW graft.vw.v_self AS " +
        "SELECT k FROM graft.vw.v_self")
    }
    assert(e2.getMessage.contains("reference itself"))
    val e3 = intercept[Exception] {
      spark.sql("INSERT INTO graft.vw.v_self VALUES (1)")
    }
    assert(e3.getMessage.contains("INSERT into view"))
    // a table name cannot be shadowed by a view, nor vice versa
    val e4 = intercept[Exception] {
      spark.sql(s"CREATE VIEW graft.vw.base AS SELECT 1 AS x")
    }
    assert(e4.getMessage.contains("TABLE of that name exists"))
    val e5 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.vw.v_self (k BIGINT) " +
        "TBLPROPERTIES('keyCols'='k')")
    }
    assert(e5.getMessage.contains("VIEW of that name exists"))
    // a broken body fails at CREATE, not at first use
    assertThrows[Exception] {
      spark.sql("CREATE VIEW graft.vw.v_bad2 AS " +
        "SELECT nope FROM graft.vw.base")
    }
    spark.sql("DROP VIEW graft.vw.v_self")
  }

  test("temp views shadow stored views; DROP VIEW still drops temps") {
    fqn
    spark.sql("USE graft.vw")
    try {
      spark.sql("DROP VIEW IF EXISTS graft.vw.shadow_t")
      spark.sql(s"CREATE VIEW graft.vw.shadow_t AS SELECT k FROM base")
      spark.range(3).createOrReplaceTempView("shadow_t")
      // unqualified name resolves the TEMP view (stock precedence)
      assert(spark.sql("SELECT count(*) FROM shadow_t")
        .head().getLong(0) == 3)
      // DROP VIEW on the unqualified name drops the TEMP view
      spark.sql("DROP VIEW shadow_t")
      assert(!spark.catalog.tableExists("shadow_t"))
      // the stored view remains, reachable by its qualified name
      assert(spark.sql("SELECT count(*) FROM graft.vw.shadow_t")
        .head().getLong(0) > 3)
      spark.sql("DROP VIEW graft.vw.shadow_t")
    } finally {
      spark.sql("USE spark_catalog.default")
    }
  }
}
