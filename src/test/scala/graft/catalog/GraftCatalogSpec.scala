package graft.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.TestSpark

/** End-to-end DDL → bulk insert → pruned scan through the V2 catalog. */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  override def beforeAll(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.t1")
  }

  test("create table requires keyCols") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.t1.bad (a INT, b STRING)")
    }
    assert(e.getMessage.contains("keyCols"))
  }

  test("create, describe, insert, select round trip") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.orders_t")
    spark.sql(
      """CREATE TABLE graft.t1.orders_t (
        |  o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        |  o_totalprice DOUBLE, o_orderdate DATE)
        |TBLPROPERTIES('keyCols'='o_orderkey', 'numRegions'='8')""".stripMargin)
    assert(spark.sql("SHOW TABLES IN graft.t1").collect()
      .map(_.getString(1)).contains("orders_t"))

    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .createOrReplaceTempView("orders_src")
    spark.sql("INSERT INTO graft.t1.orders_t SELECT * FROM orders_src")

    val n = spark.table("graft.t1.orders_t").count()
    val expected = spark.table("orders_src").count()
    assert(n == expected)

    // point lookup matches the parquet source
    val got = spark.sql(
      "SELECT o_custkey FROM graft.t1.orders_t WHERE o_orderkey = 100")
      .collect().map(_.getLong(0)).toSeq
    val want = spark.sql(
      "SELECT o_custkey FROM orders_src WHERE o_orderkey = 100")
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("write produced multiple key-sorted disjoint regions") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("t1"), "orders_t")).asInstanceOf[GraftTable]
    val regions = TableMeta.loadRegions(t.tableDir)
    assert(regions.size > 1, s"expected multiple regions, got ${regions.size}")
    // each region's [min,max] in hex; sorted and pairwise disjoint
    val sorted = regions.sortBy(_.mins.head)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxs.head <= b.mins.head,
        s"overlapping regions: ${a.maxs.head} vs ${b.mins.head}")
      case _ =>
    }
    // rows inside each file are sorted by the key
    val f = new java.io.File(t.tableDir, sorted.head.file).getPath
    val keys = spark.read.parquet(f).select("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted)
  }

  test("region pruning selects a strict subset for key predicates") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("t1"), "orders_t")).asInstanceOf[GraftTable]
    val total = TableMeta.loadRegions(t.tableDir).size

    def planned(filters: Array[sources.Filter]): Int = {
      val b = t.newScanBuilder(CaseInsensitiveStringMap.empty())
        .asInstanceOf[GraftScanBuilder]
      b.pushFilters(filters)
      b.build().asInstanceOf[GraftScan].planInputPartitions().length
    }
    assert(planned(Array(sources.EqualTo("o_orderkey", 100L))) == 1)
    assert(planned(Array(sources.LessThan("o_orderkey", 5L))) <= 2)
    assert(planned(Array.empty) == total)
    // IS NULL on a key column proves empty (keys are non-null)
    assert(planned(Array(sources.IsNull("o_orderkey"))) == 0)
  }

  test("aggregation and join over the catalog table match parquet") {
    val viaCatalog = spark.sql(
      """SELECT o_orderstatus, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM graft.t1.orders_t WHERE o_orderkey <= 500
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val viaParquet = spark.sql(
      """SELECT o_orderstatus, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders_src WHERE o_orderkey <= 500
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      .collect().map(_.toSeq).toSeq
    assert(viaCatalog == viaParquet)
  }

  test("null key values are rejected at write time") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.nullkey")
    spark.sql(
      """CREATE TABLE graft.t1.nullkey (k INT, v STRING)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.t1.nullkey VALUES (1, 'a'), (NULL, 'b')")
    }
    assert(e.getMessage != null)
    spark.sql("DROP TABLE graft.t1.nullkey")
  }

  test("alter table add/drop non-key column; key column drop rejected") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.alt")
    spark.sql(
      """CREATE TABLE graft.t1.alt (k INT, v STRING)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    spark.sql("INSERT INTO graft.t1.alt VALUES (1, 'a')")
    spark.sql("ALTER TABLE graft.t1.alt ADD COLUMN extra DOUBLE")
    // old files lack the new column -> reads as null
    val r = spark.sql("SELECT k, v, extra FROM graft.t1.alt").collect()
    assert(r.length == 1 && r.head.isNullAt(2))
    spark.sql("INSERT INTO graft.t1.alt VALUES (2, 'b', 3.5)")
    val r2 = spark.sql("SELECT extra FROM graft.t1.alt WHERE k = 2").collect()
    assert(r2.head.getDouble(0) == 3.5)
    spark.sql("ALTER TABLE graft.t1.alt DROP COLUMN extra")
    assert(!spark.table("graft.t1.alt").columns.contains("extra"))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.t1.alt DROP COLUMN k")
    }
    assert(e.getMessage.contains("key column"))
    spark.sql("DROP TABLE graft.t1.alt")
  }

  test("composite string+numeric key with date/timestamp columns") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.comp")
    spark.sql(
      """CREATE TABLE graft.t1.comp (
        |  name STRING, seq INT, d DATE, ts TIMESTAMP, v DOUBLE)
        |TBLPROPERTIES('keyCols'='name;seq')""".stripMargin)
    spark.sql(
      """INSERT INTO graft.t1.comp VALUES
        |('b', 2, DATE'2020-01-02', TIMESTAMP'2020-01-02 03:04:05.123456', 2.0),
        |('a', 1, DATE'2020-01-01', TIMESTAMP'2020-01-01 00:00:00', 1.0),
        |('a', 2, NULL, NULL, NULL)""".stripMargin)
    val rows = spark.sql(
      "SELECT name, seq, CAST(d AS STRING), CAST(ts AS STRING), v " +
        "FROM graft.t1.comp ORDER BY name, seq").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "a" && rows(0).getInt(1) == 1)
    assert(rows(0).getString(2) == "2020-01-01")
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(3) && rows(1).isNullAt(4))
    assert(rows(2).getString(3) == "2020-01-02 03:04:05.123456")
    // prune on the first key dimension only (prefix predicate)
    val a = spark.sql("SELECT count(*) FROM graft.t1.comp WHERE name = 'a'")
      .collect().head.getLong(0)
    assert(a == 2)
    spark.sql("DROP TABLE graft.t1.comp")
  }

  test("count(keycol) answered from the manifest (non-null keys)") {
    val df = spark.sql(
      "SELECT count(o_orderkey) AS c FROM graft.t1.orders_t")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("GraftAggScan"), s"count(key) not pushed:\n$p")
    assert(df.collect().head.getLong(0) ==
      spark.table("orders_src").count())
    // count on a NULLABLE non-key column pushes too: the manifest's
    // per-region null counts (ColStats) make totalRows - nulls exact
    val nk = spark.sql(
      "SELECT count(o_custkey) AS c FROM graft.t1.orders_t")
    assert(nk.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      .contains("GraftAggScan"))
    assert(nk.collect().head.getLong(0) ==
      spark.sql("SELECT count(o_custkey) FROM orders_src")
        .collect().head.getLong(0))
  }

  test("min/max/count on non-key columns answered from column stats") {
    // exact for integral/date types; nulls excluded from min/max
    spark.sql("DROP TABLE IF EXISTS graft.t1.nkagg")
    spark.sql(
      """CREATE TABLE graft.t1.nkagg (k BIGINT, d DATE, n INT, s STRING)
        |TBLPROPERTIES('keyCols'='k', 'numRegions'='4')""".stripMargin)
    spark.sql(
      """INSERT INTO graft.t1.nkagg
        |SELECT id, date_add(DATE'2024-01-01', CAST(id % 50 AS INT)),
        |       CASE WHEN id % 7 = 0 THEN NULL ELSE CAST(id * 3 AS INT) END,
        |       concat('s', id)
        |FROM range(700)""".stripMargin)
    val df = spark.sql(
      """SELECT min(d) AS dlo, max(d) AS dhi, min(n) AS nlo,
        |       max(n) AS nhi, count(n) AS nc, count(s) AS sc
        |FROM graft.t1.nkagg""".stripMargin)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("GraftAggScan"), s"non-key agg not pushed:\n$p")
    val r = df.collect().head
    assert(r.getDate(0).toString == "2024-01-01" &&
      r.getDate(1).toString == "2024-02-19")
    assert(r.getInt(2) == 3 && r.getInt(3) == 699 * 3) // id=0 -> null
    assert(r.getLong(4) == 700L - 100L) // 100 multiples of 7 under 700
    assert(r.getLong(5) == 700L) // strings: count pushes, bounds don't
    // min/max on a STRING column must NOT push (bounds may truncate)
    val sm = spark.sql("SELECT min(s) FROM graft.t1.nkagg")
    assert(!sm.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      .contains("GraftAggScan"))
    assert(sm.collect().head.getString(0) == "s0")
    spark.sql("DROP TABLE graft.t1.nkagg")
  }

  test("count/min/max on keys answered from the manifest (agg pushdown)") {
    val df = spark.sql("SELECT count(*) AS c, min(o_orderkey) AS mn, " +
      "max(o_orderkey) AS mx FROM graft.t1.orders_t")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("GraftAggScan"), s"aggregate not pushed:\n$p")
    val r = df.collect().head
    val e = spark.sql("SELECT count(*), min(o_orderkey), max(o_orderkey) " +
      "FROM orders_src").collect().head
    assert(r.getLong(0) == e.getLong(0))
    assert(r.getLong(1) == e.getLong(1) && r.getLong(2) == e.getLong(2))
    // with a filter the pushdown must NOT trigger; result stays correct
    val f = spark.sql("SELECT count(*) FROM graft.t1.orders_t " +
      "WHERE o_orderkey <= 100")
    assert(!f.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      .contains("GraftAggScan"))
    assert(f.collect().head.getLong(0) ==
      spark.sql("SELECT count(*) FROM orders_src WHERE o_orderkey <= 100")
        .collect().head.getLong(0))
    // avg is not metadata-answerable -> falls back to a real scan
    val a = spark.sql(
      "SELECT round(avg(o_totalprice), 2) FROM graft.t1.orders_t")
    assert(a.collect().head.getDouble(0) ==
      spark.sql("SELECT round(avg(o_totalprice), 2) FROM orders_src")
        .collect().head.getDouble(0))
  }

  test("UDF in WHERE stays residual and answers correctly") {
    // reference: UDFs are never pushed down (ScanPredClassifier catch-all)
    spark.udf.register("graft_is_even", (x: Long) => x % 2 == 0)
    val got = spark.sql(
      "SELECT count(*) FROM graft.t1.orders_t " +
        "WHERE graft_is_even(o_orderkey) AND o_orderkey <= 100")
      .collect().head.getLong(0)
    val want = spark.sql(
      "SELECT count(*) FROM orders_src " +
        "WHERE o_orderkey % 2 = 0 AND o_orderkey <= 100")
      .collect().head.getLong(0)
    assert(got == want && got > 0)
  }

  test("131-region parallel bulk load (reference's largest region count)") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.orders_many")
    spark.sql(
      """CREATE TABLE graft.t1.orders_many (
        |  o_orderkey BIGINT, o_totalprice DOUBLE)
        |TBLPROPERTIES('keyCols'='o_orderkey', 'numRegions'='131')"""
        .stripMargin)
    spark.sql("INSERT INTO graft.t1.orders_many " +
      "SELECT o_orderkey, o_totalprice FROM orders_src")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("t1"), "orders_many")).asInstanceOf[GraftTable]
    val regions = TableMeta.loadRegions(t.tableDir)
    assert(regions.size > 100, s"got ${regions.size} regions")
    assert(regions.map(_.rows).sum ==
      spark.table("orders_src").count())
    // point lookup prunes to one of the many regions
    val b = t.newScanBuilder(CaseInsensitiveStringMap.empty())
      .asInstanceOf[GraftScanBuilder]
    b.pushFilters(Array(sources.EqualTo("o_orderkey", 750L)))
    assert(b.build().asInstanceOf[GraftScan].planInputPartitions().length == 1)
    spark.sql("DROP TABLE graft.t1.orders_many")
  }

  test("runtime (dynamic) filters re-prune regions at execution time") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("t1"), "orders_t")).asInstanceOf[GraftTable]
    val b = t.newScanBuilder(CaseInsensitiveStringMap.empty())
      .asInstanceOf[GraftScanBuilder]
    b.pushFilters(Array.empty)
    val scan = b.build().asInstanceOf[GraftScan]
    val total = scan.planInputPartitions().length
    assert(total > 1)
    // the key column leads; stat-covered non-key columns are runtime-
    // filterable too (ColStats region skipping on broadcast key sets)
    val attrs = scan.filterAttributes().map(_.fieldNames.head)
    assert(attrs.head == "o_orderkey")
    assert(attrs.toSet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate"))
    // Spark injects the broadcast build side's key set at runtime
    scan.filter(Array[sources.Filter](sources.In("o_orderkey",
      Array(100L, 101L, 102L): Array[Any])))
    assert(scan.planInputPartitions().length == 1)
  }

  test("CTAS creates and loads a key-organized table") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.ctas_t")
    spark.sql(
      """CREATE TABLE graft.t1.ctas_t
        |TBLPROPERTIES('keyCols'='o_orderkey', 'numRegions'='4')
        |AS SELECT o_orderkey, o_totalprice FROM orders_src
        |   WHERE o_orderkey <= 1000""".stripMargin)
    val n = spark.table("graft.t1.ctas_t").count()
    val e = spark.sql(
      "SELECT count(*) FROM orders_src WHERE o_orderkey <= 1000")
      .collect().head.getLong(0)
    assert(n == e && n > 0)
    spark.sql("DROP TABLE graft.t1.ctas_t")
  }

  test("unsupported DDL fails with reference-parity errors") {
    // nested maps are not storable (atomics, DECIMAL, BINARY, ARRAY of
    // atomic only; DECIMAL non-key columns are storable as of round 6)
    val e1 = intercept[Exception] {
      spark.sql(
        "CREATE TABLE graft.t1.badtype (k INT, v MAP<STRING, INT>) " +
          "TBLPROPERTIES('keyCols'='k')")
    }
    assert(e1.getMessage.contains("not storable"))
    spark.sql("DROP TABLE IF EXISTS graft.t1.badtype")
    // rename is unsupported, mirroring the reference
    spark.sql("DROP TABLE IF EXISTS graft.t1.ren1")
    spark.sql("CREATE TABLE graft.t1.ren1 (k INT) " +
      "TBLPROPERTIES('keyCols'='k')")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.t1.ren1 RENAME TO graft.t1.ren2")
    }
    assert(e2.getMessage.toLowerCase.contains("rename"))
    spark.sql("DROP TABLE graft.t1.ren1")
    // PARTITIONED BY is rejected (keys organize storage instead)
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.t1.badpart (k INT, p INT) " +
        "PARTITIONED BY (p) TBLPROPERTIES('keyCols'='k')")
    }
    assert(e3.getMessage.contains("keyCols") ||
      e3.getMessage.contains("PARTITIONED"))
  }

  test("encodingFormat property: stringformat accepted, bogus rejected") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.strfmt")
    spark.sql(
      """CREATE TABLE graft.t1.strfmt (strkey STRING, q INT, cost DOUBLE)
        |TBLPROPERTIES('keyCols'='strkey',
        |              'encodingFormat'='stringformat')""".stripMargin)
    spark.sql("INSERT INTO graft.t1.strfmt VALUES " +
      "('01857000000007', 31, 11.41), ('01857000000008', 37, 63.63)")
    // identical query semantics under either encoding (reference's
    // stringformat suite re-runs the same goldens)
    val r = spark.sql("SELECT q, cost FROM graft.t1.strfmt " +
      "WHERE strkey = '01857000000007'").collect()
    assert(r.length == 1 && r.head.getInt(0) == 31)
    assert(spark.sql("SELECT count(*) FROM graft.t1.strfmt " +
      "WHERE strkey > '01857000000007'").collect().head.getLong(0) == 1)
    spark.sql("DROP TABLE graft.t1.strfmt")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.t1.badenc (k INT) " +
        "TBLPROPERTIES('keyCols'='k', 'encodingFormat'='protobuf')")
    }
    assert(e.getMessage.contains("encodingFormat"))
  }

  test("empty table: scans return nothing, manifest aggregates null/zero") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.empty_t")
    spark.sql("CREATE TABLE graft.t1.empty_t (k INT, v DOUBLE) " +
      "TBLPROPERTIES('keyCols'='k')")
    assert(spark.table("graft.t1.empty_t").count() == 0)
    assert(spark.sql("SELECT * FROM graft.t1.empty_t WHERE k = 5")
      .collect().isEmpty)
    val r = spark.sql(
      "SELECT count(*) AS c, min(k) AS mn, max(k) AS mx " +
        "FROM graft.t1.empty_t").collect().head
    assert(r.getLong(0) == 0 && r.isNullAt(1) && r.isNullAt(2))
    // non-pushable aggregate over empty data
    assert(spark.sql("SELECT avg(v) FROM graft.t1.empty_t")
      .collect().head.isNullAt(0))
    spark.sql("DROP TABLE graft.t1.empty_t")
  }

  test("string-keyed manifest aggregate decodes min/max correctly") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.strkey_t")
    spark.sql("CREATE TABLE graft.t1.strkey_t (name STRING, n INT) " +
      "TBLPROPERTIES('keyCols'='name')")
    spark.sql("INSERT INTO graft.t1.strkey_t VALUES " +
      "('mango', 1), ('apple', 2), ('zebra', 3)")
    val df = spark.sql(
      "SELECT min(name) AS mn, max(name) AS mx FROM graft.t1.strkey_t")
    assert(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      .contains("GraftAggScan"))
    val r = df.collect().head
    assert(r.getString(0) == "apple" && r.getString(1) == "zebra")
    spark.sql("DROP TABLE graft.t1.strkey_t")
  }

  test("insert with explicit column list and defaults-to-null") {
    spark.sql("DROP TABLE IF EXISTS graft.t1.collist")
    spark.sql(
      """CREATE TABLE graft.t1.collist (k INT, a STRING, b DOUBLE)
        |TBLPROPERTIES('keyCols'='k')""".stripMargin)
    // partial column list: unmentioned column becomes null
    spark.sql("INSERT INTO graft.t1.collist (k, a) VALUES (1, 'x')")
    // reordered column list
    spark.sql("INSERT INTO graft.t1.collist (b, k, a) VALUES (2.5, 2, 'y')")
    val rows = spark.sql(
      "SELECT k, a, b FROM graft.t1.collist ORDER BY k").collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "x" &&
      rows(0).isNullAt(2))
    assert(rows(1).getInt(0) == 2 && rows(1).getString(1) == "y" &&
      rows(1).getDouble(2) == 2.5)
    // arity mismatch is an analysis error
    intercept[Exception] {
      spark.sql("INSERT INTO graft.t1.collist VALUES (3, 'z')")
    }
    spark.sql("DROP TABLE graft.t1.collist")
  }

  test("drop table and namespace") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.t2")
    spark.sql(
      """CREATE TABLE graft.t2.tmp (k INT) TBLPROPERTIES('keyCols'='k')""")
    assert(spark.sql("SHOW TABLES IN graft.t2").count() == 1)
    spark.sql("DROP TABLE graft.t2.tmp")
    assert(spark.sql("SHOW TABLES IN graft.t2").count() == 0)
    spark.sql("DROP NAMESPACE graft.t2")
  }
}
