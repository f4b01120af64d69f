package graft.catalog

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.MetadataBuilder
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.TestSpark

/** Replay of the reference's `HBaseAdvancedSQLQuerySuite` (/root/reference
  * HBaseAdvancedSQLQuerySuite.scala:28-68) over its `ta` fixture
  * (TestBaseWithSplitData.scala:93-96 DDL + insertTestData:107-205): a
  * 3-dimension composite key `(col7 INT, col1 STRING, col3 SHORT)` with
  * NEGATIVE leading-key values across multiple regions — the
  * sign-flip order-preserving encoding is what the splits exercise —
  * plus the suite's DSL-face queries and DataFrame metadata
  * propagation over the scan.
  */
class AdvancedParitySuite extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  // (col7, col1, col3, col2, col4, col5, col6) as inserted by
  // insertTestData (reference rows, reordered here as key-first)
  private val rows = Seq(
    (-257, " n257 ", 128, 1, -2048), (-255, " n255 ", 128, 2, -1024),
    (-129, " n129 ", 128, 3, -512), (-127, " n127 ", 128, 4, -256),
    (-33, " n33 ", 128, 5, -128), (-31, " n31 ", 128, 6, -64),
    (-1, " n1 ", 128, 7, -1), (1, " p1 ", 128, 8, 1),
    (31, " p31 ", 128, 9, 4), (33, " p33 ", 128, 10, 64),
    (127, " p127 ", 128, 11, 128), (129, " p129 ", 128, 12, 256),
    (255, " p255 ", 128, 13, 512), (257, " p257 ", 128, 14, 1024))

  override def beforeAll(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.refadv")
    spark.sql("DROP TABLE IF EXISTS graft.refadv.ta")
    // reference DDL (TestBaseWithSplitData:93-96), multi-region like
    // useMultiplePartitions=true; splits on the leading INT dimension
    // cross zero so the sign-flip encoding is load-bearing
    spark.sql(
      """CREATE TABLE graft.refadv.ta (
        |  col1 STRING, col2 TINYINT, col3 SMALLINT, col4 INT,
        |  col5 BIGINT, col6 FLOAT, col7 INT)
        |TBLPROPERTIES('keyCols'='col7;col1;col3',
        |              'regionSplits'='-128;0;128')""".stripMargin)
    val values = rows.map { case (c7, c1, c3, c2, c4) =>
      s"('$c1', ${c2}Y, ${c3}S, $c4, 12345678901234L, " +
        s"CAST(1234.5678 AS FLOAT), $c7)"
    }.mkString(", ")
    spark.sql(s"INSERT INTO graft.refadv.ta VALUES $values")
  }

  override def afterAll(): Unit =
    spark.sql("DROP TABLE IF EXISTS graft.refadv.ta")

  test("aggregation with codegen: 14 distinct col1 groups") {
    assert(spark.sql("SELECT col1 FROM graft.refadv.ta GROUP BY col1")
      .collect().length == 14)
  }

  test("dsl simple select 0 (where on key / non-key, order, project)") {
    import org.apache.spark.sql.functions.col
    val tableA = spark.sql("SELECT * FROM graft.refadv.ta")
    assert(tableA.where(col("col7") === 1).orderBy(col("col2").asc)
      .select(col("col4")).collect().toSeq == Seq(Row(1)))
    assert(tableA.where(col("col2") === 6).orderBy(col("col2").asc)
      .select(col("col7")).collect().toSeq == Seq(Row(-31)))
  }

  test("metadata is propagated correctly through scans and joins") {
    import org.apache.spark.sql.functions.col
    val tableA = spark.sql("SELECT col7, col1, col3 FROM graft.refadv.ta")
    val metadata = new MetadataBuilder().putString("doc", "first name").build()
    val schema = tableA.schema
    val schemaWithMeta = org.apache.spark.sql.types.StructType(Array(
      schema("col7"), schema("col1").copy(metadata = metadata),
      schema("col3")))
    val withMeta = spark.createDataFrame(tableA.rdd, schemaWithMeta)
    withMeta.createOrReplaceTempView("ta_meta")
    import spark.implicits._
    Seq((1, 100.0), (-31, 200.0)).toDF("personId", "salary")
      .createOrReplaceTempView("salary_ref")
    def check(df: org.apache.spark.sql.DataFrame): Unit =
      assert(df.schema("col1").metadata.getString("doc") == "first name")
    check(withMeta.select(col("col1")))
    check(withMeta.select(col("col7"), col("col1")))
    check(spark.sql("SELECT * FROM ta_meta"))
    check(spark.sql("SELECT col7, col1 FROM ta_meta"))
    check(spark.sql(
      "SELECT * FROM ta_meta JOIN salary_ref ON col7 = personId"))
    check(spark.sql(
      """SELECT col1, salary FROM ta_meta
        |JOIN salary_ref ON col7 = personId""".stripMargin))
  }

  test("negative leading keys prune correctly across the zero split") {
    val q = spark.sql(
      "SELECT col1 FROM graft.refadv.ta WHERE col7 BETWEEN -129 AND -31")
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      Seq(" n127 ", " n129 ", " n33 ", " n31 ").sorted)
    // interval (-129..-31) lies inside the (-128, 0) band plus one
    // straddle below: at most 2 of the 4 fixed regions scan
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    scan.foreach(b => assert(b.inputRDD.getNumPartitions <= 2,
      s"expected <=2 regions, got ${b.inputRDD.getNumPartitions}"))
  }
}
