package graft.catalog

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.TestSpark

/** The reference's own TPC-DS-derived golden corpus, replayed against
  * the graft catalog: same DDL semantics (2-dim composite key, 21
  * family-mapped measure columns), same 100-row store_sales fixture
  * (loaded read-only from /root/reference test resources), same 36
  * queries with the reference's asserted results
  * (/root/reference HBaseTpcMiniTestSuite.scala:107-339).
  *
  * One deliberate re-reading: the reference's Query 7.1 comments
  * "should not be null?" on `sum(ss_wholesale_cost)` being null for
  * item 17183 — but that row's ss_wholesale_cost IS null in the
  * fixture, so the null sum is standard SQL; we assert it as correct.
  */
class TpcMiniSuite extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val csv = "/root/reference/src/test/resources/store_sales.txt"

  private val intCols = Seq("ss_sold_date_sk", "ss_sold_time_sk",
    "ss_item_sk", "ss_customer_sk", "ss_cdemo_sk", "ss_hdemo_sk",
    "ss_addr_sk", "ss_store_sk", "ss_promo_sk", "ss_ticket_number",
    "ss_quantity")
  private val floatCols = Seq("ss_wholesale_cost", "ss_list_price",
    "ss_sales_price", "ss_ext_discount_amt", "ss_ext_sales_price",
    "ss_ext_wholesale_cost", "ss_ext_list_price", "ss_ext_tax",
    "ss_coupon_amt", "ss_net_paid", "ss_net_paid_inc_tax",
    "ss_net_profit")
  private val schema = StructType(
    (intCols.map(StructField(_, IntegerType, nullable = true)) ++
      floatCols.map(StructField(_, FloatType, nullable = true)))
      .sortBy(f => (intCols ++ floatCols).indexOf(f.name)))

  // fixture column order: date,time,item,customer,cdemo,hdemo,addr,store,
  // promo,ticket,quantity, then the 12 float measures
  private val csvOrder = Seq("ss_sold_date_sk", "ss_sold_time_sk",
    "ss_item_sk", "ss_customer_sk", "ss_cdemo_sk", "ss_hdemo_sk",
    "ss_addr_sk", "ss_store_sk", "ss_promo_sk", "ss_ticket_number",
    "ss_quantity") ++ floatCols

  override def beforeAll(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tpc")
    spark.sql("DROP TABLE IF EXISTS graft.tpc.store_sales")
    val nonKey = (intCols ++ floatCols)
      .filterNot(c => c == "ss_item_sk" || c == "ss_ticket_number")
      .map(c => s"$c,f,$c").mkString(";")
    spark.sql(
      s"""CREATE TABLE graft.tpc.store_sales (
         |  ${csvOrder.map(c => s"$c ${if (intCols.contains(c)) "INT" else "FLOAT"}").mkString(", ")})
         |TBLPROPERTIES('keyCols'='ss_item_sk;ss_ticket_number',
         |              'nonKeyCols'='$nonKey', 'numRegions'='4')""".stripMargin)
    val csvSchema = StructType(csvOrder.map(c => StructField(c,
      if (intCols.contains(c)) IntegerType else FloatType, nullable = true)))
    spark.read.schema(csvSchema).csv(csv)
      .createOrReplaceTempView("store_sales_src")
    spark.sql(
      "INSERT INTO graft.tpc.store_sales SELECT * FROM store_sales_src")
    spark.sql("SELECT * FROM graft.tpc.store_sales")
      .createOrReplaceTempView("store_sales")
  }

  override def afterAll(): Unit =
    spark.sql("DROP TABLE IF EXISTS graft.tpc.store_sales")

  private def run(sql: String): Array[Row] = spark.sql(sql).collect()

  test("Query 0: full count") {
    assert(run("SELECT count(1) FROM store_sales")(0).get(0) == 100)
  }

  test("Query 1-3: point lookup on both key dimensions") {
    val r1 = run("SELECT ss_quantity, ss_wholesale_cost, ss_list_price " +
      "FROM store_sales WHERE ss_item_sk = 2744 AND ss_ticket_number = 1")
    assert(r1(0).get(0) == 37 && r1(0).get(1) == 63.63f &&
      r1(0).get(2) == 101.17f)
    val r2 = run("SELECT ss_sold_date_sk, ss_sold_time_sk, ss_store_sk " +
      "FROM store_sales WHERE ss_item_sk = 2744 AND ss_ticket_number = 1")
    assert(r2(0).get(0) == 2451813 && r2(0).get(1) == 65495 &&
      r2(0).get(2) == 25)
    val r3 = run("SELECT ss_customer_sk, ss_promo_sk, ss_coupon_amt " +
      "FROM store_sales WHERE ss_item_sk = 2744 AND ss_ticket_number = 1")
    assert(r3(0).get(0) == 225006 && r3(0).get(1) == 354 &&
      r3(0).get(2) == 46.03f)
  }

  test("Query 4: group by key prefix") {
    assert(run("SELECT ss_item_sk, count(1) FROM store_sales " +
      "GROUP BY ss_item_sk").length == 100)
  }

  test("Query 5-9: key-range predicates with aggregation") {
    assert(run("SELECT ss_item_sk, ss_ticket_number, count(1) " +
      "FROM store_sales WHERE ss_item_sk > 4000 AND ss_item_sk < 5000 " +
      "GROUP BY ss_item_sk, ss_ticket_number").length == 5)
    assert(run("SELECT ss_item_sk, avg(ss_quantity) AS avg_qty, " +
      "count(ss_quantity) AS cnt_qty FROM store_sales " +
      "WHERE ss_item_sk = 2744 GROUP BY ss_item_sk").length == 1)
    assert(run("SELECT ss_item_sk, ss_ticket_number, " +
      "sum(ss_wholesale_cost) AS s FROM store_sales " +
      "WHERE ss_item_sk > 4000 AND ss_item_sk <= 5000 " +
      "GROUP BY ss_item_sk, ss_ticket_number").length == 5)
    assert(run("SELECT ss_item_sk, ss_ticket_number, " +
      "min(ss_wholesale_cost) AS mn, max(ss_wholesale_cost) AS mx, " +
      "avg(ss_wholesale_cost) AS av FROM store_sales " +
      "WHERE ss_item_sk > 4000 AND ss_item_sk <= 5000 " +
      "GROUP BY ss_item_sk, ss_ticket_number").length == 5)
    assert(run("SELECT ss_item_sk, count(ss_customer_sk) AS c " +
      "FROM store_sales WHERE ss_item_sk > 4000 AND ss_item_sk <= 5000 " +
      "GROUP BY ss_item_sk").length == 5)
  }

  test("Query 7.1: sum over all-null group is null (standard SQL)") {
    val rows = run(
      """SELECT ss_item_sk, ss_ticket_number,
        |       sum(ss_wholesale_cost) AS sum_wholesale_cost
        |FROM store_sales
        |WHERE ss_item_sk > 17182 AND ss_item_sk <= 17183
        |GROUP BY ss_item_sk, ss_ticket_number""".stripMargin)
    assert(rows.length == 1)
    assert(rows(0).get(0) == 17183 && rows(0).get(1) == 6)
    assert(rows(0).isNullAt(2))
  }

  test("Query 10-12: measure predicates and distinct") {
    assert(run("SELECT count(*) FROM store_sales " +
      "WHERE ss_net_profit < 100")(0).get(0) == 74)
    assert(run("SELECT count(*) FROM store_sales WHERE ss_coupon_amt < 50 " +
      "AND ss_ext_discount_amt < 50 AND ss_net_paid < 50 " +
      "AND ss_net_paid_inc_tax < 50")(0).get(0) == 6)
    assert(run("SELECT count(distinct ss_customer_sk) AS c " +
      "FROM store_sales")(0).get(0) == 8)
  }

  test("Query 13-17: limit, IN, mixed predicates") {
    assert(run("SELECT * FROM store_sales LIMIT 100").length == 100)
    assert(run("SELECT ss_customer_sk, count(*) FROM store_sales " +
      "WHERE ss_item_sk >= 4000 AND ss_item_sk <= 5000 " +
      "GROUP BY ss_customer_sk").length == 5)
    assert(run("SELECT count(ss_customer_sk) AS c FROM store_sales " +
      "WHERE ss_customer_sk IN (1,25,50,75,100)")(0).get(0) == 0)
    assert(run("SELECT count(ss_customer_sk) AS c FROM store_sales " +
      "WHERE ss_customer_sk < 100 AND ss_quantity < 5")(0).get(0) == 2)
    assert(run("SELECT count(ss_customer_sk) AS c FROM store_sales " +
      "WHERE ss_customer_sk > 100")(0).get(0) == 83)
  }

  test("Query 18-23: second key dimension alone (no prefix prune)") {
    assert(run("SELECT ss_quantity, ss_wholesale_cost, ss_list_price " +
      "FROM store_sales WHERE ss_ticket_number = 3").length == 14)
    assert(run("SELECT ss_sold_date_sk, ss_sold_time_sk, ss_store_sk " +
      "FROM store_sales WHERE ss_ticket_number = 3").length == 14)
    assert(run("SELECT ss_customer_sk, ss_promo_sk, ss_coupon_amt " +
      "FROM store_sales WHERE ss_ticket_number = 3").length == 14)
    assert(run("SELECT ss_item_sk, ss_ticket_number, count(1) " +
      "FROM store_sales WHERE ss_ticket_number >= 3 " +
      "AND ss_ticket_number <= 4 " +
      "GROUP BY ss_item_sk, ss_ticket_number").length == 24)
    assert(run("SELECT ss_item_sk, ss_ticket_number, " +
      "sum(ss_wholesale_cost) AS s FROM store_sales " +
      "WHERE ss_ticket_number >= 3 AND ss_ticket_number <= 4 " +
      "GROUP BY ss_item_sk, ss_ticket_number").length == 24)
    assert(run("SELECT ss_item_sk, ss_ticket_number, " +
      "min(ss_wholesale_cost) AS mn, max(ss_wholesale_cost) AS mx, " +
      "avg(ss_wholesale_cost) AS av FROM store_sales " +
      "WHERE ss_ticket_number >= 3 AND ss_ticket_number <= 3 " +
      "GROUP BY ss_item_sk, ss_ticket_number").length == 14)
  }

  test("Query 24-27: conjunctions and arithmetic predicates") {
    assert(run("SELECT ss_item_sk, ss_ticket_number FROM store_sales " +
      "WHERE (ss_item_sk = 186 AND ss_ticket_number > 0)").length == 1)
    assert(run("SELECT * FROM store_sales WHERE ss_ticket_number > 6 " +
      "AND ss_sold_date_sk > 0").length == 21)
    assert(run("SELECT * FROM store_sales WHERE ss_ticket_number = 7 " +
      "AND ss_sold_date_sk > 0").length == 12)
    assert(run("SELECT * FROM store_sales WHERE ss_ticket_number + 0 = 3 " +
      "AND ss_sold_date_sk + 0 > 0").length == 13)
  }

  test("Query 28-34: null semantics of sparse columns") {
    assert(run("SELECT * FROM store_sales " +
      "WHERE ss_sold_date_sk IS NULL").length == 5)
    assert(run("SELECT * FROM store_sales " +
      "WHERE ss_sold_date_sk IS NOT NULL").length == 95)
    assert(run("SELECT * FROM store_sales WHERE ss_sold_date_sk IS NOT NULL " +
      "AND ss_ticket_number = 3").length == 13)
    assert(run("SELECT * FROM store_sales WHERE ss_sold_date_sk IS NULL " +
      "AND ss_ticket_number = 3").length == 1)
    assert(run("SELECT * FROM store_sales WHERE ss_sold_date_sk IS NULL " +
      "OR ss_ticket_number = 3").length == 18)
    assert(run("SELECT ss_hdemo_sk FROM store_sales " +
      "WHERE ss_sold_date_sk IS NULL AND ss_sold_time_sk = 75316").length == 1)
    assert(run("SELECT 1 FROM store_sales " +
      "WHERE ss_sold_date_sk IS NULL").length == 5)
  }
}
