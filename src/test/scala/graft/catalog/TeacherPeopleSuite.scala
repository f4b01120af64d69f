package graft.catalog

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.TestSpark

/** The reference's teacher/people fixtures and goldens
  * (/root/reference HBaseAdditionalQuerySuite.scala:78-238): a 3-dim
  * (int,int,string) key table and a people table with null cells from
  * short CSV lines; UNION across tables, key-ordered sort+limit, the
  * DataFrame API over catalog tables, disjunctive key predicates, and
  * a UDF in WHERE. The reference runs these under a 2×2
  * coprocessor/custom-filter config matrix to prove mode-independent
  * semantics; graft has no modes — one result set, same goldens. */
class TeacherPeopleSuite extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val res = "/root/reference/src/test/resources"

  override def beforeAll(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ref")
    spark.sql("DROP TABLE IF EXISTS graft.ref.teacher")
    spark.sql(
      """CREATE TABLE graft.ref.teacher (
        |  grade INT, class INT, subject STRING, teacher_name STRING,
        |  teacher_age INT)
        |TBLPROPERTIES('keyCols'='grade;class;subject', 'numRegions'='1',
        |  'nonKeyCols'='teacher_name,cf,a;teacher_age,cf,b')""".stripMargin)
    GraftBulkLoad.loadCsv(spark, s"$res/teacher.txt", "graft.ref.teacher")

    spark.sql("DROP TABLE IF EXISTS graft.ref.people")
    spark.sql(
      """CREATE TABLE graft.ref.people (
        |  rowNum INT, people_name STRING, people_age INT,
        |  school_identification STRING, school_director STRING)
        |TBLPROPERTIES('keyCols'='rowNum')""".stripMargin)
    GraftBulkLoad.loadCsv(spark, s"$res/people.txt", "graft.ref.people")
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft.ref.teacher")
    spark.sql("DROP TABLE IF EXISTS graft.ref.people")
  }

  test("UNION across two graft tables deduplicates to 7 names") {
    val n = spark.sql(
      """SELECT people_name FROM graft.ref.people
        |UNION
        |SELECT teacher_name FROM graft.ref.teacher""".stripMargin).count()
    assert(n == 7)
  }

  test("sort by key prefix with limit returns key-ordered heads") {
    val r = spark.sql(
      "SELECT teacher_name FROM graft.ref.teacher ORDER BY grade LIMIT 2")
      .collect().map(_.getString(0))
    assert(r(0) == "teacher_1_1_1" && r(1) == "teacher_1_2_1")
  }

  test("DataFrame API over the catalog table (reference DataFrame Test)") {
    val r = spark.table("graft.ref.teacher")
      .orderBy(col("grade").asc, col("class").asc)
      .select("teacher_name").limit(3)
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("teacher_1_1_1", "teacher_1_2_1", "teacher_1_3_1"))
  }

  test("disjunctive key predicate returns all 12 rows; IS NULL finds 2") {
    assert(spark.sql(
      """SELECT grade, class, subject, teacher_name, teacher_age
        |FROM graft.ref.teacher WHERE grade = 1 OR class < 3"""
        .stripMargin).count() == 12)
    assert(spark.sql(
      "SELECT school_identification FROM graft.ref.people " +
        "WHERE school_director IS NULL").count() == 2)
  }

  test("UDF in WHERE over the 3-key table (reference myFilter)") {
    spark.udf.register("myFilter", (s: String) => s.contains("_1_2"))
    assert(spark.sql(
      "SELECT count(*) FROM graft.ref.teacher WHERE myFilter(teacher_name)")
      .collect().head.getLong(0) == 3)
  }
}
