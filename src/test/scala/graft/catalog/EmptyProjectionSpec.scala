package graft.catalog
import org.scalatest.funsuite.AnyFunSuite
class EmptyProjectionSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  test("empty projection and constant select over catalog table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.safety")
    spark.sql("DROP TABLE IF EXISTS graft.safety.emptyproj")
    spark.sql("CREATE TABLE graft.safety.emptyproj (k INT, v INT) TBLPROPERTIES('keyCols'='k')")
    spark.sql("INSERT INTO graft.safety.emptyproj SELECT CAST(id AS INT), CAST(id AS INT) FROM range(0, 1000)")
    assert(spark.sql("SELECT 1 FROM graft.safety.emptyproj").count() == 1000)
    assert(spark.sql("SELECT count(*) FROM graft.safety.emptyproj WHERE v > 500").collect().head.getLong(0) == 499)
    spark.sql("DROP TABLE graft.safety.emptyproj")
  }
}
