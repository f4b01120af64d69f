package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL face of the native functions, injected via
  * spark.sql.extensions on a fresh session over the shared context. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions register vec_cosine/vec_dot/minhash_sig/simhash64") {
    val base = TestSpark.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql(
        """SELECT round(vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 4) AS c,
          |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
        .collect()(0)
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 11.0)
      val mh = s2.sql(
        """SELECT size(minhash_sig(array('a', 'b'), 16)) AS n,
          |       size(minhash_sig(array('a', 'b'))) AS n64,
          |       simhash64(array('x', 'y')) AS h""".stripMargin).collect()(0)
      assert(mh.getInt(0) == 16)
      assert(mh.getInt(1) == 64)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
