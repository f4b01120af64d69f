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
      // the text kernels are SQL-callable too (values pinned vs their
      // Column faces by KernelEquivalenceSpec; here just resolution)
      val tk = s2.sql(
        """SELECT size(winnow_keys('abcdefghijklmno', 8, 4)) AS w,
          |       size(shingle3_hashes('a b c d')) AS s3,
          |       size(word_hashes('a  b')) AS wh,
          |       size(word_window_hashes('a b c', 2)) AS ww,
          |       size(distinct_word_hashes('a a b')) AS dw,
          |       size(distinct_gram_hashes('abcab', 3)) AS dg,
          |       shared_count(array(1L, 2L), array(2L, 3L)) AS sc"""
          .stripMargin).collect()(0)
      assert(tk.getInt(0) >= 1)
      assert(tk.getInt(1) == 2)
      assert(tk.getInt(2) == 2)
      assert(tk.getInt(3) == 2)
      assert(tk.getInt(4) == 2)
      assert(tk.getInt(5) == 3)
      assert(tk.getInt(6) == 1)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
