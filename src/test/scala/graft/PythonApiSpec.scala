package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Python API smoke: the reference ships a PySpark context wrapper
  * (/root/reference python/pyspark_hbase/sql/context.py:26-48,
  * shell.py:1-44); graft's catalog/extensions are config-driven, so
  * the Python face is `python/graft.py` + three config lines. This
  * spec runs `python/graft_smoke.py` in a subprocess — DDL, INSERT,
  * key-pruned SELECT (plan-asserted), native `vec_cosine`, manifest
  * aggregates — and requires its GRAFT_PY_OK marker.
  *
  * Cancels (rather than fails) when no python3+pyspark is available,
  * so the JVM suite stays runnable in minimal environments.
  */
class PythonApiSpec extends AnyFunSuite {

  private def havePyspark: Boolean =
    try {
      Seq("python3", "-c", "import pyspark").!(ProcessLogger(_ => ())) == 0
    } catch { case _: Exception => false }

  test("pyspark reaches the graft catalog end-to-end") {
    assume(havePyspark, "python3 with pyspark not available")
    val repo = new java.io.File(".").getCanonicalPath
    val classes = s"$repo/target/scala-2.13/classes"
    val warehouse =
      java.nio.file.Files.createTempDirectory("graft_py_wh").toString
    val out = new StringBuilder
    val code = Process(
      Seq("python3", s"$repo/python/graft_smoke.py", classes, warehouse),
      new java.io.File(repo),
      "PYTHONPATH" -> s"$repo/python")
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0, s"python smoke exited $code:\n$out")
    assert(out.toString.contains("GRAFT_PY_OK"), out.toString)
  }
}
