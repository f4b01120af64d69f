package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import org.scalatest.funsuite.AnyFunSuite

/** The CLI loop (reference `HBaseSQLCliDriver`) driven with scripted
  * input: statement splitting (quotes, multi-line), DDL → INSERT →
  * SELECT round trip with tabular output, error recovery, and exit
  * commands. */
class ShellSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runScript(script: String): String = {
    val bos = new ByteArrayOutputStream()
    val out = new PrintStream(bos, true, "UTF-8")
    Shell.run(spark, new BufferedReader(new StringReader(script)), out,
      interactive = false)
    bos.toString("UTF-8")
  }

  test("statement splitting respects quotes and multi-line input") {
    val (stmts, rest) = Shell.splitStatements(
      "SELECT 'a;b' AS x;\nSELECT\n 2;SELECT 3")
    assert(stmts == Seq("SELECT 'a;b' AS x", "SELECT\n 2"))
    assert(rest == "SELECT 3")
  }

  test("splitting survives escapes, backticks, and -- comments") {
    // backslash-escaped quote inside a literal
    val (s1, r1) = Shell.splitStatements(
      "SELECT 'it\\'s; done' AS x;SELECT 1")
    assert(s1 == Seq("SELECT 'it\\'s; done' AS x") && r1 == "SELECT 1")
    // ';' inside a -- comment does not split; the newline ends it
    val (s2, r2) = Shell.splitStatements(
      "SELECT 1 -- note; not a split\n + 2;")
    assert(s2 == Seq("SELECT 1 -- note; not a split\n + 2") && r2.isEmpty)
    // backtick identifiers may carry ';'
    val (s3, _) = Shell.splitStatements("SELECT `a;b` FROM t;")
    assert(s3 == Seq("SELECT `a;b` FROM t"))
    // and the escaped-literal statement actually runs
    val outText = runScript("SELECT 'it\\'s; done' AS x;\n")
    assert(outText.contains("it's; done"), outText)
    // ';' inside a bracketed /* */ comment does not split (Hive-style
    // input accepts bracketed comments), across lines too
    val (s4, r4) = Shell.splitStatements(
      "SELECT 1 /* note; still\nthe same; statement */ + 2;SELECT 9")
    assert(s4 ==
      Seq("SELECT 1 /* note; still\nthe same; statement */ + 2"))
    assert(r4 == "SELECT 9")
    // '/*' inside a string literal is not a comment opener
    val (s5, _) = Shell.splitStatements("SELECT '/*' AS x; SELECT 2;")
    assert(s5 == Seq("SELECT '/*' AS x", "SELECT 2"))
  }

  test("DDL, insert, select round trip through the shell") {
    val outText = runScript(
      """CREATE NAMESPACE IF NOT EXISTS graft.shell;
        |DROP TABLE IF EXISTS graft.shell.t;
        |CREATE TABLE graft.shell.t (k INT, v STRING)
        |  TBLPROPERTIES('keyCols'='k');
        |INSERT INTO graft.shell.t VALUES (1, 'one'), (2, 'two');
        |SELECT * FROM graft.shell.t WHERE k = 2;
        |DROP TABLE graft.shell.t;
        |""".stripMargin)
    assert(outText.contains("two"), outText)
    assert(!outText.contains("one |") || outText.contains("two"),
      outText)
    assert(outText.contains("| k|") || outText.contains("|  k|"), outText)
  }

  test("errors are reported and the loop continues") {
    val outText = runScript(
      "SELECT * FROM graft.shell.does_not_exist;\nSELECT 42 AS answer;\n")
    assert(outText.contains("Error:"), outText)
    assert(outText.contains("42"), outText)
  }

  test("quit stops processing subsequent statements") {
    val outText = runScript("SELECT 7 AS seven;\nquit;\nSELECT 8 AS eight;\n")
    assert(outText.contains("seven"), outText)
    assert(!outText.contains("eight"), outText)
  }

  test("help prints usage") {
    val outText = runScript("help;\n")
    assert(outText.contains("CALL graft.sys.load_csv"), outText)
  }
}
