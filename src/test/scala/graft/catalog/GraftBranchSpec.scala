package graft.catalog

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Write-audit-publish branches ([[GraftBranch]], [[TableMeta]]'s
  * branch section): staged appends are invisible to main, the branch
  * read is the post-publish preview, publish is one atomic main
  * commit, drop reclaims staged files. The capability Iceberg ships
  * as `spark.wap.branch`, re-expressed on the graft commit log — the
  * audit gate a production ingest pipeline runs quality checks behind
  * before data becomes visible to every downstream job. */
class GraftBranchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ns(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.wap")

  private def tableDir(name: String): File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("wap"), name)).asInstanceOf[GraftTable].tableDir
  }

  private def mk(name: String): String = {
    ns()
    val fqn = s"graft.wap.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(s"CREATE TABLE $fqn (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k')")
    spark.sql(s"INSERT INTO $fqn SELECT id, concat('a', id) FROM range(10)")
    fqn
  }

  test("staged writes are invisible to main; the branch option reads " +
      "the post-publish preview; publish is one commit with all rows") {
    val fqn = mk("basic")
    val dir = tableDir("basic")
    spark.sql("CALL graft.sys.branch(table => 'wap.basic', " +
      "name => 'audit')")
    spark.range(10, 25).selectExpr("id AS k", "concat('b', id) AS v")
      .writeTo(fqn).option("branch", "audit").append()

    assert(spark.table(fqn).count() == 10L, "main must not see staging")
    val preview = spark.read.option("branch", "audit").table(fqn)
    assert(preview.count() == 25L, "preview = main + staged")
    // preview predicates still push to the scan (same pinned seam)
    assert(spark.read.option("branch", "audit").table(fqn)
      .where("k >= 20").count() == 5L)

    val v0 = TableMeta.currentVersion(dir)
    val pub = spark.sql("CALL graft.sys.publish(" +
      "table => 'wap.basic', name => 'audit')").collect()(0)
    assert(pub.getString(1) == "15", "published_rows")
    assert(TableMeta.currentVersion(dir) == v0 + 1,
      "publish = exactly ONE atomic main commit")
    assert(spark.table(fqn).count() == 25L)
    assert(!TableMeta.branchExists(dir, "audit"), "branch dropped")
    // published data participates in ordinary reads, pruned scans etc.
    assert(spark.sql(s"SELECT v FROM $fqn WHERE k = 24").collect()
      .map(_.getString(0)).toSeq == Seq("b24"))
  }

  test("session-conf WAP flow: SQL INSERT stages, SQL SELECT previews, " +
      "other tables read plain main, RESET restores everything") {
    val fqn = mk("conf")
    val other = mk("confother")
    try {
      spark.conf.set(GraftBranch.WapConf, "audit")
      // branch auto-creates on the first staged write
      spark.sql(s"INSERT INTO $fqn SELECT id, concat('b', id) " +
        "FROM range(10, 30)")
      assert(TableMeta.branchExists(tableDir("conf"), "audit"))
      assert(spark.table(fqn).count() == 30L,
        "WAP session preview sees staged rows")
      assert(spark.table(other).count() == 10L,
        "a table WITHOUT the branch reads plain main under the conf")
      // the audit readout
      val b = spark.sql("CALL graft.sys.branches(table => 'wap.conf')")
        .collect()
      assert(b.length == 1 && b(0).getString(0) == "audit" &&
        b(0).getString(4) == "20")
      // explicit EMPTY option opts a write out of the session conf
      spark.range(100, 101).selectExpr("id AS k", "'main' AS v")
        .writeTo(fqn).option("branch", "").append()
    } finally spark.conf.unset(GraftBranch.WapConf)
    assert(spark.table(fqn).count() == 11L,
      "main after RESET: original 10 + the opted-out row only")
    spark.sql("CALL graft.sys.publish(table => 'wap.conf', " +
      "name => 'audit')")
    assert(spark.table(fqn).count() == 31L)
  }

  test("branch_drop deletes the staged region files; main and its " +
      "files are untouched") {
    val fqn = mk("drop")
    val dir = tableDir("drop")
    def dataFiles(): Set[String] =
      dir.list().filter(_.endsWith(".parquet")).toSet
    val before = dataFiles()
    // first write auto-creates the branch (option and conf paths share
    // the same first-write semantics)
    spark.range(10, 20).selectExpr("id AS k", "'x' AS v")
      .writeTo(fqn).option("branch", "tmp").append()
    assert(dataFiles().size > before.size, "staged files exist on disk")
    val dropped = spark.sql("CALL graft.sys.branch_drop(" +
      "table => 'wap.drop', name => 'tmp')").collect()(0).getString(0)
    assert(dropped.toInt >= 1)
    assert(dataFiles() == before, "staged files reclaimed, main's kept")
    assert(spark.table(fqn).count() == 10L)
  }

  test("publish is idempotent across the crash window, and a recreated " +
      "same-name branch is a fresh generation (its staging publishes)") {
    val fqn = mk("replay")
    val dir = tableDir("replay")
    spark.range(10, 15).selectExpr("id AS k", "'x' AS v")
      .writeTo(fqn).option("branch", "b1").append()
    // simulate the crash window: the publish segment committed but the
    // ladder cleanup did not run — re-running publish must not
    // double-commit the regions
    val (_, rows1) = TableMeta.publishBranch(dir, "b1")
    assert(rows1 == 5L)
    assert(spark.table(fqn).count() == 15L)
    // recreate the SAME name, stage FEWER rows (ladder indexes start
    // lower than the published generation's): a generation-blind
    // ledger would read this as a duplicate replay and drop it
    spark.range(15, 17).selectExpr("id AS k", "'y' AS v")
      .writeTo(fqn).option("branch", "b1").append()
    val (_, rows2) = TableMeta.publishBranch(dir, "b1")
    assert(rows2 == 2L, "fresh generation publishes, never 'replay'")
    assert(spark.table(fqn).count() == 17L)
  }

  test("refusals: overwrite/streaming/row-level DML against staging, " +
      "preview over time travel, publish of an unknown branch") {
    val fqn = mk("refuse")
    intercept[Exception] {
      spark.range(5).selectExpr("id AS k", "'o' AS v")
        .writeTo(fqn).option("branch", "audit")
        .overwrite(org.apache.spark.sql.functions.lit(true))
    }
    intercept[Exception] {
      spark.sql("CALL graft.sys.publish(table => 'wap.refuse', " +
        "name => 'nosuch')").collect()
    }
    spark.sql("CALL graft.sys.branch(table => 'wap.refuse', " +
      "name => 'audit')")
    intercept[Exception] { // duplicate create is loud
      spark.sql("CALL graft.sys.branch(table => 'wap.refuse', " +
        "name => 'audit')").collect()
    }
    val v = TableMeta.currentVersion(tableDir("refuse"))
    intercept[Exception] { // explicit branch + version pin
      spark.read.option("branch", "audit").option("versionAsOf", v.toString)
        .table(fqn).collect()
    }
    try {
      spark.conf.set(GraftBranch.WapConf, "audit")
      intercept[Exception] { // DML would mutate MAIN mid-audit —
        // refused on BOTH paths (metadata-only interval DELETE here;
        // the row-level rewrite guard is in GraftRowLevel)
        spark.sql(s"DELETE FROM $fqn WHERE k >= 3 AND k <= 4")
      }
      intercept[Exception] { // the row-level rewrite path, via UPDATE
        spark.sql(s"UPDATE $fqn SET v = 'z' WHERE k = 3")
      }
      // ...but the ambient conf YIELDS to an explicit version pin
      assert(spark.read.option("versionAsOf", v.toString).table(fqn)
        .count() == 10L)
    } finally spark.conf.unset(GraftBranch.WapConf)
  }

  test("branchDelta reads ONLY the staged batch — the audit face — " +
      "and an absent branch reads empty, not main") {
    val fqn = mk("delta")
    spark.range(10, 22).selectExpr("id AS k", "concat('s', id) AS v")
      .writeTo(fqn).option("branch", "audit").append()
    val delta = spark.read.option("branch", "audit")
      .option("branchDelta", "true").table(fqn)
    assert(delta.count() == 12L)
    assert(delta.where("k < 10").count() == 0L, "no main rows leak in")
    // pushdown still reaches the staged regions' stats
    assert(delta.where("k >= 20").count() == 2L)
    assert(spark.read.option("branch", "nosuch")
      .option("branchDelta", "true").table(fqn).count() == 0L,
      "absent branch = nothing staged = empty, never a main fallback")
  }

  test("latest-wins preview on a dedupKeys table ranks staged rows " +
      "newest — exactly what publish then makes true") {
    ns()
    val fqn = "graft.wap.upsert"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(s"CREATE TABLE $fqn (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k', 'graft.dedupKeys'='true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'old' FROM range(10)")
    spark.range(5, 10).selectExpr("id AS k", "'new' AS v")
      .writeTo(fqn).option("branch", "audit").append()
    def latest(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.selectExpr("k", "v",
        "row_number() OVER (PARTITION BY k ORDER BY _graft_region_id " +
          "DESC) AS rn")
        .where("rn = 1").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pre = latest(spark.read.option("branch", "audit").table(fqn))
    assert(pre(4L) == "old" && pre(7L) == "new")
    spark.sql("CALL graft.sys.publish(table => 'wap.upsert', " +
      "name => 'audit')")
    val post = latest(spark.table(fqn))
    assert(post == pre, "publish realizes the preview verbatim")
    // compaction folds latest-wins to the same answer
    spark.sql("CALL graft.sys.compact(table => 'wap.upsert', " +
      "target_regions => 1)").collect()
    assert(spark.table(fqn).where("v = 'new'").count() == 5L)
  }
}
