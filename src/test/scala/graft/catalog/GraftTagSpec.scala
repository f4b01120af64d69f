package graft.catalog

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Snapshot TAGS (`CALL graft.sys.tag` / `.untag`): a named,
  * retention-pinning reference to a commit-log version — Iceberg's
  * tag semantics on the graft commit protocol. `VERSION AS OF '<name>'`
  * resolves the pinned seq, and the pin is honored by every cleanup
  * layer until untagged: checkpoint-time log cleanup keeps the
  * segments that reconstruct the tagged version, compaction/cluster
  * retired age-out keeps its region files on the retired list, and
  * vacuum skips them. This is the pin-the-exact-training-corpus
  * operation at O(1) metadata cost (clone pins by hard-linking every
  * region; a tag pins by name). */
class GraftTagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ns(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tg")

  private def tableDir(name: String): File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("tg"), name)).asInstanceOf[GraftTable].tableDir
  }

  private def ks(fqn: String): Seq[Long] =
    spark.sql(s"SELECT k FROM $fqn ORDER BY k").collect()
      .map(_.getLong(0)).toSeq

  private def freshTable(name: String): String = {
    ns()
    val fqn = s"graft.tg.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(s"CREATE TABLE $fqn (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k')")
    fqn
  }

  test("tag resolves via VERSION AS OF '<name>', defaults to the " +
      "current version, and lists in the t.tags metadata table") {
    val fqn = freshTable("basic")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(10)")
    val v1 = TableMeta.currentVersion(tableDir("basic"))
    spark.sql(s"CALL graft.sys.tag(table => 'tg.basic', name => 'b1')")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(10, 20)")
    // explicit historical version
    spark.sql("CALL graft.sys.tag(table => 'tg.basic', " +
      s"name => 'also-b1', version => $v1)")

    assert(ks(s"$fqn VERSION AS OF 'b1'") == (0L until 10L))
    assert(ks(s"$fqn VERSION AS OF 'also-b1'") == (0L until 10L))
    assert(ks(fqn) == (0L until 20L), "head unaffected")
    // the DataFrameReader option face goes through the same resolution
    assert(spark.read.option("versionAsOf", "b1")
      .table(fqn).count() == 10L)
    val tags = spark.sql(s"SELECT tag, version FROM $fqn.tags ORDER BY tag")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(tags == Seq("also-b1" -> v1, "b1" -> v1))
  }

  test("a tagged snapshot stays readable through compaction AND " +
      "vacuum; untag + vacuum reclaims it") {
    val fqn = freshTable("pin")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(10)")
    val v1 = TableMeta.currentVersion(tableDir("pin"))
    spark.sql("CALL graft.sys.tag(table => 'tg.pin', name => 'keep')")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(10, 20)")
    // compaction rewrites every region; batch-1 files move to the
    // retired list — the pin must keep them there across BOTH the
    // compaction age-out and an explicit vacuum
    spark.sql("CALL graft.sys.compact(table => 'tg.pin', " +
      "target_regions => 2)").collect()
    spark.sql("CALL graft.sys.vacuum(table => 'tg.pin')").collect()
    assert(ks(s"$fqn VERSION AS OF 'keep'") == (0L until 10L),
      "tag readable after compact + vacuum")
    assert(ks(s"$fqn VERSION AS OF $v1") == (0L until 10L),
      "the pinned numeric version reads too")
    // a SECOND compaction cycle would normally age the retired files
    // out; the pin must survive that as well
    spark.sql(s"INSERT INTO $fqn SELECT id, 'c' FROM range(20, 25)")
    spark.sql("CALL graft.sys.compact(table => 'tg.pin', " +
      "target_regions => 2)").collect()
    assert(ks(s"$fqn VERSION AS OF 'keep'") == (0L until 10L),
      "tag readable after a second compaction cycle")

    spark.sql("CALL graft.sys.untag(table => 'tg.pin', name => 'keep')")
    spark.sql("CALL graft.sys.vacuum(table => 'tg.pin')").collect()
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM $fqn VERSION AS OF 'keep'").collect() }
    assert(e1.getMessage.contains("neither"), s"unexpected: ${e1.getMessage}")
    val e2 = intercept[Exception] { ks(s"$fqn VERSION AS OF $v1") }
    assert(e2.getMessage.contains("no longer readable"),
      s"files reclaimed after untag+vacuum: ${e2.getMessage}")
    assert(ks(fqn) == (0L until 25L), "head unaffected throughout")
  }

  test("the log-cleanup layer keeps the segments that reconstruct a " +
      "tagged version even past the retention horizon") {
    val fqn = freshTable("logpin")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'x' FROM range(5)")
    spark.sql("CALL graft.sys.tag(table => 'tg.logpin', name => 'pin')")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'y' FROM range(5, 8)")
    // fold + simulate the horizon passing (the TimeTravelSpec aged-out
    // recipe): WITHOUT the tag this makes the version unreconstructible
    val saved = TableMeta.historyRetainMillis
    try {
      TableMeta.historyRetainMillis = 0L
      TableMeta.foldLog(tableDir("logpin"))
    } finally TableMeta.historyRetainMillis = saved
    assert(ks(s"$fqn VERSION AS OF 'pin'") == (0L until 5L),
      "tag pins the log segments past the horizon")
  }

  test("refusals: invalid names, unknown tags (listing the known " +
      "ones), unknown untag, tagging an unreadable version") {
    val fqn = freshTable("refuse")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(5)")
    val v1 = TableMeta.currentVersion(tableDir("refuse"))
    // a name that could collide with an integer version is refused
    val e1 = intercept[Exception] {
      spark.sql("CALL graft.sys.tag(table => 'tg.refuse', name => '42')")
        .collect() }
    assert(e1.getMessage.contains("invalid tag name"))
    spark.sql("CALL graft.sys.tag(table => 'tg.refuse', name => 'known')")
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM $fqn VERSION AS OF 'nope'").collect() }
    assert(e2.getMessage.contains("known"),
      s"unknown tag names the known ones: ${e2.getMessage}")
    val e3 = intercept[Exception] {
      spark.sql("CALL graft.sys.untag(table => 'tg.refuse', " +
        "name => 'nope')").collect() }
    assert(e3.getMessage.contains("no tag"))
    // make v1's files unreachable (rewrite + vacuum), then try to tag
    // it — 'known' also pins v1, so release it first
    spark.sql("CALL graft.sys.untag(table => 'tg.refuse', " +
      "name => 'known')")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(5, 9)")
    spark.sql("CALL graft.sys.compact(table => 'tg.refuse', " +
      "target_regions => 1)").collect()
    spark.sql("CALL graft.sys.vacuum(table => 'tg.refuse')").collect()
    val e4 = intercept[Exception] {
      spark.sql("CALL graft.sys.tag(table => 'tg.refuse', " +
        s"name => 'late', version => $v1)").collect() }
    assert(e4.getMessage.contains("already removed"),
      s"tagging a vacuumed version refuses: ${e4.getMessage}")
  }

  test("statement faces: ALTER TABLE ... CREATE TAG [AS OF VERSION n] " +
      "and DROP TAG lower onto the procedures") {
    val fqn = freshTable("faces")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(6)")
    val v1 = TableMeta.currentVersion(tableDir("faces"))
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(6, 12)")
    spark.sql(s"ALTER TABLE $fqn CREATE TAG head_now")
    spark.sql(s"ALTER TABLE $fqn CREATE TAG first_batch AS OF VERSION $v1")
    assert(ks(s"$fqn VERSION AS OF 'first_batch'") == (0L until 6L))
    assert(ks(s"$fqn VERSION AS OF 'head_now'") == (0L until 12L))
    spark.sql(s"ALTER TABLE $fqn DROP TAG head_now")
    assert(spark.sql(s"SELECT * FROM $fqn.tags").count() == 1L)
  }
}
