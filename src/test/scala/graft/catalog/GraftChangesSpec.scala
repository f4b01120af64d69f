package graft.catalog

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Batch CDC reads (`changesFromVersion`/`changesToVersion` reader
  * options, [[GraftChanges]]): the delta between two commit versions is
  * resolved from manifests alone (original regions above the start
  * version's highest id — the streaming tail's lineage rule), so the
  * scan touches only changed regions and composes with every pushdown
  * surface via the same pinned seam as time travel. */
class GraftChangesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tableDir(name: String): File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("cdc"), name)).asInstanceOf[GraftTable].tableDir
  }

  private def ks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("k").collect().map(_.getLong(0)).toSeq.sorted

  private def changes(fqn: String, from: Long,
      to: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val r = spark.read.option(GraftChanges.FromKey, from.toString)
    to.fold(r)(v => r.option(GraftChanges.ToKey, v.toString)).table(fqn)
  }

  private def mk(name: String): (String, File) = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdc")
    val fqn = s"graft.cdc.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(s"CREATE TABLE $fqn (k BIGINT, v STRING) " +
      "TBLPROPERTIES('keyCols'='k', 'numRegions'='2')")
    (fqn, tableDir(name))
  }

  test("changes between versions are exactly the appended batches, " +
      "resolved region-exactly") {
    val (fqn, dir) = mk("basic")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(10)")
    val v1 = TableMeta.currentVersion(dir)
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(10, 25)")
    val v2 = TableMeta.currentVersion(dir)
    spark.sql(s"INSERT INTO $fqn SELECT id, 'c' FROM range(25, 30)")

    assert(ks(changes(fqn, v1)) == (10L until 30L))
    assert(ks(changes(fqn, v1, Some(v2))) == (10L until 25L))
    assert(ks(changes(fqn, v2)) == (25L until 30L))
    assert(changes(fqn, TableMeta.currentVersion(dir)).count() == 0L)

    // region-exact: the delta read plans ONLY regions absent at v1
    val v1Ids = spark.read.option("versionAsOf", v1.toString).table(fqn)
      .select("_graft_region_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val deltaIds = changes(fqn, v1).select("_graft_region_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(deltaIds.nonEmpty && deltaIds.intersect(v1Ids).isEmpty)

    // pushdown composes on the pinned seam: a key predicate narrows
    // the delta read further, answers exact
    assert(ks(changes(fqn, v1).where("k >= 28")) == Seq(28L, 29L))
  }

  test("compaction rewrites are not change events: the delta is served " +
      "from retired originals, one cycle of slack, then refuses loudly") {
    val (fqn, dir) = mk("compacted")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(10)")
    val v1 = TableMeta.currentVersion(dir)
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(10, 20)")
    spark.sql(s"CALL graft.sys.compact(table => 'cdc.compacted', target_regions => 1)")
    // the rewrite replaced the originals; the retired list still
    // carries them, so the v1 delta still reads exactly batch 2
    assert(ks(changes(fqn, v1)) == (10L until 20L))
    assert(ks(spark.table(fqn)) == (0L until 20L), "head unchanged")

    spark.sql(s"INSERT INTO $fqn SELECT id, 'c' FROM range(20, 25)")
    spark.sql(s"CALL graft.sys.compact(table => 'cdc.compacted', target_regions => 1)")
    // two cycles behind: the originals of (v1, v2] are gone
    val e = intercept[IllegalStateException] { changes(fqn, v1).count() }
    assert(e.getMessage.contains("compaction cycle"),
      s"unexpected: ${e.getMessage}")
  }

  test("UPDATE copy-on-write rewrites ARE change events (post-image " +
      "regions); interval DELETE is not") {
    val (fqn, dir) = mk("updated")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(10)")
    val v1 = TableMeta.currentVersion(dir)
    spark.sql(s"UPDATE $fqn SET v = 'z' WHERE k = 3")
    val post = changes(fqn, v1)
    // the touched region re-emits whole (region-granular post-image)
    assert(post.where("k = 3 AND v = 'z'").count() == 1L)
    assert(ks(post).forall(_ < 10L))

    val v2 = TableMeta.currentVersion(dir)
    spark.sql(s"DELETE FROM $fqn WHERE k >= 5") // interval: metadata-only
    assert(changes(fqn, v2).count() == 0L, "no tombstone stream")
  }

  test("changesFromVersion refuses to combine with time travel and " +
      "rejects non-integer versions") {
    val (fqn, dir) = mk("refusals")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(5)")
    val v1 = TableMeta.currentVersion(dir)
    val e1 = intercept[Exception] {
      spark.read.option(GraftChanges.FromKey, v1.toString)
        .option("versionAsOf", v1.toString).table(fqn).collect()
    }
    assert(e1.getMessage.contains("VERSION/TIMESTAMP AS OF"),
      s"unexpected: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      spark.read.option(GraftChanges.FromKey, "latest").table(fqn).collect()
    }
    assert(e2.getMessage.contains("commit-log seq"),
      s"unexpected: ${e2.getMessage}")
  }

  test("rows appended then metadata-DELETEd still deliver as appended " +
      "(stream-consistent); a vacuum that purges them refuses loudly") {
    val (fqn, dir) = mk("delvac")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(10)")
    val v1 = TableMeta.currentVersion(dir)
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(100, 200)")
    spark.sql(s"DELETE FROM $fqn WHERE k >= 100") // whole-region metadata
    assert(ks(spark.table(fqn)) == (0L until 10L), "head sees the DELETE")
    // the delta is what a tailing stream would have consumed: the
    // appended batch, pre-delete image, served from the retired list
    assert(ks(changes(fqn, v1)) == (100L until 200L))

    spark.sql(s"CALL graft.sys.vacuum(table => 'cdc.delvac')").collect()
    val e = intercept[IllegalStateException] { changes(fqn, v1).count() }
    assert(e.getMessage.contains("vacuum"), s"unexpected: ${e.getMessage}")
  }

  test("a vacuum that only purges PRE-range retirements does not " +
      "refuse the delta") {
    val (fqn, dir) = mk("vacok")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(10)")
    spark.sql(s"CALL graft.sys.compact(table => 'cdc.vacok', " +
      "target_regions => 1)")
    val v1 = TableMeta.currentVersion(dir)
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(10, 20)")
    spark.sql(s"CALL graft.sys.vacuum(table => 'cdc.vacok')").collect()
    assert(ks(changes(fqn, v1)) == (10L until 20L))
  }

  test("batch changes equal what a stream tailing from the same point " +
      "would deliver (shared lineage rule) after split/merge rewrites") {
    val (fqn, dir) = mk("lifecycle")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'a' FROM range(10)")
    val v1 = TableMeta.currentVersion(dir)
    spark.sql(s"INSERT INTO $fqn SELECT id, 'b' FROM range(10, 40)")
    // a structural rewrite between the delta's endpoints: merge the
    // small regions; srcMaxId lineage must keep it out of the delta
    spark.sql("CALL graft.sys.merge(table => 'cdc.lifecycle', " +
      "target_bytes => 1073741824)")
    assert(ks(changes(fqn, v1)) == (10L until 40L))
  }
}
