package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The `_graft_region_id` / `_graft_file` provenance metadata columns
  * ([[GraftMetaCols]]): SELECT-able by name like Spark's file-source
  * `_metadata`, absent otherwise, correct per region file, and the
  * documented read-time latest-wins recipe over an UNCOMPACTED
  * dedupKeys table — the analogue of reading HBase's newest cell
  * version before a major compaction folds the store files.
  */
class MetadataColumnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def build(name: String, props: String = ""): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.metacol")
    val fqn = s"graft.metacol.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(
      s"""CREATE TABLE $fqn (k BIGINT, v DOUBLE)
         |TBLPROPERTIES('keyCols'='k', 'regionSplits'='100;200;300'$props)"""
        .stripMargin)
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 1.0 FROM range(400)")
    fqn
  }

  private def tableDir(name: String): java.io.File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("metacol"), name)).asInstanceOf[GraftTable].tableDir
  }

  test("region id and file name match the manifest, row for row") {
    val fqn = build("prov")
    val manifest = TableMeta.loadRegions(tableDir("prov"))
      .map(r => (r.id, r.file, r.rows)).sortBy(_._1)
    val seen = spark.sql(
      s"""SELECT _graft_region_id AS id, _graft_file AS f,
         |       count(*) AS rows, min(k) AS lo, max(k) AS hi
         |FROM $fqn GROUP BY 1, 2 ORDER BY 1""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(seen.toSeq == manifest,
      "per-region row counts must match the manifest exactly")
    spark.sql(s"DROP TABLE $fqn")
  }

  test("metadata columns do not appear unless asked for by name") {
    val fqn = build("hidden")
    assert(!spark.table(fqn).columns.exists(_.startsWith("_graft")))
    assert(spark.sql(s"SELECT * FROM $fqn").columns.toSeq == Seq("k", "v"))
    spark.sql(s"DROP TABLE $fqn")
  }

  test("metadata-only projection still counts every row") {
    val fqn = build("only")
    val files = spark.sql(
      s"SELECT count(DISTINCT _graft_file) FROM $fqn").head().getLong(0)
    assert(files == TableMeta.loadRegions(tableDir("only")).size)
    assert(spark.sql(s"SELECT count(_graft_region_id) FROM $fqn")
      .head().getLong(0) == 400L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("region ids survive filters and serve provenance joins") {
    val fqn = build("joinable")
    // which region holds k = 250?
    val rid = spark.sql(
      s"SELECT _graft_region_id FROM $fqn WHERE k = 250").head().getLong(0)
    val meta = TableMeta.loadRegions(tableDir("joinable"))
      .find(_.id == rid).get
    assert(graft.codec.KeyCodec.decode(
      org.apache.spark.sql.types.LongType,
      graft.codec.KeyCodec.fromHex(meta.mins.head), 0,
      graft.codec.KeyCodec.fromHex(meta.mins.head).length) == 200L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("a _graft_region_id predicate prunes regions exactly — the " +
      "incremental-batch pattern reads only new regions") {
    val fqn = build("incr")
    // 4 regions with ids 1..4; consume "everything after id 2"
    val ids = TableMeta.loadRegions(tableDir("incr")).map(_.id).sorted
    assert(ids == Seq(1L, 2L, 3L, 4L))
    val df = spark.sql(
      s"SELECT k, _graft_region_id FROM $fqn WHERE _graft_region_id > 2")
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).forall(_ > 2L))
    assert(rows.map(_.getLong(0)).min == 200L,
      "regions 3 and 4 hold keys 200..399")
    assert(rows.length == 200)
    assert(df.rdd.getNumPartitions == 2,
      "two of four regions must be pruned by the id predicate alone")
    // a half-translatable conjunction stays sound (superset pruning)
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE " +
      "_graft_region_id > 2 AND v < 250").head().getLong(0) == 50L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("latest-wins is readable BEFORE a dedupKeys compaction folds " +
      "duplicates, and matches the folded result") {
    val fqn = build("upsert", ", 'graft.dedupKeys'='true'")
    // second batch upserts the even keys with v = -k
    spark.sql(
      s"INSERT INTO $fqn SELECT id * 2, -(id * 2.0) FROM range(200)")
    assert(spark.table(fqn).count() == 600L,
      "before compaction both versions are stored")
    val latest = spark.sql(
      s"""SELECT k, v FROM (
         |  SELECT k, v, row_number() OVER (
         |    PARTITION BY k ORDER BY _graft_region_id DESC) AS rn
         |  FROM $fqn) WHERE rn = 1""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    // now fold for real and compare
    spark.sql("CALL graft.sys.compact(table => 'metacol.upsert', " +
      "target_regions => 2)")
    val folded = spark.table(fqn)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(latest.length == 400)
    assert(latest.toSeq == folded.toSeq,
      "read-time latest view must equal the compaction fold")
    assert(latest.filter(_._1 % 2 == 0).forall { case (k, v) => v == -k })
    spark.sql(s"DROP TABLE $fqn")
  }
}
