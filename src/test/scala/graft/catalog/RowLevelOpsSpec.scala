package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SQL UPDATE / MERGE INTO / rewrite-fallback DELETE over graft tables
  * ([[GraftRowLevelOperation]]): group-based copy-on-write at region
  * granularity. The reference only reaches update semantics through
  * whole-row Put-upsert (`HBaseRelation.scala:659-723`); this is the
  * expression-level DML face on the V2 API, with the scale property
  * that regions without matches are never read or rewritten.
  */
class RowLevelOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def build(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rlo")
    val fqn = s"graft.rlo.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(
      s"""CREATE TABLE $fqn (k BIGINT, status STRING, v DOUBLE)
         |TBLPROPERTIES('keyCols'='k', 'regionSplits'='100;200;300')"""
        .stripMargin)
    spark.sql(s"INSERT INTO $fqn " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'open' ELSE 'done' END, " +
      "id * 1.0 FROM range(400)")
    fqn
  }

  private def tableDir(name: String): java.io.File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("rlo"), name)).asInstanceOf[GraftTable].tableDir
  }

  test("UPDATE with a key-range predicate rewrites only the matching " +
      "regions; the others keep their original files") {
    val fqn = build("upd")
    val before = TableMeta.loadRegions(tableDir("upd"))
    assert(before.size == 4)
    spark.sql(s"UPDATE $fqn SET v = v + 1000 WHERE k >= 200 AND k < 300")
    // values: exactly the matched rows changed
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE v >= 1200")
      .head().getLong(0) == 100L)
    assert(spark.sql(s"SELECT sum(v) FROM $fqn").head().getDouble(0) ==
      (0 until 400).map(_.toDouble).sum + 100 * 1000.0)
    val after = TableMeta.loadRegions(tableDir("upd"))
    val beforeFiles = before.map(_.file).toSet
    val keptOriginals = after.map(_.file).toSet.intersect(beforeFiles)
    assert(keptOriginals.size == 3,
      s"only the [200,300) region may be rewritten; kept $keptOriginals")
    // the rewritten region retired, generation bumped
    val st = TableMeta.loadState(tableDir("upd"))
    assert(st.retired.nonEmpty && st.gen >= 1L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("UPDATE on a non-key predicate with runtime group filtering " +
      "still answers exactly") {
    val fqn = build("updnk")
    spark.sql(s"UPDATE $fqn SET status = 'closed' WHERE status = 'done'")
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE status = 'closed'")
      .head().getLong(0) == 200L)
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE status = 'done'")
      .head().getLong(0) == 0L)
    assert(spark.table(fqn).count() == 400L, "no rows lost or duplicated")
    spark.sql(s"DROP TABLE $fqn")
  }

  test("runtime GROUP filter narrows a non-key UPDATE to the regions " +
      "that contain matches — the others are never rewritten") {
    val fqn = build("updgf")
    val before = TableMeta.loadRegions(tableDir("updgf")).map(_.file).toSet
    // matches exist only among k < 50 → only the first region's group
    spark.sql(s"UPDATE $fqn SET v = -v WHERE status = 'open' AND k < 50")
    val after = TableMeta.loadRegions(tableDir("updgf")).map(_.file).toSet
    assert(after.intersect(before).size == 3,
      s"3 of 4 regions must keep their files; kept ${after.intersect(before)}")
    // even keys below 50 negate; k=0 becomes -0.0, which is not < 0
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE v < 0")
      .head().getLong(0) == 24L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("UPDATE preserves key order and buckets: key-grouped plans " +
      "survive the rewrite") {
    val fqn = build("updplan")
    spark.sql(s"UPDATE $fqn SET v = -v WHERE k % 7 = 0")
    val regions = TableMeta.loadRegions(tableDir("updplan"))
    assert(regions.forall(_.bucket >= 0),
      "rewritten regions must carry their fixed-split bucket")
    // exchange-free groupBy on the key still plans (KeyGroupedPartitioning)
    val df = spark.sql(
      s"SELECT k, count(*) AS c FROM $fqn GROUP BY k")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"key groupBy must stay exchange-free after UPDATE:\n$plan")
    spark.sql(s"DROP TABLE $fqn")
  }

  test("DELETE that is not an exact key interval falls back to the " +
      "rewrite instead of refusing") {
    val fqn = build("delnk")
    // non-key predicate: the metadata-only path cannot express it
    spark.sql(s"DELETE FROM $fqn WHERE status = 'open'")
    assert(spark.table(fqn).count() == 200L)
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE status = 'open'")
      .head().getLong(0) == 0L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("exact-interval DELETE still takes the metadata-only path " +
      "(original files untouched)") {
    val fqn = build("delmeta")
    val files = TableMeta.loadRegions(tableDir("delmeta")).map(_.file).toSet
    spark.sql(s"DELETE FROM $fqn WHERE k < 100")
    val after = TableMeta.loadRegions(tableDir("delmeta")).map(_.file).toSet
    assert(after.subsetOf(files),
      "region-aligned delete must not rewrite any file")
    assert(spark.table(fqn).count() == 300L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("MERGE INTO: matched update + not-matched insert, equal to the " +
      "batch-computed expectation") {
    val fqn = build("merge")
    spark.sql("DROP VIEW IF EXISTS rlo_src")
    // updates for keys 0..99 (matched), inserts for 400..449 (not)
    spark.createDataFrame(
      (0L until 100L).map(k => (k, "merged", k * 2.0)) ++
        (400L until 450L).map(k => (k, "fresh", k * 1.0)))
      .toDF("k", "status", "v").createOrReplaceTempView("rlo_src")
    spark.sql(
      s"""MERGE INTO $fqn t USING rlo_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET status = s.status, v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, status, v)
         |VALUES (s.k, s.status, s.v)""".stripMargin)
    assert(spark.table(fqn).count() == 450L)
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE status = 'merged'")
      .head().getLong(0) == 100L)
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE status = 'fresh'")
      .head().getLong(0) == 50L)
    assert(spark.sql(
      s"SELECT sum(v) FROM $fqn WHERE k < 100").head().getDouble(0) ==
      (0 until 100).map(_ * 2.0).sum)
    // untouched middle rows intact
    assert(spark.sql(
      s"SELECT count(*) FROM $fqn WHERE k >= 100 AND k < 400 " +
        "AND status IN ('open','done')").head().getLong(0) == 300L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("a tailing stream treats an UPDATE rewrite as new data: the " +
      "rewritten region re-emits (changed rows included), no crash") {
    val fqn = build("updstream")
    val q = spark.readStream.table(fqn)
      .writeStream.format("memory").queryName("upd_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("upd_tail").count() == 400L)
      // rewrite one region: its rows are CHANGED data at region grain,
      // so the stream re-sees the whole rewritten region — unlike a
      // DELETE boundary rewrite or a compaction (srcMaxId-marked, pure
      // rewrites of consumed data, which streams skip)
      spark.sql(s"UPDATE $fqn SET v = v + 1000 WHERE k >= 0 AND k < 100")
      q.processAllAvailable()
      assert(spark.table("upd_tail").count() == 500L,
        "400 originals + the 100-row rewritten region")
      assert(spark.sql(
        "SELECT count(*) FROM upd_tail WHERE v >= 1000").head()
        .getLong(0) == 100L)
    } finally q.stop()
    spark.sql(s"DROP TABLE $fqn")
  }

  test("no-match UPDATE: statically prunable predicates are true " +
      "no-ops; unprunable ones preserve content exactly") {
    val fqn = build("noop")
    val before = TableMeta.loadRegions(tableDir("noop")).map(_.file).toSet
    // key predicate outside every region: static pruning selects zero
    // regions and the commit's no-op guard leaves manifest+generation
    // untouched (without the guard this would still gen-bump)
    spark.sql(s"UPDATE $fqn SET v = 0.0 WHERE k > 100000")
    assert(TableMeta.loadRegions(tableDir("noop")).map(_.file).toSet
      == before, "statically-prunable no-match must not rewrite")
    // non-key predicate INSIDE every region's stat bounds
    // ('done' < 'meh' < 'open'): nothing static prunes it, and Spark
    // does not deliver an empty runtime group filter on this version —
    // the rewrite runs (files churn) but content must be exact
    spark.sql(s"UPDATE $fqn SET v = 0.0 WHERE status = 'meh'")
    assert(spark.table(fqn).count() == 400L)
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE v = 0.0")
      .head().getLong(0) == 1L, "only k=0 had v=0 before; none matched")
    spark.sql(s"DROP TABLE $fqn")
  }

  test("MERGE scope is bounded by a target-side ON conjunct: only its " +
      "regions rewrite; an unbounded merge preserves content exactly") {
    val fqn = build("mrgbound")
    val before = TableMeta.loadRegions(tableDir("mrgbound")).map(_.file).toSet
    spark.createDataFrame((0L until 10L).map(k => (k, "m", 0.0)))
      .toDF("k", "status", "v").createOrReplaceTempView("rlo_bsrc")
    // Spark's runtime group filter skips MERGE (its rewrite condition
    // is the TrueLiteral — matching lives in the join), so an
    // UNbounded merge rewrites every statically-surviving region.
    // The scale pattern: bound the target side in the ON clause — the
    // conjunct prunes regions statically.
    spark.sql(
      s"""MERGE INTO $fqn t USING rlo_bsrc s
         |ON t.k = s.k AND t.k < 100
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    val after = TableMeta.loadRegions(tableDir("mrgbound")).map(_.file).toSet
    assert(after.intersect(before).size == 3,
      "3 of 4 regions must keep their files under the bounded merge")
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE v = 0.0")
      .head().getLong(0) == 10L)
    // empty-source merge: content preserved exactly (files may churn
    // on this Spark version — no group filter for MERGE)
    spark.createDataFrame(Seq.empty[(Long, String, Double)])
      .toDF("k", "status", "v").createOrReplaceTempView("rlo_empty")
    spark.sql(
      s"""MERGE INTO $fqn t USING rlo_empty s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    assert(spark.table(fqn).count() == 400L)
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE v = 0.0")
      .head().getLong(0) == 10L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("CALL graft.sys.manifest reports log/manifest state through a " +
      "DML lifecycle") {
    val fqn = build("maniproc")
    def state(): Map[String, String] = {
      val r = spark.sql(
        "CALL graft.sys.manifest(table => 'rlo.maniproc')").collect().head
      r.schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> r.getString(i) }.toMap
    }
    val s0 = state()
    assert(s0("live_regions") == "4" && s0("live_rows") == "400")
    assert(s0("log_segments").toInt >= 1, "the INSERT appended a segment")
    // manual fold: checkpoint carries the whole state, log empties
    val folded = spark.sql(
      "CALL graft.sys.fold(table => 'rlo.maniproc')").collect().head
    assert(folded.getString(0).toInt >= 1)
    assert(state()("log_segments") == "0")
    assert(spark.sql(
      "CALL graft.sys.fold(table => 'rlo.maniproc')").collect()
      .head.getString(0) == "0", "second fold is a no-op")
    spark.sql(s"INSERT INTO $fqn SELECT id, 'open', id * 1.0 " +
      "FROM range(400, 401)")
    spark.sql(s"UPDATE $fqn SET v = 0.0 WHERE k < 100")
    val s1 = state()
    assert(s1("generation").toLong == s0("generation").toLong + 1,
      "a rewrite bumps the generation")
    assert(s1("retired_regions").toInt >= 1)
    // the INSERT and the UPDATE each logged one O(touched) delta
    // segment — a 2-region rewrite on a huge table must not pay an
    // O(regions) checkpoint; the fold happens on demand or at the
    // live-segment threshold
    assert(s1("log_segments") == "2",
      "append + rewrite each log one delta segment")
    assert(spark.sql("CALL graft.sys.fold(table => 'rlo.maniproc')")
      .collect().head.getString(0).toInt == 2)
    assert(state()("log_segments") == "0")
    spark.sql("CALL graft.sys.vacuum(table => 'rlo.maniproc')")
    assert(state()("retired_regions") == "0")
    spark.sql(s"DROP TABLE $fqn")
  }

  test("row-level ops refuse a dedupKeys table (the rewrite would " +
      "collapse key versions); exact DELETE and append-upsert still work") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rlo")
    val fqn = "graft.rlo.vers"
    spark.sql(s"DROP TABLE IF EXISTS $fqn")
    spark.sql(
      s"""CREATE TABLE $fqn (k BIGINT, v DOUBLE)
         |TBLPROPERTIES('keyCols'='k', 'regionSplits'='100;200;300',
         |              'graft.dedupKeys'='true')""".stripMargin)
    spark.sql(s"INSERT INTO $fqn SELECT id, 1.0 FROM range(400)")
    spark.sql(s"INSERT INTO $fqn SELECT id, 2.0 FROM range(400)") // upsert
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $fqn SET v = 9.0 WHERE k < 10")
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("dedupKeys"), rootMsg(e))
    // both versions still stored, latest-wins recipe still correct
    assert(spark.table(fqn).count() == 800L)
    val latest = spark.sql(
      s"""SELECT count(*) FROM (
         |  SELECT k, v, row_number() OVER (
         |    PARTITION BY k ORDER BY _graft_region_id DESC) rn
         |  FROM $fqn) WHERE rn = 1 AND v = 2.0""".stripMargin)
      .head().getLong(0)
    assert(latest == 400L, "UPDATE refusal must leave version order intact")
    // interval-exact DELETE drops ALL versions of its keys — sound
    spark.sql(s"DELETE FROM $fqn WHERE k < 100")
    assert(spark.table(fqn).count() == 600L)
    spark.sql(s"DROP TABLE $fqn")
  }

  test("MERGE with NOT MATCHED BY SOURCE deletes the rest of a region") {
    val fqn = build("mergedel")
    spark.createDataFrame((0L until 50L).map(k => Tuple1(k)))
      .toDF("k").createOrReplaceTempView("rlo_keep")
    spark.sql(
      s"""MERGE INTO $fqn t USING rlo_keep s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = 0.0
         |WHEN NOT MATCHED BY SOURCE AND t.k < 100 THEN DELETE"""
        .stripMargin)
    assert(spark.table(fqn).count() == 350L)
    assert(spark.sql(s"SELECT max(v) FROM $fqn WHERE k < 50")
      .head().getDouble(0) == 0.0)
    spark.sql(s"DROP TABLE $fqn")
  }
}
