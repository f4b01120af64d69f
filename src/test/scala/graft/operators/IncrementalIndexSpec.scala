package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.catalog.GraftChanges

/** Incremental near-dup index maintenance: the CDC face
  * (`changesFromVersion`) feeds the MinHash band index with ONLY the
  * newly appended documents, and the incrementally-maintained index
  * answers exactly like a from-scratch rebuild — the nightly-pipeline
  * pattern at 100 TB, where re-signing the whole corpus per batch is
  * the thing you cannot afford. Cross-batch pairs (new doc ≈ old doc)
  * are the case that breaks naive per-batch indexing; an injected one
  * must be found. */
class IncrementalIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tableDir(name: String): java.io.File = {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("inc"), name)).asInstanceOf[graft.catalog.GraftTable]
      .tableDir
  }

  test("band index maintained from the CDC delta equals a full rebuild " +
      "and finds cross-batch near-duplicates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.inc")
    Seq("docs", "bands").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.inc.$t"))
    spark.sql("CREATE TABLE graft.inc.docs (doc_id BIGINT, text STRING) " +
      "TBLPROPERTIES('keyCols'='doc_id', 'numRegions'='2')")
    spark.sql("CREATE TABLE graft.inc.bands (bh BIGINT, doc_id BIGINT) " +
      "TBLPROPERTIES('keyCols'='bh;doc_id', 'numRegions'='4')")

    val src = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "text")

    // batch 1: docs 0..149 -> full index build
    src.filter(col("doc_id") < 150).createOrReplaceTempView("inc_b1")
    spark.sql("INSERT INTO graft.inc.docs SELECT * FROM inc_b1")
    TextOps.minhashBands(TextOps.minhashWordSigs(
      spark.table("graft.inc.docs")))
      .select(col("bh"), col("doc_id"))
      .createOrReplaceTempView("inc_bands1")
    spark.sql("INSERT INTO graft.inc.bands SELECT * FROM inc_bands1")
    val v1 = graft.catalog.TableMeta.currentVersion(tableDir("docs"))

    // batch 2: docs 150..299 PLUS near-copies of docs 0..2 (one word
    // appended) — the cross-batch near-dup pairs (i, 10000+i)
    val b2 = src.filter(col("doc_id") >= 150 && col("doc_id") < 300)
      .unionAll(src.filter(col("doc_id") < 3)
        .withColumn("doc_id", col("doc_id") + 10000L)
        .withColumn("text", concat(col("text"), lit(" zzzz"))))
    b2.createOrReplaceTempView("inc_b2")
    spark.sql("INSERT INTO graft.inc.docs SELECT * FROM inc_b2")

    // incremental maintenance: sign ONLY the delta, append to the index
    val delta = spark.read.option(GraftChanges.FromKey, v1.toString)
      .table("graft.inc.docs")
    assert(delta.count() == b2.count(), "delta is exactly batch 2")
    TextOps.minhashBands(TextOps.minhashWordSigs(delta))
      .select(col("bh"), col("doc_id"))
      .createOrReplaceTempView("inc_bands2")
    spark.sql("INSERT INTO graft.inc.bands SELECT * FROM inc_bands2")

    // the incrementally-maintained index answers like a full rebuild
    val docsAll = spark.table("graft.inc.docs")
    val incPairs = TextOps.minhashVerifiedPairsFromBands(
      docsAll, spark.table("graft.inc.bands"))
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val fullPairs = TextOps.minhashVerifiedPairsFromBands(
      docsAll, TextOps.minhashBands(TextOps.minhashWordSigs(docsAll)))
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(incPairs == fullPairs,
      s"incremental index diverged: missing=${fullPairs -- incPairs} " +
        s"extra=${incPairs -- fullPairs}")
    // and the cross-batch injected pairs are present
    (0L until 3L).foreach(i => assert(incPairs.contains((i, 10000L + i)),
      s"cross-batch near-dup ($i, ${10000 + i}) not found"))

    Seq("docs", "bands").foreach(t =>
      spark.sql(s"DROP TABLE graft.inc.$t"))
  }
}
