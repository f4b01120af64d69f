package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** `CALL graft.sys.text_index` / `text_index_refresh`: the full-text
  * tier as a catalog feature. The refresh must be O(delta) and
  * bit-identical to a rebuild; the soundness refusals mirror
  * index_refresh's. */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  private def bm25FromFts(fts: String, stats: String) = {
    val posts = spark.table(fts)
      .filter(col("term").isin("vector", "join", "stream"))
      .select(col("doc_id"), col("dl"), col("term").as("w"), col("tf"))
    val st = spark.table(stats).groupBy()
      .agg(max(when(col("stat") === "n_docs", col("v"))).as("n_docs"),
        (max(when(col("stat") === "total_dl", col("v"))).cast("double") /
          max(when(col("stat") === "n_docs", col("v")))).as("avgdl"))
    graft.operators.TextOps.bm25ScoreOf(posts, st)
      .orderBy(col("score").desc, col("doc_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("text_index builds the postings tier; refresh after an append " +
      "is O(delta) and equals a full rebuild") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fts")
    Seq("docs_f", "docs_f_fts", "docs_f_fts_stats").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.fts.$t"))
    spark.sql(
      """CREATE TABLE graft.fts.docs_f (
        |  doc_id BIGINT, text STRING, lang STRING)
        |TBLPROPERTIES('keyCols'='doc_id', 'numRegions'='4')"""
        .stripMargin)
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang")
    all.filter(col("doc_id") < 300).createOrReplaceTempView("fts_hist")
    spark.sql("INSERT INTO graft.fts.docs_f SELECT * FROM fts_hist")
    val built = spark.sql("CALL graft.sys.text_index(" +
      "table => 'fts.docs_f', column => 'text', id => 'doc_id')")
      .collect()
    assert(built.head.getString(1).toLong > 0)
    // append a delta, refresh incrementally
    all.filter(col("doc_id") >= 300).createOrReplaceTempView("fts_delta")
    spark.sql("INSERT INTO graft.fts.docs_f SELECT * FROM fts_delta")
    val refreshed = spark.sql(
      "CALL graft.sys.text_index_refresh(table => 'fts.docs_f')")
      .collect()
    assert(refreshed.head.getString(1).toLong > 0, "delta postings")
    // BM25 from the refreshed index == the full-scan recompute over
    // the whole corpus (the driver-gated text_bm25 pipeline)
    val viaFts = bm25FromFts("graft.fts.docs_f_fts",
      "graft.fts.docs_f_fts_stats")
    val full = graft.operators.TextOps.bm25(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaFts == full, s"fts=$viaFts full=$full")
    // idempotence: nothing new => zero appended, watermark advances
    val again = spark.sql(
      "CALL graft.sys.text_index_refresh(table => 'fts.docs_f')")
      .collect()
    assert(again.head.getString(1) == "0")
  }

  test("text_search CALL equals the driver-gated BM25 pipeline for " +
      "the same terms, and answers arbitrary queries") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fts")
    Seq("docs_s", "docs_s_fts", "docs_s_fts_stats").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.fts.$t"))
    spark.sql(
      """CREATE TABLE graft.fts.docs_s (
        |  doc_id BIGINT, text STRING, lang STRING)
        |TBLPROPERTIES('keyCols'='doc_id', 'numRegions'='4')"""
        .stripMargin)
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang")
      .createOrReplaceTempView("fts_all")
    spark.sql("INSERT INTO graft.fts.docs_s SELECT * FROM fts_all")
    spark.sql("CALL graft.sys.text_index(table => 'fts.docs_s', " +
      "column => 'text', id => 'doc_id')").collect()
    val viaCall = spark.sql("CALL graft.sys.text_search(" +
      "table => 'fts.docs_s', query => 'vector join stream')")
      .collect().map(r => (r.getString(0).toLong,
        r.getString(1).toDouble)).toSeq
    val full = graft.operators.TextOps.bm25(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaCall == full, s"call=$viaCall full=$full")
    // an arbitrary single-term query answers too (df=1 term)
    val one = spark.sql("CALL graft.sys.text_search(" +
      "table => 'fts.docs_s', query => 'customer', k => 5)").collect()
    assert(one.length == 5)
  }

  test("build refuses duplicate ids; refresh refuses a re-used or " +
      "within-delta-duplicated id (insert-only postings cannot " +
      "retract the old document)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fts")
    Seq("docs_u", "docs_u_fts", "docs_u_fts_stats").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.fts.$t"))
    spark.sql(
      """CREATE TABLE graft.fts.docs_u (doc_id BIGINT, text STRING)
        |TBLPROPERTIES('keyCols'='doc_id', 'numRegions'='2')"""
        .stripMargin)
    // duplicate id 7 at build time: BM25 stats count documents, so the
    // build itself must refuse
    spark.sql("INSERT INTO graft.fts.docs_u " +
      "SELECT id, concat('w', id % 5, ' y z') FROM range(50)")
    spark.sql("INSERT INTO graft.fts.docs_u VALUES (7, 'dup seven')")
    val eb = intercept[Exception] {
      spark.sql("CALL graft.sys.text_index(table => 'fts.docs_u', " +
        "column => 'text', id => 'doc_id')").collect()
    }
    assert(eb.getMessage.contains("duplicate"),
      s"expected a duplicate-id refusal, got: ${eb.getMessage}")
    // clean base indexes fine…
    spark.sql("DELETE FROM graft.fts.docs_u WHERE text = 'dup seven'")
    spark.sql("CALL graft.sys.text_index(table => 'fts.docs_u', " +
      "column => 'text', id => 'doc_id')").collect()
    // …but an append RE-USING an indexed id must refuse at refresh:
    // blindly inserting the delta's postings would double-count the
    // (term, id) rows and the n_docs/total_dl counters
    spark.sql("INSERT INTO graft.fts.docs_u VALUES (7, 'reused seven')")
    val er = intercept[Exception] {
      spark.sql("CALL graft.sys.text_index_refresh(" +
        "table => 'fts.docs_u')").collect()
    }
    assert(er.getMessage.contains("rebuild") &&
      er.getMessage.contains("re-used"),
      s"expected a re-used-id rebuild refusal, got: ${er.getMessage}")
    // a rebuild also refuses (the duplicate is now in the base) until
    // the offending row is removed
    spark.sql("DELETE FROM graft.fts.docs_u WHERE text = 'reused seven'")
    spark.sql("CALL graft.sys.text_index(table => 'fts.docs_u', " +
      "column => 'text', id => 'doc_id')").collect()
    // within-delta duplicate: two new rows sharing a NEW id
    spark.sql("INSERT INTO graft.fts.docs_u VALUES " +
      "(900, 'fresh a'), (900, 'fresh b')")
    val ed = intercept[Exception] {
      spark.sql("CALL graft.sys.text_index_refresh(" +
        "table => 'fts.docs_u')").collect()
    }
    assert(ed.getMessage.contains("duplicate"),
      s"expected a within-delta duplicate refusal, got: ${ed.getMessage}")
  }

  test("refresh refuses after an in-place rewrite and on dedupKeys " +
      "bases, directing to a rebuild") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fts")
    Seq("docs_r", "docs_r_fts", "docs_r_fts_stats").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.fts.$t"))
    spark.sql(
      """CREATE TABLE graft.fts.docs_r (doc_id BIGINT, text STRING)
        |TBLPROPERTIES('keyCols'='doc_id', 'numRegions'='2')"""
        .stripMargin)
    spark.sql("INSERT INTO graft.fts.docs_r " +
      "SELECT id, concat('w', id % 7, ' x y') FROM range(100)")
    spark.sql("CALL graft.sys.text_index(table => 'fts.docs_r', " +
      "column => 'text', id => 'doc_id')").collect()
    spark.sql("UPDATE graft.fts.docs_r SET text = 'rewritten' " +
      "WHERE doc_id = 5")
    val e = intercept[Exception] {
      spark.sql("CALL graft.sys.text_index_refresh(" +
        "table => 'fts.docs_r')").collect()
    }
    assert(e.getMessage.contains("rebuild"),
      s"expected a rebuild refusal, got: ${e.getMessage}")
  }
}
