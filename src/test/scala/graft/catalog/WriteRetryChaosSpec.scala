package graft.catalog

import java.io.File

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Task-retry / speculative-attempt idempotence of the plain append
  * commit: a write attempt whose files reached the table directory but
  * whose commit message was NEVER passed to the job commit (a killed
  * or losing speculative attempt) must be invisible to readers — the
  * manifest, not the directory listing, is the source of truth. The
  * driver-board mview reds were hypothesized to come from a retried
  * write double-publishing a region; this pins the protocol. */
class WriteRetryChaosSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def warehouse: String =
    spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def row(k: Long, g: String, x: Long): InternalRow =
    new GenericInternalRow(Array[Any](k, UTF8String.fromString(g), x))

  test("an abandoned duplicate attempt's published files never become " +
      "visible; only the committed attempt's rows read back") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.chaos")
    val t = "graft.chaos.retry_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, g STRING, x BIGINT)
                 |TBLPROPERTIES('keyCols'='k', 'numRegions'='2')"""
      .stripMargin)
    val dir = new File(new File(warehouse, "chaos"), "retry_t")
    val meta = TableMeta.load(dir)
    val batch = new GraftBatchWrite(dir, meta)
    val factory = GraftCommits.factory(dir, meta)
    val rows = Seq(row(1L, "a", 10L), row(2L, "b", 20L))

    // attempt 0 of partition 0: writes, commits its task-level message
    val w0 = factory.createWriter(0, 0L)
    rows.foreach(w0.write)
    val m0 = w0.commit()

    // speculative/retry attempt 1 of the SAME partition: its files
    // reach the table directory too, but it loses the race — its
    // message is dropped on the floor (no abort: a killed executor
    // never gets to abort)
    val w1 = factory.createWriter(0, 1L)
    rows.foreach(w1.write)
    w1.commit() // message discarded — the attempt is abandoned

    val orphansBefore = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(orphansBefore >= 2, "both attempts' files should be on disk")

    // job commit sees ONLY the winning attempt's message
    batch.commit(Array(m0))

    // exactly one copy of the rows is visible
    val got = spark.sql(s"SELECT k, x FROM $t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 10L), (2L, 20L)))
    assert(spark.table(t).count() === 2L)

    // and a real aborted attempt deletes its own files
    val w2 = factory.createWriter(1, 2L)
    w2.write(row(3L, "c", 30L))
    val before = dir.listFiles().count(_.getName.endsWith(".parquet"))
    w2.abort()
    val after = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before, "abort() must delete the attempt's files")
    assert(spark.table(t).count() === 2L)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("re-running a whole failed job (new attempt ids) after a " +
      "successful one does not duplicate rows unless committed twice") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.chaos")
    val t = "graft.chaos.rerun_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, g STRING, x BIGINT)
                 |TBLPROPERTIES('keyCols'='k', 'numRegions'='2')"""
      .stripMargin)
    val dir = new File(new File(warehouse, "chaos"), "rerun_t")
    val meta = TableMeta.load(dir)
    val factory = GraftCommits.factory(dir, meta)

    // job 1: writes files but DIES before the driver-side commit —
    // nothing becomes visible
    val wa = factory.createWriter(0, 10L)
    wa.write(row(1L, "a", 1L))
    wa.commit() // task message produced, job commit never happens
    assert(spark.table(t).count() === 0L,
      "uncommitted job's files must be invisible")

    // job 2 (the retry): full write + commit
    val batch = new GraftBatchWrite(dir, TableMeta.load(dir))
    val wb = factory.createWriter(0, 11L)
    wb.write(row(1L, "a", 1L))
    val mb = wb.commit()
    batch.commit(Array(mb))
    assert(spark.table(t).count() === 1L)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
