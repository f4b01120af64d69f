package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapred.FileSplit
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Columnar (vectorized) reader for graft region files.
  *
  * The reference's scan decodes HBase `Result`s row-at-a-time
  * (/root/reference `HBaseSQLReaderRDD.createIterator:178-210`); the
  * Spark-native bar is higher — Spark's own parquet source decodes
  * whole column pages into `ColumnarBatch`es that feed whole-stage
  * codegen through a single `ColumnarToRow` boundary. Region files are
  * plain parquet (written by [[ParquetRowIO.RowWriter]] or Spark's
  * writer in the bulk-load path, always modern-calendar MICROS
  * timestamps), so we reuse Spark's `VectorizedParquetRecordReader`
  * directly: ~10× fewer per-value virtual calls than the row-oriented
  * Group API, plus free dictionary-aware decoding and lazy
  * materialization.
  *
  * Pushed filters become parquet `FilterPredicate`s for row-group and
  * page (column-index) skipping only — the vectorized reader never
  * filters record-at-a-time, and Spark re-applies every pushed filter
  * above the scan, so skipping stays best-effort and exactness never
  * depends on it (same contract as the row path).
  */
object ParquetColumnarIO {

  /** Spark's conf key carrying the Catalyst read schema into
    * `ParquetReadSupport` (string literal to avoid compile-time access
    * to the `private[parquet]` constant). */
  private val RowRequestedSchemaKey =
    "org.apache.spark.sql.parquet.row.requested_schema"
  private val ReadSupportClass =
    "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport"

  /** Batch size matching Spark's `spark.sql.parquet.columnarReaderBatchSize`
    * default. */
  private val Capacity = 4096

  final class ColumnarReader(file: String, required: StructType,
      filters: Seq[sources.Filter], sessionZone: String = "UTC",
      caseSensitive: Boolean = false) {

    private val conf = new Configuration()
    conf.set(ParquetInputFormat.READ_SUPPORT_CLASS, ReadSupportClass)
    conf.set(RowRequestedSchemaKey, required.json)
    // read-time semantics captured from the live session conf on the
    // driver (GraftReaderFactory) so the columnar path resolves names
    // and zones exactly like the row fallback and plain parquet scans
    conf.set("spark.sql.session.timeZone", sessionZone)
    conf.setBoolean("spark.sql.caseSensitive", caseSensitive)
    // ParquetToSparkSchemaConverter(conf) reads these with no default —
    // every one must be present
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    conf.setBoolean("spark.sql.parquet.fieldId.read.enabled", false)

    private val path = new Path(file)
    private val length = path.getFileSystem(conf).getFileStatus(path).getLen
    // pushed predicate rebuilt per file against the columns the file
    // actually has (ALTER-added columns are absent from older regions) —
    // same soundness contract as the row path (ParquetRowIO.toFileFilter).
    // The extra footer read only happens when there is a filter to build.
    if (filters.nonEmpty) {
      val footer = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(path, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getFileMetaData.getSchema finally r.close()
      }
      ParquetRowIO.toFileFilter(filters, required, footer)
        .foreach(p => ParquetInputFormat.setFilterPredicate(conf, p))
    }
    // graft region files are written whole by modern writers: no legacy
    // calendar rebase (CORRECTED = read stored values as-is), no INT96
    private val reader = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, Capacity)
    private var initialized = false
    try {
      reader.initialize(
        new FileSplit(path, 0, length, Array.empty[String]),
        new TaskAttemptContextImpl(conf, new TaskAttemptID()))
      reader.initBatch(new StructType(), InternalRow.empty)
      reader.enableReturningBatches()
      initialized = true
    } finally if (!initialized) reader.close()

    def nextBatch(): Boolean = reader.nextKeyValue()
    def batch(): ColumnarBatch =
      reader.getCurrentValue.asInstanceOf[ColumnarBatch]
    def close(): Unit = reader.close()
  }
}
