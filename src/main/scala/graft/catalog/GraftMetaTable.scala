package graft.catalog

import java.io.File
import java.util.Collections

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style metadata tables: `SELECT * FROM graft.ns.t.history` /
  * `...t.manifest` resolve to read-only relations over the commit log
  * and the live region manifest — the SQL-composable face of
  * `CALL graft.sys.history` / `.manifest` (a CALL's result set cannot
  * be joined or filtered; these can: "which regions hold fewer than
  * 10k rows", "commits per op last hour", the join driving a
  * split/merge/vacuum decision).
  *
  * Both materialize driver-side ([[LocalScan]] — no job, no data IO),
  * which is exactly the manifest's own residence: the region list and
  * retained log segments are driver-memory metadata already, O(regions
  * + retained commits), not O(data). The reference surfaces the
  * analogous metadata through the HBase shell (`status`, `scan
  * 'hbase:meta'`); here it is a table like any other.
  *
  * Snapshots are read at load time — a query plans against the
  * metadata as of resolution, matching the semantics of every other
  * catalog's metadata tables. */
object GraftMetaTable {

  val Kinds: Set[String] = Set("history", "manifest", "tags")

  val TagsSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  val HistorySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("regions_added", IntegerType, nullable = false),
    StructField("rows_added", LongType, nullable = false),
    StructField("regions_removed", IntegerType, nullable = false)))

  val ManifestSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("src_max_id", LongType, nullable = false),
    StructField("min_key", StringType, nullable = true),
    StructField("max_key", StringType, nullable = true)))

  def apply(baseName: String, kind: String, dir: File): GraftMetaTable =
    kind match {
      case "history" => new GraftMetaTable(s"$baseName.history",
        HistorySchema,
        () => TableMeta.history(dir).map { e =>
          new GenericInternalRow(Array[Any](e.version, e.tsMillis * 1000L,
            UTF8String.fromString(e.op), e.regionsAdded, e.rowsAdded,
            e.regionsRemoved)): InternalRow
        })
      case "manifest" => new GraftMetaTable(s"$baseName.manifest",
        ManifestSchema,
        () => TableMeta.loadRegions(dir).map { r =>
          new GenericInternalRow(Array[Any](r.id,
            UTF8String.fromString(r.file), r.rows,
            new File(dir, r.file).length(), r.bucket, r.srcMaxId,
            UTF8String.fromString(r.mins.mkString(";")),
            UTF8String.fromString(r.maxs.mkString(";")))): InternalRow
        })
      case "tags" => new GraftMetaTable(s"$baseName.tags",
        TagsSchema,
        () => TableMeta.tags(TableMeta.load(dir).properties).toSeq
          .sortBy(_._1).map { case (tag, v) =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(tag), v)): InternalRow
          })
      case other => throw new IllegalArgumentException(
        s"unknown metadata table '$other' (${Kinds.mkString(", ")})")
    }
}

final class GraftMetaTable(tableName: String, tableSchema: StructType,
    rowsFn: () => Seq[InternalRow]) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    // snapshot at plan time: metadata rows are already driver-resident
    val data = rowsFn().toArray
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = tableSchema
        override def rows(): Array[InternalRow] = data
      }
    }
  }
}
