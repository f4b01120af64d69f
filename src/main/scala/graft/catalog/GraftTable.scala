package graft.catalog

import java.io.File
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.codec.KeyCodec
import graft.prune.KeyRanges
import graft.prune.KeyRanges.{Iv, IvSet}

/** A graft table: key-sorted parquet region files + JSON metadata,
  * exposed through DataSource V2.
  *
  * Read path mirrors the reference's scan stack (SURVEY §2.1/§4.1) in
  * Spark-native terms:
  *  - `SupportsPushDownFilters` receives the predicate split (the
  *    reference's `ScanPredClassifier`); key-column conjuncts drive
  *    region pruning (the reference's critical-point partition pruning,
  *    `HBaseCriticalPoint.scala`), all filters also become parquet
  *    row-group predicates (the FilterList/skip-scan analogue), and
  *    everything is kept as residual for Spark to re-check (exactness
  *    never depends on storage-side evaluation);
  *  - `SupportsPushDownRequiredColumns` is the column-pruning path
  *    (`addColumnFamiliesToScan`);
  *  - one `InputPartition` per surviving region (the reference's
  *    `HBasePartition`), with row-count statistics for the planner.
  */
class GraftTable(tableName: String, val tableDir: File, val meta: TableMeta)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = tableName
  override def schema(): StructType = meta.schema
  override def properties(): java.util.Map[String, String] =
    meta.properties.asJava
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableDir, meta)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(tableDir, meta, info)
}

/** V1 `sources.Filter` → per-key-dimension interval sets, for region
  * pruning (same interval domain as [[graft.prune.KeyRanges]], which
  * covers the Catalyst-expression face of the same capability). */
object GraftFilters {

  def intervals(filters: Seq[sources.Filter],
      dims: Map[String, (Int, DataType)]): Map[Int, IvSet] =
    filters.map(one(_, dims)).foldLeft(Map.empty[Int, IvSet])(merge)

  private def merge(a: Map[Int, IvSet], b: Map[Int, IvSet]): Map[Int, IvSet] =
    (a.keySet ++ b.keySet).map { d =>
      val xs = a.getOrElse(d, List(KeyRanges.full))
      val ys = b.getOrElse(d, List(KeyRanges.full))
      d -> (for (x <- xs; y <- ys) yield x.intersect(y)).filterNot(_.isEmpty)
    }.toMap

  private def enc(dt: DataType, v: Any): Option[Array[Byte]] =
    ParquetRowIO.toInternal(dt, v).flatMap { cv =>
      try Some(KeyCodec.encode(dt, cv)) catch { case _: Exception => None }
    }

  private def one(f: sources.Filter, dims: Map[String, (Int, DataType)])
      : Map[Int, IvSet] = f match {
    case sources.And(l, r) => merge(one(l, dims), one(r, dims))
    case sources.Or(l, r) =>
      val (a, b) = (one(l, dims), one(r, dims))
      (a.keySet intersect b.keySet).map(d => d -> (a(d) ++ b(d))).toMap
    case sources.EqualTo(n, v) => dim(n, dims).flatMap { case (d, dt) =>
      enc(dt, v).map(b => Map(d -> List(Iv(Some(b), true, Some(b), true))))
    }.getOrElse(Map.empty)
    case sources.GreaterThan(n, v) => dim(n, dims).flatMap { case (d, dt) =>
      enc(dt, v).map(b => Map(d -> List(Iv(Some(b), false, None, false))))
    }.getOrElse(Map.empty)
    case sources.GreaterThanOrEqual(n, v) => dim(n, dims).flatMap { case (d, dt) =>
      enc(dt, v).map(b => Map(d -> List(Iv(Some(b), true, None, false))))
    }.getOrElse(Map.empty)
    case sources.LessThan(n, v) => dim(n, dims).flatMap { case (d, dt) =>
      enc(dt, v).map(b => Map(d -> List(Iv(None, false, Some(b), false))))
    }.getOrElse(Map.empty)
    case sources.LessThanOrEqual(n, v) => dim(n, dims).flatMap { case (d, dt) =>
      enc(dt, v).map(b => Map(d -> List(Iv(None, false, Some(b), true))))
    }.getOrElse(Map.empty)
    case sources.In(n, vs) => dim(n, dims).map { case (d, dt) =>
      val ivs = vs.toList.flatMap(v =>
        enc(dt, v).map(b => Iv(Some(b), true, Some(b), true)))
      if (ivs.length == vs.length) Map(d -> ivs) else Map.empty[Int, IvSet]
    }.getOrElse(Map.empty)
    // key columns reject nulls at write time → IS NULL proves empty
    case sources.IsNull(n) =>
      dim(n, dims).map { case (d, _) => Map(d -> (Nil: IvSet)) }
        .getOrElse(Map.empty)
    case _ => Map.empty
  }

  private def dim(name: String, dims: Map[String, (Int, DataType)])
      : Option[(Int, DataType)] = dims.get(name.toLowerCase)
}

class GraftScanBuilder(tableDir: File, meta: TableMeta)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = meta.schema
  private var pushed: Array[sources.Filter] = Array.empty

  override def pushFilters(filters: Array[sources.Filter])
      : Array[sources.Filter] = {
    pushed = filters
    filters // everything stays residual; storage-side eval is best-effort
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftScan(tableDir, meta, required, pushed)
}

class GraftScan(tableDir: File, meta: TableMeta, required: StructType,
    filters: Array[sources.Filter])
    extends Scan with Batch with SupportsReportStatistics
    with SupportsReportOrdering {

  private val dims: Map[String, (Int, DataType)] =
    meta.keyCols.zipWithIndex.map { case (k, i) =>
      k.toLowerCase -> (i, meta.schema(k).dataType)
    }.toMap

  /** Regions surviving interval pruning (driver-side, O(regions)). */
  lazy val selectedRegions: Seq[RegionMeta] = {
    val constraints = GraftFilters.intervals(filters.toSeq, dims)
    TableMeta.loadRegions(tableDir).filter { r =>
      KeyRanges.survives(constraints,
        r.mins.map(KeyCodec.fromHex), r.maxs.map(KeyCodec.fromHex))
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    selectedRegions.map(r => GraftInputPartition(
      new File(tableDir, r.file).getPath, r.rows): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(required.json, filters)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(
      selectedRegions.map(r => new File(tableDir, r.file).length())
        .sum.max(1L))
    override def numRows(): OptionalLong =
      OptionalLong.of(selectedRegions.map(_.rows).sum)
  }

  /** Region files are written key-sorted (RequiresDistributionAndOrdering
    * on the write side), so each partition reads in composite-key order —
    * reported so Spark elides local sorts on key prefixes (the rebuild of
    * the reference's declared scan ordering, HBaseSQLTableScan.scala:41-47).
    * Only reported when every key column survives column pruning. */
  override def outputOrdering(): Array[connector.expressions.SortOrder] = {
    val have = required.fieldNames.map(_.toLowerCase).toSet
    if (meta.keyCols.forall(k => have.contains(k.toLowerCase)))
      meta.keyCols.map(k => connector.expressions.Expressions.sort(
        connector.expressions.Expressions.column(k),
        connector.expressions.SortDirection.ASCENDING)).toArray
    else Array.empty
  }

  override def description(): String =
    s"GraftScan ${tableDir.getName} regions=${selectedRegions.size} " +
      s"filters=${filters.mkString(", ")}"
}

final case class GraftInputPartition(file: String, rows: Long)
    extends InputPartition

final case class GraftReaderFactory(requiredJson: String,
    filters: Array[sources.Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    new GraftPartitionReader(p.file, required, filters)
  }
}

final class GraftPartitionReader(file: String, required: StructType,
    filters: Array[sources.Filter]) extends PartitionReader[InternalRow] {
  private val reader = new ParquetRowIO.RowReader(file, required,
    ParquetRowIO.toParquetFilter(filters.toSeq, required))
  private var current: InternalRow = _
  override def next(): Boolean = { current = reader.next(); current != null }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
