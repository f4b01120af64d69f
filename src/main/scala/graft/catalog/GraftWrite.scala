package graft.catalog

import java.io.File
import java.util.UUID

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import graft.codec.KeyCodec

/** Write path: every append is a range-partitioned, key-sorted bulk
  * load.
  *
  * The reference bulk-loads by shuffling rows with a custom range
  * partitioner over encoded row keys, sorting within partitions and
  * writing HFiles (/root/reference `HBaseCatalog.loadTable:507-663`,
  * `HBasePartitioner.scala`). The Spark-4-native equivalent is
  * [[RequiresDistributionAndOrdering]]: the write declares an ordered
  * distribution on the key columns and Spark plans the range shuffle +
  * sort itself (AQE sizes the partitions), so every task receives a
  * disjoint, sorted key range and writes exactly one region file.
  * The commit message carries per-dimension min/max encoded keys; the
  * driver appends them to the region manifest atomically on commit.
  *
  * Key columns reject nulls at write time (the reference's key columns
  * are structurally non-null, SURVEY §1.2).
  */
class GraftWriteBuilder(tableDir: File, meta: TableMeta,
    info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new GraftWrite(tableDir, meta)
}

class GraftWrite(tableDir: File, meta: TableMeta)
    extends Write with RequiresDistributionAndOrdering {

  private def sortOrders: Array[SortOrder] =
    meta.keyCols.map(k =>
      Expressions.sort(Expressions.column(k), SortDirection.ASCENDING)).toArray

  override def requiredDistribution(): Distribution =
    Distributions.ordered(sortOrders)
  override def requiredOrdering(): Array[SortOrder] = sortOrders
  override def requiredNumPartitions(): Int =
    meta.properties.get(TableMeta.NumRegionsProp).map(_.toInt).getOrElse(0)

  override def toBatch: BatchWrite =
    new GraftBatchWrite(tableDir, meta)
}

final case class RegionCommit(file: String, rows: Long,
    mins: Seq[String], maxs: Seq[String]) extends WriterCommitMessage

class GraftBatchWrite(tableDir: File, meta: TableMeta) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    GraftWriterFactory(tableDir.getPath, meta.schema.json,
      meta.keyCols.toArray)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val regions = messages.collect {
      case r: RegionCommit if r.rows > 0 =>
        RegionMeta(r.file, r.rows, r.mins, r.maxs)
    }
    TableMeta.appendRegions(tableDir, regions.toSeq)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case r: RegionCommit => new File(tableDir, r.file).delete()
      case _ =>
    }
}

final case class GraftWriterFactory(dir: String, schemaJson: String,
    keyCols: Array[String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftDataWriter(dir, schemaJson, keyCols, partitionId, taskId)
}

final class GraftDataWriter(dir: String, schemaJson: String,
    keyCols: Array[String], partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val keyIdx = keyCols.map(schema.fieldIndex)
  private val keyTypes = keyIdx.map(schema.fields(_).dataType)
  private val fileName = f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.parquet"

  private var writer: ParquetRowIO.RowWriter = _
  private var rows = 0L
  private val mins = Array.fill[Array[Byte]](keyCols.length)(null)
  private val maxs = Array.fill[Array[Byte]](keyCols.length)(null)

  /** Internal value of key dimension d, for the codec. */
  private def keyValue(row: InternalRow, d: Int): Any = keyTypes(d) match {
    case BooleanType => row.getBoolean(keyIdx(d))
    case ByteType => row.getByte(keyIdx(d))
    case ShortType => row.getShort(keyIdx(d))
    case IntegerType | DateType => row.getInt(keyIdx(d))
    case LongType | TimestampType => row.getLong(keyIdx(d))
    case FloatType => row.getFloat(keyIdx(d))
    case DoubleType => row.getDouble(keyIdx(d))
    case StringType => row.getUTF8String(keyIdx(d)).toString
    case other => throw new IllegalStateException(other.toString)
  }

  override def write(row: InternalRow): Unit = {
    var d = 0
    while (d < keyIdx.length) {
      if (row.isNullAt(keyIdx(d)))
        throw new IllegalArgumentException(
          s"null value in key column ${keyCols(d)}")
      val enc = KeyCodec.encode(keyTypes(d), keyValue(row, d))
      if (mins(d) == null || KeyCodec.compare(enc, mins(d)) < 0) mins(d) = enc
      if (maxs(d) == null || KeyCodec.compare(enc, maxs(d)) > 0) maxs(d) = enc
      d += 1
    }
    if (writer == null)
      writer = new ParquetRowIO.RowWriter(new File(dir, fileName).getPath, schema)
    writer.write(row)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    RegionCommit(fileName, rows,
      mins.map(b => if (b == null) "" else KeyCodec.toHex(b)).toSeq,
      maxs.map(b => if (b == null) "" else KeyCodec.toHex(b)).toSeq)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    new File(dir, fileName).delete()
  }

  override def close(): Unit = ()
}
