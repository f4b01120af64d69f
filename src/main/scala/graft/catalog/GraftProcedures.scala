package graft.catalog

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}

/** SQL-visible maintenance procedures for the graft catalog, on the
  * Spark-4 V2 `ProcedureCatalog` API:
  *
  * {{{
  *   CALL graft.sys.load_csv(table => 'ns.t', path => '/data/x.csv')
  *   CALL graft.sys.compact(table => 'ns.t', target_regions => 4)
  * }}}
  *
  * `load_csv` is the statement form of the reference's
  * `LOAD DATA [LOCAL] INPATH '<path>' INTO TABLE t` surface
  * (/root/reference `HBaseBulkLoadIntoTableSuite.scala:35-66`,
  * `HBaseSQLParser` LOAD grammar): same CSV → typed rows with null
  * backfill of short lines → range-shuffled sorted region load.
  * Spark's own `LOAD DATA` statement is reserved for Hive-format v1
  * tables, so the sanctioned v2 route is a procedure rather than a
  * parser fork — one name, same semantics, plus it composes with
  * named/default arguments.
  */
object GraftProcedures {

  /** Namespace the procedures live in: `CALL graft.sys.<name>(...)`. */
  val Namespace: Array[String] = Array("sys")

  val Names: Seq[String] = Seq("load_csv", "compact")

  def load(catalogName: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.isEmpty ||
      ident.namespace.map(_.toLowerCase).sameElements(Namespace),
      s"graft procedures live in the '${Namespace.mkString(".")}' " +
        s"namespace; got ${ident.namespace.mkString(".")}")
    ident.name.toLowerCase match {
      case "load_csv" => new LoadCsvProcedure(catalogName)
      case "compact" => new CompactProcedure(catalogName)
      case other => throw new IllegalArgumentException(
        s"unknown graft procedure $other; available: ${Names.mkString(", ")}")
    }
  }

  /** 'ns.t' (within this catalog) → fully-qualified `catalog.ns.t`. */
  private def fqn(catalogName: String, table: String): String =
    s"$catalogName.$table"

  private def splitNsTable(table: String): (String, String) = {
    val i = table.lastIndexOf('.')
    require(i > 0, s"expected '<namespace>.<table>', got '$table'")
    (table.substring(0, i), table.substring(i + 1))
  }

  final class LoadCsvProcedure(catalogName: String)
      extends UnboundProcedure {
    override def name(): String = "load_csv"
    override def description(): String =
      "bulk-load a delimited text file into a graft table " +
        "(range-shuffled sorted region load; short lines null-backfill)"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = "load_csv"
        override def description(): String = LoadCsvProcedure.this.description()
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType)
            .comment("'<namespace>.<table>' within this catalog").build(),
          ProcedureParameter.in("path", StringType)
            .comment("CSV file or directory").build(),
          ProcedureParameter.in("delimiter", StringType)
            .defaultValue("','").build())
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val table = input.getUTF8String(0).toString
          val path = input.getUTF8String(1).toString
          val delimiter = input.getUTF8String(2).toString
          GraftBulkLoad.loadCsv(SparkSession.active, path,
            fqn(catalogName, table), delimiter)
          Collections.emptyIterator()
        }
      }
  }

  final class CompactProcedure(catalogName: String)
      extends UnboundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite a graft table's regions into target_regions key-sorted " +
        "files and bump the manifest generation"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = "compact"
        override def description(): String = CompactProcedure.this.description()
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType)
            .comment("'<namespace>.<table>' within this catalog").build(),
          ProcedureParameter.in("target_regions", IntegerType).build())
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val (ns, t) = splitNsTable(input.getUTF8String(0).toString)
          GraftCompact.compact(SparkSession.active, catalogName, ns, t,
            input.getInt(1))
          Collections.emptyIterator()
        }
      }
  }
}
