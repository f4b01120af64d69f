package graft.catalog

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier

/** Region compaction: rewrite a table's region files into `numRegions`
  * key-sorted, disjoint regions.
  *
  * The reference delegates this to HBase (memstore flushes create small
  * HFiles, the region server compacts them); in graft every append
  * commits its own region files, so a table fed by many small inserts —
  * e.g. the streaming foreachBatch sink — accumulates overlapping
  * little regions that weaken pruning. Compaction = one range-shuffled
  * sorted rewrite through the normal write path into a staging table,
  * then an atomic-enough manifest+file swap.
  */
object GraftCompact {

  def compact(spark: SparkSession, catalogName: String, namespace: String,
      table: String, numRegions: Int): Unit = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array(namespace), table)
    val t = cat.loadTable(ident).asInstanceOf[GraftTable]

    val stagingName = s"${table}__compacting"
    val stagingIdent = Identifier.of(Array(namespace), stagingName)
    cat.dropTable(stagingIdent) // stale staging from a failed run
    val props = new java.util.HashMap[String, String]()
    t.meta.properties.foreach { case (k, v) => props.put(k, v) }
    props.put(TableMeta.NumRegionsProp, numRegions.toString)
    cat.createTable(stagingIdent, t.meta.schema,
      Array.empty, props)
    spark.sql(s"INSERT INTO $catalogName.$namespace.$stagingName " +
      s"SELECT * FROM $catalogName.$namespace.$table")

    val staging = cat.loadTable(stagingIdent).asInstanceOf[GraftTable]
    val newRegions = TableMeta.loadRegions(staging.tableDir)
    val oldRegions = TableMeta.loadRegions(t.tableDir)
    // move new files in, point the manifest at them, remove old files
    newRegions.foreach { r =>
      Files.move(new File(staging.tableDir, r.file).toPath,
        new File(t.tableDir, r.file).toPath,
        StandardCopyOption.REPLACE_EXISTING)
    }
    TableMeta.saveRegions(t.tableDir, newRegions)
    oldRegions.foreach(r => new File(t.tableDir, r.file).delete())
    cat.dropTable(stagingIdent)
    cat.invalidateTable(ident)
  }
}
