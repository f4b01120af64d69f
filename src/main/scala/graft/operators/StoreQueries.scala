package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.RegionStore

/** Driver-gate queries that run through the [[graft.store.RegionStore]]
  * (bulk load → manifest → pruned scan), verifying the storage engine
  * end-to-end against the same DuckDB oracles as the plain-parquet
  * queries: the store must hold exactly the source rows. */
object StoreQueries {
  type Q = (SparkSession, String) => DataFrame

  private val cache = scala.collection.concurrent.TrieMap[String, String]()

  /** Build (once per sf dir) an orders region store keyed by o_orderkey.
    * `private[operators]` so PlanShapeSpec asserts pruning/ordering on
    * the SAME fixture the driver-gate faces run against.
    *
    * The store path is keyed by (warehouse, sf dir) — the SAME pair
    * FixtureLock serializes on — so two processes configured with
    * different warehouses can never share (and race on) one region
    * store under locks that don't exclude each other. */
  private[operators] def ordersStore(s: SparkSession, d: String): String = {
    CatalogQueries.ensureGraftCatalog(s) // before warehouse resolution
    val key = FixtureLock.warehouse(s) + "#" + d
    cache.getOrElseUpdate(key, FixtureLock.build(d) {
      val dir = s"/tmp/graft_region_store/orders_${math.abs(key.hashCode)}"
      if (!new java.io.File(s"$dir/_graft_manifest").exists()) {
        RegionStore.bulkLoad(
          s.read.parquet(s"$d/orders.parquet"), Seq("o_orderkey"), dir, 16)
      }
      dir
    })
  }

  /** Point lookup through region pruning (1 of 16 regions read). */
  val pointLookup: Q = (s, d) =>
    RegionStore.scan(s, ordersStore(s, d), Some(col("o_orderkey") === 100))
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))

  /** Range scan through region pruning. */
  val rangeScan: Q = (s, d) =>
    RegionStore.scan(s, ordersStore(s, d),
        Some(col("o_orderkey").between(100, 200)))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))

  /** Aggregation over a pruned key range (scan feeds stock Catalyst). */
  val keyAgg: Q = (s, d) =>
    RegionStore.scan(s, ordersStore(s, d),
        Some(col("o_orderkey") <= 500 || col("o_orderkey") > 1400))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice")), 2).as("total"))

  val queries: Map[String, Q] = Map(
    "store_point_lookup" -> pointLookup,
    "store_range_scan" -> rangeScan,
    "store_key_agg" -> keyAgg,
  )

  val oracles: Map[String, String] = Map(
    "store_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |       round(o_totalprice, 2) AS price,
        |       strftime(o_orderdate, '%Y-%m-%d') AS odate
        |FROM orders WHERE o_orderkey = 100""".stripMargin,

    "store_range_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 200""".stripMargin,

    "store_key_agg" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey <= 500 OR o_orderkey > 1400
        |GROUP BY o_orderstatus""".stripMargin,
  )
}
