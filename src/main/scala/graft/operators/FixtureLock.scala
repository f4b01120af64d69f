package graft.operators

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Cross-process serialization of fixture builds.
  *
  * Every catalog/store fixture follows check-then-build: trust an
  * existing warehouse table only if its row count / properties match,
  * else DROP and rebuild. That protocol is correct for any number of
  * SEQUENTIAL runs (crash anywhere, the next run heals) but unsafe
  * when two JVMs share one warehouse CONCURRENTLY: a second process
  * starting mid-build sees a half-built table, drops it, and rebuilds
  * it under the first process's feet — the first process then reads
  * mixed region state (reproduced: two overlapped `graft.Verify` runs
  * on one warehouse → the earlier one fails exactly the mview faces
  * with row-count-green / value-red results, the signature of the
  * driver-board reds in rounds 9-10, while the later run passes —
  * which is why post-hoc reproductions always came back green).
  *
  * The fix is an exclusive lock held across each fixture's whole
  * check-then-build section: the second process WAITS, then its trust
  * checks see the completed table and take the reuse path — no drop,
  * no rebuild, both processes green. One lock per (warehouse, sf dir)
  * pair — coarse on purpose: builds are seconds long, only cold
  * warehouses contend, and a single key makes nested builder calls
  * trivially re-entrant (a builder that ensures another table
  * re-enters the same lock on the same thread and passes through).
  *
  * Three layers:
  *  - a ThreadLocal held-set for re-entrance (nested builders);
  *  - a per-key JVM monitor so threads of one process serialize
  *    without fighting over the OS lock (java.nio throws
  *    [[java.nio.channels.OverlappingFileLockException]] on a second
  *    in-process acquire);
  *  - an OS [[java.nio.channels.FileLock]] on
  *    `<warehouse>/_locks/<key>.lock` for cross-process exclusion —
  *    released by the OS on ANY process death, so a killed build
  *    never wedges the next run (it just heals as before).
  */
object FixtureLock {
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val held = new ThreadLocal[java.util.HashSet[String]] {
    override def initialValue(): java.util.HashSet[String] =
      new java.util.HashSet[String]()
  }

  /** The ONE warehouse resolution fixture code uses — it must agree
    * with [[graft.catalog.GraftCatalog]]'s own default (the `warehouse`
    * catalog option, falling back to `/tmp/graft_warehouse`,
    * GraftCatalog.scala) or the lock would guard a different directory
    * than the catalog mutates. */
  private[operators] def warehouse(s: SparkSession): String =
    s.conf.getOption("spark.sql.catalog.graft.warehouse")
      .getOrElse("/tmp/graft_warehouse")

  def build[T](d: String)(body: => T): T = {
    val s = SparkSession.active
    // register the catalog (idempotent) BEFORE resolving the warehouse:
    // the first builder in a fresh session would otherwise resolve the
    // pre-registration default while later builders resolve the
    // registered location — two lock roots guarding one warehouse
    CatalogQueries.ensureGraftCatalog(s)
    val wh = warehouse(s)
    val key = wh + "#" + d
    if (held.get.contains(key)) return body // re-entrant nested builder
    val mon = monitors.computeIfAbsent(key, _ => new Object)
    mon.synchronized {
      val dir = Paths.get(wh, "_locks")
      Files.createDirectories(dir)
      // file name from a digest of the SAME key the monitor uses: the
      // monitor and the OS lock must agree on identity, or a hash
      // collision could reach ch.lock() twice in one JVM
      // (OverlappingFileLockException) or skip serialization entirely
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      val file = dir.resolve(
        md.map("%02x".format(_)).mkString + ".lock")
      val ch = FileChannel.open(file,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val fl = ch.lock() // blocks until the other process finishes
        held.get.add(key)
        try body
        finally { held.get.remove(key); fl.release() }
      } finally ch.close()
    }
  }
}
