package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths,
  StandardCopyOption}

/** The storage primitives the manifest commit protocol is built on —
  * the seam that makes the protocol portable across filesystems with
  * different consistency contracts.
  *
  * The protocol ([[TableMeta]]) needs exactly three things:
  *
  *  1. `exclusively` — serialize a manifest read-modify-write against
  *     every other committer (same-JVM threads and other processes).
  *  2. `putReplace` — atomically publish a file readers see either
  *     old or new, never partial (checkpoints, table metadata).
  *  3. `putIfAbsent` — atomically publish a file ONLY if nothing is
  *     there yet (log segments; the loser of a race must observe it
  *     lost).
  *
  * Which primitives a filesystem can actually provide decides the
  * implementation:
  *
  *  - POSIX / NFSv4-with-locking: OS advisory file locks give
  *    `exclusively`; rename gives both puts. [[CommitStore.LockedPosix]]
  *    (the default).
  *  - Object stores (S3 and friends): advisory locks silently no-op
  *    and rename is copy+delete — `exclusively` cannot be built from
  *    the filesystem alone. The safe protocol there is optimistic:
  *    conditional-put (put-if-absent) on numbered log segments with a
  *    re-read-and-retry loser, the log-store protocol published for
  *    Delta Lake. [[CommitStore.Cas]] IS that protocol — its
  *    `exclusively` takes no lock and instead re-runs the commit body
  *    when the conditional put loses — realized here over POSIX hard
  *    links; shipping to a real object store means subclassing the
  *    same retry discipline over the store SDK's conditional-write
  *    call (S3 `If-None-Match: *`, GCS `ifGenerationMatch: 0`, ABFS
  *    ETags). graft still REFUSES unknown store names rather than
  *    running a lock that does not lock (see README, "Commit-store
  *    deployment matrix").
  *
  * Defense in depth: even under [[CommitStore.LockedPosix]], log
  * segments are published with `putIfAbsent`. Under working locks a
  * segment-sequence collision is impossible (sequences are allocated
  * inside `exclusively` and never reused — [[TableMeta.saveState]]
  * keeps `lastSeq` monotone). So a `false` from `putIfAbsent` has
  * exactly one cause — a second committer slipped past a lock the
  * filesystem ignored — and [[TableMeta]] turns it into a loud
  * [[java.util.ConcurrentModificationException]] instead of a silent
  * lost update. The reference never faced this class of problem: its
  * metadata writes go through HBase itself, which owns the WAL
  * (`HBaseCatalog.scala:814-832`).
  */
/** A commit lost the conditional-put race for its log-segment seq —
  * another committer published that seq first. Under [[CommitStore.Cas]]
  * this is the normal optimistic-concurrency signal: `exclusively`
  * catches it and re-runs the whole read-modify-write body against the
  * fresh state. Escaping to the user it means either retries were
  * exhausted (cas) or a committer slipped past a lock the filesystem
  * ignored (the posix tripwire). Extends
  * ConcurrentModificationException so callers that abort on manifest
  * races need one catch. */
private[catalog] final class CommitRaceException(msg: String)
  extends java.util.ConcurrentModificationException(msg)

trait CommitStore {
  /** Name the store is registered/selected under. */
  def name: String

  /** Run `body` holding mutual exclusion over `tableDir`'s manifest
    * against all other committers, in this JVM and in others. */
  def exclusively[T](tableDir: File)(body: => T): T

  /** Atomically publish `content` at `path`, replacing any existing
    * file. Readers concurrently opening `path` see the previous or
    * the new content, never a torn write. */
  def putReplace(path: File, content: String): Unit

  /** Atomically publish `content` at `path` only if nothing exists
    * there; returns false — leaving the existing file untouched — if
    * a concurrent committer already won the name. */
  def putIfAbsent(path: File, content: String): Boolean

  /** How long consumed log-segment names must stay on disk after a
    * checkpoint folds them. 0 under stores whose `exclusively`
    * actually excludes (a stale view cannot exist inside the lock, so
    * a consumed seq can never be re-won — delete immediately). Under
    * the lock-free [[CommitStore.Cas]] this is the STALE-WRITER
    * HORIZON: a deleted segment name would let a writer holding a
    * pre-fold view re-win the seq with `putIfAbsent` and commit
    * invisibly below the checkpoint; keeping the name refuses the
    * reuse. A writer stalled longer than this window is assumed dead
    * — the same retention assumption Delta Lake's metadata cleanup
    * makes. */
  def segmentRetainMillis: Long = 0L
}

object CommitStore {

  /** The two atomic puts, realized with POSIX rename/link. Shared by
    * [[LockedPosix]] and [[Cas]] — on a real object store a
    * [[CommitStore]] implementation would realize them with the
    * store's conditional-write API instead (S3 `If-None-Match`, GCS
    * generation preconditions, ABFS ETags). */
  private[catalog] trait AtomicFiles {
    // tmp names are unique per attempt (not `<path>.tmp`): two racers
    // past a broken lock must not steal each other's half-written tmp
    // — each loses or wins on the TARGET name only. The `.tmp` suffix
    // stays so vacuum's crash-leftover sweep still matches.
    private def writeTmp(path: File, content: String) = {
      val tmp = Paths.get(path.getPath + "." +
        java.util.UUID.randomUUID().toString + ".tmp")
      Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      tmp
    }

    def putReplace(path: File, content: String): Unit =
      Files.move(writeTmp(path, content), path.toPath,
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)

    def putIfAbsent(path: File, content: String): Boolean = {
      val tmp = writeTmp(path, content)
      // link(2) fails with EEXIST when the target exists — an atomic
      // publish-if-absent with full content (the tmp is complete
      // before the name appears)
      try { Files.createLink(path.toPath, tmp); Files.delete(tmp); true }
      catch {
        case _: FileAlreadyExistsException => Files.delete(tmp); false
        case _: UnsupportedOperationException =>
          // no hard links (exotic mounts): existence check + rename.
          // Not atomic across processes by itself — only acceptable
          // under a store whose `exclusively` actually excludes.
          if (path.exists()) { Files.delete(tmp); false }
          else {
            Files.move(tmp, path.toPath, StandardCopyOption.ATOMIC_MOVE)
            true
          }
      }
    }
  }

  /** The default store: OS advisory file locks + atomic rename.
    * Correct on filesystems where both actually work — local POSIX,
    * NFSv4 with locking enabled. See the deployment matrix in the
    * README for what is and is not safe. */
  object LockedPosix extends CommitStore with AtomicFiles {
    val name = "posix"

    // JVM file locks throw OverlappingFileLockException for
    // same-process contention, so threads serialize on a per-table
    // monitor first; the OS lock then excludes other processes only.
    private val monitors =
      new java.util.concurrent.ConcurrentHashMap[String, Object]()

    def exclusively[T](tableDir: File)(body: => T): T = {
      val monitor = monitors.computeIfAbsent(
        tableDir.getCanonicalPath, _ => new Object)
      monitor.synchronized {
        val lockFile = new File(tableDir, ".graft_manifest.lock")
        val ch =
          try java.nio.channels.FileChannel.open(lockFile.toPath,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE)
          catch { case e: java.io.IOException =>
            throw new java.io.IOException(
              s"cannot open manifest lock file $lockFile — the " +
                "filesystem refused it; graft's default commit store " +
                "requires working advisory file locks (README: " +
                "commit-store deployment matrix)", e)
          }
        try {
          val lock =
            try ch.lock()
            catch { case e: java.io.IOException =>
              throw new java.io.IOException(
                s"advisory lock on $lockFile failed — this filesystem " +
                  "does not support file locking, so the default " +
                  "commit store cannot serialize committers safely. " +
                  "Use a CommitStore built for this filesystem " +
                  "(README: commit-store deployment matrix)", e)
            }
          try body finally lock.release()
        } finally ch.close()
      }
    }
  }

  /** The lock-free optimistic store — the protocol for filesystems
    * that provide an atomic conditional put but NO advisory locking:
    * object stores with conditional writes (S3 `If-None-Match`, GCS
    * generation preconditions, ABFS ETags), and any shared filesystem
    * whose locks are unreliable. `exclusively` takes no lock at all:
    * it simply re-runs the whole read-modify-write body when the
    * body's conditional put of its log-segment seq reports the race
    * lost ([[CommitRaceException]]). Every [[TableMeta]] commit body
    * re-reads the manifest at its start and re-validates before
    * writing, so a retry IS a fresh optimistic attempt — compare-and-
    * swap on the segment sequence number is the global serialization
    * point (the log-store protocol Delta Lake publishes for exactly
    * these filesystems). Checkpoints need no extra care: they are
    * published if-absent under a name derived from the log position
    * and their content is a pure function of the log prefix, so a
    * checkpoint race is benign by construction.
    *
    * This object realizes the conditional put with POSIX hard links
    * ([[AtomicFiles]]); an object-store deployment subclasses the same
    * retry discipline over the store SDK's conditional write. */
  object Cas extends CommitStore with AtomicFiles {
    val name = "cas"

    /** Consumed segment names persist 10 minutes so no stale writer
      * can re-win a folded seq (see [[CommitStore.segmentRetainMillis]]);
      * [[TableMeta]] additionally pre-checks every segment write
      * against the newest checkpoint, so breaking this horizon takes a
      * writer stalled >10 min AND a listing anomaly in the same
      * commit. */
    override def segmentRetainMillis: Long = 600000L

    /** Races observed and retried — exposed for the concurrency spec
      * (a race test that never raced proves nothing). */
    private[catalog] val racesRetried =
      new java.util.concurrent.atomic.AtomicLong

    private val MaxAttempts = 64

    def exclusively[T](tableDir: File)(body: => T): T = {
      var attempt = 0
      while (true) {
        try return body
        catch { case e: CommitRaceException =>
          attempt += 1
          if (attempt >= MaxAttempts) throw e
          racesRetried.incrementAndGet()
          // jittered bounded backoff: contention here is tens of
          // committers, not thousands; the CAS loser re-reads O(1)
          // log segments before its next attempt
          Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
            .nextLong(1L << math.min(attempt, 5)))
        }
      }
      sys.error("unreachable")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitStore]()
  registry.put(LockedPosix.name, LockedPosix)
  registry.put(Cas.name, Cas)

  /** Register an additional store (an object-store implementation
    * built against its SDK) so `spark.sql.catalog.graft.commitStore`
    * can select it by name. */
  def register(store: CommitStore): Unit =
    registry.put(store.name.toLowerCase, store)

  /** Resolve a configured store name; REFUSES unknown names loudly —
    * a lock that silently does not lock corrupts manifests, so "I do
    * not know this filesystem" must never default to hoping. */
  def select(name: String): CommitStore = {
    val s = registry.get(name.trim.toLowerCase)
    if (s == null) throw new IllegalArgumentException(
      s"unknown commit store '$name'. Known stores: " +
        s"${java.util.Collections.list(registry.keys()).toArray.toSeq
          .mkString(", ")}. Object stores without advisory locking " +
        "need a CommitStore implementation registered via " +
        "CommitStore.register (README: commit-store deployment matrix).")
    s
  }
}
