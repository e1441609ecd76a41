package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, FileAlreadyExistsException, StandardCopyOption}

/** Exclusive maintenance lock for the mutable clustered-store directories
  * (round-3 verdict ask #6). MERGE, compaction, resumable commits and the
  * IVF index lifecycle (append / rebalance) all mutate a store through
  * staged-swap + manifest append, which is crash-safe for ONE writer but
  * corruptible by TWO: interleaved swaps can resurrect deleted partitions
  * or drop staged ones. The lock is a CREATE-EXCLUSIVE `_writer.lock`
  * file carrying the owner id and pid — `Files.createFile` is atomic on a
  * POSIX filesystem (on an object store, substitute its
  * conditional-create/CAS primitive), so exactly one contender wins and
  * every loser fails LOUDLY naming the holder, with the store untouched.
  *
  * A writer that crashes while holding the lock leaves it behind on
  * purpose: the next DIFFERENT-owner writer's loud failure is the signal
  * that the previous run needs inspection (the staged-swap ops are
  * resumable / idempotent per their own docs). After inspecting, clear it
  * with [[breakLock]]. No TTL auto-expiry — silent lock theft under a
  * slow-but-alive writer is exactly the corruption this guard exists to
  * prevent.
  *
  * Same-owner reclaim (the crashed-run retry path ResumableWrite's resume
  * contract needs — retries reuse their runId; merge/compaction/IVF
  * maintenance pass a fresh UUID per invocation precisely so they can
  * never reclaim each other) is race-safe against CONCURRENT same-owner
  * retries: a stale lock is reclaimable only when its recorded pid is
  * this process or provably dead, the stale file is claimed by an ATOMIC
  * rename (at most one contender succeeds; POSIX rename of an existing
  * file is atomic and fails for everyone else), and the fresh lock then
  * goes through the normal create-exclusive race — a losing contender
  * re-reads the winner's lock, sees a live foreign pid, and fails loudly.
  * Within one JVM an additional held-paths registry refuses re-entry
  * outright (same-pid contenders could otherwise judge each other
  * reclaimable). */
object WriterLock {

  private def lockPath(dir: String) = Paths.get(dir, "_writer.lock")

  /** Absolute lock paths held by THIS JVM — refuses in-process double
    * acquisition, which the pid-based reclaim test cannot distinguish
    * from our own crashed run. */
  private val heldInJvm = scala.collection.mutable.Set.empty[String]

  private def pidAlive(pid: Long): Boolean = {
    val h = ProcessHandle.of(pid)
    h.isPresent && h.get.isAlive
  }

  private def holderPid(payload: String): Option[Long] =
    """"pid":(\d+)""".r.findFirstMatchIn(payload).map(_.group(1).toLong)

  /** Run `body` holding the exclusive writer lock on `dir`; releases on
    * every exit path. Throws `IllegalStateException` naming the current
    * holder if the lock is held by a DIFFERENT owner, by the same owner
    * in a live different process, or by this JVM itself. */
  def withLock[T](dir: String, owner: String)(body: => T): T = {
    require(!owner.contains("\""), s"owner must not contain quotes: $owner")
    val p = lockPath(dir)
    val key = p.toAbsolutePath.toString
    heldInJvm.synchronized {
      if (!heldInJvm.add(key)) throw new IllegalStateException(
        s"writer lock on $dir is held: ${holder(dir).getOrElse("<this process>")} " +
          "(by this very process) — concurrent in-JVM maintenance on one " +
          "store is not supported")
    }
    val payload =
      s"""{"owner":"$owner","pid":${ProcessHandle.current.pid}}"""
    def create(): Unit =
      Files.write(p, payload.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW): Unit
    def loudFail(holder: String): Nothing = throw new IllegalStateException(
      s"writer lock on $dir is held: $holder — concurrent maintenance " +
        "is not supported; if the holder crashed, inspect the store " +
        "and clear with WriterLock.breakLock")
    def acquire(): Unit =
      try create()
      catch {
        case _: FileAlreadyExistsException =>
          val holder =
            try new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
            catch { case _: Exception => "<unreadable>" }
          val stale = holder.startsWith(s"""{"owner":"$owner",""") &&
            holderPid(holder).exists(hp =>
              hp == ProcessHandle.current.pid || !pidAlive(hp))
          if (!stale) loudFail(holder)
          // claim the stale file atomically: rename it to a unique
          // graveyard name — exactly one concurrent contender's rename
          // can succeed, and a loser's failed rename means someone else
          // is already mid-reclaim
          val grave = p.resolveSibling(
            s"_writer.lock.claimed.${java.util.UUID.randomUUID}")
          try {
            Files.move(p, grave, StandardCopyOption.ATOMIC_MOVE)
            Files.deleteIfExists(grave): Unit
          } catch { case _: java.io.IOException => () }
          // fresh create-exclusive race: at most one contender wins; a
          // loser re-reads the winner's lock (live pid, not ours) and
          // takes the loud-failure branch above on this recursive retry
          try create()
          catch {
            case _: FileAlreadyExistsException =>
              val now =
                try new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
                catch { case _: Exception => "<unreadable>" }
              loudFail(now)
          }
      }
    try {
      acquire()
      try body finally Files.deleteIfExists(p)
    } finally heldInJvm.synchronized { heldInJvm.remove(key): Unit }
  }

  /** Forcibly clear a stale lock after operator inspection. */
  def breakLock(dir: String): Boolean = Files.deleteIfExists(lockPath(dir))

  /** The current holder's payload, if locked. */
  def holder(dir: String): Option[String] = {
    val p = lockPath(dir)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }
}
