package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, FileAlreadyExistsException}

/** Exclusive maintenance lock for the mutable clustered-store directories
  * (round-3 verdict ask #6). MERGE, compaction and resumable commits all
  * mutate a store through staged-swap + manifest append, which is
  * crash-safe for ONE writer but corruptible by TWO: interleaved swaps
  * can resurrect deleted partitions or drop staged ones. The lock is a
  * CREATE-EXCLUSIVE `_writer.lock` file carrying the owner id and pid —
  * `Files.createFile` is atomic on a POSIX filesystem (on an object
  * store, substitute its conditional-create/CAS primitive), so exactly
  * one contender wins and every loser fails LOUDLY naming the holder,
  * with the store untouched.
  *
  * A writer that crashes while holding the lock leaves it behind on
  * purpose: the next writer's loud failure is the signal that the
  * previous run needs inspection (the staged-swap ops are resumable /
  * idempotent per their own docs). After inspecting, clear it with
  * [[breakLock]]. No TTL auto-expiry — silent lock theft under a slow
  *-but-alive writer is exactly the corruption this guard exists to
  * prevent. */
object WriterLock {

  private def lockPath(dir: String) = Paths.get(dir, "_writer.lock")

  /** Run `body` holding the exclusive writer lock on `dir`; releases on
    * every exit path. Throws `IllegalStateException` naming the current
    * holder if the lock is held by a DIFFERENT owner. A lock left by the
    * SAME owner id is reclaimed silently — that is the crashed-run retry
    * path ResumableWrite's resume contract needs (retries reuse their
    * runId; merge/compaction pass a fresh UUID per invocation precisely
    * so they can never reclaim each other). */
  def withLock[T](dir: String, owner: String)(body: => T): T = {
    require(!owner.contains("\""), s"owner must not contain quotes: $owner")
    val p = lockPath(dir)
    val payload =
      s"""{"owner":"$owner","pid":${ProcessHandle.current.pid}}"""
    def acquire(): Unit =
      try Files.write(p, payload.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW): Unit
      catch {
        case _: FileAlreadyExistsException =>
          val holder =
            try new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
            catch { case _: Exception => "<unreadable>" }
          if (holder.startsWith(s"""{"owner":"$owner",""")) {
            // stale lock from our own crashed attempt: reclaim
            Files.deleteIfExists(p)
            Files.write(p, payload.getBytes(StandardCharsets.UTF_8),
              java.nio.file.StandardOpenOption.CREATE_NEW): Unit
          } else throw new IllegalStateException(
            s"writer lock on $dir is held: $holder — concurrent maintenance " +
              "is not supported; if the holder crashed, inspect the store " +
              "and clear with WriterLock.breakLock")
      }
    acquire()
    try body finally Files.deleteIfExists(p)
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
