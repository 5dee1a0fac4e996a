package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Cross-process writer lock on a directory — the reference's
  * per-sensor process lock (`database.py:154-168`) generalized to any
  * on-disk store root, so [[graft.store.SensorStore.withWriterLock]]
  * and [[graft.ext.DocStore]]'s ingest surface share one tested
  * discipline instead of two divergent copies (r16 verdict ask #3).
  *
  * Acquisition is an ATOMIC exclusive file create (POSIX O_EXCL
  * semantics — two contenders cannot both succeed); a crashed holder's
  * lock is taken over after `staleMs`.
  *
  * Ownership is token-checked: the lock file carries a unique
  * `pid@nonce` token, stale takeover happens by an atomic RENAME to a
  * per-contender tombstone (exactly one renamer can win — no
  * double-delete race), and release deletes the file only while it
  * still holds OUR token. A holder that pauses past `staleMs` (GC,
  * long job) and resumes after a takeover therefore cannot delete the
  * NEW holder's lock. A daemon heartbeat refreshes the lock mtime at
  * `staleMs/3` so a long-but-alive write is never mistaken for a
  * crash in the first place.
  *
  * On an object store without atomic create/rename, swap this for a
  * DynamoDB/etcd mutex or a Delta/Iceberg optimistic commit — the
  * callers' write paths are format-agnostic.
  */
object PathLock {

  /** Run `f` holding the exclusive writer lock of `dir`. `label` names
    * the protected resource in the timeout error. */
  def withLock[T](dir: String, label: String, timeoutMs: Long = 30000,
                  staleMs: Long = 600000)(f: => T): T = {
    Files.createDirectories(Paths.get(dir))
    val lock = Paths.get(dir, "_WRITE_LOCK")
    val token = s"${ProcessHandle.current().pid()}@${java.util.UUID.randomUUID()}"
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      try {
        Files.write(lock, token.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stale = try {
            Files.getLastModifiedTime(lock).toMillis < System.currentTimeMillis() - staleMs
          } catch { case _: java.io.IOException => false } // holder just released
          if (stale) {
            // takeover by atomic same-dir rename to a unique tombstone:
            // of N contenders exactly one move succeeds (the rest see
            // NoSuchFileException and re-race); nobody can delete a
            // lock that a newer holder just re-created.
            val tomb = Paths.get(dir, s"_WRITE_LOCK.stale.$token")
            try {
              Files.move(lock, tomb)
              // re-verify on the tombstone: a FRESH mtime means the
              // stale holder released and someone re-acquired between
              // our staleness read and the move — we stole a LIVE lock.
              // Put it straight back (the path is free unless a third
              // contender creates it in this same syscall window, which
              // shrinks the race from the whole contention period to
              // microseconds); only a genuinely stale tombstone is
              // discarded.
              if (Files.getLastModifiedTime(tomb).toMillis >=
                  System.currentTimeMillis() - staleMs)
                try Files.move(tomb, lock)
                catch { case _: java.io.IOException =>
                  // restore raced a third contender's create: keep the
                  // tombstone (unique name, preserves the victim's
                  // token for post-mortem) rather than destroying the
                  // last record of the double race
                  ()
                }
              else { Files.deleteIfExists(tomb); () }
            }
            catch { case _: java.io.IOException => () }
          }
          else if (System.currentTimeMillis() > deadline)
            throw new WriteLockTimeoutException(label, timeoutMs)
          else Thread.sleep(50)
      }
    }
    val heartbeat = new Thread(() => {
      try {
        var owned = true
        while (owned) {
          Thread.sleep(math.max(staleMs / 3, 50L))
          // refresh ONLY while the file still carries OUR token: after a
          // stale takeover the new holder re-creates the lock at the same
          // path, so a blind setLastModifiedTime would keep a lock we no
          // longer own artificially fresh and block third-party takeover
          // if the new holder crashes.
          // stop ONLY on positively observing a foreign token; an
          // IOException may be the transient file-absent window of
          // another contender's move/re-verify/move-back and must not
          // kill a live holder's refresh (the lock would go stale
          // mid-write and be stolen)
          try {
            if (new String(Files.readAllBytes(lock),
                StandardCharsets.UTF_8) == token)
              Files.setLastModifiedTime(lock,
                java.nio.file.attribute.FileTime.fromMillis(
                  System.currentTimeMillis()))
            else owned = false // taken over: stop touching for good
          } catch { case _: java.io.IOException => () }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-writelock-heartbeat-$label")
    heartbeat.setDaemon(true)
    heartbeat.start()
    try f finally {
      heartbeat.interrupt()
      // release only while the file still carries OUR token — after a
      // stale takeover the path belongs to the new holder.
      try {
        if (new String(Files.readAllBytes(lock), StandardCharsets.UTF_8) == token)
          Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () } // already taken over/released
    }
  }
}
