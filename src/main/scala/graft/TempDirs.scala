package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** JVM-lifetime temp-dir registry. Queries that materialize a corpus copy
  * (q139's tar shards, q140's JSONL, the stats-store fixture) hand back a
  * LAZY DataFrame — the files must outlive the query builder because the
  * caller runs the action — so per-call deletion is impossible. Instead
  * every created dir is registered here and ONE shutdown hook removes them
  * all: a bench run's 3 passes no longer leave corpus copies accumulating
  * in /tmp after the JVM exits. */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  @volatile private var hooked = false

  private def ensureHook(): Unit = if (!hooked) synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        dirs.forEach(p => deleteRecursively(p))
      }, "graft-tempdir-cleanup"))
      hooked = true
    }
  }

  /** Create a fresh temp directory cleaned up at JVM exit. */
  def create(prefix: String): String = {
    ensureHook()
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Register an externally created directory for exit-time cleanup. */
  def register(path: String): String = {
    ensureHook()
    dirs.add(Paths.get(path))
    path
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // deepest-first walk; best-effort — a cleanup hook must never throw
      try {
        val stream = Files.walk(p)
        try stream.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
        finally stream.close()
      } catch { case _: Exception => () }
    }
}
