package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Shared filesystem helpers for the temp-dir lifecycles the harnesses
  * and sinks manage — one definition of the recursive delete so a future
  * traversal or locking fix lands everywhere at once (it was previously
  * hand-rolled at five call sites). */
object Fs {

  /** Recursively delete `p` if it exists (children first). Missing
    * entries are tolerated — cleanup racing a concurrent cleanup must
    * not throw. The walk stream is closed via Using (leaked directory
    * streams exhaust file handles in bench/stress loops). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { w =>
        w.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      }

  private val tempRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val exitHook: Unit = {
    sys.addShutdownHook(tempRoots.forEach(deleteRecursively(_))); ()
  }

  /** Create a temp directory cleaned at JVM exit by ONE shared hook.
    * Per-call `sys.addShutdownHook` registrations accumulate for the
    * JVM lifetime — in the bench harness, which invokes each query for
    * dozens of iterations, that is thousands of hooks by the end of a
    * full suite. One queue, one hook, however many roots. */
  def tempRoot(prefix: String): Path = {
    exitHook
    val p = Files.createTempDirectory(prefix)
    tempRoots.add(p)
    p
  }

  /** Copy the directory tree at `src` under `dst` (files byte-for-byte,
    * structure preserved) — the carry-over half of a copy-on-write
    * rewrite: partitions a purge does not touch move to the new store
    * version WITHOUT being read or re-encoded. */
  def copyRecursively(src: Path, dst: Path): Unit = {
    require(Files.isDirectory(src), s"copyRecursively: $src is not a dir")
    scala.util.Using.resource(Files.walk(src)) { w =>
      w.forEach { p =>
        val t = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else {
          Files.createDirectories(t.getParent)
          Files.copy(p, t)
        }
      }
    }
  }

  /** Delete `p` now and drop it from the exit-hook queue — for callers
    * that can bound the store's lifetime to one invocation (q165's
    * compaction serve), so bench loops do not strand one temp store
    * per iteration until exit. */
  def releaseTempRoot(p: Path): Unit = {
    tempRoots.remove(p)
    deleteRecursively(p)
  }
}
