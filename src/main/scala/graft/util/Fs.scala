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
}
