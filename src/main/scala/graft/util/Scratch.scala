package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Best-effort local scratch cleanup for per-PID run directories
  * (warehouses, stream sinks). Failures are swallowed: scratch removal
  * must never fail a run that already produced its artifacts. */
object Scratch {
  def deleteRecursively(dir: String): Unit =
    try {
      val p: Path = Paths.get(dir)
      if (Files.exists(p)) {
        // Files.walk holds open DirectoryStream handles until closed —
        // close explicitly so repeated cleanups don't accumulate fds
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
        finally walk.close()
      }
    } catch { case _: Throwable => () }
}
