package graft.util

import java.nio.file.{Files, Path}

/** JVM-exit cleanup for staged temp TREES. `File.deleteOnExit` removes
  * only files and EMPTY directories, so every staged artifact dir
  * (vector index, image corpus, stream staging/sinks, warehouse) filled
  * after registration was silently leaked — multi-MB-to-GB under /tmp
  * per bench/verify/test JVM, accumulating across runs. One shutdown
  * hook walks each tracked root deepest-first and deletes best-effort
  * (a busy file must not block the rest of the cleanup).
  */
object TempDirs {

  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.forEach(deleteRecursively(_)), "graft-tempdirs-cleanup"))

  /** Register a temp root for recursive deletion at JVM exit. */
  def track(p: Path): Path = { dirs.add(p); p }

  /** Test-only: the hook's deletion pass on one untracked tree. */
  private[graft] def deleteNow(p: Path): Unit = deleteRecursively(p)

  private def deleteRecursively(root: Path): Unit =
    try {
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
        finally walk.close()
      }
    } catch { case _: Exception => () }
}
