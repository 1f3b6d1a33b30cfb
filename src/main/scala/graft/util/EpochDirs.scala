package graft.util

import java.nio.file.{Files, Path, Paths}

/** Epoch-keyed overlay layout helpers (`root/epoch=N/…`) — shared by the
  * two delta-overlay families (cluster deltas, ANN segments) and their
  * intra-overlay compactors. LOCAL-FILESYSTEM precondition throughout
  * (the [[ServingManifest]] sidecar discipline): listings and the
  * publish rename are `java.nio` calls; an object-store overlay would
  * swap the layout layer, not its callers.
  */
object EpochDirs {

  /** Epoch ids currently materialized under `root`, ascending — one
    * local listing, never a Spark job. Non-numeric `epoch=` dirs (none
    * are ever written) are ignored rather than thrown on. */
  def list(root: String): Seq[Long] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
      .flatMap(f =>
        scala.util.Try(f.getName.stripPrefix("epoch=").toLong).toOption)
      .sorted

  /** A hidden scratch dir under `root` for a compaction write in
    * flight: the leading dot keeps every Spark listing (partition
    * discovery, file-stream sources) from seeing the half-written
    * collapse, so the serve path reads only published epochs. */
  def scratch(root: String): Path =
    Paths.get(root, s".compact_${System.nanoTime()}")

  /** Publish `tmp` as `root/epoch=<epoch>` — one local directory
    * rename. The target must not exist (callers drop it first). */
  def publish(tmp: Path, root: String, epoch: Long): Unit = {
    Files.move(tmp, Paths.get(root, s"epoch=$epoch"))
    ()
  }

  /** Remove any `.compact_*` scratch a dead compactor left under
    * `root` — invisible to readers the whole time, so the sweep is pure
    * housekeeping, safe at every compaction entry. */
  def sweepScratch(root: String): Unit =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(".compact_"))
      .foreach(f => TempDirs.deleteNow(f.toPath))

  /** The DATA files directly under `dir` — the part files a Spark
    * parquet write produced, skipping `_SUCCESS`/checksum/hidden
    * entries (exactly the files a Spark read would list). */
  def dataFilesIn(dir: Path): Seq[Path] =
    Option(dir.toFile.listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
      .map(_.toPath)

  /** Drop `root/epoch=<epoch>` recursively, best-effort per file (the
    * [[TempDirs]] deletion stance). */
  def drop(root: String, epoch: Long): Unit = {
    val d = Paths.get(root, s"epoch=$epoch")
    if (Files.exists(d)) {
      val walk = Files.walk(d)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p =>
          try { Files.deleteIfExists(p); () } catch { case _: Exception => () })
      finally walk.close()
    }
  }
}
