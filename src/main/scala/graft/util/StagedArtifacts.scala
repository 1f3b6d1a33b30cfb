package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE staged-artifact build shape shared by every per-corpus-snapshot
  * index (media fingerprints, text signatures, dup clusters,
  * contamination): build-or-reuse a parquet artifact keyed by corpus dir
  * through a [[StampedMemo]] (an in-place corpus rewrite re-derives), with
  * a build counter for staging observability in tests. One definition so
  * a staging-discipline fix (tracking, stamping, counter placement) can
  * never half-apply across artifact families.
  */
object StagedArtifacts {

  def parquet(spark: SparkSession, sfDir: String,
      memo: StampedMemo[java.nio.file.Path], prefix: String,
      builds: java.util.concurrent.atomic.AtomicLong,
      partitionCols: Seq[String] = Nil)
      (build: => DataFrame): DataFrame =
    spark.read.parquet(
      parquetDir(sfDir, memo, prefix, builds, partitionCols)(build).toString)

  /** [[parquet]] returning the staged DIRECTORY — for maintenance paths
    * that append files into the artifact's partition dirs (the
    * incremental-index-append shape) rather than read it. */
  def parquetDir(sfDir: String,
      memo: StampedMemo[java.nio.file.Path], prefix: String,
      builds: java.util.concurrent.atomic.AtomicLong,
      partitionCols: Seq[String] = Nil)
      (build: => DataFrame): java.nio.file.Path =
    memo.get(sfDir)({
      builds.incrementAndGet()
      val d = java.nio.file.Files.createTempDirectory(prefix)
      TempDirs.track(d)
      val w = build.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(d.toString)
      d
    })
}
