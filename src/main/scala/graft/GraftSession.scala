package graft

import org.apache.spark.sql.SparkSession

/** Single place for the session shape every entry point needs: UTC
  * timestamps, ns-as-long parquet reads (the r1-r7 events fixture was
  * timestamp[ns]; the loader adapts either way — `Fixtures
  * .normalizeEventTs`), a per-JVM temp warehouse (bucketed tables must
  * not land in the working directory), right-sized shuffle parallelism.
  * One builder so a new main cannot forget an invariant.
  */
object GraftSession {

  private lazy val warehouseDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_wh_")
    graft.util.TempDirs.track(d)
    d.toString
  }

  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.ui.enabled", "false")

  /** Register every custom SQL function of the engine in a session's
    * registry (idempotent). Operators that need one call this with THEIR
    * DataFrame's session — registering on the thread's active session
    * would target the wrong registry in a multi-session JVM. Drives off
    * the single [[graft.functions.GraftFunctions.all]] table — the same
    * one [[GraftExtensions]] injects, so the two paths cannot drift.
    */
  def registerFunctions(spark: SparkSession): Unit =
    graft.functions.GraftFunctions.registerAll(spark)
}
