package graft

import org.apache.spark.sql.SparkSession

/** Single place for the session shape every entry point needs: UTC
  * timestamps, ns-as-long parquet reads (the events fixture is
  * timestamp[ns]), a per-JVM temp warehouse (bucketed tables must not
  * land in the working directory), right-sized shuffle parallelism.
  * One builder so a new main cannot forget an invariant.
  */
object GraftSession {

  private lazy val warehouseDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_wh_")
    d.toFile.deleteOnExit()
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
    * would target the wrong registry in a multi-session JVM.
    */
  def registerFunctions(spark: SparkSession): Unit = {
    graft.functions.Crc32C.register(spark)
    graft.functions.CosineSim.register(spark)
    graft.functions.LshBucket.register(spark)
    graft.functions.GramMd5s.register(spark)
    graft.functions.MinhashBands.register(spark)
    graft.functions.Simhash60.register(spark)
    graft.functions.WordShingles.register(spark)
    graft.functions.CountIn.register(spark)
    graft.functions.SumStrlen.register(spark)
    graft.functions.JaccardDistinct.register(spark)
    graft.functions.DupFracs.register(spark)
    graft.functions.LogpSum.register(spark)
    graft.functions.PqEnc.register(spark)
    graft.functions.PqAdc.register(spark)
  }
}
