package graft

/** Throwaway measurement main for the optimization round (deleted
  * before round close): decomposes the segment-write job cost. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.SimilarityOps
    GraftSession.registerFunctions(spark)
    val emb = graft.model.Fixtures.embeddings(spark, sfDir)
    val cents = SimilarityOps.stagedCentroidIndex(spark, sfDir)
    val cb = SimilarityOps.stagedPqCodebook(spark, sfDir)
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $name%s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    println("[probe] emb partitions = " + emb.rdd.getNumPartitions)
    for (i <- 0 until 3) {
      val rows = SimilarityOps.indexRows(emb, cents, cb)
      t(s"noop_$i") { rows.write.format("noop").mode("overwrite").save() }
      val d1 = java.nio.file.Files.createTempDirectory("probe_part_")
      t(s"partBy_$i") { rows.write.mode("overwrite").partitionBy("cell").parquet(d1.toString) }
      val n = java.nio.file.Files.walk(d1).filter(p => p.toString.endsWith(".parquet")).count()
      println(s"[probe] partBy files = $n")
      val d2 = java.nio.file.Files.createTempDirectory("probe_flat_")
      t(s"flat_$i") { rows.write.mode("overwrite").parquet(d2.toString) }
      val d3 = java.nio.file.Files.createTempDirectory("probe_repart_")
      t(s"repartBy_$i") { rows.repartition(org.apache.spark.sql.functions.col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(d3.toString) }
      graft.util.TempDirs.track(d1); graft.util.TempDirs.track(d2); graft.util.TempDirs.track(d3)
    }
    spark.stop()
  }
}
