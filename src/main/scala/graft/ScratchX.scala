package graft

/** Scratch xmodal breakdown (deleted before commit). */
object ScratchX {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{DedupOps, TextOps}
    import graft.model.Fixtures

    def time(name: String)(fn: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = fn
      println(f"$name%s: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    // warm the staged tables first (bench warmup does the same)
    DedupOps.crossModalKeepBest(spark, sfDir).write.format("noop").mode("overwrite").save()

    val docs = Fixtures.documents(spark, sfDir)
    time("text pairs") { DedupOps.docLshVerifiedDups(docs).count() }
    time("img pairs") { DedupOps.imageDHashDups(spark, sfDir).count() }
    time("wav pairs") { DedupOps.audioHashDups(spark, sfDir).count() }
    time("quality") { TextOps.textQualityScore(docs).count() }
    time("xmodal full 1") { DedupOps.crossModalKeepBest(spark, sfDir).count() }
    time("xmodal full 2") { DedupOps.crossModalKeepBest(spark, sfDir).count() }
    println(s"cc.iterations gauge: ${graft.ObservedMetrics.gaugeSnapshot.get("cc.iterations")}")
    spark.stop()
  }
}
