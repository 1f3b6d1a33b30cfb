package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch probe for the r20 streaming-machinery decomposition (deleted
  * before round close): times minimal AvailableNow file-stream shapes so
  * the per-key stream floor can be attributed to machinery vs body.
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })

    // stage events like StreamOps does
    val src = java.nio.file.Paths.get(sfDir, "events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("probe_events_")
    java.nio.file.Files.copy(src, dir.resolve("events.parquet"))
    val schema = spark.read.parquet(src.toString).schema

    def timePhase(name: String)(body: => Unit): Unit = {
      // warm
      body
      val times = (0 until reps).map { _ =>
        jobs = 0
        val t0 = System.nanoTime()
        body
        ((System.nanoTime() - t0) / 1e9, jobs)
      }
      Thread.sleep(100) // let listener events drain
      val secs = times.map(_._1)
      println(f"[probe] $name%-40s min=${secs.min}%.3f med=${secs.sorted.apply(secs.size / 2)}%.3f jobs=${times.map(_._2).max}%d")
    }

    def runStream(body: (DataFrame, Long) => Unit, ckptReuse: Option[String] = None): Unit = {
      val ckpt = ckptReuse.getOrElse(
        java.nio.file.Files.createTempDirectory("probe_ckpt_").toString)
      val q = spark.readStream.schema(schema).parquet(dir.toString)
        .select("event_id")
        .writeStream
        .foreachBatch(body)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // durationMs breakdown of one noop-body run
    {
      val ckpt = java.nio.file.Files.createTempDirectory("probe_ckpt_").toString
      val q = spark.readStream.schema(schema).parquet(dir.toString)
        .select("event_id")
        .writeStream
        .foreachBatch((_: DataFrame, _: Long) => ())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.foreach(p =>
        println(s"[probe] COLD progress batch=${p.batchId} durationMs=${p.durationMs}"))
    }
    // warm breakdown: several fresh-ckpt runs after the cold one
    (0 until 6).foreach { i =>
      val ckpt = (if (i >= 3)
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), "probe_ckpt_")
      else java.nio.file.Files.createTempDirectory("probe_ckpt_")).toString
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema).parquet(dir.toString)
        .select("event_id")
        .writeStream
        .foreachBatch((_: DataFrame, _: Long) => ())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      q.recentProgress.foreach(p =>
        println(f"[probe] WARM$i wall=$wall%.3f batch=${p.batchId} durationMs=${p.durationMs}"))
    }

    timePhase("stream noop-body fresh-ckpt") { runStream((_, _) => ()) }
    timePhase("stream count-body fresh-ckpt") { runStream((b, _) => { b.count(); () }) }
    timePhase("stream persist+count fresh-ckpt") { runStream((b, _) => {
      b.persist(); b.count(); b.unpersist(); () }) }
    // how much of it is checkpoint-dir fresh creation?
    val fixedCkpt = java.nio.file.Files.createTempDirectory("probe_ckpt_fixed_").toString
    timePhase("stream noop-body REUSED ckpt (no data!)") {
      runStream((_, _) => (), Some(fixedCkpt)) }
    // batch-side floor for comparison: same read+count as a batch job
    timePhase("batch read+count") {
      spark.read.schema(schema).parquet(dir.toString).select("event_id").count(); () }
    // a memory-sink complete aggregate (the runToTable shape)
    timePhase("stream memory-sink complete agg") {
      val q = spark.readStream.schema(schema).parquet(dir.toString)
        .groupBy().count()
        .writeStream.format("memory")
        .queryName(s"probe_${System.nanoTime()}")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // stateful shape: 8 shuffle partitions, window agg (stream_tumbling-like)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    def statefulOnce(tag: String): Unit = {
      val q = spark.readStream.schema(schema).parquet(dir.toString)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour")).count()
        .writeStream.format("memory")
        .queryName(s"probe_${System.nanoTime()}")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.foreach(p =>
        println(s"[probe] $tag batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}"))
    }
    timePhase("stream stateful window 8-part") {
      val q = spark.readStream.schema(schema).parquet(dir.toString)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour")).count()
        .writeStream.format("memory")
        .queryName(s"probe_${System.nanoTime()}")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    statefulOnce("STATEFUL-DEFAULT")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    timePhase("stream stateful window 8-part NODATA-OFF") {
      val q = spark.readStream.schema(schema).parquet(dir.toString)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour")).count()
        .writeStream.format("memory")
        .queryName(s"probe_${System.nanoTime()}")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    statefulOnce("STATEFUL-NODATA-OFF")
    spark.stop()
  }
}
