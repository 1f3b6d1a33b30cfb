package graft

/** Per-key profiling harness for the optimization rounds: times a key's
  * noop-sink materialization over several reps (after a warm-up) and
  * reports per-rep wall seconds plus the Spark job count and task time
  * per rep — the job-count delta is the first-order signal for
  * driver-side overhead (extra actions, listings, counts) that the
  * plan text cannot show.
  *
  * Usage: runMain graft.KeyProf <reps> <key> [key...]
  */
object KeyProf {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val keys = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.Fixtures.canary(spark, sfDir, "keyprof")

    val traceJobs = sys.env.get("KEYPROF_TRACE").contains("1")
    @volatile var jobs = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs += 1
          if (traceJobs) jobStarts.put(j.jobId, (j.time,
            j.stageInfos.lastOption.map(_.name).getOrElse("?")))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (traceJobs) Option(jobStarts.remove(j.jobId)).foreach {
            case (t0, site) =>
              println(f"[jobtrace] job ${j.jobId}%4d ${(j.time - t0) / 1000.0}%6.2fs  $site%s")
          }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks += 1
          Option(t.taskMetrics).foreach(m =>
            taskMs += m.executorRunTime)
        }
      })

    for (k <- keys) {
      val fn = SparkEntry.queries(k)
      def run(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      try {
        run() // warm-up
        val times = (0 until reps).map { i =>
          jobs = 0; tasks = 0; taskMs = 0L
          val t0 = System.nanoTime()
          run()
          val s = (System.nanoTime() - t0) / 1e9
          // listener events drain async; give them a beat
          Thread.sleep(150)
          println(f"[keyprof] $k%s rep$i%d ${s}%.2fs jobs=$jobs%d " +
            f"tasks=$tasks%d taskSec=${taskMs / 1000.0}%.1f")
          s
        }
        println(f"[keyprof] $k%s min=${times.min}%.2f med=" +
          f"${times.sorted.apply(times.size / 2)}%.2f")
      } catch {
        case e: Throwable =>
          println(s"[keyprof] $k FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
