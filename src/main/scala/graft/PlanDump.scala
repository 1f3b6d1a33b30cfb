package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` output for declared query keys to files —
  * the plan-evidence artifact of the optimization rounds
  * (`plans/r{N}/<key>_{before,after}.txt`).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <key> [key...]
  * Writes <outDir>/<key>_<suffix>.txt for each key.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val keys = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    for (k <- keys) {
      val df = SparkEntry.queries(k)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${k}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote ${k}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
