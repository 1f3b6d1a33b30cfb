package graft

/** Dev tool backing `FIXTURE_SCHEMAS.md` §"On a spec failure": print the
  * Spark-read DDL of every fixture table at every scale factor, so a
  * `FixtureSchemaSpec` failure (the driver regenerated the fixtures) is
  * diagnosed with one `sbt "runMain graft.SchemaDump"` instead of a
  * scratch main. Output: one `SCHEMA|<sf>|<table>|<ddl>` line each.
  */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "/root/testdata"
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for {
      sf <- Seq("sf0.001", "sf0.01", "sf0.1")
      if java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$root/$sf"))
      t <- graft.model.Fixtures.tableNames
    } {
      val ddl =
        try spark.read.parquet(s"$root/$sf/$t.parquet").schema.toDDL
        catch { case scala.util.control.NonFatal(e) =>
          s"UNREADABLE: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}"
        }
      println(s"SCHEMA|$sf|$t|$ddl")
    }
    spark.stop()
  }
}
