package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver fixture tables (TESTDATA.md / FIXTURES.md §B) and
  * the Pulsar-style message-envelope projection from SURVEY.md §1.3.
  *
  * The reference's unit of data is a protocol frame whose metadata
  * (`MessageMetadata`, reference `src/PulsarApi.proto:89-149`) carries
  * `publish_time`/`event_time` (epoch millis), `partition_key`,
  * `sequence_id`, and free-form properties. The `events` fixture models that
  * envelope: `event_id` ≈ sequence/entry id, `ts` ≈ publish/event time,
  * `user_id` ≈ partition key, `props` ≈ the opaque JSON payload.
  *
  * Scale note: every loader is a plain parquet scan, so Catalyst pushes
  * filters/column pruning down to the file source; at 100 TB the same code
  * reads a partitioned table with partition pruning intact.
  */
object Fixtures {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred schema per (file, size, mtime) — schema inference on a
    * bare `spark.read.parquet` runs a footer-read JOB per call, and the
    * fixture tables are read by nearly every key on every rep (opt r19:
    * ~0.02–0.04 s × hundreds of reads per bench run). The stamp is the
    * (size, mtime) staleness key every staged artifact already uses, so
    * a regenerated fixture re-infers; only single-file tables cache (a
    * directory's mtime does not cover its children). Metadata only —
    * the data path of the read is unchanged. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, ((Long, Long), org.apache.spark.sql.types.StructType)]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isRegularFile(p)) spark.read.parquet(path)
    else {
      // keyed by path with the stamp INSIDE the value, so a regenerated
      // fixture REPLACES its entry instead of leaving the stale stamp's
      // schema behind forever (r19 ADVICE). Inference assumes the fixed
      // GraftSession parquet configs (nanosAsLong etc.) — every session
      // in this JVM comes from that one builder.
      val stamp = (java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
      val s = schemaCache.compute(path, (_, prev) =>
        if (prev != null && prev._1 == stamp) prev
        else (stamp, spark.read.parquet(path).schema))._2
      spark.read.schema(s).parquet(path)
    }
  }

  /** `events` with `ts` normalized to session-TZ TimestampType (µs),
    * adaptive to the fixture's declared type — the driver has regenerated
    * the table with different physical encodings across rounds:
    *
    *  - `timestamp[ns]`: Spark 4 refuses to read parquet nanos as a
    *    timestamp ([PARQUET_TYPE_ILLEGAL]); we read it as a nanos long
    *    (`nanosAsLong`, set at runtime so any driver-created session
    *    works) and truncate ns → µs with integer `div` — large
    *    epoch-nanos do not fit a double, so float division would corrupt
    *    low digits. Matches DuckDB's `CAST(ts AS TIMESTAMP)` truncation.
    *  - `timestamp[us]` (isAdjustedToUTC=false ⇒ TimestampNTZType):
    *    cast to session-TZ TimestampType — lossless under the pinned-UTC
    *    sessions every entry point builds.
    *  - already TimestampType: pass through.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, sfDir, "events"))
  }

  /** Normalize an `events`-shaped frame's `ts` column to TimestampType,
    * branching on the schema actually read (see [[events]]). Shared with
    * the streaming loader so batch and stream stay byte-identical.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampType => df
    case _             => df.withColumn("ts", col("ts").cast(TimestampType))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Per-table fixture-load canary: load one row of every fixture table
    * (`events` through its normalizing loader) and report ok/FAILED per
    * table on stderr. Round 8's regenerated `events` fixture
    * analysis-failed inside Bench's warm-up and Verify's premise check —
    * both OUTSIDE per-key error isolation — and a single stale loader
    * assumption zeroed all 92 keys' round signal. The canary names the
    * broken table in the artifact's stderr, doubles as the untimed
    * JVM/codegen/parquet warm-up, and never throws: dependent keys fail
    * per-key downstream while unaffected keys keep their signal.
    */
  def canary(spark: SparkSession, sfDir: String, tag: String): Unit =
    tableNames.foreach { name =>
      try {
        val df = if (name == "events") events(spark, sfDir)
                 else table(spark, sfDir, name)
        df.limit(1).collect()
        System.err.println(s"[$tag-canary] $name ok")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[$tag-canary] $name FAILED: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }
    }

  /** Number of topic partitions modeled for routing queries (reference:
    * partitioned topics fan out to `{topic}-partition-{n}` sub-topics,
    * `src/discovery/mod.rs:71`). Routing must stay portable across engines
    * (SURVEY §7.3), hence `user_id % N`, never an engine-native hash.
    */
  val NumPartitions = 8
}
