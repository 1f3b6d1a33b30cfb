package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

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

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` normalized to session-TZ TimestampType (µs). The
    * fixture stores timestamp[ns], which Spark 4 refuses to read as a
    * timestamp ([PARQUET_TYPE_ILLEGAL]); we read it as a nanos long
    * (`nanosAsLong`, set at runtime so any driver-created session works)
    * and truncate ns → µs with integer `div` — large epoch-nanos do not fit
    * a double, so float division would corrupt low digits. Matches DuckDB's
    * `CAST(ts AS TIMESTAMP)` truncation.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  /** Number of topic partitions modeled for routing queries (reference:
    * partitioned topics fan out to `{topic}-partition-{n}` sub-topics,
    * `src/discovery/mod.rs:71`). Routing must stay portable across engines
    * (SURVEY §7.3), hence `user_id % N`, never an engine-native hash.
    */
  val NumPartitions = 8
}
