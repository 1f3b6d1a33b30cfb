package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Fixtures

/** Producer side of the graft message log: route rows to ledger files by
  * partition key and frame them with the [[MsgLogCodec]] — the reference's
  * produce path (§3.1: serialize → sequence → frame → send) with the
  * "send" landing in a ledger file instead of a socket. Hash routing on
  * `user_id` mirrors `partition_key` routing (`src/PulsarApi.proto:98-99`);
  * one writer per partition mirrors the per-partition producer fan-out
  * (`src/entity/producer.rs:39-52`).
  *
  * Executors write ledgers local to the task (correct in local mode; on a
  * cluster the directory would be a DFS path — the routing and framing
  * logic is unchanged).
  */
object MsgLog {

  def writeEvents(ev: DataFrame, dir: String, numLedgers: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    ev.select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props"))
      .repartition(numLedgers, col("user_id"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val pid = TaskContext.get().partitionId()
          val path = Paths.get(dir, f"ledger-$pid%04d${MsgLogCodec.Extension}")
          val out = new DataOutputStream(
            new BufferedOutputStream(Files.newOutputStream(path), 1 << 16))
          try it.foreach { r =>
            MsgLogCodec.writeFrame(out, MsgFrame(
              r.getAs[Long]("event_id"), r.getAs[Long]("ts_us"),
              r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
              r.getAs[Double]("value"), r.getAs[String]("props")))
          } finally out.close()
        }
      }
  }

  val NumLedgers = 4

  private val staged = new ConcurrentHashMap[String, String]()

  /** Stage the events fixture as a message-log topic once per sf dir. */
  def stagedEventsLog(spark: SparkSession, sfDir: String): String =
    staged.computeIfAbsent(sfDir, _ => {
      val dir = Files.createTempDirectory("graft_msglog_")
      dir.toFile.deleteOnExit()
      writeEvents(Fixtures.events(spark, sfDir), dir.toString, NumLedgers)
      dir.toString
    })

  /** Contract query: produce the events stream into the log (framed,
    * CRC'd, hash-routed), consume it back through the DataSource V2
    * reader (CRC-verified), and aggregate — a full produce/consume
    * round-trip through the custom connector. The oracle aggregates the
    * original table: any framing/routing/decode defect breaks the hash
    * match.
    */
  def msglogRoundtripScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedEventsLog(spark, sfDir)
    spark.read.format("graft-msglog").load(dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "msglog_roundtrip_scan" -> ((s, d) => msglogRoundtripScan(s, d)))

  def oracle: Map[String, String] = Map(
    "msglog_roundtrip_scan" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                round(sum(value), 2) AS sum_value,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""")
}
