package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.operators.MessageOps

/** Invariant/known-answer tests for the message-semantics operators,
  * independent of the DuckDB oracle: each assertion recomputes the
  * expected property through a different formulation than the operator
  * under test.
  */
class MessageOpsSpec extends SparkTestBase {

  private lazy val ev: DataFrame = Fixtures.events(spark, sfDir)
  private lazy val total: Long = ev.count()

  test("events fixture loads with µs timestamps") {
    assert(total === 1000L)
    assert(ev.schema("ts").dataType.typeName === "timestamp")
  }

  test("scanEnvelope preserves cardinality and maps partition = user_id % P") {
    val env = MessageOps.scanEnvelope(ev)
    assert(env.count() === total)
    val bad = env.filter(col("partition") =!= (col("partition_key") % Fixtures.NumPartitions).cast("int"))
    assert(bad.count() === 0)
  }

  test("filterByType returns only matching rows") {
    val f = MessageOps.filterByType(ev, "purchase", 50.0)
    val expected = ev.filter(col("event_type") === "purchase" && col("value") > 50.0).count()
    assert(f.count() === expected)
  }

  test("roundRobinBalance: slots partition the total, max spread 1") {
    val rows = MessageOps.roundRobinBalance(ev, 4).collect()
    assert(rows.map(_.getLong(1)).sum === total)
    assert(rows.length === 4)
    val ns = rows.map(_.getLong(1))
    assert(ns.max - ns.min <= 1)
    // closed form against the explicit row_number computation
    val explicit = ev.orderBy("event_id").collect().zipWithIndex
      .groupBy { case (_, i) => i % 4 }.view.mapValues(_.length.toLong).toMap
    rows.foreach(r => assert(r.getLong(1) === explicit(r.getLong(0).toInt)))
  }

  test("dedupBySequence keeps exactly one row per (user, seq), the first") {
    val d = MessageOps.dedupBySequence(ev)
    val expectedGroups = ev
      .select(col("user_id"), (col("event_id") % 256).as("seq"))
      .distinct().count()
    assert(d.count() === expectedGroups)
    // survivor is the min event_id of its group
    val mins = ev.groupBy(col("user_id"), (col("event_id") % 256).as("seq"))
      .agg(min("event_id").as("first_event_id"))
    assertSameRows(d, mins.select("user_id", "seq", "first_event_id"))
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = MessageOps.dedupBySequence(ev)
    // re-feed survivors through the same keying: every group is a singleton
    val again = once.select(
      col("user_id"), col("first_event_id").as("event_id"))
      .groupBy(col("user_id"), (col("event_id") % 256).as("seq"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(again.count() === 0)
  }

  test("ackBacklogAntiJoin: backlog and acked partition the stream") {
    val backlog = MessageOps.ackBacklogAntiJoin(ev).count()
    val acked = ev.filter(col("event_type") === "click" || col("event_id") % 3 === 0).count()
    assert(backlog + acked === total)
  }

  test("cumulativeAckFrontier is monotone non-decreasing per user") {
    val f = MessageOps.cumulativeAckFrontier(ev)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val violations = f
      .withColumn("prev", lag("frontier_us", 1).over(w))
      .filter(col("prev").isNotNull && col("frontier_us") < col("prev"))
    assert(violations.count() === 0)
  }

  test("seekByTimeTopK returns k rows ordered by (ts, id) at/after the seek point") {
    val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC
    val rows = MessageOps.seekByTimeTopK(ev, t0, 50).collect()
    assert(rows.length === 50)
    val times = rows.map(_.getAs[Long]("publish_us"))
    assert(times.forall(_ >= t0))
    assert(times.sameElements(times.sorted))
  }

  test("readCompactedLastPerKey: one row per key, carrying that key's max ts") {
    val last = MessageOps.readCompactedLastPerKey(ev)
    val keys = ev.select("user_id").distinct().count()
    assert(last.count() === keys)
    val expected = ev.groupBy("user_id").agg(max(unix_micros(col("ts"))).as("publish_us"))
    assertSameRows(
      last.select("user_id", "publish_us"),
      expected.select("user_id", "publish_us"))
  }

  test("batchExplode round-trips every message exactly once") {
    val b = MessageOps.batchExplode(ev)
    assert(b.count() === total)
    assertSameRows(b.select("event_id"), ev.select("event_id"))
  }

  test("chunkReassembly restores full document length") {
    val docs = Fixtures.documents(spark, sfDir)
    val r = MessageOps.chunkReassembly(docs, 40)
    assert(r.count() === docs.count())
    val mismatch = r.join(docs, "doc_id")
      .filter(col("len_out") =!= length(col("text")).cast("long"))
    assert(mismatch.count() === 0)
  }

  test("throughputTumbling buckets partition the stream") {
    val t = MessageOps.throughputTumbling(ev)
    assert(t.agg(sum("n")).collect()(0).getLong(0) === total)
    // bucket width exactly one hour in ms
    val hours = t.select("hour_ms").collect().map(_.getLong(0))
    assert(hours.forall(_ % 3600000L === 0L))
  }

  test("backlogByType rollup carries a grand-total row equal to the table") {
    val r = MessageOps.backlogByType(ev).collect()
    val grand = r.find(_.isNullAt(0)).get
    assert(grand.getAs[Long]("n") === total)
  }

  test("payloadIntegrityCrc covers every event type with nonzero checksums") {
    val r = MessageOps.payloadIntegrityCrc(ev)
    assert(r.count() === ev.select("event_type").distinct().count())
    assert(r.agg(sum("n")).collect()(0).getLong(0) === total)
    assert(r.filter(col("crc_sum") <= 0).count() === 0)
  }
}
