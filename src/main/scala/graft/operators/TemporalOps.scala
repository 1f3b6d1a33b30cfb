package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Fixtures

/** Event-time analytics operators: as-of join, batch sessionization,
  * funnel conversion, and retention cohorts — the temporal query family a
  * messaging-analytics engine needs beyond plain windows (SURVEY §2.2:
  * categories with no reference implementation, built Spark-first).
  *
  * Scale discipline shared by every op here: all work is keyed by
  * `user_id` (the producer/partition key, reference `MessageMetadata`
  * `partition_key`, src/PulsarApi.proto:96), so each op is one or two
  * hash shuffles on that key — never a range join, never a driver
  * materialization, never an all-pairs structure. Event times are epoch
  * integers end-to-end (SURVEY §7.3 portability discipline).
  *
  * FIXTURE CONTRACT — non-negative event times: the cell/day/session
  * bucketings use Spark integer `div` (truncate toward zero) where the
  * DuckDB oracles use `//` (floor); the two agree only for ts_us ≥ 0.
  * Pre-1970 event times would bucket one cell high here and diverge
  * from the oracle. `TemporalOpsSpec` pins the premise on the fixture;
  * a caller feeding historical pre-epoch data must pre-shift times.
  */
object TemporalOps {

  /** Gap that closes a session: 5 minutes in µs — the SAME constant as
    * [[graft.streaming.StreamOps.streamSessionWindow]], so the batch and
    * streaming sessionizations are equivalence-testable twins. */
  val SessionGapUs: Long = 300000000L

  /** AS-OF JOIN — for each left event, the most recent right event of the
    * same key at or before it (`l.ts >= r.ts`), ties within the right
    * side broken deterministically by max event_id. The canonical
    * temporal-enrichment operator (DuckDB/Flink `ASOF JOIN`; Spark has no
    * built-in).
    *
    * Spark-first shape: NOT a range join (O(n·m) worst case, and
    * Catalyst would plan a broadcast-nested-loop) — instead the classic
    * union-and-carry-forward rewrite: tag both sides, sort each key's
    * timeline once, and `last(right_payload, ignoreNulls)` over an
    * unbounded-preceding row frame carries the newest right row forward
    * onto every left row. ONE hash shuffle on the key + a per-key sort,
    * linear in input, skew bounded by the largest single key — the same
    * plan at 100 TB. Right rows sort BEFORE left rows at equal
    * timestamps (`side` 0 < 1), making the join inclusive; right-side
    * ties at the same timestamp resolve to max event_id by the SORT
    * ORDER itself (event_id ascending ⇒ `last` sees the max one last) —
    * a pre-dedup groupBy would buy the same semantics for a second
    * corpus-wide exchange.
    */
  def asofJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val tagged = left
      .select(col("user_id"), col("ts_us"), col("event_id"), lit(1).as("side"))
      .unionByName(right
        .select(col("user_id"), col("ts_us"), col("event_id"), lit(0).as("side")))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "side", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof",
        last(when(col("side") === 0, struct(col("ts_us").as("ts"), col("event_id").as("id"))),
          ignoreNulls = true).over(w))
      .filter(col("side") === 1) // survivors are exactly the left rows
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        col("asof.id").as("asof_event_id"),
        col("asof.ts").as("asof_us"),
        (col("ts_us") - col("asof.ts")).as("gap_us"))
  }

  /** Batch sessionization: split each user's event-time line at gaps
    * `>= gapUs` and aggregate per session — the batch twin of
    * `session_window` (streaming form: StreamOps.streamSessionWindow;
    * reference semantics: consumer keep-alive/idle detection,
    * src/netflow/connection.rs:516-558). Output matches the streaming
    * op column-for-column (`session_end = last event + gap`, Spark's
    * half-open session_window contract), so the no-oracle streaming key
    * is anchored by this oracle-checked batch twin (equivalence asserted
    * in TemporalOpsSpec).
    *
    * Plan: two window functions over the SAME (partition, order) spec —
    * one shuffle + one sort — then a groupBy on (user_id, session) that
    * reuses the existing hash partitioning (clustering by a superset of
    * the partition key needs no second exchange).
    */
  def sessionAssign(ev: DataFrame, gapUs: Long = SessionGapUs): DataFrame = {
    // session_end_ms = last div 1000 + gapUs/1000 only equals the
    // built-in session_window's unix_millis(last + gap) when the gap is
    // whole milliseconds — a sub-ms gap would silently floor
    require(gapUs > 0 && gapUs % 1000 == 0,
      s"sessionAssign: gap must be a positive whole number of ms in µs, got $gapUs")
    val ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("prev", lag("ts_us", 1).over(ord))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts_us") - col("prev") >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(cum))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("start_us"), max("ts_us").as("last_us"),
        count(lit(1)).as("n"))
      .select(
        col("user_id"),
        expr("start_us div 1000").as("session_start_ms"),
        (expr("last_us div 1000") + gapUs / 1000).as("session_end_ms"),
        col("n"))
  }

  /** Ordered funnel conversion: how many users reached stage k — where a
    * stage counts only AT OR AFTER the user's earliest completion of the
    * previous stage (strict event-time ordering, not mere membership).
    *
    * Plan: a per-stage fold — aggregate the frontier (earliest time each
    * user completed the prefix), then semi-join the next stage's events
    * against it. Every join and aggregate is keyed on user_id, so all
    * exchanges hash on the same key and the stage-k work is bounded by
    * the stage-k event volume. No per-user event lists are ever
    * collected (the collect-sorted-events rewrite dies on power users
    * with 10^6 events; this one doesn't).
    *
    * STAGE-COUNT CEILING: the per-stage fold is lazy, so stage k's
    * frontier plan re-derives stages 1..k — the physical plan scans the
    * events source stages·(stages+1)/2 times (6 scans at the contract's
    * 3 stages; PlanSpec pins this). Fine for short product funnels; a
    * 20-stage funnel would pay 210 scans. The scale path past ~5 stages
    * is either (a) materializing each frontier (persist/checkpoint —
    * linear scans, at the cost of cache residency), or (b) the
    * single-pass rewrite: one groupBy(user_id) over stage-tagged events
    * with a sorted conditional-aggregation fold computing every stage's
    * frontier time in-row. Not built until a caller needs deep funnels —
    * the rewrite's per-user sorted fold is strictly worse at 3 stages.
    */
  def funnelConversion(ev: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var frontier: DataFrame = null
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      frontier =
        if (frontier == null)
          ev.filter(col("event_type") === st)
            .groupBy("user_id").agg(min("ts_us").as("t"))
        else
          ev.filter(col("event_type") === st)
            .join(frontier, "user_id")
            .filter(col("ts_us") >= col("t"))
            .groupBy("user_id").agg(min("ts_us").as("t"))
      frontier.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(st).as("event_type"), col("n_users"))
    }
    perStage.reduce(_ unionByName _)
  }

  /** Half-width of the [[rangeJoinCount]] window: ±5 minutes in µs. */
  val RangeJoinHalfUs: Long = 300000000L

  /** RANGE (interval) JOIN — for each left event, how many right events
    * of the same key fall within ±[[RangeJoinHalfUs]] of it. The second
    * temporal-join shape an analytics engine must handle (DuckDB/Flink
    * interval join); Catalyst plans a naive time-band predicate as a
    * broadcast-nested-loop — O(n·m) per key and a driver-size bomb.
    *
    * Spark-first shape: the CELL-BUCKET rewrite. Quantize time into
    * window-width cells; a right event within ±width of a left event is
    * always in the left's cell or an adjacent one, so replicating each
    * LEFT row into its 3 candidate cells and hash-joining on
    * (key, cell) bounds comparisons to same-bucket pairs — work ∝
    * events × per-key activity inside one window, never |L|×|R|. The
    * exact band filter runs after the equi-join; every exchange is a
    * hash shuffle. Left rows with no neighbors survive via the final
    * per-left aggregate over the replicated rows (count of matches, not
    * of rows).
    */
  def rangeJoinCount(left: DataFrame, right: DataFrame,
      halfUs: Long = RangeJoinHalfUs): DataFrame = {
    // div 0 would NULL every cell and silently report zero neighbors
    require(halfUs > 0, s"rangeJoinCount: half-width must be positive, got $halfUs")
    val l = left
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("cell", explode(array(
        expr(s"ts_us div $halfUs") - 1,
        expr(s"ts_us div $halfUs"),
        expr(s"ts_us div $halfUs") + 1)))
    val r = right.select(
      col("user_id"), expr(s"ts_us div $halfUs").as("cell"),
      col("ts_us").as("r_ts"))
    l.join(r, Seq("user_id", "cell"), "left")
      .withColumn("hit",
        when(col("r_ts").isNotNull &&
          abs(col("r_ts") - col("ts_us")) <= halfUs, 1L).otherwise(0L))
      // group by ALL left columns (same shuffle — event_id is the key's
      // superset): duplicate left event_ids then stay separate rows like
      // the oracle's GROUP BY 1,2,3, with no nondeterministic first()
      .groupBy("event_id", "user_id", "ts_us")
      // each (left, right) pair joins EXACTLY once — a right row lives
      // in one cell and the left's 3 candidate cells are distinct
      .agg(sum(col("hit")).as("n_near"))
  }

  /** Retention cohorts: users grouped by first-active day, counted on
    * each later active day (classic cohort-retention triangle).
    *
    * Plan: ONE map-side-combined `collect_set(day)` per user — state
    * bounded by distinct active days (calendar-bounded, ≤ a few
    * thousand forever), NOT by event count — then the cohort day is an
    * in-row `array_min` and the triangle is a second small aggregate.
    * Two shuffles total, both map-side combined; nothing scales with
    * per-user event volume.
    */
  def retentionCohort(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .groupBy("user_id").agg(collect_set("day").as("days"))
      .select(array_min(col("days")).as("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))

  // ---------------------------------------------------------------------
  // Driver-contract wiring
  // ---------------------------------------------------------------------

  /** Events with `ts_us` (epoch µs) — the common input projection. */
  private def evUs(s: SparkSession, d: String): DataFrame =
    Fixtures.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))

  val FunnelStages = Seq("view", "click", "purchase")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> ((s, d) => {
      val e = evUs(s, d)
      asofJoin(
        e.filter(col("event_type") === "purchase"),
        e.filter(col("event_type") === "click"))
    }),
    "session_assign" -> ((s, d) => sessionAssign(evUs(s, d))),
    "range_join" -> ((s, d) => {
      val e = evUs(s, d)
      rangeJoinCount(
        e.filter(col("event_type") === "purchase"),
        e.filter(col("event_type") === "click"))
    }),
    "funnel" -> ((s, d) => funnelConversion(evUs(s, d), FunnelStages)),
    "retention" -> ((s, d) => retentionCohort(evUs(s, d))))

  private val US = MessageOps.US // shared ns→µs oracle cast discipline

  def oracle: Map[String, String] = Map(
    "asof_join" ->
      s"""WITH r AS (SELECT user_id, $US AS ts_us, max(event_id) AS r_id
                     FROM events WHERE event_type = 'click' GROUP BY 1, 2),
               l AS (SELECT event_id, user_id, $US AS ts_us
                     FROM events WHERE event_type = 'purchase')
          SELECT l.event_id, l.user_id, l.ts_us,
                 r.r_id AS asof_event_id, r.ts_us AS asof_us,
                 l.ts_us - r.ts_us AS gap_us
          FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.ts_us >= r.ts_us""",
    "range_join" ->
      s"""WITH l AS (SELECT event_id, user_id, $US AS ts_us
                     FROM events WHERE event_type = 'purchase'),
               r AS (SELECT user_id, $US AS ts_us
                     FROM events WHERE event_type = 'click')
          SELECT l.event_id, l.user_id, l.ts_us,
                 CAST(count(r.ts_us) AS BIGINT) AS n_near
          FROM l LEFT JOIN r
            ON l.user_id = r.user_id
           AND abs(r.ts_us - l.ts_us) <= $RangeJoinHalfUs
          GROUP BY 1, 2, 3""",
    "session_assign" ->
      s"""WITH e AS (SELECT user_id, event_id, $US AS ts_us FROM events),
            lagd AS (SELECT *, lag(ts_us) OVER
                       (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
                     FROM e),
            marked AS (SELECT *, CASE WHEN prev IS NULL
                                        OR ts_us - prev >= $SessionGapUs
                                      THEN 1 ELSE 0 END AS new_s
                       FROM lagd),
            sess AS (SELECT *, sum(new_s) OVER
                       (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
                     FROM marked)
          SELECT user_id,
                 min(ts_us) // 1000 AS session_start_ms,
                 max(ts_us) // 1000 + ${SessionGapUs / 1000} AS session_end_ms,
                 count(*) AS n
          FROM sess GROUP BY user_id, sid""",
    "funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, $US AS ts_us FROM events),
            s1 AS (SELECT user_id, min(ts_us) AS t FROM e
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(ts_us) AS t FROM e JOIN s1 USING (user_id)
                   WHERE event_type = 'click' AND ts_us >= s1.t GROUP BY 1),
            s3 AS (SELECT e.user_id, min(ts_us) AS t FROM e JOIN s2 USING (user_id)
                   WHERE event_type = 'purchase' AND ts_us >= s2.t GROUP BY 1)
          SELECT CAST(stage AS INTEGER) AS stage, event_type, n_users FROM (
            SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_users FROM s1
            UNION ALL SELECT 2, 'click', count(*) FROM s2
            UNION ALL SELECT 3, 'purchase', count(*) FROM s3)""",
    "retention" ->
      s"""WITH e AS (SELECT DISTINCT user_id, $US // 86400000000 AS day FROM events),
            cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
          SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
          FROM e JOIN cohort USING (user_id)
          GROUP BY 1, 2""")
}
