package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Fixtures

/** Relational coverage block (SURVEY §2.2/§2.3): the classic operator
  * categories the reference has no implementation of — joins, grouping
  * sets, set operations, scalar functions, approximate distinct — surfaced
  * through Spark built-ins over the TPC-H-ish star schema.
  *
  * The star join is the query-surface analog of the reference's topic
  * lookup join (`/root/reference/src/discovery/mod.rs:44-110`: resolve a
  * key against small metadata, here dimension tables).
  *
  * Scale notes: dimension sides are broadcast explicitly (nation/region/
  * customer are orders-of-magnitude smaller than the fact table — at 100 TB
  * the fact side streams through broadcast-hash joins with zero shuffle
  * until the final group-by); monetary aggregates are emitted on an integer
  * grid (×10^4) so double summation order can never flip a rounded decimal
  * across engines.
  */
object RelationalOps {

  /** lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, revenue per
    * (region, nation). Join order: fact table joins the pre-joined,
    * broadcast dimension chain. `revenue_x10k` = sum(extprice·(1-disc))
    * scaled to its exact 10^-4 grain and rounded to an integer — portable
    * across any summation order (fp error ≪ 0.5 on the scaled grid).
    */
  def topicJoinStar(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 10000)
          .cast("long").as("revenue_x10k"))
  }

  /** Grouping-sets coverage: CUBE over (status, priority) with counts and
    * totals. o_totalprice has a 2-decimal grain, so round(sum, 2) is exact
    * under any summation order.
    */
  def ordersRollupCube(orders: DataFrame): DataFrame =
    orders.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))

  /** Set-operation coverage: segment customers split into those with at
    * least one order (INTERSECT) and those with none (EXCEPT). Both set ops
    * use distinct semantics in Spark and DuckDB alike; the two branches
    * partition the segment's key set (asserted in tests).
    */
  def setOpsSegment(customer: DataFrame, orders: DataFrame, segment: String): DataFrame = {
    val seg = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey").as("custkey"))
    val withOrders = orders.select(col("o_custkey").as("custkey")).distinct()
    seg.intersect(withOrders).withColumn("tag", lit("with_orders"))
      .union(seg.except(withOrders).withColumn("tag", lit("no_orders")))
  }

  /** Scalar-function coverage: string/date/math built-ins over orders.
    * Every expression is a deterministic single-row IEEE computation on
    * identical input bits, so raw doubles compare exactly across engines
    * (+, -, *, /, sqrt are all correctly rounded; no transcendentals).
    */
  def stringDateMathFuncs(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      upper(substring(col("o_orderpriority"), 1, 4)).as("prio4"),
      concat_ws("-", col("o_orderstatus"), lower(col("o_orderpriority"))).as("status_prio"),
      length(col("o_orderpriority")).as("prio_len"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dom"),
      (col("o_totalprice") * lit(0.1)).as("price_tenth"),
      sqrt(col("o_totalprice")).as("price_sqrt"),
      abs(col("o_totalprice") - lit(150000.0)).as("price_dev"),
      floor(col("o_totalprice")).cast("long").as("price_floor"))

  /** HLL++ distinct-count coverage. Approximate values differ by algorithm
    * across engines, so the portable contract is: exact count (hashable)
    * plus a boolean asserting the engine's own approximation lands within
    * 15% of exact (≈3σ at Spark's default rsd=0.05) — true in both engines,
    * deterministic per dataset.
    */
  def approxDistinctUsers(ev: DataFrame): DataFrame =
    ev.agg(
      count_distinct(col("user_id")).as("exact_users"),
      count(lit(1)).as("n_events"),
      approx_count_distinct(col("user_id")).as("apx"))
      .select(
        col("exact_users"),
        col("n_events"),
        (abs(col("apx") - col("exact_users")) <= col("exact_users") * 0.15).as("approx_ok"))

  /** Skew-safe equi-join: spread each hot key of the large side over
    * `salts` sub-keys (deterministic salt from a spreading column) and
    * replicate the small side once per salt. At 100 TB a single hot
    * partition key (one celebrity user, one default topic) turns a plain
    * shuffle join into one straggler task; salting bounds any task at
    * 1/`salts` of the hot key. AQE's skew-join handles the sort-merge
    * case at runtime; explicit salting is the declarative form that also
    * covers aggregations and non-AQE paths.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      spreadCol: String, salts: Int): DataFrame = {
    val l = large.withColumn("_salt", pmod(hash(col(spreadCol)), lit(salts)))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Contract query for the salting path: events ⋈ per-user dimension
    * through [[saltedJoin]], then aggregated — results are identical to
    * the plain join (the oracle computes it unsalted), proving salting is
    * a pure physical rewrite.
    */
  def saltedJoinSkew(ev: DataFrame): DataFrame = {
    val dim = ev.groupBy("user_id")
      .agg(count_distinct(col("event_type")).as("n_types"))
    saltedJoin(ev, dim, "user_id", "event_id", 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("n_types")).as("sum_types"))
  }

  /** Exact interpolated percentiles of message values per topic — the
    * latency/size-distribution readout every stats surface needs
    * (consumer stats rates, proto:609-613, generalized to quantiles).
    * Exact (sort-based) rather than approximate so the cross-engine
    * comparison is bit-deterministic: both engines linearly interpolate
    * over the same sorted doubles. At 100 TB exact percentiles become
    * `approx_percentile` (t-digest) — same query shape, sketch mergeable
    * map-side.
    */
  def valuePercentiles(ev: DataFrame): DataFrame =
    ev.groupBy("event_type")
      .agg(expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D))").as("pcts"))
      .select(
        col("event_type"),
        col("pcts").getItem(0).as("p25"),
        col("pcts").getItem(1).as("p50"),
        col("pcts").getItem(2).as("p75"),
        col("pcts").getItem(3).as("p95"))

  // ---------------------------------------------------------------------
  // Driver-contract wiring
  // ---------------------------------------------------------------------

  private val SEGMENT = "BUILDING"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topic_join_star" -> ((s, d) => topicJoinStar(
      Fixtures.lineitem(s, d), Fixtures.orders(s, d), Fixtures.customer(s, d),
      Fixtures.nation(s, d), Fixtures.region(s, d))),
    "rollup_cube" -> ((s, d) => ordersRollupCube(Fixtures.orders(s, d))),
    "set_ops" -> ((s, d) => setOpsSegment(
      Fixtures.customer(s, d), Fixtures.orders(s, d), SEGMENT)),
    "str_date_funcs" -> ((s, d) => stringDateMathFuncs(Fixtures.orders(s, d))),
    "approx_users" -> ((s, d) => approxDistinctUsers(Fixtures.events(s, d))),
    "salt_join" -> ((s, d) => saltedJoinSkew(Fixtures.events(s, d))),
    "val_pcts" -> ((s, d) => valuePercentiles(Fixtures.events(s, d))))

  def oracle: Map[String, String] = Map(
    "topic_join_star" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_items,
                CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT) AS revenue_x10k
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "rollup_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "set_ops" ->
      """SELECT custkey, 'with_orders' AS tag FROM
           (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT SELECT o_custkey FROM orders)
         UNION ALL
         SELECT custkey, 'no_orders' AS tag FROM
           (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            EXCEPT SELECT o_custkey FROM orders)
         ORDER BY tag, custkey""",
    "str_date_funcs" ->
      """SELECT o_orderkey,
                upper(substring(o_orderpriority, 1, 4)) AS prio4,
                concat_ws('-', o_orderstatus, lower(o_orderpriority)) AS status_prio,
                CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
                CAST(year(o_orderdate) AS INTEGER) AS yr,
                CAST(month(o_orderdate) AS INTEGER) AS mo,
                CAST(day(o_orderdate) AS INTEGER) AS dom,
                o_totalprice * 0.1 AS price_tenth,
                sqrt(o_totalprice) AS price_sqrt,
                abs(o_totalprice - 150000.0) AS price_dev,
                CAST(floor(o_totalprice) AS BIGINT) AS price_floor
         FROM orders""",
    "val_pcts" ->
      """SELECT event_type,
                quantile_cont(value, 0.25) AS p25,
                quantile_cont(value, 0.5) AS p50,
                quantile_cont(value, 0.75) AS p75,
                quantile_cont(value, 0.95) AS p95
         FROM events GROUP BY event_type ORDER BY event_type""",
    "salt_join" ->
      """WITH dim AS (SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
                      FROM events GROUP BY user_id)
         SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(d.n_types) AS BIGINT) AS sum_types
         FROM events e JOIN dim d USING (user_id)
         GROUP BY e.event_type ORDER BY e.event_type""",
    "approx_users" ->
      """SELECT exact_users, n_events,
                (abs(apx - exact_users) <= exact_users * 0.15) AS approx_ok
         FROM (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
                      CAST(count(*) AS BIGINT) AS n_events,
                      approx_count_distinct(user_id) AS apx
               FROM events)""")
}
