package graft

import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.operators.RelationalOps

class RelationalOpsSpec extends SparkTestBase {

  private lazy val lineitem = Fixtures.lineitem(spark, sfDir)
  private lazy val orders = Fixtures.orders(spark, sfDir)
  private lazy val customer = Fixtures.customer(spark, sfDir)
  private lazy val nation = Fixtures.nation(spark, sfDir)
  private lazy val region = Fixtures.region(spark, sfDir)

  test("topicJoinStar: item counts sum to the joined fact count; revenue matches SQL") {
    val star = RelationalOps.topicJoinStar(lineitem, orders, customer, nation, region)
    val rows = star.collect()
    val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count()
    assert(rows.map(_.getAs[Long]("n_items")).sum === joined)

    // independent recompute through the SQL surface
    Seq(("lineitem", lineitem), ("orders", orders), ("customer", customer),
      ("nation", nation), ("region", region))
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
    val sql = spark.sql(
      """SELECT r_name, n_name, count(*) AS n_items,
               CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 10000) AS LONG) AS revenue_x10k
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""")
    assertSameRows(star, sql)
  }

  test("topicJoinStar plan broadcasts the dimension side") {
    val star = RelationalOps.topicJoinStar(lineitem, orders, customer, nation, region)
    val plan = star.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("ordersRollupCube: cube contains the grand total and per-status marginals") {
    val cube = RelationalOps.ordersRollupCube(orders).collect()
    val totalOrders = orders.count()
    val grand = cube.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getAs[Long]("n") === totalOrders)
    val statusMarginals = cube.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(statusMarginals.map(_.getAs[Long]("n")).sum === totalOrders)
  }

  test("setOpsSegment partitions the segment's customers") {
    val r = RelationalOps.setOpsSegment(customer, orders, "BUILDING")
    val segTotal = customer.filter(col("c_mktsegment") === "BUILDING").count()
    val byTag = r.groupBy("tag").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byTag.values.sum === segTotal)
    // the two branches are disjoint
    assert(r.select("custkey").distinct().count() === r.count())
  }

  test("stringDateMathFuncs: spot-check one row against scala math") {
    val row = RelationalOps.stringDateMathFuncs(orders)
      .filter(col("o_orderkey") === orders.select(min("o_orderkey")).collect()(0).getLong(0))
      .collect()(0)
    val src = orders.orderBy("o_orderkey").limit(1).collect()(0)
    val price = src.getAs[Double]("o_totalprice")
    assert(row.getAs[Double]("price_sqrt") === math.sqrt(price))
    assert(row.getAs[Double]("price_dev") === math.abs(price - 150000.0))
    assert(row.getAs[Long]("price_floor") === math.floor(price).toLong)
    assert(row.getAs[String]("prio4") === src.getAs[String]("o_orderpriority").substring(0, 4).toUpperCase)
  }

  test("saltedJoin is a pure physical rewrite: same rows as the plain join") {
    val ev = Fixtures.events(spark, sfDir)
    val dim = ev.groupBy("user_id").agg(count_distinct(col("event_type")).as("n_types"))
    val salted = RelationalOps.saltedJoin(ev, dim, "user_id", "event_id", 8)
      .select("user_id", "event_id", "n_types")
    val plain = ev.join(dim, "user_id").select("user_id", "event_id", "n_types")
    assertSameRows(salted, plain)
  }

  test("approxDistinctUsers: exact matches count(distinct), approx within bound") {
    val ev = Fixtures.events(spark, sfDir)
    val r = RelationalOps.approxDistinctUsers(ev).collect()(0)
    val exact = ev.select("user_id").distinct().count()
    assert(r.getAs[Long]("exact_users") === exact)
    assert(r.getAs[Boolean]("approx_ok"))
  }
}
