package graft

import graft.model.Fixtures

/** Pin the fixture schemas AS SPARK READS THEM against the snapshot in
  * `FIXTURE_SCHEMAS.md`, so the driver's next silent fixture
  * regeneration fails here as ONE named schema diff instead of as
  * dozens of red query keys (round-8 postmortem: `events.ts` churned
  * `timestamp[ns]` → `timestamp[us]` and the whole round's gate signal
  * vanished through two hard-coded loader sites).
  *
  * `events` accepts its known historical variants because
  * [[Fixtures.normalizeEventTs]] adapts to them by design; every other
  * table is pinned exact. On failure, follow the playbook in
  * `FIXTURE_SCHEMAS.md` §"On a spec failure".
  */
class FixtureSchemaSpec extends SparkTestBase {

  private val exact: Map[String, String] = Map(
    "region" -> "r_regionkey INT,r_name STRING",
    "nation" -> "n_nationkey INT,n_name STRING,n_regionkey INT",
    "customer" -> ("c_custkey BIGINT,c_name STRING,c_nationkey INT," +
      "c_acctbal DOUBLE,c_mktsegment STRING"),
    "supplier" -> "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "part" -> ("p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING," +
      "p_size INT,p_retailprice DOUBLE"),
    "orders" -> ("o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING," +
      "o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING"),
    "lineitem" -> ("l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT," +
      "l_linenumber INT,l_quantity DOUBLE,l_extendedprice DOUBLE," +
      "l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING,l_linestatus STRING," +
      "l_shipdate TIMESTAMP_NTZ"),
    "documents" -> "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT",
    "embeddings" -> "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT")

  /** r1-r7 stored timestamp[ns] (read as a nanos BIGINT under
    * `nanosAsLong`); r8+ stores timestamp[us] (TIMESTAMP_NTZ). */
  private val eventsVariants = Set(
    "event_id BIGINT,ts TIMESTAMP_NTZ,user_id BIGINT,event_type STRING," +
      "value DOUBLE,props STRING",
    "event_id BIGINT,ts BIGINT,user_id BIGINT,event_type STRING," +
      "value DOUBLE,props STRING")

  private def readDdl(name: String): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet").schema.toDDL
  }

  test("every fixture table matches the FIXTURE_SCHEMAS.md snapshot") {
    val diffs = Fixtures.tableNames.flatMap { name =>
      val got = readDdl(name)
      val ok =
        if (name == "events") eventsVariants.contains(got)
        else exact(name) == got
      if (ok) None
      else Some(s"$name:\n  read    = $got\n  expected = " +
        (if (name == "events") eventsVariants.mkString(" OR ") else exact(name)))
    }
    assert(diffs.isEmpty,
      "fixture schema drift — the driver regenerated the fixtures; follow " +
        "FIXTURE_SCHEMAS.md §'On a spec failure':\n" + diffs.mkString("\n"))
  }

  test("normalized events loader always lands ts on session-TZ TimestampType") {
    val ts = Fixtures.events(spark, sfDir).schema("ts").dataType
    assert(ts === org.apache.spark.sql.types.TimestampType)
  }

  test("fixture canary names broken tables, keeps good ones, never throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_canary_")
    dir.toFile.deleteOnExit()
    // one healthy table, one corrupt file, everything else missing — the
    // r8 failure class: the canary must localize, not propagate
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "region.parquet"),
      dir.resolve("region.parquet"))
    java.nio.file.Files.write(dir.resolve("events.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    val buf = new java.io.ByteArrayOutputStream()
    val saved = System.err
    try {
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      Fixtures.canary(spark, dir.toString, "test") // must not throw
    } finally System.setErr(saved)
    val out = buf.toString("UTF-8")
    assert(out.contains("[test-canary] region ok"), out)
    assert(out.contains("[test-canary] events FAILED"), out)
    assert(out.contains("[test-canary] lineitem FAILED"), out)
  }

  test("temp-dir cleanup deletes a filled tree (File.deleteOnExit could not)") {
    val root = java.nio.file.Files.createTempDirectory("graft_cleanup_test_")
    val sub = java.nio.file.Files.createDirectories(root.resolve("a/b"))
    java.nio.file.Files.write(sub.resolve("f.bin"), Array.fill(64)(7.toByte))
    java.nio.file.Files.write(root.resolve("top.txt"), "x".getBytes("UTF-8"))
    graft.util.TempDirs.deleteNow(root)
    assert(!java.nio.file.Files.exists(root))
  }

  test("both historical ts encodings normalize to the same instants") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the same three instants, stored the two ways the driver has
    // shipped them: epoch-nanos long (r1-r7 under nanosAsLong) and
    // microsecond timestamp (r8+); µs chosen non-round so the ns
    // div-1000 truncation is actually exercised
    val us = Seq(1704067200123456L, 1704067201987654L, 1704070800000001L)
    val asNs = us.map(_ * 1000 + 999).toDF("ts") // sub-µs tail must truncate
    val asTs = us.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val a = Fixtures.normalizeEventTs(asNs).select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    val b = Fixtures.normalizeEventTs(asTs).select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(a === us && b === us)
  }
}
