package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the suite (one per test JVM; sbt forks a
  * single JVM for all suites). Mirrors the driver's session shape: UTC,
  * small shuffle partitioning, ns-as-long parquet reads.
  */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkTestBase.session

  val sfDir = "/root/testdata/sf0.001"

  /** Collected rows as a canonical sorted multiset for order-insensitive
    * equality (the comparator's discipline).
    */
  def canon(df: DataFrame): Seq[Seq[String]] = {
    val names = df.columns.sorted.toSeq
    df.collect().toSeq
      .map(r => names.map(n => String.valueOf(r.getAs[Any](n))))
      .sortBy(_.mkString("\u0000"))
  }

  def assertSameRows(a: DataFrame, b: DataFrame): Unit =
    assert(canon(a) == canon(b))

  /** Test-side replica of the engine's md5-permille bucket
    * (`graft.operators.Hashing.md5Bucket`) — kept as an INDEPENDENT JVM
    * implementation so tests verify the Spark expression rather than
    * echo it; shared here so the replica exists exactly once. */
  def md5BucketOf(id: Long, mod: Long = 1000L): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % mod
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("local[4]", "4")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
