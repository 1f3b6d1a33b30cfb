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
