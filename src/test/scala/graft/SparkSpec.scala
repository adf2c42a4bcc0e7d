package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. One session per JVM (sbt forks one
  * test JVM), small shuffle-partition count so tiny-data tests don't pay
  * 200-task overhead.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = {} // keep shared session alive across suites
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // deliberately NON-default (round-17 advice): every table-backed
      // operator must resolve locations through the catalog, never a
      // hardcoded cwd-relative ./spark-warehouse — running the whole
      // suite under a configured warehouse keeps that honest
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_test_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.tune(s) // engine-required confs (top-k agg fallback threshold)
    s
  }
}
