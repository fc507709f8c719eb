package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * startup dominates test wall-clock otherwise).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(s)
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  // lazy val (not def): `import spark.implicits._` needs a stable identifier
  lazy val spark: SparkSession = SparkSpec.spark
  def sf001 = "/root/testdata/sf0.001"

  /** Evaluate a single Column expression over a one-row frame. */
  def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  def assertClose(got: Any, want: Double, tol: Double = 1e-9): Unit = {
    val g = got.asInstanceOf[Double]
    assert(math.abs(g - want) <= tol, s"got $g want $want")
  }
}
