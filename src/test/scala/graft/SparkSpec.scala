package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  /** The live shared session. `getOrCreate` returns the running one and
    * transparently builds a replacement after a restart-testing suite
    * (DurableStateSpec) stops the context mid-run — suites execute
    * sequentially in the forked test JVM, so a restart never races a
    * sibling suite. */
  def session: SparkSession = synchronized {
    SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
