package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, lazy). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf0001 = "/root/testdata/sf0.001"

  /** Default-suite budget (VERDICT r16 #7): >5 s maintenance-
    * equivalence / training-eval pins for SETTLED waves run under
    * GRAFT_FULL_SMOKE=1 (mandatory at round close); the fast default
    * gate keeps every cheap pin, the whole current wave, and the
    * sampled query smoke. Call at the top of a gated test.
    */
  protected val fullSmoke: Boolean = sys.env.contains("GRAFT_FULL_SMOKE")
  protected def slowGate(): Unit =
    if (!fullSmoke) cancel("settled-wave heavy gate runs under " +
      "GRAFT_FULL_SMOKE=1 (round close)")
}
