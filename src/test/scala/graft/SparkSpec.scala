package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (getOrCreate reuses one JVM-wide
  * session; sbt forks a single JVM for tests).
  */
trait SparkSpec extends AnyFunSuite {
  protected lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Runs `body` with the given SQL confs set on the shared session,
    * restoring (or unsetting) each previous value afterwards — the ONE
    * home for plan-assertion conf windows (broadcast disabled, AQE off).
    *
    * SEQUENTIAL-EXECUTION ASSUMPTION (round-10 ADVICE #4): this mutates
    * GLOBAL SQL confs on the JVM-shared session. It is safe only because
    * sbt runs forked test suites sequentially (no Test/testForkedParallel
    * in build.sbt); enabling suite parallelism would flake other suites'
    * plan assertions during the conf window. If parallelism is ever
    * turned on, move the conf-window tests onto `spark.newSession()`
    * (session-scoped runtime confs) instead of widening this helper.
    */
  protected def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
