package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps the
  * test run fast; Spark's getOrCreate caches it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"

  /** Set session confs for the duration of `body`, then restore the prior
    * state exactly (re-set what existed, unset what didn't). The test
    * session is JVM-shared across every suite, so a conf left flipped in
    * one spec silently changes another spec's plans — round 8's
    * SpatialJoinRewriteSpec failed 4 tests purely from suite order this
    * way. Every spec that flips a conf must go through this (or pin the
    * flag itself, as the j8 gates do for their own deferred actions). */
  def withConf[A](pairs: (String, Any)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v.toString) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => try spark.conf.unset(k) catch { case _: Throwable => () }
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
