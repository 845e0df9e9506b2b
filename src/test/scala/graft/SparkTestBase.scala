package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM per `sbt test` fork). */
object SparkTestBase {
  lazy val session: SparkSession = {
    val s = GraftSession.builder(4).appName("graft-tests").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // mirror production: the whole suite runs under the engine's custom
    // optimizer rules, so every PlanGuard/decision assertion covers them
    GraftSession.registerOptimizations(s)
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
}
