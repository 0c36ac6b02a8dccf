package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for the whole test JVM (Test/fork gives us a single
  * forked JVM; suites share it instead of paying session startup each). */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4)
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
  lazy val sf001 = "/root/testdata/sf0.01"
}
