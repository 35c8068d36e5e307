package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs — one lazy session per suite. */
trait SparkTestBase extends AnyFunSuite {
  final val Sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.builder("graft-test", "4").getOrCreate()
}
