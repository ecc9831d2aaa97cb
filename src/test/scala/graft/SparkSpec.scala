package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one local SparkSession per suite. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4)
  lazy val sf0001 = "/root/testdata/sf0.001"
}
