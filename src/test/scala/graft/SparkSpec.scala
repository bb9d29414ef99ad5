package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for the whole suite (JVM-wide, like the
  * reference's single listener shared by all connections). */
object TestSpark {
  lazy val spark: SparkSession = Engine.build("local[8]", shufflePartitions = 8)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  /** Smallest fixture scale — specs must stay fast. */
  val sf = "/root/testdata/sf0.001"
}
