package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (small core count — specs use tiny data). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()
  val Sf0001 = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session shared across suites in one forked JVM; do not stop
    super.afterAll()
  }
}
