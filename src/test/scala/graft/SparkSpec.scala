package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one local session per suite, UTC, small shuffle. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // all shared conf (UTC, nanosAsLong, AQE, ...) comes from GraftSession —
    // the single place session conf lives
    val s = GraftSession.build("local[4]", 4, "graft-test", Map(
      "spark.ui.enabled" -> "false",
      "spark.sql.warehouse.dir" ->
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString))
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
