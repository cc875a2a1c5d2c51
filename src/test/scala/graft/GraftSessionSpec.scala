package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("session factory applies scale confs and registers engine functions") {
    // getOrCreate in a shared JVM returns the existing context but applies
    // session-level confs to a fresh session state
    val s = GraftSession.build("local[4]", parallelism = 4, appName = "graft-test")
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    val r = s.sql(
      "SELECT cosine_sim(array(CAST(3 AS FLOAT)), array(CAST(7 AS FLOAT))) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
