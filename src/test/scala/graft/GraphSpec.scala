package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("integer pagerank matches an independent in-memory fixed-point computation") {
    val got = Graph.qPagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))

    // independent reference: same recurrence, plain Scala maps
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.toSeq.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps = grp.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.map(_._1)
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, d) =>
        contrib(d) = contrib.getOrElse(d, 0L) + r(s) / deg(s)
      }
      r = contrib.map { case (n, c) => n -> (150000L + 85L * c / 100L) }.toMap
    }
    val want = r.toSeq.sortBy { case (n, v) => (-v, n) }.take(100)
    assert(got.toSeq == want, "exact integer arithmetic must agree term for term")
  }

  test("pagerank ranks are positive and the hub ordering is tie-broken") {
    val rows = Graph.qPagerank(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
    val pairs = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.sliding(2).forall {
      case Array((r1, n1), (r2, n2)) => r1 > r2 || (r1 == r2 && n1 < n2)
      case _ => true
    }, "descending rank, ascending node on ties")
  }
}
