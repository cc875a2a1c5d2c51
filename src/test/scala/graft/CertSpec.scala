package graft

import graft.ops.{Dedup, Graph}
import org.apache.spark.sql.functions._

/** The round-9 decade certificates: each heavy key whose full-frame sf1.0
  * oracle exhausts a single-process DuckDB gets a bounded twin (residue
  * slice + exact-integer census). These tests pin the twins to
  * INDEPENDENT in-memory recomputations of the same slice, so the cert
  * can never drift from the full key's semantics without failing here. */
class CertSpec extends SparkSpec {

  /** The co-purchase edge set exactly as Graph.edges derives it (distinct
    * directed pairs within an order, 64-smallest-partkey cap). */
  private def copurchaseEdges(): Set[(Long, Long)] = {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.toSeq.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted.take(64)
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
  }

  test("q_triangle_cert matches an in-memory apex-sliced oriented count") {
    val edges = copurchaseEdges()
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // same (degree, id) orientation as the operator
    val o = edges.filter { case (s, d) => s < d }.map { case (s, d) =>
      if (deg(s) < deg(d) || (deg(s) == deg(d) && s < d)) (s, d) else (d, s)
    }
    val out = o.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val census = scala.collection.mutable.HashMap.empty[Long, (Long, Long, Long, Long, Long)]
    for {
      (u, vs) <- out if u % 8 == 0
      i <- vs.indices; j <- (i + 1) until vs.size
      (b, c) = (vs(i), vs(j))
      if edges.contains((b, c))
    } {
      val k = c % 16
      val (n, sa, sb, sc, ch) = census.getOrElse(k, (0L, 0L, 0L, 0L, 0L))
      census(k) = (n + 1, sa + u, sb + b, sc + c,
        ch + (u * 1009L + b * 31L + c) % 1000000007L)
    }
    val want = census.toSeq.map { case (k, (n, sa, sb, sc, ch)) =>
      (k, n, sa, sb, sc, ch)
    }.sortBy(_._1)
    val got = Graph.qTriangleCert(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(want.nonEmpty, "fixture must contain apex-sliced triangles")
    assert(got == want, s"got $got\nwant $want")
  }

  test("q_kcore_cert matches an in-memory peel of the mod-4 subgraph") {
    var e = copurchaseEdges().filter { case (s, d) => s % 4 == 0 && d % 4 == 0 }
    val want = (1 to 3).map { round =>
      val keep = e.groupBy(_._1).collect { case (n, es) if es.size >= 3 => n }.toSet
      e = e.filter { case (s, d) => keep(s) && keep(d) }
      (round.toLong, e.map(_._1).size.toLong,
        e.size.toLong, e.toSeq.map(_._1).sum, e.toSeq.map(_._2).sum)
    }
    val got2 = Graph.qKcoreCert(spark, sf).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("sum_src"), r.getAs[Long]("sum_dst")))
      .toSeq
    assert(got2 == want, s"got $got2\nwant $want")
  }

  test("q_setsim_cert matches a brute-force census of the mod-4 slice") {
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 4 === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split(" ").toSeq.sliding(2)
          .filter(_.size == 2).map(_.mkString(" ")).toSet)
      .toMap
    var (nP, sO, s1, s2, sJ, ch) = (0L, 0L, 0L, 0L, 0L, 0L)
    for {
      a <- docs.keys.toSeq.sorted; b <- docs.keys.toSeq.sorted if a < b
      o = (docs(a) & docs(b)).size.toLong
      n1 = docs(a).size.toLong; n2 = docs(b).size.toLong
      if o * 10 >= (n1 + n2 - o) * 8
    } {
      nP += 1; sO += o; s1 += n1; s2 += n2
      sJ += math.floor(o.toDouble / (n1 + n2 - o) * 1000000 + 0.5).toLong
      ch += (a * 31L + b) % 1000000007L
    }
    val r = Dedup.qSetsimCert(spark, sf).collect()(0)
    assert(nP > 0, "fixture must contain matching pairs in the slice")
    assert((r.getAs[Long]("n_pairs"), r.getAs[Long]("sum_o"),
      r.getAs[Long]("sum_n1"), r.getAs[Long]("sum_n2"),
      r.getAs[Long]("sum_jaccard_ppm"), r.getAs[Long]("chk"))
      == ((nP, sO, s1, s2, sJ, ch)))
  }

  test("q_dedup_pipeline_cert: stage algebra chains and checksums shrink") {
    val rows = Dedup.qDedupPipelineCert(spark, sf).collect()
      .sortBy(_.getAs[String]("stage"))
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_in") - r.getAs[Long]("dropped")
        == r.getAs[Long]("docs_out"))
    }
    // stages chain: docs_out of k == docs_in of k+1
    assert(rows(0).getAs[Long]("docs_out") == rows(1).getAs[Long]("docs_in"))
    assert(rows(1).getAs[Long]("docs_out") == rows(2).getAs[Long]("docs_in"))
    // keep sets only shrink, and ids are positive: the id-sum checksum is
    // monotone non-increasing across stages
    val chks = rows.map(_.getAs[Long]("chk_out"))
    assert(chks(0) >= chks(1) && chks(1) >= chks(2))
    // the cert runs on the mod-4 slice: stage-1 input is exactly that count
    val n4 = Tables.documents(spark, sf).filter(col("doc_id") % 4 === 0).count()
    assert(rows(0).getAs[Long]("docs_in") == n4)
  }
}
