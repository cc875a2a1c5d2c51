package graft

import graft.ops.Evaluation
import org.apache.spark.sql.functions._

/** Evaluation module: each metric is recomputed independently in plain
  * Scala (BigInt / brute force) from the raw tables — the same discipline
  * as the DuckDB oracle but SQL-free, so an error shared by both SQL
  * engines would still surface here. */
class EvaluationSpec extends SparkSpec {

  private def rawEvents(): Array[(Int, Long, Long, Long)] =
    Tables.events(spark, sf)
      .select(dayofweek(col("ts")), expr("CAST(round(value*100) AS BIGINT)"),
        when(col("event_type") === "purchase", 1L).otherwise(0L), col("user_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("auc: matches the O(n^2) pairwise definition exactly") {
    val rows = Evaluation.qAuc(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = rawEvents()
    rows.foreach { r =>
      val dow = r.getInt(0)
      val g = ev.filter(_._1 == dow)
      val posS = g.filter(_._3 == 1L).map(_._2)
      val negS = g.filter(_._3 == 0L).map(_._2)
      // brute-force 2U: every (pos, neg) pair scores 2 if pos>neg, 1 if tie
      val u2 = (for (p <- posS; n <- negS)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert(r.getLong(1) == posS.length.toLong, s"npos dow=$dow")
      assert(r.getLong(2) == negS.length.toLong, s"nneg dow=$dow")
      assert(r.getLong(3) == u2, s"u2 dow=$dow")
      assert(r.getDouble(4) ==
        u2.toDouble / (posS.length.toLong * negS.length * 2).toDouble)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("calibration_bins: bins partition the events, rates recompute") {
    val rows = Evaluation.qCalibrationBins(spark, sf).collect()
    val ev = rawEvents()
    assert(rows.map(_.getLong(1)).sum == ev.length.toLong, "bins must partition")
    rows.foreach { r =>
      val g = ev.filter(e => e._2 / 3280 == r.getLong(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.map(_._3).sum)
      assert(r.getDouble(3) == g.map(_._2).sum.toDouble / (g.length * 100L).toDouble)
      assert(r.getDouble(4) == g.map(_._3).sum.toDouble / g.length.toDouble)
    }
  }

  test("crossval_folds: 5 folds partition users and events; assignment is md5-stable") {
    val rows = Evaluation.qCrossvalFolds(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted.toList == List(0L, 1L, 2L, 3L, 4L))
    val ev = rawEvents()
    assert(rows.map(_.getLong(1)).sum == ev.map(_._4).distinct.length.toLong)
    assert(rows.map(_.getLong(2)).sum == ev.length.toLong)
    // replay one fold assignment via java MD5 — independent of both engines
    val md = java.security.MessageDigest.getInstance("MD5")
    def fold(u: Long): Long = {
      val hex = md.digest(s"fold:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 5
    }
    val byFold = ev.map(_._4).distinct.groupBy(fold)
    rows.foreach(r => assert(r.getLong(1) == byFold(r.getLong(0)).length.toLong))
  }

  test("dp_noise: magnitude is the geometric(1/2) inverse CDF of the hash bits") {
    val rows = Evaluation.qDpNoise(spark, sf).collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String, k: Int): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(k)
    val trueN = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      val m = java.lang.Long.parseLong(hex(s"dp:$t", 13), 16)
      val g = 52 - (64 - java.lang.Long.numberOfLeadingZeros(m))
      val sgn = if (Integer.parseInt(hex(s"dps:$t", 1), 16) % 2 == 0) 1L else -1L
      assert(r.getLong(2) == g.toLong, s"mag for $t")
      assert(r.getLong(3) == sgn, s"sign for $t")
      assert(r.getLong(1) == trueN(t) + sgn * g, s"noisy count for $t")
    }
  }

  test("uplift: arms partition users per dow; rates and uplift recompute exactly") {
    val rows = Evaluation.qUplift(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = rawEvents()
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(u: Long): Long = {
      val hex = md.digest(s"uplift:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    rows.foreach { r =>
      val dow = r.getInt(0)
      val byUser = ev.filter(_._1 == dow).groupBy(_._4).toSeq
        .map { case (u, es) => (arm(u), es.map(_._3).max) }
      val (nt, ct) = (byUser.count(_._1 == 1L).toLong,
        byUser.filter(_._1 == 1L).map(_._2).sum)
      val (nc, cc) = (byUser.count(_._1 == 0L).toLong,
        byUser.filter(_._1 == 0L).map(_._2).sum)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((nt, ct, nc, cc)))
      assert(r.getDouble(5) == ct.toDouble / nt.toDouble)
      assert(r.getDouble(6) == cc.toDouble / nc.toDouble)
      assert(r.getDouble(7) == ct.toDouble / nt.toDouble - cc.toDouble / nc.toDouble)
    }
  }

  test("vocab_coverage: covered+oov partition tokens; empty-token filter holds") {
    val rows = Evaluation.qVocabCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(lower(trim(col("text"))), " ")).as("t"))
      .filter(col("t") =!= "").collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(1000).map(_._1).toSet
    rows.foreach { r =>
      val g = toks.filter(_._1 == r.getString(0))
      val cov = g.count(t => vocab(t._2)).toLong
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == cov)
      assert(r.getDouble(3) == cov.toDouble / g.length.toDouble)
      assert(r.getDouble(4) == (g.length - cov).toDouble / g.length.toDouble)
    }
  }

  test("kappa: 2x2 cells partition events; kappa matches the po/pe definition") {
    val rows = Evaluation.qKappa(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(dayofweek(col("ts")),
        when(expr("CAST(round(value*100) AS BIGINT)") >= 10000L, 1L).otherwise(0L),
        when(col("event_type").isin("purchase", "signup"), 1L).otherwise(0L))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val g = ev.filter(_._1 == r.getInt(0))
      val n11 = g.count(e => e._2 == 1 && e._3 == 1).toLong
      val n10 = g.count(e => e._2 == 1 && e._3 == 0).toLong
      val n01 = g.count(e => e._2 == 0 && e._3 == 1).toLong
      val n00 = g.count(e => e._2 == 0 && e._3 == 0).toLong
      val n = g.length.toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        == ((n, n11, n10, n01, n00)))
      val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      assert(r.getDouble(6) == (n * (n11 + n00) - pe).toDouble / (n * n - pe).toDouble)
      assert(r.getDouble(6) >= -1.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("coldstart: cold items are exactly the test-only items; split is md5-stable") {
    val rows = Evaluation.qColdstart(spark, sf).collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def isTest(ok: Long): Boolean = {
      val hex = md.digest(s"split:$ok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 5 == 0
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brand = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_brand"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val testItems = li.filter(e => isTest(e._1)).map(_._2).distinct
    val trainItems = li.filterNot(e => isTest(e._1)).map(_._2).toSet
    val byBrand = testItems.groupBy(brand)
    rows.foreach { r =>
      val g = byBrand(r.getString(0))
      val cold = g.count(p => !trainItems(p)).toLong
      assert(r.getLong(1) == g.length.toLong && r.getLong(2) == cold)
      assert(r.getDouble(3) == cold.toDouble / g.length.toDouble)
    }
    assert(rows.map(_.getLong(1)).sum == testItems.length.toLong)
  }

  test("offpolicy_ips: IPS/SNIPS replay the matched-reward sums exactly") {
    val rows = Evaluation.qOffpolicyIps(spark, sf).collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def target(u: Long): String = {
      val hex = md.digest(s"pi:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "purchase" else "click"
    }
    val ev = Tables.events(spark, sf)
      .select(dayofweek(col("ts")), col("event_type"),
        expr("CAST(round(value*100) AS BIGINT)"), col("user_id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val g = ev.filter(_._1 == r.getInt(0))
      val m = g.filter(e => e._2 == target(e._4))
      assert(r.getLong(1) == g.length.toLong && r.getLong(2) == m.length.toLong)
      assert(r.getLong(3) == m.map(_._3).sum)
      assert(r.getDouble(4) == (m.map(_._3).sum * 5).toDouble / (g.length * 100L).toDouble)
      if (m.nonEmpty)
        assert(r.getDouble(5) == m.map(_._3).sum.toDouble / (m.length * 100L).toDouble)
    }
  }
}
