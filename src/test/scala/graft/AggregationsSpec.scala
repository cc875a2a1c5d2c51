package graft

import graft.ops.Aggregations
import org.apache.spark.sql.functions._

class AggregationsSpec extends SparkSpec {

  test("grouped counts sum to table size") {
    val total = Aggregations.qAggGroup(spark, sf).agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("approx distinct certificate: exact counts match and bound holds at sf0.001") {
    val exact = Aggregations.qAggCountDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Aggregations.qAggApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getAs[Long]("n_exact") == exact(flag), s"$flag exact side drifted")
      assert(r.getAs[Boolean]("within_5pct"), s"$flag: HLL estimate outside 5% bound")
    }
  }

  test("rollup has grand total row equal to customer count") {
    val grand = Aggregations.qRollup(spark, sf)
      .filter(col("g_region") === 1 && col("g_nation") === 1).collect()
    assert(grand.length == 1)
    assert(grand(0).getAs[Long]("n_customers") == Tables.customer(spark, sf).count())
  }

  test("cube contains all four grouping-set combinations") {
    val sets = Aggregations.qCube(spark, sf)
      .select("g_flag", "g_status").distinct().count()
    assert(sets == 4)
  }

  test("approx percentile certificate: every group's sketch lands within 2% of exact") {
    val rows = Aggregations.qAggPercentileApprox(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (c <- Seq("within_p25", "within_p50", "within_p75"))
        assert(r.getAs[Boolean](c), s"${r.getString(0)}: $c failed the 2% bound")
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("percentiles are ordered p25 <= p50 <= p75") {
    Aggregations.qAggPercentile(spark, sf).collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("per-capita ratio is positive for every nation") {
    assert(Aggregations.qPerCapita(spark, sf)
      .filter(col("revenue_per_customer") <= 0).count() == 0)
  }

  test("grouping sets = per-flag rows + per-status rows + grand total, no cross cells") {
    val li = Tables.lineitem(spark, sf)
    val nFlags = li.select("l_returnflag").distinct().count()
    val nStatus = li.select("l_linestatus").distinct().count()
    val gs = Aggregations.qGroupingSets(spark, sf).cache()
    try {
      assert(gs.count() == nFlags + nStatus + 1)
      // no (flag, status) cross cells: every row has at least one grouping flag set
      assert(gs.filter(col("g_flag") === 0 && col("g_status") === 0).count() == 0)
      // each grouping set independently totals the full table
      val total = li.count()
      assert(gs.filter(col("g_status") === 1 && col("g_flag") === 0)
        .agg(sum("n")).collect()(0).getLong(0) == total)
      assert(gs.filter(col("g_flag") === 1 && col("g_status") === 1)
        .agg(sum("n")).collect()(0).getLong(0) == total)
    } finally gs.unpersist()
  }

  test("exact-sum stats agree with Spark's native stddev/corr aggregates") {
    val got = Aggregations.qAggStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(avg("l_quantity").as("m"), stddev_samp("l_quantity").as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == native.keySet)
    got.foreach { case (k, (m, s, c)) =>
      val (nm, ns, nc) = native(k)
      assert(math.abs(m - nm) < 1e-4, s"mean $k: $m vs $nm")
      assert(math.abs(s - ns) < 1e-4, s"std $k: $s vs $ns")
      assert(math.abs(c - nc) < 1e-4, s"corr $k: $c vs $nc")
    }
  }

  test("mode picks the max count with lexicographic tie-break") {
    val modes = Aggregations.qAggMode(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // brute-force one brand
    val (brand, (modeType, n)) = modes.head
    val counts = Tables.part(spark, sf).filter(col("p_brand") === brand)
      .groupBy("p_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(n == counts.map(_._2).max)
    assert(modeType == counts.filter(_._2 == n).map(_._1).min,
      "ties break to the lexicographically smallest type")
  }

  test("discrete percentiles are actual data values, cont interpolates between them") {
    val disc = Aggregations.qPercentileDisc(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val values = Tables.lineitem(spark, sf).select("l_returnflag", "l_extendedprice")
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    disc.foreach { case (flag, (p50, p90, p99)) =>
      val vs = values(flag)
      assert(vs.contains(p50) && vs.contains(p90) && vs.contains(p99),
        s"disc percentiles must be members of the group: $flag")
      assert(p50 == vs(math.ceil(vs.length * 0.5).toInt - 1))
      assert(p90 == vs(math.ceil(vs.length * 0.9).toInt - 1))
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("bool aggregates match direct per-group predicates") {
    val rows = Aggregations.qAggBool(spark, sf).collect()
    val o = Tables.orders(spark, sf).collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
    rows.foreach { r =>
      val g = o(r.getString(0))
      assert(r.getBoolean(1) == g.forall(_.getAs[Double]("o_totalprice") > 500))
      assert(r.getBoolean(2) == g.exists(_.getAs[String]("o_orderstatus") == "F"))
      assert(r.getLong(3) == g.count(_.getAs[Double]("o_totalprice") > 100000))
    }
  }

  test("bit aggregates match a fold over the group's keys") {
    val rows = Aggregations.qAggBits(spark, sf).collect()
    val li = Tables.lineitem(spark, sf).select("l_returnflag", "l_partkey").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    rows.foreach { r =>
      val ks = li(r.getString(0))
      assert(r.getLong(1) == ks.reduce(_ & _))
      assert(r.getLong(2) == ks.reduce(_ | _))
      assert(r.getLong(3) == ks.reduce(_ ^ _))
      assert(r.getLong(4) == ks.length)
    }
  }

  test("merged daily partials equal a direct single-pass aggregation") {
    val merged = Aggregations.qAggMerge(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val direct = Tables.events(spark, sf)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type")
      .agg(countDistinct(to_date(col("ts"))).as("n_days"),
        count(lit(1)).as("n"),
        (sum(col("cents").cast("decimal(38,0)")).cast("double") / 100.0).as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(merged == direct, "algebraic merge is lossless")
  }

  test("winsorized mean matches an in-memory clamp at the discrete percentiles") {
    val rows = Aggregations.qWinsorize(spark, sf).collect()
    val vals = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val vs = vals(r.getString(0))
      val lo = vs(math.ceil(vs.length * 0.05).toInt - 1)
      val hi = vs(math.ceil(vs.length * 0.95).toInt - 1)
      val want = BigDecimal(vs.map(c => math.max(lo, math.min(hi, c))).sum)./(vs.length)./(100)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - want) < 1e-9, s"robust mean ${r.getString(0)}")
      assert(r.getDouble(2) >= r.getDouble(5) && r.getDouble(2) <= r.getDouble(6),
        "mean inside the clamp band")
      assert(r.getLong(3) < vs.length * 0.06 && r.getLong(4) < vs.length * 0.06,
        "each tail clips at most ~5%")
    }
  }

  test("regression closed form matches a direct least-squares fit") {
    val rows = Aggregations.qRegr(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val g = li(r.getString(0)).map(x => (x.getDouble(1), x.getDouble(2)))
      val n = g.length.toDouble
      val (sx, sy) = (g.map(_._1).sum, g.map(_._2).sum)
      val sxy = g.map(p => p._1 * p._2).sum
      val sx2 = g.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
      val intercept = (sy - slope * sx) / n
      assert(math.abs(r.getDouble(2) - slope) < 1e-3, s"slope ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - intercept) < 1e-1, s"intercept ${r.getString(0)}")
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }
}
