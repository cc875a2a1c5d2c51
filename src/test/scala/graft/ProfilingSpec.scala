package graft

import graft.ops.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {

  test("forecast_holt replays the integer Holt recursion per series") {
    val got = Profiling.qForecastHolt(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").cast("string").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("y")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toSeq
      .map { case ((et, d), y) => (et, d, y) }
    val want = daily.groupBy(_._1).toSeq.flatMap { case (et, xs) =>
      var l = 0L; var b = 0L; var first = true
      xs.sortBy(_._2).map { case (_, d, y) =>
        if (first) { l = y; b = 0L; first = false }
        else { val lp = l; l = (y + lp + b) / 2; b = (l - lp + b) / 2 }
        (et, d, y, l, b, l + 7 * b)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want, "floor-quantized level/trend must agree term for term")
  }

  test("dq_rules: planted violations are counted rule for rule") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("dqrules").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, Option(10L), "O", 100.0, ts, "1-URGENT"),
      (1L, Option(11L), "F", 50.0, ts, "2-HIGH"), // duplicate key
      (2L, Option.empty[Long], "P", 70.0, ts, "3-MEDIUM"), // null custkey
      (3L, Option(12L), "X", -5.0, ts, "4-NOT")) // bad status + negative price
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(
      (1L, 1L, 1L, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", ts),
      (9L, 1L, 1L, 1, 99.0, 10.0, 0.5, 0.0, "N", "O", ts)) // orphan + qty + discount
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Profiling.qDqRules(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("orders_custkey_not_null") == ((4L, 1L)))
    assert(got("orders_price_positive") == ((4L, 1L)))
    assert(got("orders_status_domain") == ((4L, 1L)))
    assert(got("orders_orderkey_unique") == ((3L, 1L)))
    assert(got("lineitem_quantity_range") == ((2L, 1L)))
    assert(got("lineitem_discount_range") == ((2L, 1L)))
    assert(got("lineitem_fk_orders") == ((2L, 1L)))
  }

  test("bootstrap CI matches an in-memory md5-weight replication") {
    val row = Profiling.qBootstrapCi(spark, sf).collect().head
    val base = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val M = 2147483647L
    val means = (0 until 32).map { rep =>
      val a = ((2L * rep + 1L) * 2654435761L) % M
      val b = (rep.toLong * 1779033703L) % M
      var wsum = 0L; var wn = 0L
      base.foreach { case (ok, cents) =>
        val h = java.lang.Long.parseLong(md5hex(s"$ok").take(15), 16) % M
        val m = ((h * a + b) % M) % 4
        val w = if (m == 0) 2L else if (m == 1) 0L else 1L
        wsum += w * cents; wn += w
      }
      rep -> wsum / wn
    }
    val sorted = means.sortBy { case (rep, m) => (m, rep) }.map(_._2)
    assert(row.getLong(0) == 32L)
    assert(row.getLong(1) == means.map(_._2).sum / 32)
    assert(row.getLong(2) == sorted(1) && row.getLong(3) == sorted(30))
    assert(row.getLong(4) == sorted.head && row.getLong(5) == sorted.last)
    assert(sorted.head <= row.getLong(1) && row.getLong(1) <= sorted.last,
      "point estimate must lie inside the replicate range")
  }

  test("histogram buckets partition the table and edges are exact") {
    val h = Profiling.qHist(spark, sf).collect()
    assert(h.map(_.getLong(2)).sum == Tables.orders(spark, sf).count(),
      "bucket counts must partition the table")
    h.foreach { r =>
      val (bucket, lo, mn, mx) = (r.getLong(0), r.getDouble(1), r.getDouble(3), r.getDouble(4))
      assert(lo == bucket * 25000.0)
      assert(mn >= lo && mx < lo + 25000.0, s"bucket $bucket bounds violated: [$mn,$mx)")
    }
  }

  test("profile reports planted nulls, ndv, and ranges") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("prof").toString
    Seq(
      (1L, 10L, "O", 100.0, "2024-01-01 00:00:00"),
      (2L, 10L, "F", 250.0, "2024-06-01 12:00:00"),
      (3L, 20L, "O", 100.0, "2024-01-01 00:00:00"),
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp_ntz")).drop("d")
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val p = Profiling.qProfile(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(p("o_orderkey") == ((0L, 3L, Some(1.0), Some(3.0))))
    assert(p("o_custkey") == ((0L, 2L, Some(10.0), Some(20.0))))
    assert(p("o_totalprice")._2 == 2L)
    assert(p("o_orderstatus") == ((0L, 2L, None, None)))
    // epoch micros of 2024-01-01T00:00Z
    assert(p("o_orderdate")._3 == Some(1704067200000000.0.toDouble))
  }

  test("kanon flags only sub-threshold classes and attaches exact global stats") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("kanon").toString
    // class (1, "A"): 3 members (risky at k=10); class (2, "B"): 12 (safe)
    val rows = (1L to 3L).map(i => (i, s"c$i", 1, 100.0, "A")) ++
      (4L to 15L).map(i => (i, s"c$i", 2, 100.0, "B"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val out = Profiling.qKanon(spark, d).collect()
    assert(out.length == 1, "only the sub-k class is flagged")
    val r = out(0)
    assert(r.getAs[Int]("c_nationkey") == 1 && r.getAs[String]("c_mktsegment") == "A")
    assert(r.getAs[Long]("cnt") == 3L)
    assert(r.getAs[Long]("k_anon") == 3L, "dataset k-anonymity is the smallest class")
    assert(r.getAs[Long]("n_classes") == 2L)
    assert(r.getAs[Long]("risky_ppm") == 1000000L * 3 / 15)
  }

  test("abtest: planted cohort gap yields a large negative t and sane df") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ab").toString
    // even users (variant 0) around 10, odd users (variant 1) around 20 —
    // a real gap with a little within-arm variance so neither arm is
    // degenerate
    val rows = (1L to 40L).map { i =>
      val variant = i % 2
      val base = if (variant == 0) 10.0 else 20.0
      (i, "2024-01-01 00:00:00", i, "click", base + (i % 4) * 0.5, "{}")
    }
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", unix_micros(col("tss").cast("timestamp")) * 1000).drop("tss")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Profiling.qAbtest(spark, d).collect()
    assert(r.length == 1)
    val (n0, n1, m0, m1, t, df) = (r(0).getLong(1), r(0).getLong(2),
      r(0).getDouble(3), r(0).getDouble(4), r(0).getDouble(5), r(0).getDouble(6))
    assert(n0 == 20 && n1 == 20)
    assert(m0 < 11.5 && m1 > 19.5)
    assert(t < -20, s"a 10-unit gap with sub-unit variance must be decisive, got $t")
    assert(df >= math.min(n0, n1) - 1 && df <= n0 + n1 - 2, s"Welch df in range, got $df")
  }

  test("zscore flags exactly the planted outlier and no symmetric inlier") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("zsc").toString
    // 20 values at 10.0, one at 1000.0 → the spike has z >> 2.5, the rest
    // sit just below the mean with tiny |z|
    val rows = (1L to 20L).map(i => (i, "2024-01-01 00:00:00", i % 5, "click", 10.0, "{}")) :+
      ((21L, "2024-01-01 00:00:00", 0L, "click", 1000.0, "{}"))
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", unix_micros(col("tss").cast("timestamp")) * 1000).drop("tss")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val z = Profiling.qAnomalyZscore(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(z.map(_._1).toSet == Set(21L), s"only the spike is an outlier: ${z.toSeq}")
    assert(z.head._2 > 4.0)
  }

  test("correlation matrix matches Spark's built-in corr within rounding") {
    val rows = Profiling.qCorrMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 3)
    val li = Tables.lineitem(spark, sf)
    def ref(a: String, b: String): Double = li.stat.corr(a, b)
    // cent quantization shifts the inputs by <= 0.5 cent; tolerance covers it
    assert(math.abs(rows(("quantity", "extendedprice")) - ref("l_quantity", "l_extendedprice")) < 1e-4)
    assert(math.abs(rows(("quantity", "discount")) - ref("l_quantity", "l_discount")) < 1e-4)
    assert(math.abs(rows(("extendedprice", "discount")) - ref("l_extendedprice", "l_discount")) < 1e-4)
    rows.values.foreach(c => assert(c >= -1.0 && c <= 1.0))
  }

  test("chi-square cells: expecteds preserve margins, contribs nonneg, total = cell sum") {
    val rows = Profiling.qChisq(spark, sf).collect()
    val obs = rows.map(_.getLong(2)).sum.toDouble
    val exp = rows.map(_.getDouble(3)).sum
    assert(math.abs(obs - exp) < 0.01, "expected counts sum to N")
    assert(rows.forall(_.getDouble(4) >= 0.0))
    val total = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == total), "chi2_total constant across cells")
    assert(math.abs(total - rows.map(_.getDouble(4)).sum) < 1e-4)
  }

  test("fk audit matches direct anti-join counts on every edge") {
    val rows = Profiling.qFkAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val l = Tables.lineitem(spark, sf); val o = Tables.orders(spark, sf)
    assert(rows("lineitem->orders")._1 == l.count())
    assert(rows("lineitem->orders")._2 ==
      l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count())
    assert(rows.size == 3)
  }

  test("equi-depth buckets are balanced to within one row and tile the range") {
    val h = Profiling.qHistEquidepth(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(h.map(_.getLong(0)).toSeq == (1L to 8L), "exactly buckets 1..8")
    assert(h.map(_.getLong(1)).sum == n, "bucket counts must partition the table")
    val sizes = h.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1,
      s"equi-depth: sizes differ by at most one row, got ${sizes.mkString(",")}")
    // buckets tile the value axis: each bucket's hi <= next bucket's lo
    h.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2),
        s"bucket ${a.getLong(0)} hi must not exceed bucket ${b.getLong(0)} lo")
      case _ =>
    }
  }

  test("IQR outlier audit matches an in-memory Tukey fence per event type") {
    val got = Profiling.qOutlierIqr(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).toSeq.map { case (t, vs) =>
      val cs = vs.map(_._2).sorted
      val n = cs.length
      def disc(q: Double) = cs(math.ceil(n * q).toInt - 1)
      val (q1, q3) = (disc(0.25), disc(0.75))
      (t, n.toLong, q1 / 100.0, q3 / 100.0,
        cs.count(c => 2 * c < 5 * q1 - 3 * q3).toLong,
        cs.count(c => 2 * c > 5 * q3 - 3 * q1).toLong)
    }.sortBy(_._1)
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._5, x._6)).toSeq == want)
    // fences are strictly outside the box on a nondegenerate distribution
    got.foreach { case (_, n, q1, q3, lo, hi) =>
      assert(q1 <= q3 && lo + hi < n)
    }
  }

  test("skew audit: planted hot key tops the list with exact share and skew factor") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("skew").toString
    // key 7 appears 6 times; keys 1..4 once each → total 10, n_keys 5,
    // max 6. share(7) = 600000 ppm; skew = 1000·6·5/10 = 3000.
    val rows = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L, 4L)).zipWithIndex.map {
      case (pk, i) => (i.toLong, pk, 1L, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Profiling.qSkewAudit(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.head == (7L -> (6L, 600000L, 3000L)))
    assert(got.length == 5)
    assert(got.map(_._1).toSeq == Seq(7L, 1L, 2L, 3L, 4L), "desc count, key tiebreak")
  }

  test("mad outliers: hand-computed medians, zero-MAD degenerate case") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mad").toString
    // type a: cents [100,100,100,200,1000] → med 100, devs [0,0,0,100,900],
    //   MAD 0 → every dev>0 row is an outlier (2).
    // type b: cents [100,200,300,400,10000] → med 300, devs sorted
    //   [0,100,100,200,9700], MAD 100 → 6745·dev > 3.5e6 ⇔ dev ≥ 519 → 1.
    val rows =
      Seq(1.0, 1.0, 1.0, 2.0, 10.0).zipWithIndex.map { case (v, i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a", v)
      } ++ Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
        (10L + i, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2L, "b", v)
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Profiling.qAnomalyMad(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got("a") == (5L, 1.0, 0.0, 2L))
    assert(got("b") == (5L, 3.0, 1.0, 1L))
  }

  test("benford: digit census is exact and expected ppm matches log10(1+1/d)") {
    val rows = Profiling.qBenford(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val nOrders = Tables.orders(spark, sf).count()
    assert(total == nOrders, "every order contributes exactly one digit")
    rows.foreach { r =>
      val d = r.getInt(0)
      assert((1 to 9).contains(d))
      val expPpm = math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong
      assert(r.getLong(3) == expPpm)
      assert(r.getLong(4) == math.abs(r.getLong(2) - expPpm))
    }
    // obs ppm sums to ~1e6 (floor loss < 9 ppm)
    val obsSum = rows.map(_.getLong(2)).sum
    assert(obsSum > 999990L && obsSum <= 1000000L)
  }

  test("ldiversity: per-nation distinct segments recompute from raw rows") {
    val rows = Profiling.qLdiversity(spark, sf).collect()
    val raw = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val byNation = raw.groupBy(_._1)
    assert(rows.length == byNation.size)
    rows.foreach { r =>
      val grp = byNation(r.getInt(0))
      assert(r.getLong(1) == grp.length)
      val l = grp.map(_._2).filter(_ != null).distinct.length
      assert(r.getLong(2) == l)
      assert(r.getBoolean(3) == (l >= 5))
    }
  }

  test("anomaly_seasonal: the +-25% weekday screen replays in exact BigInt") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("vc")).as("y"), first(dayofweek(col("d"))).as("dow"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2), r.getInt(3)))
    val base = daily.groupBy(t => (t._1, t._4))
      .map { case (k, rs) => k -> (rs.length, rs.map(t => BigInt(t._3)).sum) }
      .filter { case (_, (n, s)) => n > 1 && s > 0 }
    val expect = daily.filter { t =>
      base.get((t._1, t._4)).exists { case (n, s) =>
        BigInt(t._3) * n * 5 < s * 4 || BigInt(t._3) * n * 4 > s * 5
      }
    }.map(t => (t._1, t._2.toString)).toSet
    val got = Profiling.qAnomalySeasonal(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(got == expect)
    assert(got.nonEmpty || expect.isEmpty)
  }

  test("seasonal_decompose: components reassemble and trend replays exactly") {
    val rows = Profiling.qSeasonalDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .groupBy(col("event_type"), col("d")).agg(sum(col("vc")).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1).map { case (t, rs) =>
      t -> rs.sortBy(_._2).map(r => (r._2, r._3))
    }
    // exact centered-7 trend per emitted row; identity daily = t + e + r
    rows.foreach { r =>
      val series = byType(r.getString(0))
      val i = series.indexWhere(_._1 == r.getDate(1).toString)
      assert(i >= 3 && i < series.length - 3, "only full centered weeks emitted")
      val t7 = series.slice(i - 3, i + 4).map(x => BigInt(x._2)).sum
      assert(math.abs(r.getDouble(3) - t7.toDouble / 700.0) < 1e-6, "trend")
      assert(math.abs(r.getDouble(2) - (r.getDouble(3) + r.getDouble(4) + r.getDouble(5))) < 2e-6,
        "daily = trend + dow_effect + residual (to rounding)")
    }
    // the weekday-effect construction centers residuals within each (type, dow)
    rows.groupBy(r => (r.getString(0), r.getDate(1).toLocalDate.getDayOfWeek)).foreach {
      case (k, rs) =>
        val mean = rs.map(_.getDouble(5)).sum / rs.length
        assert(math.abs(mean) < 1e-4, s"residual mean for $k")
    }
  }

  test("freshness: staleness and rate recompute from raw timestamps") {
    val rows = Profiling.qFreshness(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val h = raw.map(_._2).max
    val byType = raw.groupBy(_._1)
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val us = byType(r.getString(0)).map(_._2)
      assert(r.getLong(1) == us.length)
      val lagUs = h - us.max
      assert(math.abs(r.getDouble(4) - lagUs.toDouble / 86400e6) < 1e-6)
      assert(r.getBoolean(5) == (lagUs >= 172800000000L))
    }
  }

  test("acf: lag correlations replay the n-scaled BigInt closed form; lag-0 identity") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("x"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("x")).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (t, rs) =>
      val byDay = rs.map(r => r._2 -> BigInt(r._3)).toMap
      val n = BigInt(rs.length)
      val s = byDay.values.sum
      val den = n * (n * byDay.values.map(x => x * x).sum - s * s)
      if (den <= 0) Nil
      else (1 to 7).flatMap { k =>
        val pairs = byDay.toSeq.flatMap { case (d, xa) =>
          byDay.get(d.plusDays(k.toLong)).map(xb => (n * xa - s) * (n * xb - s))
        }
        if (pairs.isEmpty) Nil
        else Seq((t, k) -> (pairs.length.toLong,
          BigDecimal(pairs.sum.toDouble / den.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0))
      }
    }
    val got = Profiling.qAcf(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (np, acf) = expect((r.getString(0), r.getInt(1)))
      assert(r.getLong(2) == np, s"${r.getString(0)} lag ${r.getInt(1)}")
      assert(r.getDouble(3) == acf, s"${r.getString(0)} lag ${r.getInt(1)}")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, "ACF must lie in [-1, 1]")
    }
  }

  test("changepoint_cusum: argmax of the scaled centered prefix replays in BigInt") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("vc")).as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expect = daily.groupBy(_._1).collect {
      case (t, rs) if rs.length > 2 =>
        val sorted = rs.sortBy(_._2)
        val ss = sorted.map(r => BigInt(r._3)).sum
        val nn = sorted.length
        var p = BigInt(0)
        val cs = sorted.zipWithIndex.map { case ((_, d, y), i) =>
          p += y
          (d, nn * p - BigInt(i + 1) * ss)
        }
        val (day, c) = cs.minBy { case (d, c) => (-c.abs, d) }
        t -> (day, c.toDouble / nn / 100.0)
    }
    val got = Profiling.qChangepointCusum(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (day, cu) = expect(r.getString(0))
      assert(r.getDate(1).toString == day)
      assert(math.abs(r.getDouble(2) - cu) < 1e-6)
    }
  }

  test("tclose: hand-computed TV distances, including a group MISSING a segment") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("tclose").toString
    // global: A 3/7 → 428571 ppm, B 4/7 → 571428 ppm
    // nation 1 (A,A,B): |666666−428571| + |333333−571428| = 476190 → tv 238095, breach
    // nation 2 (A,B):   |500000−428571| + |500000−571428| = 142857 → tv 71428, ok
    // nation 3 (B,B):   |0−428571| + |1000000−571428| = 857143 → tv 428571, breach
    //   (the missing segment A contributes its FULL global share — the grid
    //    left-join is what makes that term exist at all)
    val rows = Seq((1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B"),
      (3, "B"), (3, "B"))
    rows.zipWithIndex.map { case ((nk, seg), i) => (i.toLong, nk, seg) }
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val got = Profiling.qTclose(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1, 3L, 476190L, 238095L, true),
      (2, 2L, 142857L, 71428L, false),
      (3, 2L, 857143L, 428571L, true)))
  }

  test("count_min: sketch replays cell-for-cell and never undercounts") {
    val toks = Tables.documents(spark, sf).select(col("text")).collect()
      .flatMap(_.getString(0).trim.toLowerCase.split(" ", -1)).filter(_.nonEmpty)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(j: Int, t: String): Long =
      java.lang.Long.parseLong(md5hex(s"$j:$t").take(15), 16) % 256
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    toks.foreach(t => (0 until 4).foreach { j =>
      cells((j, bucket(j, t))) += 1
    })
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
      .map { case (t, c) =>
        val est = (0 until 4).map(j => cells((j, bucket(j, t)))).min
        (t, c, est, est - c)
      }
    val got = Profiling.qCountMin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.forall(_._4 >= 0L), "a Count-Min estimate can never undercount")
  }

  test("hll_sketch: registers and integer estimate replay bit-for-bit") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keys = Tables.lineitem(spark, sf).select(col("l_partkey")).collect()
      .map(_.getLong(0))
    val regs = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    keys.foreach { k =>
      val h = java.lang.Long.parseLong(md5hex(s"hll:$k").take(15), 16)
      val (bucket, w) = (h % 256, h / 256)
      val rho = if (w == 0) 53L else 53L - java.lang.Long.toBinaryString(w).length
      regs(bucket) = math.max(regs(bucket), rho)
    }
    val nUsed = regs.size.toLong
    val rMax = regs.values.max
    val regChk = regs.map { case (b, m) => (b + 1) * m }.sum
    val sScaled = regs.values.map(m => 1L << (rMax - m)).sum +
      (256 - nUsed) * (1L << rMax.toInt)
    val est = (BigInt(718273) * 65536 * (BigInt(1) << rMax.toInt) /
      (BigInt(1000000) * sScaled)).toLong
    val nExact = keys.distinct.length.toLong
    val want = (256L, nUsed, rMax, regChk, sScaled, est, nExact,
      1000000L * math.abs(est - nExact) / nExact, est >= nExact)
    val got = Profiling.qHllSketch(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8))).toSeq
    assert(got == Seq(want), "register census + integer HLL estimate must replay")
    // mergeability: registers from two disjoint halves MAX-merge to the whole
    val halves = keys.zipWithIndex.partition(_._2 % 2 == 0)
    def regsOf(ks: Array[Long]): Map[Long, Long] = {
      val m = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      ks.foreach { k =>
        val h = java.lang.Long.parseLong(md5hex(s"hll:$k").take(15), 16)
        val rho = if (h / 256 == 0) 53L else 53L - java.lang.Long.toBinaryString(h / 256).length
        m(h % 256) = math.max(m(h % 256), rho)
      }
      m.toMap
    }
    val (ra, rb) = (regsOf(halves._1.map(_._1)), regsOf(halves._2.map(_._1)))
    val merged = (ra.keySet ++ rb.keySet).map(b =>
      b -> math.max(ra.getOrElse(b, 0L), rb.getOrElse(b, 0L))).toMap
    assert(merged == regs.toMap, "HLL registers merge by per-bucket MAX")
  }

  test("slice_finder: worst slices replay the ppm ratio rollup") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    def ratio(text: String): Long = {
      val t = text.trim.toLowerCase.split(" ", -1)
      1000000L * t.distinct.length / t.length
    }
    val perDoc = docs.map(t => (t._1, t._2, ratio(t._3)))
    val globalAvg = perDoc.map(_._3).sum / perDoc.length
    val want = perDoc.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((lang, src), xs) =>
        (lang, src, xs.length.toLong, xs.map(_._3).sum / xs.length) }
      .filter(_._3 >= 4)
      .map(t => (t._1, t._2, t._3, t._4, globalAvg, t._4 - globalAvg))
      .sortBy(t => (t._4, t._1, t._2)).take(10)
    val got = Profiling.qSliceFinder(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }

  test("psi replays the smoothed (p-q)ln(p/q) per bucket from raw counts") {
    val cut = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val raw = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(col("value"), col("ts")).collect()
      .map(r => (math.min(9L, math.floor(r.getDouble(0) / 50.0).toLong),
        r.getTimestamp(1).before(cut)))
    val nRef = (0L to 9L).map(b => raw.count(t => t._1 == b && t._2).toLong)
    val nCur = (0L to 9L).map(b => raw.count(t => t._1 == b && !t._2).toLong)
    val tRef = nRef.sum; val tCur = nCur.sum
    val want = (0 until 10).map { b =>
      val p = (nRef(b) + 1).toDouble / (tRef + 10).toDouble
      val q = (nCur(b) + 1).toDouble / (tCur + 10).toDouble
      math.floor((p - q) * math.log(p / q) * 1000000 + 0.5).toLong
    }
    val got = Profiling.qPsi(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 10)
    got.foreach { case (b, r, c, ppm, tot) =>
      assert(r == nRef(b.toInt) && c == nCur(b.toInt), s"bucket $b counts")
      assert(ppm == want(b.toInt), s"bucket $b psi term")
      assert(tot == want.sum, "headline PSI is the integer sum of terms")
    }
  }

  test("ks_drift finds the exact sup-distance between the two empirical CDFs") {
    val vals = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("event_type").isin("click", "purchase"))
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val v1 = vals.filter(_._1 == "click").map(_._2).sorted
    val v2 = vals.filter(_._1 == "purchase").map(_._2).sorted
    val pcs = (v1 ++ v2).distinct.sorted
    val scored = pcs.map { pc =>
      val c1 = v1.count(_ <= pc).toDouble / v1.length
      val c2 = v2.count(_ <= pc).toDouble / v2.length
      (pc, math.abs(c1 - c2))
    }
    val best = scored.minBy { case (pc, d) => (-d, pc) }
    val r = Profiling.qKsDrift(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n1") == v1.length && r(0).getAs[Long]("n2") == v2.length)
    assert(r(0).getAs[Long]("arg_pc") == best._1)
    assert(r(0).getAs[Long]("ks_ppm") ==
      math.floor(best._2 * 1000000 + 0.5).toLong)
  }

  test("mann_whitney: doubled-midrank U replays a brute-force rank sum") {
    val vals = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("event_type").isin("click", "purchase"))
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = vals.map(_._2).sorted
    // brute-force doubled midrank of value v: 2*(#below) + (#tied) + 1
    def rank2x(v: Long): Long = 2L * all.count(_ < v) + all.count(_ == v) + 1
    val v1 = vals.filter(_._1 == "click").map(_._2)
    val v2 = vals.filter(_._1 == "purchase").map(_._2)
    val (n1, n2) = (v1.length.toLong, v2.length.toLong)
    val r1x2 = v1.map(rank2x).sum
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val tieCubes = all.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    val r = Profiling.qMannWhitney(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n1") == n1 && r(0).getAs[Long]("n2") == n2)
    assert(r(0).getAs[Long]("u1_2x") == u1x2)
    assert(r(0).getAs[Long]("mu_2x") == n1 * n2)
    assert(r(0).getAs[Long]("delta_2x") == u1x2 - n1 * n2)
    assert(r(0).getAs[Long]("tie_cubes") == tieCubes)
    // U1 + U2 = n1*n2 identity (doubled): recompute U2 from the flipped side
    val u2x2 = v2.map(rank2x).sum - n2 * (n2 + 1)
    assert(u1x2 + u2x2 == 2 * n1 * n2, "U1 + U2 = n1*n2 must hold exactly")
  }

  test("gini: tie-folded rank formula replays a brute-force sorted Lorenz sum") {
    val totals = Tables.orders(spark, sf)
      .select(col("o_custkey"), expr("CAST(round(o_totalprice) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq.sorted
    val n = totals.length.toLong
    val sumV = totals.sum
    // replay in BigInt — the operator itself accumulates in DECIMAL(38,0)
    val twoRank = totals.zipWithIndex.map { case (v, i) => BigInt(2L * (i + 1)) * v }.sum
    val num = (twoRank - BigInt(n + 1) * sumV).toLong
    val den = (BigInt(n) * sumV).toLong
    val ppm = (BigInt(1000000) * num / den).toLong
    val r = Profiling.qGini(spark, sf).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4)) == ((n, sumV, num, den, ppm)))
    assert(num >= 0 && ppm < 1000000, "G lives in [0, 1) for positive values")
  }

  test("mutual_info: headline MI is nonnegative and cells replay from counts") {
    val cells = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val nl = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ns = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val t = cells.values.sum
    val got = Profiling.qMutualInfo(spark, sf).collect()
    got.foreach { r =>
      val (l, s, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(n == cells((l, s)))
      val want = math.floor(n.toDouble / t.toDouble
        * math.log(n.toDouble * t.toDouble / (nl(l).toDouble * ns(s).toDouble))
        * 1000000 + 0.5).toLong
      assert(r.getAs[Long]("mi_ppm") == want, s"cell ($l,$s)")
    }
    // MI of a joint distribution is >= 0 (ppm floor can shave at most
    // 0.5ppm per cell, and lang x source here is far from independent)
    assert(got.head.getAs[Long]("mi_total_ppm") >= 0L)
  }
}
