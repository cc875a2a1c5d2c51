package graft

import graft.ops.EventAnalytics
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {

  test("funnel stages are monotonically narrowing") {
    val stages = EventAnalytics.qFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(stages("1_view") >= stages("2_click"))
    assert(stages("2_click") >= stages("3_purchase"))
  }

  test("funnel enforces strict event order, not mere co-occurrence") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("funnel").toString
    // user 1: proper order; user 2: clicked BEFORE viewing (must not count
    // past stage 1); user 3: view+click, no purchase
    Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (2L, t("2024-01-01 11:00:00"), 1L, "click"),
      (3L, t("2024-01-01 12:00:00"), 1L, "purchase"),
      (4L, t("2024-01-02 10:00:00"), 2L, "click"),
      (5L, t("2024-01-02 11:00:00"), 2L, "view"),
      (6L, t("2024-01-03 10:00:00"), 3L, "view"),
      (7L, t("2024-01-03 11:00:00"), 3L, "click"),
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      // write micros-precision ts as plain timestamp; the loader's nanos
      // normalization only applies to the harness's nanos files, so write
      // our own events dir with ts already a LongType of nanos
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val stages = EventAnalytics.qFunnel(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages("1_view") == 3)
    assert(stages("2_click") == 2, "user 2 clicked before viewing")
    assert(stages("3_purchase") == 1)
  }

  test("sessionize splits at >30min gaps and keeps boundary ties in one session") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("sess").toString
    // user 1: three events 10min apart (one session), then a 31-min gap
    // (new session); user 2: two events exactly 30min apart — NOT > gap, so
    // a single session
    Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (2L, t("2024-01-01 10:10:00"), 1L, "click"),
      (3L, t("2024-01-01 10:20:00"), 1L, "view"),
      (4L, t("2024-01-01 10:51:00"), 1L, "view"),
      (5L, t("2024-01-02 09:00:00"), 2L, "view"),
      (6L, t("2024-01-02 09:30:00"), 2L, "click"),
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val s = EventAnalytics.qSessionize(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(s.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L)), s"got ${s.keySet}")
    assert(s((1L, 1L))._3 == 3, "first session holds the three 10-min events")
    assert(s((1L, 2L))._3 == 1, "the 31-min gap opens a new session")
    assert(s((2L, 1L))._3 == 2, "exactly 30min is not > 30min — one session")
    assert(s((1L, 1L))._1 == s((1L, 1L))._2 - 1200000000L, "bounds span 20min")
  }

  test("event paths join types in time order and cap at 8 steps") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("path").toString
    // user 1: view > click > purchase in one session; a 31-min gap then a
    // lone view session; user 2: ten views — path caps at 8
    val rows =
      Seq((1L, "10:00", "view"), (2L, "10:05", "click"), (3L, "10:10", "purchase"),
        (4L, "10:50", "view")).map { case (id, hm, et) =>
        (id, t(s"2024-01-01 $hm:00"), 1L, et) } ++
      (1 to 10).map(i => (100L + i, t(f"2024-01-02 10:${i}%02d:00"), 2L, "view"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val paths = EventAnalytics.qEventPath(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(paths("view>click>purchase") == ((1L, 1L)))
    assert(paths("view") == ((1L, 1L)), "the lone post-gap view is its own session")
    assert(paths(Seq.fill(8)("view").mkString(">")) == ((1L, 1L)),
      "ten events truncate to an 8-step path")
  }

  test("gapfill densifies the calendar and carries the last value forward") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("gap").toString
    // user 1 is active Jan 1 (two events) and Jan 4 — Jan 2 and 3 are gap
    // days that must appear with n=0 and Jan 1's sum carried forward
    Seq(
      (1L, t("2024-01-01 09:00:00"), 1L, "view", 1.25, "{}"),
      (2L, t("2024-01-01 15:00:00"), 1L, "view", 2.00, "{}"),
      (3L, t("2024-01-04 09:00:00"), 1L, "view", 8.00, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = EventAnalytics.qGapfill(spark, d).collect()
      .map(r => r.getDate(1).toString -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(rows("2024-01-01") == ((2L, 3.25)))
    assert(rows("2024-01-02") == ((0L, 3.25)), "gap day carries Jan 1 forward")
    assert(rows("2024-01-03") == ((0L, 3.25)))
    assert(rows("2024-01-04") == ((1L, 8.0)))
  }

  test("cohort ltv accumulates purchase revenue per member; views never count") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("ltv").toString
    // users 1+2 first touch in the week of Mon Jan 1 (cohort size 2, only
    // user 1 ever pays); purchases of 10.00 in week 0 and 30.00 in week 2;
    // user 2 contributes only a view, which must not add revenue
    Seq(
      (1L, t("2024-01-02 09:00:00"), 1L, "purchase", 10.00, "{}"),
      (2L, t("2024-01-03 09:00:00"), 2L, "view", 99.99, "{}"),
      (3L, t("2024-01-16 09:00:00"), 1L, "purchase", 30.00, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = EventAnalytics.qCohortLtv(spark, d).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getAs[Double]("week_revenue"),
        r.getAs[Double]("ltv_per_member")))).toMap
    assert(rows.keySet == Set(0, 2), "revenue exists only at offsets 0 and 2")
    assert(rows(0) == ((1L, 10.0, 5.0)), "10.00 over 2 members = 5.00 each")
    assert(rows(2) == ((1L, 30.0, 20.0)), "cumulative 40.00 over 2 members")
  }

  test("interpolate fills gap days linearly between the enclosing active days") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("interp").toString
    // user 1: active Jan 1 (sum 10.00) and Jan 4 (sum 40.00) — Jan 2 and 3
    // interpolate to 20.00 and 30.00; user 2 has no gaps (degenerate spine)
    Seq(
      (1L, t("2024-01-01 09:00:00"), 1L, "view", 4.00, "{}"),
      (2L, t("2024-01-01 15:00:00"), 1L, "view", 6.00, "{}"),
      (3L, t("2024-01-04 09:00:00"), 1L, "view", 40.00, "{}"),
      (4L, t("2024-01-02 09:00:00"), 2L, "view", 7.50, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = EventAnalytics.qInterpolate(spark, d).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(rows.keySet.count(_._1 == 1L) == 4, "user 1 spine covers Jan 1-4")
    assert(rows((1L, "2024-01-01")) == ((2L, 10.0, 0)))
    assert(rows((1L, "2024-01-02")) == ((0L, 20.0, 1)), "1/3 of the way 10->40")
    assert(rows((1L, "2024-01-03")) == ((0L, 30.0, 1)), "2/3 of the way 10->40")
    assert(rows((1L, "2024-01-04")) == ((1L, 40.0, 0)))
    assert(rows((2L, "2024-01-02")) == ((1L, 7.5, 0)), "single-day spine intact")
  }

  test("retention week-0 cell equals each cohort's size; offsets non-negative") {
    val ret = EventAnalytics.qRetention(spark, sf)
    assert(ret.filter(col("week_offset") < 0).count() == 0)
    // every user is active in their own first week, so the offset-0 cells
    // partition the full user population
    val week0 = ret.filter(col("week_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(week0 == users)
  }

  test("scd2: contiguous versions, changing attrs, one current row, events conserved") {
    val byUser = EventAnalytics.qScd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(4),
        r.isNullAt(5), r.getBoolean(6)))
      .groupBy(_._1)
    val eventCounts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byUser.foreach { case (user, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, "versions contiguous from 1")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3, s"consecutive versions must differ: $user")
        case _ => ()
      }
      assert(sorted.count(_._6) == 1 && sorted.last._6, "exactly the last version is current")
      assert(sorted.count(_._5) == 1, "exactly one open-ended interval")
      assert(sorted.map(_._4).sum == eventCounts(user), "every event lands in one version")
    }
  }

  test("throttle dedup follows the chained recurrence, not the naive lag-gap rule") {
    // in-memory replay equality on real data
    val got = EventAnalytics.qThrottleDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      var lastKept = Long.MinValue
      es.sortBy(e => (e._3, e._2)).flatMap { case (_, eid, tus) =>
        if (lastKept == Long.MinValue || tus - lastKept > 600000000L) {
          lastKept = tus; Some((u, eid))
        } else None
      }
    }.toSet
    assert(got == want)
    // burst 0min/5min/12min: the chain keeps {0, 12} (12 > 10 from last KEPT
    // at 0); a lag-gap rule would keep only {0} (12-5=7 < 10) — decisions
    // must chain off kept events, not previous rows
    val user = events.head._1
    val bursts = Set(0L, 5L, 12L).map(m => m * 60000000L)
    val replay = bursts.toSeq.sorted.foldLeft((Long.MinValue, Set.empty[Long])) {
      case ((last, kept), t) =>
        if (last == Long.MinValue || t - last > 600000000L) (t, kept + t) else (last, kept)
    }._2
    assert(replay == Set(0L, 12L * 60000000L))
  }

  test("scd2 snapshot returns each user's version in force at the probe instant") {
    val probe = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val snap = EventAnalytics.qScd2Snapshot(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val hist = EventAnalytics.qScd2(spark, sf)
      .select(col("user_id"), col("attr"), col("version"),
        col("valid_from").cast("string"), col("valid_to").cast("string"))
      .collect()
    val expected = hist
      .filter(r => java.sql.Timestamp.valueOf(r.getString(3)).compareTo(probe) <= 0)
      .groupBy(_.getLong(0)).view
      .mapValues(_.maxBy(_.getLong(2))).toMap
    assert(snap.keySet == expected.keySet)
    snap.foreach { case (user, (attr, ver)) =>
      val e = expected(user)
      assert(attr == e.getString(1) && ver == e.getLong(2), s"user $user")
      // interval really covers the probe: next version (if any) starts after it
      val to = if (e.isNullAt(4)) None else Some(java.sql.Timestamp.valueOf(e.getString(4)))
      assert(to.forall(_.compareTo(probe) > 0), s"probe inside interval for $user")
    }
  }

  test("attribution: last touch within 7 days, else organic; revenue in exact cents") {
    val got = EventAnalytics.qAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // independent reference: plain-Scala per-user replay
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val lookback = 7L * 24 * 3600 * 1000000L
    val attributed = rows.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      sorted.zipWithIndex.collect {
        case ((_, _, "purchase", tus, v), i) =>
          val touch = sorted.take(i).reverse
            .find(e => e._3 == "click" || e._3 == "view")
          val channel = touch match {
            case Some((_, _, t, ttus, _)) if tus - ttus <= lookback => t
            case _ => "none"
          }
          (channel, v.map(x => math.round(x * 100)).getOrElse(0L))
      }
    }.toSeq
    val want = attributed.groupBy(_._1).toSeq.map { case (ch, ps) =>
      // mirror the query's arithmetic: exact cent sum, ONE double division,
      // then HALF_UP on the double (BigDecimal.decimal = valueOf semantics,
      // what Spark's Round applies to DoubleType)
      (ch, ps.size.toLong,
        Some(BigDecimal.decimal(ps.map(_._2).sum.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.sortBy(_._1)
    assert(got.toSeq == want, "attribution must agree channel for channel")
  }

  test("conversion lag buckets match a per-user replay; pre-touch purchases never count") {
    val got = EventAnalytics.qConversionLag(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val hourUs = 3600L * 1000000L
    // sequential replay in the window's exact (tus, event_id) order: a
    // purchase only sees touches that sort BEFORE-or-AT it, so a
    // same-microsecond tie resolves identically to the running-min window
    val lags = rows.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      var runFt = Option.empty[Long]
      var best = Option.empty[Long]
      sorted.foreach {
        case (_, _, t, tus) if t == "click" || t == "view" =>
          if (runFt.isEmpty) runFt = Some(tus)
        case (_, _, "purchase", tus) if runFt.nonEmpty =>
          val lag = tus - runFt.get
          if (best.forall(lag < _)) best = Some(lag)
        case _ => ()
      }
      best
    }.toSeq
    assert(lags.nonEmpty, "fixture must contain at least one conversion")
    val want = lags.groupBy { l =>
      if (l < hourUs) "a_under_1h"
      else if (l < 24 * hourUs) "b_1h_to_1d"
      else if (l < 7 * 24 * hourUs) "c_1d_to_7d"
      else "d_over_7d"
    }.toSeq.map { case (b, ls) =>
      (b, ls.size.toLong,
        BigDecimal.decimal(ls.sum.toDouble / ls.size / hourUs)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("active users: trailing-28d MAU counts distinct users, stickiness exact") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("dau").toString
    // user 1 active Mar 1 (twice — one day) and Mar 11; user 2 active Mar 1.
    // Mar 1: DAU 2, MAU 2 → 1000000 ppm. Mar 11: DAU 1, MAU 2 → 500000.
    Seq(
      (1L, t("2024-03-01 10:00:00"), 1L), (2L, t("2024-03-01 15:00:00"), 1L),
      (3L, t("2024-03-01 11:00:00"), 2L), (4L, t("2024-03-11 09:00:00"), 1L),
    ).toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = EventAnalytics.qActiveUsers(spark, d).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows == Map(
      "2024-03-01" -> (2L, 2L, 1000000L),
      "2024-03-11" -> (1L, 2L, 500000L)))
  }

  test("cart sessions: same user converts in one session, abandons in another") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("cart").toString
    // user 1 session A: view+click+purchase (converted); then a 31-min gap;
    // session B: view+click only (abandoned). user 2: lone error session.
    Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (2L, t("2024-01-01 10:05:00"), 1L, "click"),
      (3L, t("2024-01-01 10:10:00"), 1L, "purchase"),
      (4L, t("2024-01-01 10:42:00"), 1L, "view"),
      (5L, t("2024-01-01 10:43:00"), 1L, "click"),
      (6L, t("2024-01-02 09:00:00"), 2L, "error"),
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val census = EventAnalytics.qCartSessions(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(census == Map((1, 1, 1) -> 1L, (1, 1, 0) -> 1L, (0, 0, 0) -> 1L))
  }

  test("win_streak: islands split on missing days; multi-event days count once") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("streak").toString
    // user 1: days 1,2,3 then 5,6 → best 3; two events on day 2 (one day).
    // user 2: days 1, 3, 5 → best 1. user 3: day 9 only → best 1.
    Seq(
      (1L, t("2024-03-01 10:00:00"), 1L), (2L, t("2024-03-02 09:00:00"), 1L),
      (3L, t("2024-03-02 22:00:00"), 1L), (4L, t("2024-03-03 01:00:00"), 1L),
      (5L, t("2024-03-05 12:00:00"), 1L), (6L, t("2024-03-06 12:00:00"), 1L),
      (7L, t("2024-03-01 08:00:00"), 2L), (8L, t("2024-03-03 08:00:00"), 2L),
      (9L, t("2024-03-05 08:00:00"), 2L),
      (10L, t("2024-03-09 23:59:59"), 3L),
    ).toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val census = EventAnalytics.qWinStreak(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census == Map(1L -> 2L, 3L -> 1L))
  }

  test("windowed funnel: chain must fit in 4h of its FIRST event, later chains count") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("wfunnel").toString
    Seq(
      // user 1: full chain inside 4h → stage 3
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (2L, t("2024-01-01 11:00:00"), 1L, "click"),
      (3L, t("2024-01-01 13:00:00"), 1L, "purchase"),
      // user 2: view→click fast, purchase 10h after the view → stage 2 only
      (4L, t("2024-01-01 10:00:00"), 2L, "view"),
      (5L, t("2024-01-01 10:30:00"), 2L, "click"),
      (6L, t("2024-01-01 20:00:00"), 2L, "purchase"),
      // user 3: first chain too slow, but a LATER view restarts a fast
      // chain — windowFunnel measures from the chain start, not first view
      (7L, t("2024-01-01 00:00:00"), 3L, "view"),
      (8L, t("2024-01-01 09:00:00"), 3L, "view"),
      (9L, t("2024-01-01 10:00:00"), 3L, "click"),
      (10L, t("2024-01-01 11:00:00"), 3L, "purchase"),
      // user 4: click precedes every view → stage 1 only
      (11L, t("2024-01-01 10:00:00"), 4L, "click"),
      (12L, t("2024-01-01 11:00:00"), 4L, "view"),
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val stages = EventAnalytics.qFunnelWindow(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages("1_view") == 4)
    assert(stages("2_click_4h") == 3, "users 1, 2, 3")
    assert(stages("3_purchase_4h") == 2, "users 1 and 3; user 2's purchase is outside 4h")
  }

  test("ohlc bars: open/close by total time order, exact integer mean") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("ohlc").toString
    Seq(
      (1L, t("2024-01-01 09:00:00"), 1L, "trade", 10.0),
      (2L, t("2024-01-01 12:00:00"), 1L, "trade", 40.0),
      (3L, t("2024-01-01 16:00:00"), 1L, "trade", 25.0),
      // same-microsecond tie: event_id must break it, 5 is the close
      (4L, t("2024-01-02 16:00:00"), 1L, "trade", 7.0),
      (5L, t("2024-01-02 16:00:00"), 1L, "trade", 9.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val bars = EventAnalytics.qOhlc(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("d").toString -> r).toMap
    val d1 = bars("2024-01-01")
    assert(d1.getAs[Double]("open") == 10.0 && d1.getAs[Double]("close") == 25.0)
    assert(d1.getAs[Double]("high") == 40.0 && d1.getAs[Double]("low") == 10.0)
    assert(d1.getAs[Long]("mean_micro") == 25000000L)
    val d2 = bars("2024-01-02")
    assert(d2.getAs[Double]("open") == 7.0 && d2.getAs[Double]("close") == 9.0,
      "same-timestamp tie must resolve by event_id")
    assert(d2.getAs[Long]("mean_micro") == 8000000L)
  }

  test("seq_pattern: per-user path strings and regex matches replay in plain Scala") {
    val rows = graft.ops.EventAnalytics.qSeqPattern(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("funnel_vcp", "error_recovery", "bounce"))
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "substring(event_type,1,1)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).map { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).mkString }
    val pats = Map("funnel_vcp" -> "^.*v[^p]*c[^p]*p.*$",
      "error_recovery" -> "^.*e.*p.*$", "bounce" -> "^.$")
    pats.foreach { case (name, re) =>
      val m = paths.count(_.matches(re)).toLong
      val (nu, nm, rate) = rows(name)
      assert(nu == paths.size.toLong, s"n_users for $name")
      assert(nm == m, s"n_match for $name")
      assert(rate == m.toDouble / paths.size.toDouble)
    }
  }
}
