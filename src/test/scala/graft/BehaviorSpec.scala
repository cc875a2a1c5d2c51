package graft

import graft.ops.{Behavior, Dedup}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class BehaviorSpec extends SparkSpec {

  private def lineitemDir(rows: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("basket").toString
    rows.zipWithIndex.map { case ((ok, pk), i) =>
      (ok, pk, 1L, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("basket lift: hand-computed pair, min-support filter, dup lines collapse") {
    // baskets: {A,B} ×3 (one with a duplicated A line — must not double-count),
    // {A,B,C}? no: {C} alone. Pair (A,B) support 3; (A,C)/(B,C) never co-occur.
    val d = lineitemDir(Seq(
      (1L, 100L), (1L, 100L), (1L, 200L),
      (2L, 100L), (2L, 200L),
      (3L, 100L), (3L, 200L),
      (4L, 300L)))
    val rows = Behavior.qBasketLift(spark, d).collect()
    assert(rows.length == 1, "only (A,B) clears min support 3")
    val r = rows.head
    assert(r.getLong(0) == 100L && r.getLong(1) == 200L)
    assert(r.getLong(2) == 3L)                       // c_ab
    assert(r.getLong(3) == 3L && r.getLong(4) == 3L) // c1, c2
    // lift = N·c_ab/(c1·c2) = 4·3/9
    assert(math.abs(r.getDouble(5) - 1.333333) < 1e-9)
  }

  test("markov: transitions stay inside sessions; ppm is floor division") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("markov").toString
    // user 1, one session: view→view→click; then a 31-min gap breaks the
    // chain, new session: purchase (no transition crosses the gap).
    Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (2L, t("2024-01-01 10:05:00"), 1L, "view"),
      (3L, t("2024-01-01 10:10:00"), 1L, "click"),
      (4L, t("2024-01-01 10:42:00"), 1L, "purchase"),
      // user 2: click→view (order matters, reverse of user 1's pair)
      (5L, t("2024-01-02 09:00:00"), 2L, "click"),
      (6L, t("2024-01-02 09:10:00"), 2L, "view"),
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val m = Behavior.qMarkov(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m.keySet == Set(("view", "view"), ("view", "click"), ("click", "view")))
    assert(m(("view", "view")) == (1L, 500000L))
    assert(m(("view", "click")) == (1L, 500000L))
    assert(m(("click", "view")) == (1L, 1000000L))
    assert(!m.contains(("click", "purchase")), "31-min gap must break the chain")
  }

  test("rfm: five strictly-ordered customers land on the score diagonal") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("rfm").toString
    // customer k: k orders of $1000 on day base+k → rec_days = 5-k,
    // freq = k, monetary = k·100000 cents. All three dims strictly ordered,
    // so the quintile thresholds are the four smallest values and customer k
    // scores exactly (k, k, k).
    val rows = for {
      k <- 1 to 5
      i <- 1 to k
    } yield (k * 100L + i, k.toLong, "O", 1000.0,
      Timestamp.valueOf(f"2024-01-${k + 10}%02d 00:00:00"), "1-URGENT")
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val cells = Behavior.qRfm(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getString(3), r.getLong(4), r.getLong(5))).toMap
    assert(cells.keySet == (1 to 5).map(k => (k, k, k)).toSet)
    assert(cells((1, 1, 1)) == ("hibernating", 1L, 100000L))
    assert(cells((2, 2, 2)) == ("hibernating", 1L, 200000L))
    assert(cells((3, 3, 3)) == ("core", 1L, 300000L))
    assert(cells((4, 4, 4)) == ("champions", 1L, 400000L))
    assert(cells((5, 5, 5)) == ("champions", 1L, 500000L))
  }

  test("rfm cells partition the customer base at sf0.001") {
    val cells = Behavior.qRfm(spark, sf).collect()
    val nCustomers = Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(cells.map(_.getLong(4)).sum == nCustomers)
    assert(cells.forall { r =>
      (1 to 5).contains(r.getInt(0)) &&
        (1 to 5).contains(r.getInt(1)) && (1 to 5).contains(r.getInt(2))
    })
  }

  test("audience overlap: hand-computed jaccard, empty-audience guard") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("aud").toString
    // u1: click+view, u2: click, u3: view, u4: purchase; error/signup empty
    Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "click"),
      (2L, t("2024-01-01 10:01:00"), 1L, "view"),
      (3L, t("2024-01-01 10:02:00"), 2L, "click"),
      (4L, t("2024-01-01 10:03:00"), 3L, "view"),
      (5L, t("2024-01-01 10:04:00"), 4L, "purchase"),
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .withColumn("ts", (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val m = Behavior.qAudienceOverlap(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m.size == 10)
    assert(m("click|view") == (1L, 3L, 333333L))
    assert(m("click|purchase") == (0L, 3L, 0L))
    assert(m("error|signup") == (0L, 0L, 0L), "empty∪empty must not divide by zero")
    assert(m("purchase|view") == (0L, 3L, 0L))
  }

  test("pareto: hand-computed concentration thresholds") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("pareto").toString
    // revenues (cents): 5000, 3000, 1000, 500, 500 — total 10000.
    // Desc walk: cum 5000 (50% at 1 customer), 8000 (80% at 2), 9000,
    // 9500, 10000 (90% needs 3).
    Seq((1L, 1L, 50.0), (2L, 2L, 30.0), (3L, 3L, 10.0),
        (4L, 4L, 5.0), (5L, 5L, 5.0))
      .map { case (ok, ck, price) =>
        (ok, ck, "O", price,
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT")
      }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val rows = Behavior.qPareto(spark, d).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(50) == (1L, 200000L))
    assert(rows(80) == (2L, 400000L))
    assert(rows(90) == (3L, 600000L))
  }

  test("growth: integral-division ppm agrees with DuckDB semantics on negative weeks") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("growth").toString
    // three Mondays: 100.00 → 150.00 (+50%) → 100.00 (−1/3). Both engines
    // TRUNCATE integral division toward zero (Spark div ≡ DuckDB //,
    // verified empirically), so −1/3 ppm is −333333, not floor's −333334.
    Seq((1L, 1L, 100.0, "2024-03-04"), (2L, 1L, 150.0, "2024-03-11"),
        (3L, 1L, 100.0, "2024-03-18"))
      .map { case (ok, ck, p, day) =>
        (ok, ck, "O", p, java.sql.Timestamp.valueOf(s"$day 00:00:00"), "1-URGENT")
      }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val rows = Behavior.qGrowth(spark, d).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rows("2024-03-04") == (10000L, None))
    assert(rows("2024-03-11") == (15000L, Some(500000L)))
    assert(rows("2024-03-18") == (10000L, Some(-333333L)),
      "negative growth must TRUNCATE toward zero in both engines")
  }

  test("Kaplan-Meier survival matches an in-memory integer recursion; S is non-increasing") {
    val got = Behavior.qSurvivalKm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val dayUs = 86400000000L
    val per = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tus")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(ts => (ts.map(_._2).min, ts.map(_._2).max)).toMap
    val maxUs = per.values.map(_._2).max
    val lives = per.values.toSeq.map { case (f, l) =>
      ((l - f) / dayUs, l < maxUs - 14 * dayUs)
    }
    val days = lives.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.count(_._2).toLong)
    }
    val total = days.map(_._2).sum
    var exited = 0L
    var s = 1000000L
    val want = days.map { case (t, nEnter, d) =>
      val nRisk = total - exited
      exited += nEnter
      s = s * (nRisk - d) / nRisk
      (t, nRisk, d, 1000000L * d / nRisk, s)
    }
    assert(got.toSeq == want, "the floor-quantized KM recursion must agree term for term")
    assert(got.map(_._5).sliding(2).forall {
      case Array(a, b) => b <= a; case _ => true
    }, "survival must be non-increasing")
    assert(got.forall(r => r._4 >= 0 && r._4 <= 1000000L))
  }

  test("paragraph dedup: keep-first across docs, intra-doc repeats dropped") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("paradedup").toString
    def seg(c: Char) = (1 to 16).map(i => s"$c$i").mkString(" ")
    val s1 = seg('a'); val s2 = seg('b'); val s3 = seg('c')
    Seq(
      (1L, s"$s1 $s2", "en", "src0"),
      (2L, s"$s1 $s3", "en", "src0"), // s1 is doc1's — dropped here
      (3L, s"$s1 $s1", "en", "src0"), // both copies lose to doc1
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Dedup.qDedupParagraph(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (2L, 2L, s"$s1 $s2"))
    assert(out(2L) == (2L, 1L, s3))
    assert(out(3L) == (2L, 0L, ""))
  }

  test("paragraph dedup reassembles surviving text in original segment order") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("paraorder").toString
    def seg(c: Char) = (1 to 16).map(i => s"$c$i").mkString(" ")
    val segs = Seq(seg('a'), seg('b'), seg('c'), seg('d'))
    Seq((1L, segs.mkString(" "), "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Dedup.qDedupParagraph(spark, d).collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getString(3) == segs.mkString(" "), "order must be chunk_idx order")
  }
}
