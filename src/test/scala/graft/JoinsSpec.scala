package graft

import graft.ops.{Joins, Scale}
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  test("semi + anti partition the customer table") {
    val total = Tables.customer(spark, sf).count()
    val semi  = Joins.qJoinSemi(spark, sf).count()
    val anti  = Joins.qJoinAnti(spark, sf).count()
    assert(semi + anti == total)
  }

  test("left join keeps every customer exactly once") {
    assert(Joins.qJoinLeft(spark, sf).count() == Tables.customer(spark, sf).count())
  }

  test("broadcast join plan actually broadcasts the dims") {
    val plan = Joins.qJoinBroadcast(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("range join buckets cover all orders exactly once") {
    val n = Joins.qJoinRange(spark, sf).agg(sum("n")).collect()(0).getLong(0)
    assert(n == Tables.orders(spark, sf).count())
  }

  test("asof picks at most one row per order, all shipped before pivot") {
    val df = Joins.qAsof(spark, sf)
    assert(df.groupBy("l_orderkey").count().filter(col("count") > 1).count() == 0)
    assert(df.filter(col("asof_date") > lit("1997-06-30")).count() == 0)
  }

  test("star join revenue is positive for every region-year") {
    assert(Joins.qJoinStar(spark, sf).filter(col("revenue") <= 0).count() == 0)
  }

  test("full outer join keeps one-sided nations with NULL other side") {
    val df = Joins.qJoinFull(spark, sf).cache()
    try {
      // union of both sides' key sets, each exactly once
      val cKeys = Tables.customer(spark, sf).filter(col("c_acctbal") > 9500)
        .select(col("c_nationkey")).distinct().collect()
        .map(_.getAs[Number](0).longValue).toSet
      val sKeys = Tables.supplier(spark, sf).filter(col("s_acctbal") > 9500)
        .select(col("s_nationkey")).distinct().collect()
        .map(_.getAs[Number](0).longValue).toSet
      val rows = df.collect()
      assert(rows.map(_.getAs[Number](0).longValue).toSet == (cKeys ++ sKeys))
      assert(rows.length == (cKeys ++ sKeys).size)
      // a key on one side only must carry a null for the other side
      rows.foreach { r =>
        val k = r.getAs[Number](0).longValue
        assert(r.isNullAt(1) == !cKeys.contains(k))
        assert(r.isNullAt(2) == !sKeys.contains(k))
      }
    } finally df.unpersist()
  }

  test("nullsafe join preserves every order row, including the nulled class") {
    val rows = Joins.qJoinNullsafe(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf)
    // total-preserving: a plain = join would lose the 3-MEDIUM (nulled) rows
    assert(rows.values.sum == o.count())
    assert(rows("unspecified") == o.filter(col("o_orderpriority") === "3-MEDIUM").count())
  }

  test("bucketed join equals the plain join — the layout round trip loses nothing") {
    val got = Joins.qJoinBucketed(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .select(col("c_mktsegment"), col("n"),
        round(col("cents").cast("double") / 100.0, 2))
      .orderBy(col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("stale-bucketed sweep never deletes a directory whose name lacks a _p<pid> suffix") {
    val tmp = System.getProperty("java.io.tmpdir")
    // Malformed names: no pid suffix at all, and a non-numeric tail. Their
    // ownership cannot be established, so the sweep must SKIP them — a
    // lastIndexOf-based parse used to misread these and delete them.
    val noPid = new java.io.File(tmp, "graft_bucketed_orphan")
    val badPid = new java.io.File(tmp, "graft_bucketed_x_pabc")
    // Well-formed with a certainly-dead pid: MUST be reclaimed.
    val dead = new java.io.File(tmp, "graft_bucketed_y_p999999999")
    try {
      Seq(noPid, badPid, dead).foreach(f => assert(f.mkdir(), s"setup: $f"))
      Joins.qJoinBucketed(spark, sf).collect(): Unit
      assert(noPid.exists, "suffix-free name must be skipped, not deleted")
      assert(badPid.exists, "non-numeric pid tail must be skipped, not deleted")
      assert(!dead.exists, "well-formed dead-pid layout must be reclaimed")
    } finally Seq(noPid, badPid, dead).foreach(_.delete())
  }

  test("nearest-asof picks exactly one line per order at minimal day distance") {
    val df = Joins.qAsofNearest(spark, sf).cache()
    try {
      assert(df.groupBy("l_orderkey").count().filter(col("count") > 1).count() == 0)
      assert(df.count() == Tables.lineitem(spark, sf).select("l_orderkey").distinct().count())
      // brute-force the minimal |shipdate - (orderdate+30d)| per order
      val brute = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .withColumn("days_off",
          abs(datediff(col("l_shipdate"), expr("o_orderdate + INTERVAL 30 DAYS"))))
        .groupBy(col("l_orderkey").as("k")).agg(min("days_off").as("best"))
      assert(df.join(brute, col("l_orderkey") === col("k"))
        .filter(col("days_off") =!= col("best")).count() == 0)
    } finally df.unpersist()
  }

  test("bloom-pruned join equals the plain semi join and the bloom rejects most non-matches") {
    // equivalence: the bloom stage is semantically invisible
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
      .select(col("o_orderkey"))
    val plain = Tables.lineitem(spark, sf)
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
    val got = Joins.qJoinBloom(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    val want = plain.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.sameElements(want))
    // pruning power: measure the bloom stage directly — no false negatives,
    // and the false-positive overhang stays under 5% of the fact table
    val fact = Tables.lineitem(spark, sf)
    val pruned = Scale.bloomPrune(fact, "l_orderkey", dim, "o_orderkey", 1 << 18)
    val nFact = fact.count()
    val nPruned = pruned.count()
    val nMatch = fact.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(nPruned >= nMatch, "a bloom filter never drops a true match")
    assert(nPruned - nMatch <= nFact / 20,
      s"false-positive overhang too large: $nPruned pruned vs $nMatch true of $nFact")
  }

  test("interval overlap join counts each overlapping same-supplier pair exactly once") {
    val got = Joins.qJoinInterval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // brute force over all same-supplier pairs
    val ship = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01").cast("date")).as("sd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val want = ship.groupBy(_._1).view.mapValues { ls =>
      (for {
        a <- ls; b <- ls
        if a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)
        if math.abs(a._4 - b._4) <= 2
      } yield 1).size.toLong
    }.toSeq.filter(_._2 > 0).sortBy { case (k, n) => (-n, k) }.take(100)
    assert(got.toSeq == want, "pair counts must agree per supplier")
  }

  test("join cardinality estimates replay the uniform formula against measured truth") {
    val rows = Joins.qJoinCardEst(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("customer-orders", "orders-lineitem", "part-lineitem"))
    rows.foreach { r =>
      val (nl, nr, dl, dr) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (est, actual) = (r.getLong(5), r.getLong(6))
      assert(est == nl * nr / math.max(dl, dr), "textbook estimate replays")
      assert(r.getLong(7) == 1000000L * math.abs(est - actual) / actual)
    }
    // FK sanity pins the measured side: every lineitem names a real order,
    // so the orders⋈lineitem truth is exactly |lineitem|.
    val li = Tables.lineitem(spark, sf).count()
    assert(rows(1).getLong(6) == li)
    // and with ndv(orders.o_orderkey) = |orders| ≥ ndv(l_orderkey), the
    // uniform estimate of an FK join is exact on this key
    assert(rows(1).getLong(5) == li && rows(1).getLong(7) == 0L)
  }
}
