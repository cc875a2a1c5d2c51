package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("flagship entry returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("order_month", "city_like", "revenue", "n_lines"))
  }

  test("every query key has a builder that runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("q_dropna leaves no nulls in subset columns (R5 semantics)") {
    val df = Relational.qDropna(spark, sf)
    assert(df.filter(col("city_like").isNull || col("code_like").isNull).count() == 0)
    // and it actually dropped something (synthesized nulls existed)
    assert(df.count() < Tables.lineitem(spark, sf).count())
  }

  test("q_fillna maps blank/null to 0.0 and keeps all rows (R6 semantics)") {
    val df = Relational.qFillna(spark, sf)
    assert(df.count() == Tables.lineitem(spark, sf).count())
    assert(df.filter(col("rate_filled").isNull).count() == 0)
    // rows with linenumber % 4 in (0,1,2) must be exactly 0.0
    val zeros = df.filter(col("l_linenumber") % 4 =!= 3)
    assert(zeros.filter(col("rate_filled") =!= 0.0).count() == 0)
  }

  test("q_dedup_key keeps exactly one row per key, the first by linenumber") {
    val df = Relational.qDedupKey(spark, sf)
    assert(df.groupBy("l_orderkey").count().filter(col("count") > 1).count() == 0)
  }

  test("merge upsert: updates win, inserts append, untouched rows pass through") {
    import org.apache.spark.sql.functions._
    val base = Tables.orders(spark, sf)
    val merged = graft.ops.Relational.qMergeUpsert(spark, sf)
    val nUpd = base.filter(col("o_orderkey") % 100 === 0).count()
    val nIns = base.filter(col("o_orderkey") % 500 === 0).count()
    assert(merged.count() == base.count() + nIns, "inserts append, updates replace")
    assert(merged.filter(col("o_orderstatus") === "U").count() == nUpd)
    assert(merged.filter(col("o_orderstatus") === "N").count() == nIns)
    // an updated key carries the bumped price, not the base price
    val k = base.filter(col("o_orderkey") % 100 === 0).select("o_orderkey", "o_totalprice")
      .collect().head
    val got = merged.filter(col("o_orderkey") === k.getLong(0)).collect().head
    assert(got.getDouble(2) == k.getDouble(1) * 1.1)
  }

  test("q_topk is the 10 highest totalprice orders") {
    val rows = Relational.qTopk(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("q_limit is deterministic: first 20 orderkeys") {
    val keys = Relational.qLimit(spark, sf).collect().map(_.getLong(0))
    assert(keys.length == 20 && keys.sameElements(keys.sorted))
  }

  test("schema evolution: merged read reconciles the missing column as null, sums survive") {
    val got = Relational.qSchemaEvolution(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("value")).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1)))
    val cut = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val (early, late) = ev.partition(_._1.before(cut))
    val lateSum = late.map { case (_, v) => math.floor(v * 1000000 + 0.5).toLong }.sum
    assert(got(1) == ((early.length.toLong, 0L, 0L)),
      "pre-evolution rows must surface the new column as NULL (count 0, sum 0)")
    assert(got(2) == ((late.length.toLong, late.length.toLong, lateSum)))
  }

  test("purge cascade: censuses match brute-force key chasing and leave no orphans") {
    val got = Relational.qPurgeCascade(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val cust = Tables.customer(spark, sf).select("c_custkey").collect().map(_.getLong(0))
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val li = Tables.lineitem(spark, sf).select("l_orderkey").collect().map(_.getLong(0))
    val erased = cust.filter(_ % 97 == 0).toSet
    val purgedOrders = orders.filter(o => erased(o._2)).map(_._1).toSet
    val purgedLi = li.count(purgedOrders)
    assert(got("customer") == ((cust.length.toLong, erased.size.toLong,
      (cust.length - erased.size).toLong)))
    assert(got("orders") == ((orders.length.toLong, purgedOrders.size.toLong,
      (orders.length - purgedOrders.size).toLong)))
    assert(got("lineitem") == ((li.length.toLong, purgedLi.toLong,
      (li.length - purgedLi).toLong)))
    // cascade completeness: a surviving lineitem's order must survive too
    val survivingOrders = orders.map(_._1).toSet -- purgedOrders
    assert(li.filterNot(purgedOrders).forall(survivingOrders),
      "no lineitem may survive whose order was purged")
  }

  test("cdc diff op counts match an independent full-outer-join snapshot diff") {
    val got = Relational.qCdcDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // independent reference: materialize both snapshots and diff them the
    // naive way (full outer join), i.e. a genuinely different plan shape
    val o = Tables.orders(spark, sf).select(col("o_custkey"),
      to_date(col("o_orderdate")).as("od"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    def snap(lo: String, hi: String) =
      o.filter(col("od") >= lit(lo).cast("date") && col("od") < lit(hi).cast("date"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"), sum("cents").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = snap("1996-07-01", "1997-01-01")
    val b = snap("1997-01-01", "1997-07-01")
    val ops = (a.keySet ++ b.keySet).toSeq.map { k =>
      val op = (a.get(k), b.get(k)) match {
        case (None, Some(_))                  => "insert"
        case (Some(_), None)                  => "delete"
        case (Some(x), Some(y)) if x != y     => "update"
        case _                                => "unchanged"
      }
      val delta = b.get(k).map(_._2).getOrElse(0L) - a.get(k).map(_._2).getOrElse(0L)
      (op, delta)
    }
    val want = ops.groupBy(_._1).toSeq.map { case (op, xs) =>
      (op, xs.size.toLong,
        BigDecimal.decimal(xs.map(_._2).sum.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.map(_._1).toSet.subsetOf(Set("insert", "delete", "update", "unchanged")))
  }

  test("zorder: files partition the rows, z-ranges are disjoint, cells replay the interleave") {
    val rows = graft.ops.Relational.qZorder(spark, sf).collect()
    val ords = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("CAST(o_custkey % 16 AS BIGINT)", "CAST((year(o_orderdate)*12 + month(o_orderdate)) % 16 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def morton(cb: Long, tb: Long): Long =
      (0 until 4).map(i => (((cb >> i) & 1) << (2 * i + 1)) | (((tb >> i) & 1) << (2 * i))).sum
    val byFile = ords.map { case (cb, tb) => (morton(cb, tb) / 16, (cb, tb, morton(cb, tb))) }
      .groupBy(_._1)
    assert(rows.map(_.getLong(1)).sum == ords.length.toLong)
    rows.foreach { r =>
      val g = byFile(r.getLong(0)).map(_._2)
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.map(_._3).min && r.getLong(3) == g.map(_._3).max)
      assert(r.getLong(4) == g.map(x => (x._1, x._2)).distinct.length.toLong)
    }
    // z-contiguous files: ranges must not overlap
    val ranges = rows.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo); case _ => () }
  }
}
