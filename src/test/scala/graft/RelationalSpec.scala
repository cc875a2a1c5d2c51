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
}
