package graft

import graft.ops.Joins
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
}
