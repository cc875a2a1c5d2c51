package graft

import graft.ops.Reshape
import org.apache.spark.sql.functions._

class ReshapeSpec extends SparkSpec {

  test("pivot-unpivot round trip conserves total revenue") {
    val pivotTotal = Reshape.qPivot(spark, sf)
      .agg(sum(coalesce(col("status_f"), lit(0.0)) + coalesce(col("status_o"), lit(0.0))))
      .collect()(0).getDouble(0)
    val unpivotTotal = Reshape.qUnpivot(spark, sf)
      .agg(sum("revenue")).collect()(0).getDouble(0)
    assert(math.abs(pivotTotal - unpivotTotal) < 1e-6)
  }

  test("correlated subquery decorrelates (no per-row subplans) and counts sanely") {
    val df = Reshape.qSqlSubquery(spark, sf)
    val total = df.agg(sum("n_above_avg")).collect()(0).getLong(0)
    assert(total > 0 && total < Tables.orders(spark, sf).count())
    // decorrelation proof: the only joins this query can contain are the
    // ones Catalyst synthesized from the correlated subquery (orders joined
    // with its per-custkey aggregate)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"correlated subquery must decorrelate into a join:\n$plan")
  }

  test("stratified sample is seeded-deterministic and roughly proportioned") {
    val a = Reshape.qSampleStratified(spark, sf).collect().map(_.getLong(0))
    val b = Reshape.qSampleStratified(spark, sf).collect().map(_.getLong(0))
    assert(a.sameElements(b), "same seed must give the same sample")
    val byStratum = Reshape.qSampleStratified(spark, sf)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf)
    val en = docs.filter(col("lang") === "en").count()
    val other = docs.filter(col("lang") =!= "en").count()
    // Bernoulli sampling: expect ~50% / ~10% within loose bounds
    assert(byStratum.getOrElse("en", 0L) <= en)
    if (en >= 20)
      assert(math.abs(byStratum.getOrElse("en", 0L).toDouble / en - 0.5) < 0.25)
    if (other >= 50)
      assert(math.abs(byStratum.getOrElse("other", 0L).toDouble / other - 0.1) < 0.1)
  }
}
