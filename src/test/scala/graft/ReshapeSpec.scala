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

  test("recursive CTE rollup replays an in-memory ancestor walk exactly") {
    val got = Reshape.qSqlRecursive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Int, BigInt)]
    parts.foreach { case (k, cents) =>
      var a = k; var d = 0
      while (a > 0) {
        a = a / 10; d += 1
        if (a >= 1 && a <= 99) {
          val (n, md, s) = acc.getOrElse(a, (0L, 0, BigInt(0)))
          acc(a) = (n + 1, math.max(md, d), s + cents)
        }
      }
    }
    val want = acc.toSeq.map { case (cat, (n, md, s)) =>
      (cat, n, md, s.toDouble / 100.0) }.sortBy(_._1)
    assert(got.toSeq == want, "recursion must roll every ancestor up exactly")
    assert(got.nonEmpty && got.forall(_._3 >= 1), "every category is a proper ancestor")
  }

  test("LATERAL top-3 equals the window-ranked top-3 per customer") {
    val got = Reshape.qSqlLateral(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, -t._3, t._2))
    assert(got.toSeq == want.toSeq,
      "the decorrelated lateral limit must equal the hand-built ranked window")
    assert(got.groupBy(_._1).values.forall(_.size <= 3))
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

  test("sample split: exhaustive census near 80/10/10; assignment is append-stable") {
    val census = Reshape.qSampleSplit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val total = Tables.documents(spark, sf).count()
    assert(census.keySet == Set("train", "val", "test"))
    assert(census.values.map(_._1).sum == total, "splits partition the corpus")
    assert(math.abs(census("train")._2 - 800000L) < 100000L)
    // append-stability: membership is a pure function of doc_id, so the
    // same doc must land in the same split when computed on any subset —
    // the no-leakage guarantee an appended corpus depends on
    val d = java.nio.file.Files.createTempDirectory("split").toString
    Tables.documents(spark, sf).filter(col("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val subsetTrain = Reshape.qSampleSplit(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // recompute the subset's expected census from the full assignment
    import org.apache.spark.sql.functions.{col => c}
    val u32 = conv(substring(md5(concat(lit("split:"), c("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val expected = Tables.documents(spark, sf).filter(c("doc_id") % 3 === 0)
      .withColumn("split",
        when(u32 < 3435973836L, "train").when(u32 < 3865470565L, "val").otherwise("test"))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(subsetTrain == expected, "subset assignments must equal full-corpus assignments")
  }
}
