package graft

import graft.functions.CosineSimilarity
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("native expression equals the HOF formulation bit-for-bit") {
    val hof = Similarity.qCosineTopk(spark, sf).collect()
    val native = Similarity.qCosineTopkNative(spark, sf).collect()
    assert(hof.length == native.length)
    hof.zip(native).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getAs[Double]("cosine") == b.getAs[Double]("cosine"))
    }
  }

  test("known values: parallel=1, orthogonal=0, antiparallel=-1; zero-norm=null") {
    CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq(
      ("par",  Array(1f, 2f, 3f), Array(2f, 4f, 6f)),
      ("orth", Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      ("anti", Array(1f, 2f, 0f), Array(-1f, -2f, 0f)),
      ("zero", Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
    ).toDF("name", "a", "b").withColumn("cos", expr("cosine_sim(a, b)"))
    val m = df.collect().map(r => r.getString(0) -> Option(r.get(3))).toMap
    assert(math.abs(m("par").get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(m("orth").get.asInstanceOf[Double]) < 1e-12)
    assert(math.abs(m("anti").get.asInstanceOf[Double] + 1.0) < 1e-12)
    assert(m("zero").isEmpty)
  }

  test("expression participates in whole-stage codegen") {
    CosineSimilarity.register(spark)
    val df = Tables.embeddings(spark, sf)
      .withColumn("c", expr("cosine_sim(embedding, embedding)"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan.take(400))
  }

  test("wrong arity raises a clear error") {
    CosineSimilarity.register(spark)
    val e = intercept[Exception] {
      Tables.embeddings(spark, sf).withColumn("c", expr("cosine_sim(embedding)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.contains("2 arguments"))
  }
}
