package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  test("native operator matches the window formulation row for row") {
    val native = graft.ops.Windows.qTopkPerGroupNative(spark, sf)
      .withColumn("rn", col("rn").cast("int"))
    val window = graft.ops.Windows.qTopkPerGroup(spark, sf)
    assert(native.count() == window.count())
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("plan contains the custom exec and exactly one exchange, on the group key") {
    val df = graft.ops.Windows.qTopkPerGroupNative(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    assert(!plan.contains("!TopKPerGroup"),
      s"exec must declare rn as produced (no missing-input marker):\n$plan")
    // exactly ONE hash exchange (the group key); the trailing range
    // exchange belongs to the cosmetic output orderBy
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("c_nationkey"),
      s"expected exactly the group-key exchange:\n$plan")
    assert(!plan.contains("Window"), s"no window/sort fallback allowed:\n$plan")
  }

  test("k exceeding the group size returns whole groups with dense ranks") {
    import spark.implicits._
    val df = Seq((1, 10, 1L), (1, 20, 2L), (2, 5, 3L))
      .toDF("g", "v", "id")
    val out = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), k = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(3))).toSet
    assert(out == Set((1, 20, 1L), (1, 10, 2L), (2, 5, 1L)))
  }

  test("heap keeps the best k under a total order, replacing worse rows") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, i, i.toLong)).toDF("g", "v", "id")
    val out = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(3)))
    val expected = (1 to 100).groupBy(_ % 3).flatMap { case (g, vs) =>
      vs.sorted(Ordering[Int].reverse).take(2).zipWithIndex
        .map { case (v, i) => (g, v, (i + 1).toLong) }
    }.toSet
    assert(out.toSet == expected)
  }

  test("null group keys form their own group, matching window semantics") {
    import spark.implicits._
    val df = Seq((Some(1), 10, 1L), (None, 20, 2L), (None, 5, 3L))
      .toDF("g", "v", "id")
    val out = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), k = 1)
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0), r.getInt(1))).toSet
    assert(out == Set((1, 10), (-1, 20)))
  }
}
