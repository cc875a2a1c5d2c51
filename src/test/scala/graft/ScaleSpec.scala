package graft

import graft.ops.Scale
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("bucketed join plans without an Exchange on either side") {
    Scale.writeBucketed(Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "li_bucketed", "l_orderkey", 4)
    Scale.writeBucketed(Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice"),
      "o_bucketed", "o_orderkey", 4)
    // sf0.001 tables fit the broadcast threshold, which would bypass the
    // bucket-join path entirely — disable broadcast to exercise the plan
    // shape that matters at scale (SMJ over co-located buckets, no shuffle).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed fact-fact join must not shuffle:\n" + plan.linesIterator.take(10).mkString("\n"))
      // and it's still the correct join
      val expected = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("date-partitioned writes prune to matching partitions at scan time") {
    val out = java.nio.file.Files.createTempDirectory("events-part").toString + "/events"
    Scale.writePartitioned(
      Tables.events(spark, sf).withColumn("day", to_date(col("ts"))),
      out, "day")
    val q = spark.read.parquet(out).filter(col("day") === lit("2024-01-01").cast("date"))
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter must prune partitions, not rows: $scan")
    // and day never reaches PushedFilters (it's a directory, not a column)
    assert(!scan.replaceAll(".*PushedFilters", "").contains("day"))
  }

  test("salted join returns exactly the rows of the plain join") {
    val fact = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    val dim  = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val plain  = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    val salted = Scale.saltedJoin(fact, dim, "l_orderkey", "o_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.select(fact.columns.map(col) ++ dim.columns.map(col): _*)
      .except(plain).count() == 0)
  }

  test("salted join spreads a pathological hot key across salt buckets") {
    import spark.implicits._
    val hotFact = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val dim = Seq((42L, "only")).toDF("dk", "name")
    val salted = hotFact.withColumn("_salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8)).cast("int"))
    val nBuckets = salted.select("_salt").distinct().count()
    assert(nBuckets == 8, s"hot key should fan out to all 8 salts, got $nBuckets")
    assert(Scale.saltedJoin(hotFact, dim, "k", "dk", 8).count() == 1000)
  }
}
