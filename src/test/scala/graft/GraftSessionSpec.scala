package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("session factory applies scale confs and registers engine functions") {
    // All suites share one JVM-wide session: create the canonical test
    // session FIRST (so its static confs — temp warehouse dir, no UI —
    // win), snapshot the runtime confs build() touches, and restore them
    // so other suites aren't order-dependent on this one.
    val shared = SparkSpec.session
    val touched = Seq("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled", "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.files.maxPartitionBytes", "spark.sql.session.timeZone")
    val saved = touched.map(k => k -> shared.conf.getOption(k)).toMap
    try {
      val s = GraftSession.build("local[4]", parallelism = 4, appName = "graft-test")
      assert(s.conf.get("spark.sql.shuffle.partitions") == "4")
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.files.maxPartitionBytes") == (256 * 1024 * 1024).toString)
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      val r = s.sql(
        "SELECT cosine_sim(array(CAST(3 AS FLOAT)), array(CAST(7 AS FLOAT))) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
      // master mismatch must refuse, not half-reconfigure
      val e = intercept[IllegalArgumentException] {
        GraftSession.build("local[2]", parallelism = 2)
      }
      assert(e.getMessage.contains("already exists"))
    } finally saved.foreach {
      case (k, Some(v)) => shared.conf.set(k, v)
      case (k, None)    => shared.conf.unset(k)
    }
  }

  test("events loader normalizes ts to TimestampType on the HARNESS data") {
    // Round-4 regression: the generator switched events.ts from
    // TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) and a loader hard-wired to
    // the nanos encoding silently dropped 49 queries from the correctness
    // gate. Pin the contract — whatever encoding the harness ships, the
    // loader must yield a non-empty TimestampType column — on the real
    // files, not a fixture, so the NEXT encoding change fails here first.
    import org.apache.spark.sql.types.TimestampType
    val spark = SparkSpec.session
    for (sf <- Seq("0.001", "0.01")) {
      val dir = s"/root/testdata/sf$sf"
      if (new java.io.File(s"$dir/events.parquet").exists()) {
        val ev = Tables.events(spark, dir)
        assert(ev.schema("ts").dataType == TimestampType, s"sf$sf ts type")
        assert(ev.select("ts").filter("ts IS NOT NULL").limit(1).count() == 1L,
          s"sf$sf events readable")
      }
    }
    // Both legacy encodings still normalize: long nanos and NTZ micros.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val asNanos = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    val normNanos = Tables.normalizeTs(asNanos)
    assert(normNanos.schema("ts").dataType == TimestampType)
    // the in-range nanos value actually converts (guard lets it through)
    assert(normNanos.select("ts").filter("ts IS NOT NULL").count() == 1L)
    val asNtz = Seq((1L, "2024-01-01 10:00:00")).toDF("event_id", "s")
      .withColumn("ts", to_timestamp_ntz(col("s"))).drop("s")
    assert(Tables.normalizeTs(asNtz).schema("ts").dataType == TimestampType)
    // A LongType ts whose magnitude is NOT plausible nanos (here:
    // epoch-MICROS, the silent-drift case the round-4 incident warns
    // about) must fail LOUDLY at execution, not divide 1000x off.
    val asMicros = Seq((1L, 1700000000123456L)).toDF("event_id", "ts")
    val ex = intercept[Exception] {
      Tables.normalizeTs(asMicros).select("ts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("epoch-nanos")),
      s"expected the plausibility guard to fire, got: $ex")
  }
}
