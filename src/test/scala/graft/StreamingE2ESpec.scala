package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** End-to-end streaming over the real file source: tail the events parquet
  * as a stream, run the shared windowed transform, and check the streamed
  * result equals the batch plan over the same data — Spark's unified
  * Dataset API contract, exercised for real.
  */
class StreamingE2ESpec extends SparkSpec {

  /** The file source wants a directory; stage the events parquet into one. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("file-source stream of events equals batch tumbling counts") {
    val q = Streams.tumblingCounts(Streams.readEventsStream(spark, eventsDir))
      .writeStream.format("memory").queryName("e2e_tumble")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("e2e_tumble")
    val batch = Streams.tumblingCounts(Tables.events(spark, sf))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("session windows via file stream conserve events") {
    val q = Streams.sessionCounts(Streams.readEventsStream(spark, eventsDir))
      .writeStream.format("memory").queryName("e2e_session")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("e2e_session").agg(sum("n_events")).collect()(0).getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }

  test("cosine_sim resolves in pure SQL after registration") {
    // The withExtensions path can't be exercised in-JVM (getOrCreate returns
    // the shared session); GraftExtensions delegates to the same
    // (ident, info, builder) triple the runtime path registers, so SQL-level
    // resolution through the analyzer is the behavior under test.
    new graft.plans.GraftExtensions() // constructs cleanly
    graft.functions.CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c").collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
