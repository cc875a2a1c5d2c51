package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.3). The reference's
  * "incremental" model is a manual full re-load with a fresh batch stamp
  * (reference dags/create-data-lake.py:18,38,50); the streaming-native
  * re-expression is a readStream source feeding the SAME transformations the
  * batch queries use — Spark's unified Dataset API means each function below
  * accepts either a batch or a streaming DataFrame of the events schema
  * (ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, ...).
  *
  * Scale notes: watermarks bound state (late rows beyond 10 minutes are
  * dropped, closed windows evicted); without one, windowed state grows
  * unboundedly at 100 TB/day ingest. Sinks should use append mode +
  * checkpointing; state store partitioning follows
  * spark.sql.shuffle.partitions.
  */
object Streams {

  /** Tumbling 10-minute counts/sums per event type, watermarked. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 10/5-minute counts, watermarked. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))

  /** Per-user session windows, 5-minute gap, watermarked. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Stateful exact dedup by event_id within the watermark horizon —
    * the streaming twin of batch dropDuplicates. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom state machine: per-user running value totals via
    * mapGroupsWithState — arbitrary state beyond what windowed aggregation
    * expresses (the hook for sessionization with business rules, running
    * ML features, CDC merge). State lives in the state store, partitioned
    * by the group key; at 100 TB ingest the only scaling knobs are key
    * cardinality and a timeout policy (production sets
    * GroupStateTimeout.EventTimeTimeout to evict idle users; NoTimeout here
    * keeps the demo deterministic). */
  def runningUserTotals(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Double, (Long, Double)](GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val total = state.getOption.getOrElse(0.0) + rows.map(_._2).sum
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "running_total")
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension frame. The static side is planned per micro-batch (and
    * broadcast when small), so dimension updates between batches are picked
    * up automatically — no state store involved, the streaming analog of
    * the batch broadcast-dim join. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left")

  /** Stream-stream interval join: match each left event to right events of
    * the same user within [0, 10 min] after it — the impression⋈click
    * shape. BOTH sides are watermarked and the join condition bounds event
    * time in both directions; that pair of constraints is what lets the
    * state store evict rows once the watermark passes, keeping state
    * bounded at any ingest rate. Without the time bounds Spark would have
    * to buffer both streams forever. Inner join: unmatched rows simply
    * never emit (outer variants emit on watermark expiry). */
  def intervalJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("l_ts"), col("r_ts"),
        col("l_value"), col("r_value"))
  }

  /** File-source entry: tail a DIRECTORY of parquet event files as a stream
    * (the file source rejects single files; production: Kafka source, same
    * downstream plan). Applies the same nanos→micros ts normalization as
    * the batch loader. */
  def readEventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events parquet has TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession.build does)")
    spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
