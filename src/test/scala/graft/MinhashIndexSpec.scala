package graft

import graft.ops.{Dedup, MinhashIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The durable band index must be indistinguishable from the from-scratch
  * signature derivation after any sequence of init/upsert — otherwise the
  * ingest path and the batch dedup path would disagree about candidates. */
class MinhashIndexSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("doc_id").cast("long"), col("band").cast("long"), col("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("two-batch upsert reproduces the from-scratch index; re-upsert is a no-op") {
    val path = java.nio.file.Files.createTempDirectory("mh_index").toString + "/idx"
    val d = docs
    val batch1 = d.filter(col("doc_id") % 3 =!= 0)
    val batch2 = d.filter(col("doc_id") % 3 === 0)
    MinhashIndex.init(batch1, path)
    MinhashIndex.upsert(spark, batch2, path)
    val upserted = rows(spark.read.parquet(path))
    val scratch = rows(Dedup.bandSignatures(Dedup.shingleTable(d)))
    assert(upserted == scratch,
      "index after init+upsert must equal the from-scratch signature table")
    // idempotence: re-ingesting a batch (the retry case) must change nothing
    MinhashIndex.upsert(spark, batch2, path)
    assert(rows(spark.read.parquet(path)) == scratch,
      "re-upserting an already-ingested batch must be a no-op")
  }

  test("LIVE streaming ingest across forced micro-batches equals the from-scratch index") {
    val tmp = java.nio.file.Files.createTempDirectory("mh_stream").toString
    val stage = s"$tmp/in"; val cp = s"$tmp/cp"; val path = s"$tmp/idx"
    val d = docs
    MinhashIndex.init(d.filter(col("doc_id") % 3 === 0), path)
    // stage the remainder as TWO parquet files; maxFilesPerTrigger=1 turns
    // each into its own micro-batch, so the foreachBatch upsert runs ≥2×
    d.filter(col("doc_id") % 3 =!= 0).repartition(2).write.parquet(stage)
    val stream = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = graft.streaming.Streams.startMinhashIngest(stream, path, cp)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "the split must actually exercise ≥2 non-empty micro-batches")
    assert(rows(spark.read.parquet(path)) ==
      rows(Dedup.bandSignatures(Dedup.shingleTable(d))),
      "streamed index must equal the from-scratch signature table")
  }

  test("probe returns exactly the band-collision candidates of the query twin") {
    val path = java.nio.file.Files.createTempDirectory("mh_probe").toString + "/idx"
    val d = docs
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
    val batch = d.filter(col("doc_id") % 10 === 0)
    MinhashIndex.init(corpus, path)
    val got = MinhashIndex.probe(spark, batch, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the non-durable derivation q_minhash_incremental candidates from
    val sig = Dedup.bandSignatures(Dedup.shingleTable(d))
    val want = sig.filter(col("doc_id") % 10 === 0)
      .select(col("band"), col("key"), col("doc_id").as("d1"))
      .join(sig.filter(col("doc_id") % 10 =!= 0)
        .select(col("band"), col("key"), col("doc_id").as("d2")), Seq("band", "key"))
      .select("d1", "d2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "durable probe and in-query banding must agree")
    assert(got.nonEmpty, "sf0.001 corpus must produce at least one candidate")
  }
}
