package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable MinHash band-signature index — the state a streaming-ingest
  * dedup pipeline keeps BETWEEN batches, pairing the batch-vs-corpus
  * query shape ([[Dedup.qMinhashIncremental]]) with an index that
  * persists and grows by upsert instead of being re-derived per run.
  *
  * The stored record is exactly [[Dedup.bandSignatures]]' output —
  * (doc_id, band, key), 24 rows per document — so the durable path can
  * never disagree with the in-query path about what a candidate is
  * (MinhashIndexSpec pins upserted ≡ from-scratch row sets).
  *
  * 100 TB shape: the index is append-mostly parquet keyed by (band, key).
  * `upsert` is (a) idempotent — an anti-join on stored doc_ids drops
  *   re-submitted documents, so a retried batch cannot double rows — and
  * (b) batch-bounded — signature derivation runs over the NEW documents
  *   only; the corpus-sized side is one distinct-doc_id scan of the index
  *   (at production scale that scan is a bucket-pruned metadata read, or a
  *   MERGE key check in a table format with upsert semantics; plain
  *   parquet append is the harness-portable stand-in).
  * `probe` joins batch signatures against the stored index on (band, key)
  * and returns candidate pairs — the verify stage composes downstream
  * exactly as in the query twin, reading text only for candidates. */
object MinhashIndex {

  private def signatures(docs: DataFrame): DataFrame =
    Dedup.bandSignatures(Dedup.shingleTable(docs))

  /** Create (or replace) the index from an initial corpus. */
  def init(docs: DataFrame, path: String): Unit =
    signatures(docs).write.mode("overwrite").parquet(path)

  /** Add a new batch's signatures; documents already present are skipped
    * (idempotent re-ingest). Cost ∝ |batch| signatures + one doc_id scan
    * of the stored index — never corpus × corpus. */
  def upsert(spark: SparkSession, batch: DataFrame, path: String): Unit = {
    val existing = spark.read.parquet(path).select(col("doc_id")).distinct()
    signatures(batch)
      .join(existing, Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(path)
  }

  /** Candidate (doc_id, match_id) pairs for a batch against the stored
    * index: band-bucket collisions only, self-matches dropped. The caller
    * exact-verifies (Jaccard over shingles) before acting — banding never
    * admits a pair below threshold on its own. */
  def probe(spark: SparkSession, batch: DataFrame, path: String): DataFrame = {
    val idx = spark.read.parquet(path)
    signatures(batch).select(col("band"), col("key"), col("doc_id"))
      .join(idx.select(col("band"), col("key"), col("doc_id").as("match_id")),
        Seq("band", "key"))
      .filter(col("doc_id") =!= col("match_id"))
      .select(col("doc_id"), col("match_id")).distinct()
  }
}
