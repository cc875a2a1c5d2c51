package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE north-star; SURVEY.md §2.5): treat
  * image/audio/video payloads as opaque BinaryType columns with a typed
  * metadata struct, and run decode / feature-extract / frame-sample as
  * distributed per-partition passes.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * `featurizeStub` computes a deterministic byte-histogram standing in for
  * a real decoder (swap the body for JNI/FFI image decode in production).
  * Everything around it — the binary column, metadata struct, partitioned
  * mapPartitions batch shape, frame slicing — is the real Spark plumbing and
  * is tested.
  *
  * Scale notes: binary payloads ride the same columnar scan as everything
  * else (Parquet stores them contiguously; column pruning means queries not
  * touching `bytes` never read them). Feature extraction is mapPartitions —
  * one JVM pass per partition, no shuffle, scaling linearly with executors.
  * Frame sampling is pure expression work (substring on binary) inside
  * codegen.
  */
object Multimodal extends QueryModule {

  val FrameBytes = 256

  final case class DocBlob(doc_id: Long, bytes: Array[Byte])
  final case class DocFeatures(doc_id: Long, features: Array[Float])

  /** Attach the opaque binary column + typed metadata struct. The harness
    * has no true binary payloads, so document text bytes stand in — the
    * schema and plumbing are what is being exercised. */
  def withBinary(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bytes", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("bytes")).as("n_bytes"),
        ceil(octet_length(col("bytes")) / lit(FrameBytes.toDouble)).cast("int")
          .as("n_frames")))

  /** STUB decoder: 16-bin byte histogram, L1-normalized — deterministic
    * stand-in for image/audio feature extraction. Real plumbing: typed
    * Dataset, mapPartitions batch shape, Array[Float] feature column. */
  def featurizeStub(blobs: Dataset[DocBlob]): Dataset[DocFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { blob =>
        val hist = new Array[Float](16)
        blob.bytes.foreach(b => hist((b & 0xFF) >> 4) += 1f)
        val total = math.max(blob.bytes.length, 1).toFloat
        DocFeatures(blob.doc_id, hist.map(_ / total))
      }
    }
  }

  /** STUB resize: downsample a feature vector to `bins` by averaging
    * adjacent pairs — the deterministic stand-in for image resize (which in
    * production operates on decoded pixels via the same mapPartitions
    * shape). */
  def resizeStub(feats: Dataset[DocFeatures], bins: Int): Dataset[DocFeatures] = {
    import feats.sparkSession.implicits._
    feats.mapPartitions { it =>
      it.map { f =>
        val factor = math.max(f.features.length / bins, 1)
        val out = f.features.grouped(factor).map(g => g.sum / g.length).toArray
        DocFeatures(f.doc_id, out.take(bins))
      }
    }
  }

  /** End-to-end: binary column → typed Dataset → stub featurizer. */
  def features(spark: SparkSession, dir: String): Dataset[DocFeatures] = {
    import spark.implicits._
    featurizeStub(withBinary(spark, dir)
      .select(col("doc_id"), col("bytes")).as[DocBlob])
  }

  /** Frame-sample: slice the payload into fixed FrameBytes frames, keep
    * every 4th — pure codegen'd expression work on binary. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    withBinary(spark, dir)
      // empty payloads guard: sequence(0, -1) is DESCENDING [0, -1], which
      // would fabricate frames for a zero-byte payload
      .withColumn("frames", expr(
        s"""CASE WHEN meta.n_frames <= 0 THEN array()
           |ELSE filter(
           |  transform(sequence(0, meta.n_frames - 1),
           |    i -> substring(bytes, i * $FrameBytes + 1, $FrameBytes)),
           |  (f, i) -> i % 4 = 0)
           |END""".stripMargin))
      .select(col("doc_id"), col("meta"), col("frames"),
        size(col("frames")).as("n_sampled"))

  /** Metadata projection — the oracle-checkable face of the binary schema. */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    withBinary(spark, dir)
      .select(col("doc_id"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"), col("meta.n_frames").as("n_frames"))
      .orderBy(col("doc_id"))

  /** Frame sampling as a query key: per payload, total frames, the
    * every-4th-frame sample count, AND md5 digests of the first and last
    * sampled frames — so the binary slicing itself is oracle-verified
    * byte-for-byte, not just the frame-count arithmetic. The Spark side
    * REALLY slices the binary (substring frames inside codegen —
    * [[frameSample]]) and hashes the HEX of each frame; the oracle replays
    * the same slice on `hex(encode(text))` (byte offset i maps to hex-char
    * offset 2i; both engines' hex is uppercase, and tail truncation
    * shortens both identically), so any off-by-one in the frame substring
    * flips the hash. The count contract (kept = ceil(n_frames/4)) is what
    * a video pipeline budgets storage and GPU batches against. */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir)
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"),
        col("n_sampled"),
        when(col("n_sampled") > 0, md5(hex(element_at(col("frames"), 1))))
          .as("first_frame_md5"),
        when(col("n_sampled") > 0, md5(hex(element_at(col("frames"), -1))))
          .as("last_frame_md5"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      s"""SELECT doc_id, 'application/octet-stream' AS mime,
        |       OCTET_LENGTH(ENCODE(text)) AS n_bytes,
        |       CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / $FrameBytes.0) AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      s"""WITH m AS (
        |  SELECT doc_id, hex(ENCODE(text)) AS h,
        |         CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / $FrameBytes.0) AS INTEGER)
        |           AS n_frames
        |  FROM documents)
        |SELECT doc_id, n_frames,
        |       CAST(CASE WHEN n_frames <= 0 THEN 0
        |                 ELSE CAST(CEIL(n_frames / 4.0) AS INTEGER) END AS INTEGER)
        |         AS n_sampled,
        |       CASE WHEN n_frames <= 0 THEN NULL
        |            ELSE md5(SUBSTRING(h, 1, ${2 * FrameBytes})) END
        |         AS first_frame_md5,
        |       CASE WHEN n_frames <= 0 THEN NULL
        |            ELSE md5(SUBSTRING(h,
        |              ((n_frames - 1) // 4) * 4 * ${2 * FrameBytes} + 1,
        |              ${2 * FrameBytes})) END
        |         AS last_frame_md5
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
