package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal optimistic-concurrency transaction log — the atomic-commit
  * protocol a lakehouse table format (Delta/Iceberg) wraps around the
  * plain-parquet maintenance jobs this repo already ships
  * ([[Scale.compact]], `q_compaction_plan`, `q_ivm_agg`): data files are
  * immutable; each commit writes `_txnlog/v<N>.txt` listing the table's
  * LIVE files after version N; and version N is claimed atomically via
  * put-if-absent file creation (`Files.createFile` throws if vN exists —
  * the same primitive Delta uses on object stores). A writer that loses
  * the race re-reads the new head, REVALIDATES its intent against it, and
  * retries at the next version; a compaction whose base files are no
  * longer live must abort (its rewrite would resurrect replaced data).
  *
  * 100 TB shape: commits move KILOBYTES (file lists), never data; readers
  * pin a version (snapshot isolation — a long scan never sees a torn mix
  * of pre- and post-compaction files) and time-travel by reading an older
  * log entry. The certificate key `q_txn_commit` races an append against
  * a stale-base compaction and proves isolation via per-version row/
  * checksum censuses (content invariant under compaction, append adds
  * exactly the batch). */
object TxnLog {

  private def logDir(path: String) = java.nio.file.Paths.get(path, "_txnlog")
  private def vFile(path: String, v: Long) = logDir(path).resolve(s"v$v.txt")

  /** Highest committed version, or -1 for an empty log. */
  def headVersion(path: String): Long = {
    val d = logDir(path).toFile
    if (!d.exists()) -1L
    else d.listFiles().map(_.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toLong }
      .foldLeft(-1L)(math.max)
  }

  /** Live data files (absolute paths) at `version`. */
  def liveFiles(path: String, version: Long): Seq[String] =
    java.nio.file.Files.readAllLines(vFile(path, version))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)

  /** Snapshot read pinned at `version` — time travel. */
  def read(spark: SparkSession, path: String, version: Long): DataFrame =
    spark.read.parquet(liveFiles(path, version): _*)

  /** Atomically claim `version` with the given live-file list. Returns
    * false if another writer already committed that version (the
    * put-if-absent race loss). */
  private def tryCommit(path: String, version: Long, live: Seq[String]): Boolean = {
    java.nio.file.Files.createDirectories(logDir(path))
    val tmp = java.nio.file.Files.createTempFile(logDir(path), s"v$version", ".tmp")
    java.nio.file.Files.writeString(tmp, live.mkString("\n"))
    // claim the version name with a move that fails if the target exists
    // (Files.move without REPLACE_EXISTING — the put-if-absent / atomic
    // conditional-PUT primitive a real table format runs on)
    try {
      java.nio.file.Files.move(tmp, vFile(path, version))
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        java.nio.file.Files.deleteIfExists(tmp); false
    }
  }

  private val writeSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Write `df` as `nFiles` parquet files under an unclaimed subdirectory
    * and return their paths — data lands BEFORE any commit references it,
    * so a lost race leaves only unreferenced files (GC'd by vacuum),
    * never a torn table. The dir name carries a process-unique sequence
    * number: nanoTime alone can collide across writer threads (observed
    * as a 1-in-N flake in the threaded-append test), and two writers
    * sharing a data dir interleave their part files into both commits. */
  private def writeData(df: DataFrame, path: String, tag: String, nFiles: Int): Seq[String] = {
    val dir = s"$path/data/${tag}_${System.nanoTime()}_${writeSeq.incrementAndGet()}"
    df.repartition(nFiles).write.parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq.sorted
  }

  /** Create the table: version 0 holds `df` as `nFiles` files. */
  def init(df: DataFrame, path: String, nFiles: Int): Long = {
    val files = writeData(df, path, "init", nFiles)
    require(tryCommit(path, 0L, files), s"table already exists at $path")
    0L
  }

  /** Append `df` (as one file): read head, claim head+1 retrying on race
    * losses — an append conflicts with nothing (it only adds files), so
    * revalidation always passes. Returns (committedVersion, attempts). */
  def append(df: DataFrame, path: String): (Long, Int) = {
    val files = writeData(df, path, "append", 1)
    var attempts = 0
    var v = headVersion(path) + 1
    while (true) {
      attempts += 1
      if (tryCommit(path, v, liveFiles(path, v - 1) ++ files)) return (v, attempts)
      v = headVersion(path) + 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Compact the files that were live at `baseVersion` into one file and
    * commit optimistically — FIRST attempting baseVersion+1 (the stale
    * head this writer believed in), then revalidating against the real
    * head on each race loss: every base file must still be live there
    * (an appended file is fine; a missing base file means another rewrite
    * won and this one must abort). Returns (committedVersion, attempts).
    */
  def compactFrom(spark: SparkSession, path: String, baseVersion: Long): (Long, Int) = {
    val base = liveFiles(path, baseVersion)
    val compacted = writeData(read(spark, path, baseVersion), path, "compact", 1)
    var attempts = 0
    var v = baseVersion + 1
    while (true) {
      attempts += 1
      val headLive = liveFiles(path, v - 1)
      require(base.forall(headLive.contains),
        s"conflict: a base file was replaced since v$baseVersion — aborting compaction")
      if (tryCommit(path, v, headLive.diff(base) ++ compacted)) return (v, attempts)
      v = headVersion(path) + 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** All data files ever written under the table root (live or not). */
  def allDataFiles(path: String): Seq[String] = {
    val dataRoot = java.nio.file.Paths.get(path, "data").toFile
    if (!dataRoot.exists()) Seq.empty
    else dataRoot.listFiles().toSeq.flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
  }

  /** VACUUM: physically delete data files referenced by NO version ≥
    * `keepFromVersion`, then drop the older log entries — the retention
    * GC every table format schedules after rewrites (a compaction leaves
    * its replaced base files on disk so time travel keeps working; vacuum
    * is the moment that grace expires). Returns (removedFiles,
    * retainedFiles). Readers pinned at a retained version are unaffected
    * — exactly the Delta/Iceberg contract: vacuum shrinks HISTORY, never
    * the present. */
  def vacuum(path: String, keepFromVersion: Long): (Seq[String], Seq[String]) = {
    val head = headVersion(path)
    require(keepFromVersion >= 0 && keepFromVersion <= head,
      s"retention boundary v$keepFromVersion outside [0, v$head]")
    val retained = (keepFromVersion to head).flatMap(v => liveFiles(path, v)).distinct
    val removed = allDataFiles(path).diff(retained)
    removed.foreach(f => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)))
    (0L until keepFromVersion).foreach(v =>
      java.nio.file.Files.deleteIfExists(vFile(path, v)))
    (removed, retained)
  }
}
