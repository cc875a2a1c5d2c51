package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the conf an operator of this engine should
  * run with, at laptop or cluster scale. Everything here is about shuffle
  * and scan economics (SURVEY.md §4.2):
  *
  *  - shuffle.partitions sized to the parallelism actually available
  *    (default 200 is wrong in both directions: too many tiny tasks on a
  *    laptop, usually too few on a 1000-executor cluster — pass cores ×
  *    executors × 2-3 there). AQE coalesces down when partitions run small.
  *  - AQE on with skew-join splitting: runtime re-planning beats any static
  *    estimate at 100 TB; pathological keys beyond AQE's split threshold use
  *    [[graft.ops.Scale.saltedJoin]].
  *  - 256 MiB scan partitions: big enough to amortize task overhead against
  *    columnar parquet scans, small enough to fit comfortably in executor
  *    memory with room for a hash aggregate.
  *  - UTC session timezone: all date logic timezone-pure (the DuckDB oracle
  *    and any cross-system consumer agree).
  */
object GraftSession {

  def build(master: String, parallelism: Int,
      appName: String = "graft",
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    // getOrCreate silently ignores static confs (master!) on an existing
    // session while still applying runtime confs — a half-reconfigured
    // session is worse than an error, so refuse a master mismatch outright.
    SparkSession.getDefaultSession.filter(s => !s.sparkContext.isStopped)
      .foreach { existing =>
        val m = existing.sparkContext.master
        require(m == master,
          s"a SparkSession with master '$m' already exists; cannot rebuild as '$master'")
      }
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${256 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); set at build time so no
      // loader has to mutate session conf as a read side effect
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed tables written one-file-per-bucket + sortBy should satisfy
      // a merge join's ordering without re-sorting; Spark disables the
      // sorted-scan property by default (SPARK-28595 — the one-file check
      // costs a listing) and this engine opts back in: it only affects
      // scans of bucketed tables, and the q_join_bucketed layout is written
      // to satisfy it (see Joins.qJoinBucketed)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    graft.functions.CosineSimilarity.register(s)
    s
  }

  /** The local entry-point shape Verify/Bench/Profile/Explain share: every
    * session conf lives in [[build]], so a new shared conf is a one-line
    * change instead of an edit to six hand-rolled builders. */
  def buildLocal(cpus: String, appName: String,
      extraConf: Map[String, String] = Map.empty): SparkSession =
    build(s"local[$cpus]", cpus.toInt, appName,
      Map("spark.ui.enabled" -> "false") ++ extraConf)
}
