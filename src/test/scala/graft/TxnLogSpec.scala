package graft

import graft.ops.TxnLog
import org.apache.spark.sql.functions._

/** The commit protocol behind q_txn_commit: put-if-absent versioning,
  * snapshot-pinned reads, revalidate-and-retry on race loss, and the
  * mandatory abort when a compaction's base files were replaced. */
class TxnLogSpec extends SparkSpec {

  private def evs = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("event_type"))

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/tbl"

  test("append then stale-base compaction: retry commits, content invariant") {
    val path = freshPath("txn_race")
    val base = evs.filter(col("event_id") % 5 =!= 0)
    val batch = evs.filter(col("event_id") % 5 === 0)
    assert(TxnLog.init(base, path, nFiles = 4) == 0L)
    val (v1, a1) = TxnLog.append(batch, path)
    assert(v1 == 1L && a1 == 1)
    // B planned against v0 before A's commit; its first claim (v1) loses
    val (v2, a2) = TxnLog.compactFrom(spark, path, baseVersion = 0L)
    assert(v2 == 2L && a2 == 2, s"compaction must pay exactly one retry, got v$v2/$a2")
    // snapshot isolation: v2 content == v1 content, layout 5 -> 2 files
    assert(TxnLog.liveFiles(path, 1L).size == 5 && TxnLog.liveFiles(path, 2L).size == 2)
    val c1 = TxnLog.read(spark, path, 1L)
    val c2 = TxnLog.read(spark, path, 2L)
    assert(c2.count() == c1.count())
    assert(c2.exceptAll(c1).isEmpty && c1.exceptAll(c2).isEmpty)
    // time travel: v0 is exactly the pre-append table
    val c0 = TxnLog.read(spark, path, 0L)
    assert(c0.count() == base.count())
    assert(c0.exceptAll(base).isEmpty && base.exceptAll(c0).isEmpty)
  }

  test("a compaction whose base files were replaced must abort") {
    val path = freshPath("txn_abort")
    TxnLog.init(evs.filter(col("event_id") % 5 =!= 0), path, nFiles = 4)
    // first compaction of v0 wins and replaces the base files at v1
    val (v1, _) = TxnLog.compactFrom(spark, path, baseVersion = 0L)
    assert(v1 == 1L)
    // a second rewrite of the SAME stale v0 base must refuse to commit:
    // committing would resurrect the replaced files' data alongside v1's
    val e = intercept[IllegalArgumentException] {
      TxnLog.compactFrom(spark, path, baseVersion = 0L)
    }
    assert(e.getMessage.contains("conflict"))
    // and the failed writer changed nothing: head is still v1
    assert(TxnLog.headVersion(path) == 1L)
  }

  test("concurrent appends from two threads serialize without loss") {
    val path = freshPath("txn_threads")
    TxnLog.init(evs.filter(col("event_id") % 3 === 0), path, nFiles = 2)
    val b1 = evs.filter(col("event_id") % 3 === 1)
    val b2 = evs.filter(col("event_id") % 3 === 2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val threads = Seq(b1, b2).map(b => new Thread(() => {
      results.add(TxnLog.append(b, path))
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val committed = results.asScala.toSeq.map(_._1).sorted
    assert(committed == Seq(1L, 2L), s"appends must claim distinct versions: $committed")
    val head = TxnLog.read(spark, path, 2L)
    assert(head.count() == evs.count(), "no append may be lost or doubled")
  }

  test("vacuum deletes only superseded files; retained snapshots read intact") {
    val path = freshPath("txn_vacuum")
    TxnLog.init(evs.filter(col("event_id") % 5 =!= 0), path, nFiles = 4)
    TxnLog.append(evs.filter(col("event_id") % 5 === 0), path)
    val (head, _) = TxnLog.compactFrom(spark, path, baseVersion = 0L)
    assert(TxnLog.allDataFiles(path).size == 6)
    // keep v1 too: NOTHING dies — v1 still references the 4 init files
    // (retention must UNION the live sets of every retained version)
    val (removed1, retained1) = TxnLog.vacuum(path, keepFromVersion = 1L)
    assert(removed1.isEmpty && retained1.size == 6,
      s"got ${removed1.size} removed / ${retained1.size} retained")
    // v1 still reads completely after the vacuum
    assert(TxnLog.read(spark, path, 1L).count() == evs.count())
    // v0's log entry is gone: time travel below the boundary must fail
    intercept[Exception] { TxnLog.read(spark, path, 0L).count() }
    // tighten retention to the head: the 4 compacted-away base files die
    val (removed2, retained2) = TxnLog.vacuum(path, keepFromVersion = head)
    assert(removed2.size == 4 && retained2.size == 2)
    assert(TxnLog.read(spark, path, head).count() == evs.count())
    // boundary validation
    intercept[IllegalArgumentException] { TxnLog.vacuum(path, head + 1) }
  }

  test("change feed: append transition = exactly the batch, compaction = empty") {
    val got = graft.ops.Relational.qChangeFeed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    val batch = Tables.events(spark, sf).filter(col("event_id") % 3 === 0)
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perType = batch.groupBy(_._1).toSeq.map { case (et, xs) =>
      (0L, 1L, "append", et, xs.length.toLong, 0L, xs.map(_._2).sum, 0L)
    }
    val want = (perType :+
      (0L, 1L, "append", "*", batch.length.toLong, 0L, batch.map(_._2).sum, 0L) :+
      (1L, 2L, "compact", "*", 0L, 0L, 0L, 0L)).sortBy(t => (t._1, t._4))
    assert(got == want, "CDF must be derived from commit churn exactly")
  }
}
