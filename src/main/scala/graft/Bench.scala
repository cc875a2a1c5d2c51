package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.buildLocal(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: forces full evaluation of every column (count() would let
    // Catalyst prune the whole projection and measure only the scan).
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // One untimed warmup pass: JIT + codegen compilation + parquet footer
    // caching otherwise lands entirely on whichever query happens to run
    // first and dominates its wall time 3-10x over steady state.
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    // Nudge ContextCleaner before the timed pass: the warmup invocations
    // left localCheckpoint blocks (dedup/langid intra-query reuse) whose
    // driver references are dead but not yet collected; without a GC an
    // idle 128 GiB heap may never release them, and storage eviction mid-
    // timed-pass would add nondeterministic spill to the measurements.
    System.gc()
    // Timed pass in SORTED key order: Map iteration order shifts whenever a
    // key is added, which would silently reorder which query absorbs any
    // residual warm-up/GC settling and make per-query times incomparable
    // across rounds. The first sorted query is additionally re-primed
    // untimed, because the System.gc() above (and the JIT deopt/reopt churn
    // it triggers on a 128 GiB heap) otherwise lands entirely on it —
    // measured 6.2 s first-timed vs 1.4 s steady-state for the same query.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.headOption.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    // A query that throws reports -1 (never its meaningless elapsed time)
    // and lands in "errors" — a silently broken query must not skew the
    // total or read as a measurement. Each query is timed TWICE and reports
    // the MIN: on a shared box a single sample randomly absorbs neighbor
    // GC/JIT churn (observed 7.9 s vs 0.8 s steady state for the same
    // query in one run); min-of-two is the standard steady-state estimator
    // and applies identically to every query and every round.
    val results = ordered.map { case (name, fn) =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        run(fn)
        (System.nanoTime() - t0) / 1e9
      }
      try { name -> math.min(timed(), timed()) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name: $e"); name -> -1.0 }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
