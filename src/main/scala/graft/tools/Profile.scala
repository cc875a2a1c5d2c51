package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only profiler: run named queries N times each in one JVM, print every
  * iteration's wall time — separates JIT/first-run cost from steady state.
  * Usage: runMain graft.tools.Profile <sfDir> <reps> <q1> <q2> ...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.buildLocal(cpus, "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-22s ${times.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
