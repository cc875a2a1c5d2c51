package graft.tools

import graft.{GraftSession, Tables}
import graft.plans.PartitionedCheckpoint
import org.apache.spark.sql.functions._

/** Dev tool: print ONE pagerank iteration's executed plan — the per-round
  * plan is invisible in the final query's explain because localCheckpoint
  * truncates lineage. Usage: runMain graft.tools.RankPlan <sfDir>
  */
object RankPlan {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.buildLocal("32", "graft-rankplan")
    spark.sparkContext.setLogLevel("ERROR")
    val parts = spark.sessionState.conf.numShufflePartitions
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val a = li.select(col("l_orderkey"), col("l_partkey").as("src"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("dst"))
    val e0 = a.join(b, "l_orderkey").filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    val deg = e0.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val e = PartitionedCheckpoint.byKey(e0.join(deg, "src"), "src", parts)
    val r0 = PartitionedCheckpoint.byKey(
      e.select(col("src").as("node")).distinct().withColumn("r", lit(1000000L)),
      "node", parts)
    val it1 = e.join(r0, e("src") === r0("node"))
      .select(col("dst"), expr("r div d").as("c"))
      .groupBy(col("dst"))
      .agg(expr("150000L + (85 * sum(c)) div 100").as("r"))
      .select(col("dst").as("node"), col("r"))
    it1.write.format("noop").mode("overwrite").save()
    println("=== one-iteration executed plan ===")
    println(it1.queryExecution.executedPlan.toString)
  }
}
