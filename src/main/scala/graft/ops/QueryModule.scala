package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator family = one module. SparkEntry concatenates all modules'
  * maps, so every query key (SURVEY.md §2) registers exactly once with its
  * DuckDB oracle twin (absent only for non-SQL-expressible ops).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
