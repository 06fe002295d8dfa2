package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryModule's named queries and DuckDB oracle SQL. A
  * module's query names are globally unique (prefix convention: mr_ / q_ /
  * txt_ / dd_ / sim_ / ev_ / mm_).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    MapReduceQueries,
    TextOps,
    Relational,
    Dedup,
    Similarity,
    Streamish,
    Multimodal,
    Pipeline)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Sorted distinct tokens — the reference's canonical workload (SURVEY §2.3)
    * exercising scan → flatMap → shuffle agg → distributed sort.
    */
  def entry(spark: SparkSession): DataFrame =
    TextOps.distinctTokens(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size,
      "duplicate query name across modules — oracle/query desync hazard")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
