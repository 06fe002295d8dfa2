package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryModule, Tables}
import graft.core.MapReduce

/** The reference's own API surface exercised end-to-end through
  * `graft.core.MapReduce`: documents become (filename, contents) records
  * (one doc = one "input file", mirroring one-file-per-map-task,
  * /root/reference/src/mapreduce/master_sequential.go:12-14), and the two
  * canonical UDF pairs run through flatMap → groupByKey.mapGroups → orderBy.
  *
  * Both workloads have exact SQL semantics, so they get DuckDB oracles even
  * though the implementation path is the typed closure API.
  */
object MapReduceQueries extends QueryModule {

  private def docsAsFiles(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir)
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => (s"doc-$id", text) }
  }

  /** Sorted distinct tokens via mapF/reduceF — the reference's golden test
    * (common_test_suite.go:31-50 + Check at :74-114).
    */
  def mrDistinct(s: SparkSession, dir: String): DataFrame =
    MapReduce.distinctTokens(s, docsAsFiles(s, dir)).toDF("key", "value")

  /** Word count via mapF/combineF — the partial-aggregation path. */
  def mrWordCount(s: SparkSession, dir: String): DataFrame =
    MapReduce.wordCount(s, docsAsFiles(s, dir)).toDF("key", "value")

  /** Word count via the explicit-nReduce sort-based reduce path
    * (hash-partition to 8 reducers → in-partition sort → streamed key runs),
    * asserting the reference task-granularity plan against the same oracle.
    */
  def mrWordCountNReduce(s: SparkSession, dir: String): DataFrame =
    MapReduce.wordCountNReduce(s, docsAsFiles(s, dir), nReduce = 8)
      .toDF("key", "value")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_distinct_words" -> (mrDistinct(_, _)),
    "mr_wordcount" -> (mrWordCount(_, _)),
    "mr_wordcount_nreduce" -> (mrWordCountNReduce(_, _)))

  private val toksSql = graft.OracleSql.toks("text")

  val oracles: Map[String, String] = Map(
    "mr_distinct_words" ->
      s"""SELECT DISTINCT token AS key, '' AS value FROM (
         |  SELECT unnest($toksSql) AS token FROM documents
         |) ORDER BY key""".stripMargin,
    "mr_wordcount" ->
      s"""SELECT token AS key, count(*)::VARCHAR AS value FROM (
         |  SELECT unnest($toksSql) AS token FROM documents
         |) GROUP BY token ORDER BY key""".stripMargin,
    "mr_wordcount_nreduce" ->
      s"""SELECT token AS key, count(*)::VARCHAR AS value FROM (
         |  SELECT unnest($toksSql) AS token FROM documents
         |) GROUP BY token ORDER BY key""".stripMargin)
}
