package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Reference-parity surface of drinkbeer/SimpleMapReduce, re-expressed on the
  * typed Dataset API.
  *
  * The reference computes exactly one query shape (see SURVEY.md §1–§2): given
  * input files, a user `mapF: (filename, contents) => [(K,V)]`
  * (src/common/common_map.go:59-65) and a user
  * `reduceF: (key, values) => value` (src/common/common_reduce.go:51-57), emit
  * one `(key, value)` row per distinct key, sorted by key as a string
  * (src/mapreduce/master.go:112-127).
  *
  * Spark-first mapping:
  *   - the JSON intermediate files + FNV hash partitioning
  *     (common.go:61-66, common_map.go:72-96) become Spark's shuffle, induced
  *     by `groupByKey` — nothing to materialize ourselves;
  *   - the phase barrier (master.go:77-78) is the stage boundary at the
  *     shuffle;
  *   - the master's single-threaded merge sort (master.go:87-128) becomes a
  *     distributed `orderBy` (RangePartitioning) — strictly more scalable;
  *   - fault tolerance / scheduling (common_rpc.go:84-136) is the
  *     DAGScheduler's job, zero code here.
  *
  * `reduceF` receives an Iterator rather than a materialized slice so a huge
  * key group streams through the reducer instead of buffering
  * (common_reduce.go:58-76 buffers everything — that would not survive 100 TB).
  */
object MapReduce {

  /** Run mapF/reduceF over (filename, contents) pairs; result sorted by key. */
  def mapReduce(
      spark: SparkSession,
      input: Dataset[(String, String)],
      mapF: (String, String) => IterableOnce[(String, String)],
      reduceF: (String, Iterator[String]) => String): Dataset[(String, String)] = {
    import spark.implicits._
    input
      .flatMap { case (name, contents) => mapF(name, contents) }
      .groupByKey(_._1)
      .mapGroups((k, vs) => (k, reduceF(k, vs.map(_._2))))
      .orderBy($"_1")
  }

  /** Whole-file-per-record input, matching DoMap's ReadFile semantics
    * (common_map.go:66-70): one (path, contents) row per file.
    */
  def textFiles(spark: SparkSession, paths: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(paths).toDS()
  }

  /** Whitespace class spelled out to match the DuckDB-RE2 oracle regex
    * (Java \s includes \x0B, RE2's does not). Single source of truth — the
    * escape sequences are interpreted identically by Java's regex compiler
    * and RE2, so the same string is interpolated verbatim into oracle SQL
    * (TextOps.toksSql, MapReduceQueries.toksSql).
    */
  val WhitespaceClass = "[ \\t\\n\\x0B\\f\\r]+"

  /** The reference test workload (common_test_suite.go:31-50): whitespace
    * tokenization to (word, "") and a constant-"" reduce — net semantics is
    * the sorted distinct token set.
    */
  def distinctTokens(spark: SparkSession, input: Dataset[(String, String)]): Dataset[(String, String)] =
    mapReduce(
      spark,
      input,
      (_, contents) => contents.split(WhitespaceClass).iterator.filter(_.nonEmpty).map(w => (w, "")),
      (_, _) => "")

  /** Classic word count expressed through the same two UDF slots. */
  def wordCount(spark: SparkSession, input: Dataset[(String, String)]): Dataset[(String, String)] =
    mapReduce(
      spark,
      input,
      (_, contents) => contents.split(WhitespaceClass).iterator.filter(_.nonEmpty).map(w => (w, "1")),
      (_, vs) => vs.map(_.toLong).sum.toString)
}
