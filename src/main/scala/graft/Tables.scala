package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All queries take a scale-factor directory and read only from it; column
  * pruning + predicate pushdown then reach the parquet scan for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp; read it as a nanos long (legacy conf) and truncate to a
    * µs TimestampType — the same floor DuckDB's `ts::TIMESTAMP` applies.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** A named battery of queries plus (where SQL-expressible) DuckDB oracle SQL
  * over the same parquet tables. SparkEntry unions all modules.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Shared DuckDB oracle-SQL fragments — one definition per semantic so the
  * Spark expression and every oracle that mirrors it cannot drift apart
  * (the whitespace class itself lives in
  * [[graft.core.MapReduce.WhitespaceClass]]).
  */
object OracleSql {
  /** Whitespace tokens of `expr`, empties dropped — the SQL twin of
    * `TextOps.tokens` (lowercased) / `MapReduce.tokenize` (raw).
    */
  def toks(expr: String): String =
    s"list_filter(string_split_regex($expr, '${graft.core.MapReduce.WhitespaceClass}'), t -> length(t) > 0)"
}
