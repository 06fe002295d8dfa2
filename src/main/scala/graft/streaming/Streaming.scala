package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.DecimalType

/** Running per-user totals — the state carried by [[Streaming.runningUserTotals]]. */
final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

/** Structured Streaming surface: the same event-time semantics as the batch
  * [[graft.ops.Streamish]] battery, expressed incrementally —
  * `readStream` → transforms → `writeStream`. The reference has no streaming
  * at all (SURVEY §2.2; README.md:13-15 is an unimplemented TODO), so there
  * is no reference behavior to match; this module demonstrates that the
  * engine's event-time operators are streaming-native, and
  * StreamingSpec pins streaming ≡ batch on the shared fixture.
  *
  * Scale notes: the file source incrementalizes by new files (a 100 TB event
  * log streams as it lands); watermarks bound window state; session windows
  * use Spark's native gap-merge state store; `mapGroupsWithState` keeps one
  * small state row per user, hash-partitioned by the group key.
  */
object Streaming {

  /** Unbounded view of the events table: a file-stream source over the same
    * parquet the batch queries read (new files appearing under `dir` would
    * stream in incrementally). Same TIMESTAMP(NANOS) handling as
    * [[graft.Tables.events]].
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming twin of `ev_tumbling`: watermarked 1-hour tumbling windows.
    * The 2-hour watermark lets the state store evict every window older
    * than the stream's high-water mark minus 2 h — bounded state forever.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Streaming twin of `ev_session`: Spark's native gap-based
    * `session_window` (30-minute gap), the incremental form of the batch
    * lag+cumsum sessionization — the state store merges/extends open
    * sessions as events arrive and the watermark closes them.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Custom streaming state via the typed API: running per-user event count
    * and value total, one `UserTotals` row of state per user
    * (`mapGroupsWithState`, update mode). This is the extension slot for
    * stateful logic neither windows nor watermarks express.
    */
  def runningUserTotals(s: SparkSession, events: DataFrame): Dataset[UserTotals] = {
    import s.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          var n = prev.n_events
          var sv = prev.sum_value
          rows.foreach { r => n += 1; sv += r._2 }
          val next = UserTotals(user, n, sv)
          state.update(next)
          next
      }
  }
}
