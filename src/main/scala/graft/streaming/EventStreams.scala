package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming forms of the event-table analytics: the same logical
  * transforms as `graft.operators.Relational`, expressed over an unbounded
  * source with watermarks for state cleanup.
  *
  * The batch queries are the driver-verified truth; these streaming variants
  * share their semantics (a tumbling window over `ts`) and are exercised by
  * the test suite through in-memory sources/sinks. At production scale the
  * source line changes to `readStream.format("kafka")...` — the transform
  * and sink stages are source-agnostic.
  */
object EventStreams {

  /** Tumbling-window event counts over an unbounded stream. The 10-minute
    * watermark bounds state: windows older than watermark are finalized and
    * dropped (late data beyond it is discarded deterministically). */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Per-user running session state via mapGroupsWithState: counts sessions
    * separated by >`gapSeconds` of inactivity. Custom state machine — the
    * shape Structured Streaming's built-in windows can't express. */
  final case class SessionState(lastTsMicros: Long, nSessions: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long)

  def sessionCounts(spark: SparkSession, events: DataFrame,
                    gapSeconds: Long = 1800L): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"),
              col("ts").cast("timestamp"))
      .as[(Long, java.sql.Timestamp)]

    def update(userId: Long, batch: Iterator[(Long, java.sql.Timestamp)],
               state: GroupState[SessionState]): UserSessions = {
      var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
      // Process in event-time order within the batch for deterministic gaps.
      batch.toSeq.sortBy(_._2.getTime).foreach { case (_, ts) =>
        val micros = ts.getTime * 1000L
        val isNew = st.lastTsMicros == Long.MinValue ||
          micros - st.lastTsMicros > gapSeconds * 1000000L
        st = SessionState(micros, st.nSessions + (if (isNew) 1 else 0))
      }
      state.update(st)
      UserSessions(userId, st.nSessions)
    }

    typed.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
      .toDF()
  }

  /** Wire the tumbling aggregation to an in-memory sink (testing / demo).
    * Returns the running query; results land in table `queryName`. */
  def startMemorySink(df: DataFrame, queryName: String): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .start()

  /** File-based streaming source over the driver's events layout — one
    * parquet dir treated as an append-only stream (the local stand-in for a
    * message bus). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.sources.Tables.events(spark, sfDir).schema
    spark.readStream.schema(schema).parquet(s"$sfDir/events.parquet")
  }
}
