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

  /** Session windows with an EVENT-TIME idle timeout: a session closes when
    * a newer event of the same key arrives past `gapMillis`, or when the
    * stream's watermark passes the session's idle deadline (the timeout
    * emits the open session and RECLAIMS its state — without it per-key
    * state would grow forever). Events later than `lateness` are dropped by
    * the watermark; in-allowance stragglers merge into the open session
    * without ever moving its bounds backwards (no inverted sessions).
    * Event-time (not processing-time) timeouts keep the operator
    * deterministic: emission is driven by the data's own clock.
    *
    * Hot-key guard: a key's micro-batch folds in chunks of at most
    * `maxBufferPerKey` events — a hot key with millions of events in one
    * batch never materializes in task memory at once (the naive
    * sort-the-whole-batch fold OOMs there). Each chunk is sorted and folded
    * into the running state; the straggler-merge rule absorbs cross-chunk
    * disorder, so for a batch whose internal disorder stays within the
    * session gap (in particular any time-ordered source) the chunked fold
    * equals the global-sort fold exactly. Only an event arriving EARLIER
    * than a prior chunk by more than the gap merges into the open session
    * instead of retro-splitting it — the bounded-memory trade. */
  def sessionize(events: Dataset[Event], gapMillis: Long,
                 lateness: String = "0 milliseconds",
                 maxBufferPerKey: Int = 100000)
                (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    // +1s bookkeeping offset: the stateful late-row filter drops rows with
    // eventTime <= watermark, and the watermark starts at 0 — an offset-less
    // t=0 event would be dropped before the first batch even runs. The
    // timeout deadline below carries the same offset, so semantics are
    // unchanged.
    val offsetMs = 1000L
    events
      .withColumn("_ts",
        ((col("tsMillis") + offsetMs) / 1000.0).cast("timestamp"))
      .withWatermark("_ts", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: emit the open session, reclaim
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.last, s.nEvents))
          } else {
            // fold this batch's events into session state in BOUNDED chunks
            // (see hot-key guard above), emitting every gap-closed session
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            def fold(e: Event): Unit = cur match {
              case Some(s) if e.tsMillis - s.last > gapMillis =>
                out += SessionOut(userId, s.start, s.last, s.nEvents)
                cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
              case Some(s) =>
                // an in-allowance straggler (ts <= last) joins the session
                // but must not drag its bounds backwards
                cur = Some(SessionState(math.min(s.start, e.tsMillis),
                  math.max(s.last, e.tsMillis), s.nEvents + 1))
              case None =>
                cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
            }
            val buf = new scala.collection.mutable.ArrayBuffer[Event]()
            val byTime = Ordering.by((e: Event) => e.tsMillis)
            batch.foreach { e =>
              buf += e
              if (buf.length >= maxBufferPerKey) {
                buf.sortInPlace()(byTime).foreach(fold)
                buf.clear()
              }
            }
            buf.sortInPlace()(byTime).foreach(fold)
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMillis + 1000L)
            }
            out.result().iterator
          }
      }
  }
}
