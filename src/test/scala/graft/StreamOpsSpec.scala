package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked windowed aggregation over a stream matches batch") {
    val logDir = tmpDir("wstream")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(logDir)

    val stream = spark.readStream.schema(events.schema).parquet(logDir)
    val agg = StreamOps.windowedCounts(stream, "ts", "event_type")
    val qn = s"winagg_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .option("checkpointLocation", tmpDir("wck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append mode emits only watermark-closed windows; with AvailableNow the
    // final watermark closes all but the last windows — compare the emitted
    // subset against the batch computation.
    val got = spark.table(qn)
      .select("win_start", "event_type", "n")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got.nonEmpty, "stream must emit closed windows")
    val batch = events
      .groupBy(window(col("ts").cast("timestamp"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    got.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"window $k: stream=$n batch=${batch.get(k)}")
    }
  }

  test("flatMapGroupsWithState sessionization emits gap-closed sessions") {
    implicit val s = spark
    val events = Seq(
      StreamOps.Event(1L, 0L, "a"), StreamOps.Event(1L, 1000L, "b"),
      StreamOps.Event(1L, 100000L, "c"),  // gap > 30s → closes session 1
      StreamOps.Event(2L, 500L, "x"))
      .toDS()
    // batch Datasets also support flatMapGroupsWithState semantics via a
    // one-shot stream; drive it through a memory stream for realism
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamOps.Event]
    ms.addData(events.collect().toSeq: _*)
    val out = StreamOps.sessionize(ms.toDS(), gapMillis = 30000L)
    val qn = s"sess_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .option("checkpointLocation", tmpDir("sck"))
      .start()
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table(qn).as[StreamOps.SessionOut].collect()
    // session 1 of user 1 (0..1000, 2 events) closed by the 100000 event
    assert(sessions.exists(s0 =>
      s0.user_id == 1L && s0.startMillis == 0L && s0.endMillis == 1000L &&
        s0.nEvents == 2))
    // user 2's session idles past the gap as the watermark advances to
    // 100000: the EVENT-TIME timeout emits it and reclaims its state
    assert(sessions.exists(s0 => s0.user_id == 2L && s0.startMillis == 500L &&
      s0.endMillis == 500L && s0.nEvents == 1),
      s"idle session must be emitted by the event-time timeout: ${sessions.toSeq}")
    // user 1's second session (deadline 130000 > watermark) stays open
    assert(!sessions.exists(s0 => s0.user_id == 1L && s0.startMillis == 100000L))
  }

  test("hot key: a large single-key batch folds in bounded chunks") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // 20k events for ONE key in ONE micro-batch, folded with a 1k-event
    // buffer: the chunked fold must stay memory-bounded yet produce the
    // exact gap-split sessions of a global-sort fold.
    val nSessions = 4
    val perSession = 5000
    val events = for {
      si <- 0 until nSessions
      ei <- 0 until perSession
    } yield StreamOps.Event(1L, si * 200000L + ei, "e")
    val ms = MemoryStream[StreamOps.Event]
    ms.addData(events: _*)
    val qn = s"sesshot_${System.nanoTime()}"
    val q = StreamOps.sessionize(ms.toDS(), gapMillis = 30000L,
        maxBufferPerKey = 1000)
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .option("checkpointLocation", tmpDir("sck3")).start()
    q.processAllAvailable()
    // far-future event gap-closes the final session
    ms.addData(StreamOps.Event(1L, 10000000L, "z"))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table(qn).as[StreamOps.SessionOut].collect()
      .sortBy(_.startMillis)
    assert(sessions.length == nSessions, s"got ${sessions.toSeq}")
    sessions.zipWithIndex.foreach { case (s0, i) =>
      assert(s0.startMillis == i * 200000L &&
        s0.endMillis == i * 200000L + perSession - 1 &&
        s0.nEvents == perSession,
        s"session $i wrong under chunked fold: $s0")
    }
  }

  test("sessionize: cross-batch late event never inverts or splits a session") {
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamOps.Event]
    val qn = s"sesslate_${System.nanoTime()}"
    // generous lateness allowance so the straggler reaches the operator
    val q = StreamOps.sessionize(ms.toDS(), gapMillis = 30000L,
        lateness = "200 seconds")
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .option("checkpointLocation", tmpDir("sck2")).start()
    ms.addData(StreamOps.Event(1L, 100000L, "a"))
    q.processAllAvailable()
    // batch 2: a STRAGGLER (t=0) plus an in-session event; `last` must not
    // move backwards (the old fold produced end=0 < start and a false split)
    ms.addData(StreamOps.Event(1L, 0L, "late"),
      StreamOps.Event(1L, 100001L, "b"))
    q.processAllAvailable()
    // batch 3: far-future event closes the (merged) session
    ms.addData(StreamOps.Event(1L, 500000L, "c"))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table(qn).as[StreamOps.SessionOut].collect()
    assert(sessions.forall(s0 => s0.endMillis >= s0.startMillis),
      s"inverted session emitted: ${sessions.toSeq}")
    assert(sessions.exists(s0 => s0.user_id == 1L && s0.startMillis == 0L &&
      s0.endMillis == 100001L && s0.nEvents == 3),
      s"straggler must merge, not split: ${sessions.toSeq}")
  }
}
