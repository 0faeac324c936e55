package graft.driver

import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.table.IceTable
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/**
 * Structured Streaming runner: tails the change-log directory as a file
 * stream and applies each micro-batch through the SAME MergeEngine.applyEpoch
 * code path as batch replay — the reference's streaming mode
 * (task.executionMode=STREAMING, Task.java:243-273) where:
 *   - micro-batch = flush epoch (FlushControlMessage barrier →
 *     Trigger.ProcessingTime / AvailableNow);
 *   - Spark's checkpoint tracks which files were consumed;
 *   - the table manifest's offset fence makes the `foreachBatch` body
 *     idempotent, so batch replay after a crash commits nothing twice —
 *     the exactly-once recipe the reference implements with Iceberg
 *     offset-range properties (IcebergMetadataWriter.java:385-435).
 *
 * Note batchId is used as epochId: Spark guarantees a replayed batchId
 * re-delivers the same data, and the offset fence turns the replay into a
 * no-op commit.
 *
 * Mid-stream schema drift (`trackSchemaDrift = true`): the log is read with
 * an extra nullable `schemaId` column and each micro-batch first steps the
 * table's schema forward to the batch's maximum id via [[SchemaDrift.sync]]
 * (validated add/rename/widen hops, each an atomic metadata commit) before
 * the merge writes data files under the new id — the
 * KafkaSchemaChangeInjector pattern collapsed to the batch boundary
 * (gobblin-modules/gobblin-kafka-common/.../converter/
 * KafkaSchemaChangeInjector.java:84-117).
 */
object StreamingIngest {

  def start(
      spark: SparkSession,
      logDir: String,
      checkpointDir: String,
      table: IceTable,
      nLogPartitions: Int = 32,
      stateDir: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      viewName: Option[String] = None,
      trackSchemaDrift: Boolean = false,
      produceRate: Double = 0.0,
      onHealth: RateControl.HealthReport => Unit = r =>
        if (!r.healthy) System.err.println(
          s"[graft] ingestion UNHEALTHY: ${r.reasons.mkString("; ")}")) = {
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, StructField}
    val eventSchema = spark.emptyDataset[ChangeEvent].schema
    val schema =
      if (trackSchemaDrift)
        org.apache.spark.sql.types.StructType(
          eventSchema.fields :+ StructField("schemaId", IntegerType, true))
      else eventSchema
    var reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n.toString))
    val stream = reader.parquet(logDir)

    // sliding-window ingestion health over committed micro-batches (the
    // KafkaIngestionHealthCheck loop the reference runs around its
    // containers): consumption-vs-produce rate, watermark-lag spread,
    // quarantine rate. `onHealth` is the container-abort hook — default
    // logs; an operator can escalate (stop the query, page). Only the last
    // few entries matter (check's window is 3), so the buffer is TRIMMED
    // per batch — a months-long query must not grow driver state per batch.
    val maxHealthHistory = 16
    val history = scala.collection.mutable.ArrayBuffer
      .empty[RateControl.EpochHealth]

    stream.writeStream
      .queryName("graft-cdc-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (raw: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // drift first: the table must reach the batch's schema BEFORE the
        // merge so the data commit writes files under the evolved id
        if (trackSchemaDrift) graft.table.SchemaDrift.sync(table, raw.toDF())
        val batch: Dataset[ChangeEvent] =
          (if (raw.columns.contains("schemaId")) raw.drop("schemaId")
           else raw.toDF()).as[ChangeEvent]
        val prev = MergeEngine.committedHighs(table.currentManifest())
        val t0 = System.nanoTime()
        // the file-stream checkpoint never redelivers a committed batch, so
        // a claim-run overflow must fail the epoch (uncommitted, stream
        // replays it after the operator raises the cap) rather than
        // truncate claims that would then freeze the horizons forever
        val ovKey = "spark.graft.claimRunOverflow"
        val ovPrev = spark.conf.getOption(ovKey)
        spark.conf.set(ovKey, "fail")
        val out =
          try MergeEngine.applyEpoch(spark, table, batch, batchId,
            nLogPartitions, stateDir.map(d => s"$d/quarantine"))
          finally ovPrev match {
            case Some(v) => spark.conf.set(ovKey, v)
            case None => spark.conf.unset(ovKey)
          }
        val secs = (System.nanoTime() - t0) / 1e9
        stateDir.foreach { d =>
          if (!out.skipped) {
            MergeEngine.writeLineage(spark, d, batchId, prev,
              out.manifest.offsets, out.stats)
            ReplayJob.writeMetrics(spark, d, batchId, secs, out)
          }
        }
        if (!out.skipped) {
          val st = out.stats
          history += RateControl.EpochHealth(batchId,
            st.rowsExtracted / math.max(1e-9, secs),
            watermarkLagSpread = MergeEngine.lagSpread(out.manifest.offsets),
            quarantineRate = if (st.rowsExtracted > 0)
              st.rowsQuarantined.toDouble / st.rowsExtracted else 0.0)
          if (history.size > maxHealthHistory)
            history.remove(0, history.size - maxHealthHistory)
          onHealth(RateControl.check(history.toSeq, produceRate))
        }
        viewName.foreach(n =>
          if (table.currentVersion() >= 0) table.registerView(spark, n))
        ()
      }
      .start()
  }
}
