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
      viewName: Option[String] = None) = {
    import spark.implicits._
    val schema = spark.emptyDataset[ChangeEvent].schema
    var reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n.toString))
    val stream = reader.parquet(logDir).as[ChangeEvent]

    stream.writeStream
      .queryName("graft-cdc-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[ChangeEvent], batchId: Long) =>
        val prev = MergeEngine.committedHighs(table.currentManifest())
        val t0 = System.nanoTime()
        val out = MergeEngine.applyEpoch(spark, table, batch, batchId,
          nLogPartitions, stateDir.map(d => s"$d/quarantine"))
        val secs = (System.nanoTime() - t0) / 1e9
        stateDir.foreach { d =>
          if (!out.skipped) {
            MergeEngine.writeLineage(spark, d, batchId, prev,
              out.manifest.offsets, out.stats)
            ReplayJob.writeMetrics(spark, d, batchId, secs, out)
          }
        }
        viewName.foreach(n =>
          if (table.currentVersion() >= 0) table.registerView(spark, n))
        ()
      }
      .start()
  }
}
