package graft.driver

import graft.log.{ChangeLogGen, LogSpec}
import graft.table.IceTable
import org.apache.spark.sql.SparkSession

/**
 * spark-submit entry point for the ingest engine (the analog of the
 * reference's CLI job launcher, gobblin-runtime/.../cli — a `.pull` file
 * becomes flags here).
 *
 * Modes:
 *   replay  — fold a deterministic generated change log into an IceTable in
 *             E epochs (batch mode; ExecutionModel.BATCH analog)
 *   stream  — materialize the log as parquet then ingest it through the
 *             Structured Streaming runner (ExecutionModel.STREAMING analog)
 *
 * Usage:
 *   IngestMain replay <tableDir> <nEvents> <nEpochs> [master]
 *   IngestMain stream <tableDir> <logDir> <nEvents> [master]
 */
object IngestMain {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("replay")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]")
    val spark = SparkSession.builder()
      .master(master)
      .appName(s"graft-ingest-$mode")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try mode match {
      case "replay" =>
        val Array(_, tableDir, nEvents, nEpochs) = args.take(4)
        val t = IceTable.create(tableDir)
        val spec = LogSpec(nEvents = nEvents.toLong)
        val t0 = System.nanoTime()
        val reports = ReplayJob.replayGenerated(spark, t, spec,
          nEpochs = nEpochs.toInt, stateDir = Some(s"$tableDir/state"))
        val secs = (System.nanoTime() - t0) / 1e9
        reports.foreach(r => println(
          s"epoch=${r.epochId} skipped=${r.skipped} stats=${r.stats}"))
        val rows = t.read(spark).count()
        println(f"mode=replay events=${nEvents.toLong} epochs=${nEpochs.toInt} " +
          f"secs=$secs%.2f events_per_sec=${nEvents.toLong / secs}%.0f " +
          f"final_rows=$rows version=${t.currentVersion()}")
      case "stream" =>
        val Array(_, tableDir, logDir, nEvents) = args.take(4)
        val t = IceTable.create(tableDir)
        ChangeLogGen.writeLog(spark, LogSpec(nEvents = nEvents.toLong), logDir)
        val t0 = System.nanoTime()
        val q = StreamingIngest.start(spark, logDir,
          s"$tableDir/checkpoint", t, stateDir = Some(s"$tableDir/state"))
        q.awaitTermination()
        val secs = (System.nanoTime() - t0) / 1e9
        val rows = t.read(spark).count()
        println(f"mode=stream events=${nEvents.toLong} secs=$secs%.2f " +
          f"events_per_sec=${nEvents.toLong / secs}%.0f final_rows=$rows " +
          f"version=${t.currentVersion()}")
      case other =>
        System.err.println(s"unknown mode '$other'; use replay|stream")
        sys.exit(2)
    } finally spark.stop()
  }
}
