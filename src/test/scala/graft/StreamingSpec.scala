package graft

import graft.driver.StreamingIngest
import graft.log.{ChangeLogGen, LogSpec, OracleFold}
import graft.table.IceTable
import org.apache.spark.sql.functions._

/** Structured Streaming runner: micro-batched tail of the change-log dir
  * through the same merge/commit path; checkpoint restart + offset fence
  * give exactly-once (FIXTURES.md §7 resume semantics). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  val spec = LogSpec(seed = 11L, nEvents = 12000, nRepos = 10,
    nPathsPerRepo = 30, pDelete = 0.06)

  private def shaState(t: IceTable): Map[(String, String), String] =
    t.read(spark).select("repo", "path", "contentSha").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  private def writeSlice(logDir: String, lo: Long, hi: Long): Unit = {
    val sp = spec
    val cdf = ChangeLogGen.zipfCdf(sp.nRepos, sp.zipfExponent)
    spark.range(lo, hi).map(s => ChangeLogGen.eventAt(sp, cdf, s))
      .repartitionByRange(4, col("seq"))
      .write.mode("append").parquet(logDir)
  }

  test("streaming ingest in micro-batches matches the oracle fold") {
    val logDir = tmpDir("slog")
    val t = IceTable.create(tmpDir("stab"), numBuckets = 4)
    writeSlice(logDir, 0, 8000)
    val q = StreamingIngest.start(spark, logDir, tmpDir("sckpt"), t,
      nLogPartitions = 4, maxFilesPerTrigger = Some(2))
    q.awaitTermination()
    assert(t.currentVersion() >= 1, "expect multiple micro-batch commits")
    val oracle8k = OracleFold.fold(
      ChangeLogGen.generateLocal(spec.copy(nEvents = 8000)))
      .map { case (k, v) => k -> v.contentSha }
    assert(shaState(t) == oracle8k)
  }

  test("restart resumes from checkpoint and only ingests the new tail") {
    val logDir = tmpDir("slog2")
    val ckpt = tmpDir("sckpt2")
    val t = IceTable.create(tmpDir("stab2"), numBuckets = 4)
    writeSlice(logDir, 0, 8000)
    StreamingIngest.start(spark, logDir, ckpt, t, nLogPartitions = 4)
      .awaitTermination()
    val vMid = t.currentVersion()
    // tail grows while "down"
    writeSlice(logDir, 8000, 12000)
    StreamingIngest.start(spark, logDir, ckpt, t, nLogPartitions = 4)
      .awaitTermination()
    assert(t.currentVersion() > vMid)
    val oracle = OracleFold.fold(ChangeLogGen.generateLocal(spec))
      .map { case (k, v) => k -> v.contentSha }
    assert(shaState(t) == oracle)
  }

  test("checkpoint loss: batches replay but the offset fence makes them no-ops") {
    val logDir = tmpDir("slog3")
    val t = IceTable.create(tmpDir("stab3"), numBuckets = 4)
    writeSlice(logDir, 0, 8000)
    StreamingIngest.start(spark, logDir, tmpDir("c1"), t, nLogPartitions = 4)
      .awaitTermination()
    val v1 = t.currentVersion()
    val state1 = shaState(t)
    // fresh checkpoint → Spark re-delivers everything from scratch
    StreamingIngest.start(spark, logDir, tmpDir("c2"), t, nLogPartitions = 4)
      .awaitTermination()
    assert(t.currentVersion() == v1, "replayed batches must be fenced")
    assert(shaState(t) == state1)
  }
}
