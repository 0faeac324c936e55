package graft

import graft.driver.ReplayJob
import graft.log.{ChangeLogGen, LogSpec, OracleFold}
import graft.maintenance.Compaction
import graft.table.IceTable
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  val spec = LogSpec(seed = 31L, nEvents = 6000, nRepos = 8,
    nPathsPerRepo = 25, pDelete = 0.15)

  private def shaState(t: IceTable): Map[(String, String), String] =
    t.read(spark).select("repo", "path", "contentSha").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  test("compaction purges tombstones, bounds files, preserves the user table") {
    val t = IceTable.create(tmpDir("ctab"), numBuckets = 4)
    ReplayJob.replayGenerated(spark, t, spec, nEpochs = 6, nLogPartitions = 4)
    val before = shaState(t)
    val filesBefore = t.currentManifest().get.files.size
    val tombsBefore = t.readRaw(spark).filter(col("deleted")).count()
    assert(tombsBefore > 0, "deletes must have produced tombstones")

    val report = Compaction.compact(spark, t)
    assert(report.purgedTombstones == tombsBefore,
      "contiguously-covered tombstones must all purge")
    assert(shaState(t) == before, "user table must be unchanged")
    assert(t.readRaw(spark).filter(col("deleted")).count() == 0)
    assert(t.currentManifest().get.files.size <= 4,
      s"one file per non-empty bucket after compaction (was $filesBefore)")
    // offsets carried forward: a full replay is still fully fenced
    val reports = ReplayJob.replayGenerated(spark, t, spec, nEpochs = 6,
      nLogPartitions = 4)
    assert(reports.forall(_.skipped))
    assert(shaState(t) == before)
  }

  test("safeHorizon respects committed-interval gaps") {
    import graft.model.{EpochManifest, EpochStats, OffsetRange}
    val m = EpochManifest(0, 0, 1, Nil,
      Seq(OffsetRange(0, -1, 100), OffsetRange(1, -1, 50),
        OffsetRange(1, 80, 120)), // partition 1 has a gap (50, 80]
      EpochStats(0, 0, 0, 0, 0, 0), -1)
    // partition 0 contiguous to 100; partition 1 contiguous only to 50
    assert(Compaction.safeHorizon(m) == 50L)
  }

  test("safeHorizon stays MinValue when a partition is not anchored at origin") {
    import graft.model.{EpochManifest, EpochStats, OffsetRange}
    // out-of-order segment arrival: first committed run covers (199,299] but
    // seqs 0..199 are still outstanding — NO purge may happen (a tombstone at
    // seq 250 could otherwise be resurrected by a late update at seq 150).
    val m = EpochManifest(0, 0, 1, Nil,
      Seq(OffsetRange(0, -1, 100), OffsetRange(1, 199, 299)),
      EpochStats(0, 0, 0, 0, 0, 0), -1)
    assert(Compaction.safeHorizon(m) == Long.MinValue)
  }
}
