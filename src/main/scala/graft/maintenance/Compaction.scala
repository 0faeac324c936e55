package graft.maintenance

import graft.merge.Intervals
import graft.model.{EpochManifest, EpochStats}
import graft.table.IceTable
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Maintenance compaction (SURVEY.md §2.9): the reference runs verifier-gated
 * MapReduce compaction jobs per dataset (MRCompactor / CompactionSuite,
 * gobblin-compaction/.../MRCompactor.java; audit-count verifier
 * CompactionAuditCountVerifier.java). Spark-native version:
 *
 *  - rewrite every bucket into one file (small-file control — the bi-level
 *    packer's goal, SURVEY.md §2.8),
 *  - purge delete tombstones whose lastSeq lies at or below the SAFE
 *    horizon. Safe = the table's contiguous committed prefix: no future
 *    event can carry a smaller seq than the first committed gap, so a
 *    tombstone below it can never be out-raced by a late stale update.
 *  - verifier gate: live-row count must be identical before/after
 *    (compaction must never change the user-visible table), enforced from
 *    an Observation inside the rewrite job; on violation the new snapshot
 *    is NOT committed (files become unreferenced orphans).
 */
object Compaction {

  /** Largest seq S such that every partition's committed intervals cover
    * (-inf, S] contiguously FROM THE LOG ORIGIN (lowSeq == -1, i.e. seq 0) —
    * tombstones at or below S are safe to purge. A partition whose first
    * committed interval does NOT start at the origin contributes
    * Long.MinValue (no purge): files can arrive out of order, so a run
    * anchored mid-log (e.g. (199,299]) says nothing about seqs 0..199 still
    * outstanding — purging against its high could let a later-arriving older
    * update resurrect a deleted key. */
  def safeHorizon(m: EpochManifest): Long =
    Intervals.contiguousOriginPrefix(m.offsets)

  final case class CompactionReport(
      version: Long, purgedTombstones: Long, liveRows: Long, files: Int)

  def compact(spark: SparkSession, table: IceTable): CompactionReport = {
    val parent = table.currentManifest().getOrElse(
      throw new IllegalStateException("nothing to compact"))
    val horizon = safeHorizon(parent)

    val raw = table.readRaw(spark)
    val obs = Observation(s"compact-${parent.version}")
    // null-safe: a null `deleted` must count as live AND survive the rewrite
    // (an un-coalesced filter(!NULL) would drop it while the live counter
    // kept it, permanently failing the verifier)
    val purgeable =
      coalesce(col("deleted"), lit(false)) && col("lastSeq") <= horizon
    val kept = raw
      .observe(obs,
        sum(when(purgeable, 1L).otherwise(0L)).as("purged"),
        sum(when(!coalesce(col("deleted"), lit(false)), 1L).otherwise(0L))
          .as("liveBefore"))
      .filter(!purgeable)

    // unique data dir per compaction, disjoint from ingest epoch ids
    val compactionEpochId = 1000000000L + parent.version
    val newFiles = table.writeEpochFiles(kept, compactionEpochId,
      parent.schemaId)

    val metrics = obs.get
    val purged = metrics("purged").asInstanceOf[Long]
    val liveBefore = metrics("liveBefore").asInstanceOf[Long]

    // verifier gate (audit-count analog): user-visible rows must not change
    val liveAfter = table.readFiles(spark, newFiles, parent.schemaId)
      .filter(!coalesce(col("deleted"), lit(false))).count()
    require(liveAfter == liveBefore,
      s"compaction verifier failed: live rows $liveBefore -> $liveAfter; aborting (no commit)")

    val manifest = parent.copy(
      version = parent.version + 1,
      epochId = compactionEpochId,
      files = newFiles.sortBy(f => (f.bucket, f.path)),
      stats = EpochStats(0, 0, 0, 0, 0, 0),
      parentVersion = parent.version)
    table.commit(manifest)
    CompactionReport(manifest.version, purged, liveAfter, newFiles.size)
  }
}
