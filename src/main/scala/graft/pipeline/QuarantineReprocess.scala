package graft.pipeline

import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.table.IceTable
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Re-ingest quarantined rows after a policy/schema fix — the replay surface
 * the reference gets from work-unit retry (gobblin-core-base/.../
 * WorkUnitRetryPolicy.java:29-48: failed work units re-enter the next run).
 * Here the failed unit is the quarantine side-output itself:
 *
 *  1. read every pending `quarantine/epoch=*` parquet dir (the ERR_FILE
 *     analog), drop the `reason` column;
 *  2. run the rows through the NORMAL epoch pipeline under the CURRENT
 *     row policies, with the same quarantine root as the sink — survivors
 *     merge into the table, still-bad rows are re-quarantined under the new
 *     epoch id and stay pending for the next fix;
 *  3. archive the consumed input dirs to `.reprocessed/run=<epochId>/` so a
 *     repeated reprocess is a no-op (and the original rows remain auditable).
 *
 * Idempotence does NOT ride the offset fence here — quarantined seqs were
 * claimed by their original epoch (quarantine is terminal; the claim keeps
 * the completeness/purge horizon moving), so the fence would silently drop
 * every survivor. Reprocess instead passes `admitClaimed=true`: safe because
 * a quarantined row's effect never reached the table, and the STRICT LWW
 * merge (`seq > lastSeq`) makes even a double reprocess of the same survivor
 * a stale-drop. Claims re-merge into already-covered intervals (no-op), so
 * offset state is untouched.
 */
object QuarantineReprocess {

  /** What a reprocess run did: which pending epoch dirs were consumed, how
    * many rows they held, and the ingest outcome (None when nothing was
    * pending). `requarantined` rows failed the CURRENT policies too and are
    * back in the pending set under `epoch=<epochId>`. */
  final case class Report(
      consumedEpochs: Seq[Long], rowsRead: Long,
      applied: Long, deletes: Long, requarantined: Long,
      staleDrops: Long, dedupDrops: Long,
      outcome: Option[MergeEngine.EpochOutcome])

  private val EpochDir = """epoch=(\d+)""".r

  /** pending (non-archived) quarantine epoch ids under `root` */
  def pendingEpochs(spark: SparkSession, root: String): Seq[Long] = {
    val p = new HPath(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).iterator.filter(_.isDirectory)
      .map(_.getPath.getName).collect { case EpochDir(e) => e.toLong }
      .toSeq.sorted
  }

  /** Reprocess all pending quarantine epochs into `table` as epoch
    * `epochId` (must be a FRESH epoch id — in particular not one of the
    * pending dirs', or the archive step would consume this run's own
    * re-quarantine output). Policies/pipeline default to the engine
    * defaults; pass the FIXED versions being deployed. */
  def run(
      spark: SparkSession,
      table: IceTable,
      quarantineRoot: String,
      epochId: Long,
      nLogPartitions: Int = 32,
      pipeline: Transform.T = Transform.identity,
      taskPolicies: Seq[TaskPolicies.Policy] =
        Seq(TaskPolicies.RowCountReconciliation()),
      rowPolicies: Seq[RowPolicies.Policy] = RowPolicies.defaults,
      archive: Boolean = true): Report = {
    import spark.implicits._
    val pending = pendingEpochs(spark, quarantineRoot)
    require(!pending.contains(epochId),
      s"reprocess epochId=$epochId collides with a pending quarantine dir; " +
        "pick a fresh epoch id")
    if (pending.isEmpty)
      return Report(Nil, 0L, 0L, 0L, 0L, 0L, 0L, None)

    val dirs = pending.map(e => s"$quarantineRoot/epoch=$e")
    // EXPLICIT schema: an all-clean epoch's quarantine dir can hold zero
    // data files (only _SUCCESS) — schema inference would throw where a
    // no-op is the right answer; the envelope schema is known regardless
    val rows: Dataset[ChangeEvent] = spark.read
      .schema(org.apache.spark.sql.Encoders.product[ChangeEvent].schema)
      .parquet(dirs: _*)
      .select("op", "seq", "repo", "path", "commit", "lang", "content")
      .as[ChangeEvent]
    val nRead = rows.count()

    val out = MergeEngine.applyEpoch(spark, table, rows, epochId,
      nLogPartitions = nLogPartitions,
      quarantineDir = Some(quarantineRoot),
      pipeline = pipeline, taskPolicies = taskPolicies,
      rowPolicies = rowPolicies, admitClaimed = true)

    if (archive) {
      // the ingest epoch committed (or cleanly skipped); consuming the input
      // AFTER the commit means a crash in between merely re-runs the rows —
      // strict LWW makes the replay a stale-drop, never a double-apply
      val fs = new HPath(quarantineRoot)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val archRoot = new HPath(quarantineRoot, s".reprocessed/run=$epochId")
      fs.mkdirs(archRoot)
      pending.foreach { e =>
        // unique destination: a crashed earlier run that archived this
        // epoch under the same run id must not make rename nest the dir
        // (Hadoop rename moves src INTO an existing destination directory)
        val dst0 = new HPath(archRoot, s"epoch=$e")
        val dst = if (fs.exists(dst0))
          new HPath(archRoot, s"epoch=$e-${System.nanoTime()}") else dst0
        if (!fs.rename(new HPath(s"$quarantineRoot/epoch=$e"), dst))
          throw new IllegalStateException(
            s"quarantine archive failed: epoch=$e -> $dst (dir would stay " +
              "pending and re-run forever; failing loudly instead)")
      }
    }
    val st = out.stats
    Report(pending, nRead, st.rowsApplied, st.deletesApplied,
      st.rowsQuarantined, st.staleDrops, st.dedupDrops, Some(out))
  }
}
