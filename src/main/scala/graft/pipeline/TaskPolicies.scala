package graft.pipeline

import graft.model.EpochStats

/**
 * Task-level quality policies (SURVEY.md §2.4): the reference's
 * `TaskLevelPolicy.executePolicy(): {PASSED, FAILED}` with `{FAIL, OPTIONAL}`
 * severity, evaluated after the task and gating the commit
 * (gobblin-api/.../qualitychecker/task/TaskLevelPolicy.java:28-51;
 * commit gating Fork.java:378-389). Here a policy checks the epoch's
 * counters BEFORE the manifest commit; a FAIL severity aborts the epoch —
 * no snapshot is written, so the epoch replays cleanly next run
 * (all-or-nothing, JobCommitPolicy.COMMIT_ON_FULL_SUCCESS analog).
 */
object TaskPolicies {

  sealed trait Severity
  case object Fail extends Severity      // abort the epoch commit
  case object Optional extends Severity  // record only

  final case class Result(policy: String, passed: Boolean, detail: String,
      severity: Severity)

  trait Policy {
    def name: String
    def severity: Severity
    def check(stats: EpochStats): Result
  }

  /** extracted == quarantined + applied + deletes + dedupDrops + staleDrops
    * (the full invariant CLAUDE.md states — staleDrops matters under
    * out-of-order delivery) — the RowCountPolicy analog
    * (gobblin-core/.../policies/count/RowCountPolicy.java). */
  final case class RowCountReconciliation(severity: Severity = Fail)
      extends Policy {
    val name = "row_count_reconciliation"
    def check(s: EpochStats): Result = {
      val accounted = s.rowsQuarantined + s.rowsApplied + s.deletesApplied +
        s.dedupDrops + s.staleDrops
      Result(name, s.rowsExtracted == accounted,
        s"extracted=${s.rowsExtracted} accounted=$accounted", severity)
    }
  }

  /** quarantined/extracted must stay under a bound — RowCountRangePolicy
    * analog (.../policies/count/RowCountRangePolicy.java). */
  final case class QuarantineRatePolicy(maxRatio: Double,
      severity: Severity = Fail) extends Policy {
    val name = "quarantine_rate"
    def check(s: EpochStats): Result = {
      val ratio = if (s.rowsExtracted == 0) 0.0
        else s.rowsQuarantined.toDouble / s.rowsExtracted
      Result(name, ratio <= maxRatio, f"ratio=$ratio%.4f max=$maxRatio", severity)
    }
  }

  /** epoch must have applied at least `minRows` (sanity floor). */
  final case class MinRowsPolicy(minRows: Long, severity: Severity = Optional)
      extends Policy {
    val name = "min_rows"
    def check(s: EpochStats): Result =
      Result(name, s.rowsApplied >= minRows,
        s"applied=${s.rowsApplied} min=$minRows", severity)
  }

  final class EpochAbortedException(val results: Seq[Result])
      extends RuntimeException(
        s"task-level policy failed: ${results.filterNot(_.passed).map(r => s"${r.policy} (${r.detail})").mkString(", ")}")

  /** evaluate all; throw (abort commit) if any Fail-severity policy failed. */
  def enforce(policies: Seq[Policy], stats: EpochStats): Seq[Result] = {
    val results = policies.map(_.check(stats))
    if (results.exists(r => !r.passed && r.severity == Fail))
      throw new EpochAbortedException(results)
    results
  }
}
