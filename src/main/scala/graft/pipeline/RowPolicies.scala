package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Row-level quality policies with ERR_FILE-style side output — the Spark
 * re-expression of the reference's RowLevelPolicy / RowLevelPolicyChecker
 * (gobblin-api/.../qualitychecker/row/RowLevelPolicy.java:37-45,
 * gobblin-core/.../qualitychecker/row/RowLevelPolicyChecker.java:101):
 * instead of a per-record Java loop, each policy is a Catalyst predicate;
 * the checker is a single `filter` (codegen'd, pushed down where possible)
 * and the rejects branch is diverted to a quarantine table.
 */
object RowPolicies {

  /** A named policy = predicate that must hold for the record to pass. */
  final case class Policy(name: String, pass: Column)

  /** Default policy set for the CDC envelope (FIXTURES.md §5). */
  val defaults: Seq[Policy] = Seq(
    Policy("op_known", col("op").isin("i", "u", "d")),
    Policy("repo_nonnull", col("repo").isNotNull && length(col("repo")) > 0),
    Policy("path_nonnull", col("path").isNotNull && length(col("path")) > 0),
    Policy("seq_nonnegative", col("seq").isNotNull && col("seq") >= 0),
    Policy("content_present_unless_delete",
      col("op") === "d" || col("content").isNotNull)
  )

  /** Late-data lower bound (the reference's RecordTimestampLowerBoundPolicy,
    * gobblin-core/.../policies/time/RecordTimestampLowerBoundPolicy.java:40):
    * quarantine records whose event-time column lies at or below a cutoff —
    * too old to admit (e.g. beyond the retention/completeness horizon).
    * Compose with `defaults :+ timestampLowerBound(...)`. */
  def timestampLowerBound(timeCol: String, minExclusive: Long): Policy =
    Policy(s"${timeCol}_lower_bound",
      col(timeCol).isNotNull && col(timeCol) > minExclusive)

  /** Conjunction of all policies, null-safe: a NULL predicate result (e.g. a
    * null `op` making `op.isin(...)` three-valued-NULL) counts as FAIL, so
    * the record lands in quarantine instead of silently vanishing from both
    * the good and the bad branch (`!NULL` is NULL — such a row would match
    * neither `filter(passAll)` nor `filter(!passAll)`). */
  def passAll(policies: Seq[Policy] = defaults): Column =
    if (policies.isEmpty) lit(true) // no policies ⇒ everything passes
    else coalesce(policies.map(_.pass).reduce(_ && _), lit(false))

  /** First failing policy name (for the quarantine `reason` column);
    * null-safe per policy (NULL predicate == that policy failed). */
  def failReason(policies: Seq[Policy] = defaults): Column =
    policies.foldRight(lit("ok")) { (p, rest) =>
      when(!coalesce(p.pass, lit(false)), p.name).otherwise(rest) }
}
