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

  def passAll(policies: Seq[Policy] = defaults): Column =
    policies.map(_.pass).reduce(_ && _)

  /** First failing policy name (for the quarantine `reason` column). */
  def failReason(policies: Seq[Policy] = defaults): Column =
    policies.foldRight(lit("ok")) { (p, rest) => when(!p.pass, p.name).otherwise(rest) }
}
