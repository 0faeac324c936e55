package graft

import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.pipeline.TaskPolicies
import graft.table.IceTable
import org.apache.spark.sql.functions._

/** FIXTURES.md §5: a log salted with malformed events exercises the
  * row-level policies (ERR_FILE-style quarantine side output) and the
  * task-level commit gate. */
class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  private def saltedLog: Seq[ChangeEvent] = {
    val good = (0 until 100).map(i =>
      ChangeEvent(if (i % 10 == 0) "d" else "u", i.toLong, s"r${i % 3}",
        s"p$i", f"c$i%040d", "scala", if (i % 10 == 0) "" else s"v$i"))
    val bad = Seq(
      ChangeEvent("x", 1000L, "r0", "p1", "c", "scala", "v"),   // op unknown
      ChangeEvent("u", 1001L, null, "p1", "c", "scala", "v"),   // null repo
      ChangeEvent("u", 1002L, "r0", "", "c", "scala", "v"),     // empty path
      ChangeEvent("u", -5L, "r0", "p1", "c", "scala", "v"),     // bad seq
      ChangeEvent("u", 1004L, "r0", "p1", "c", "scala", null),  // null content
      // null op: the predicate is three-valued NULL — must still quarantine,
      // never silently vanish from both branches (ADVICE r1 null-guard)
      ChangeEvent(null, 1005L, "r0", "p1", "c", "scala", "v"))
    good ++ bad
  }

  test("malformed events divert to quarantine with reasons; counters reconcile") {
    val t = IceTable.create(tmpDir("qtab"), numBuckets = 4)
    val qDir = tmpDir("quarantine")
    val out = MergeEngine.applyEpoch(spark, t, saltedLog.toDS(), epochId = 0,
      nLogPartitions = 4, quarantineDir = Some(qDir))
    assert(out.stats.rowsQuarantined == 6)
    assert(out.stats.rowsExtracted == 106)
    assert(out.stats.rowsExtracted == out.stats.rowsQuarantined +
      out.stats.rowsApplied + out.stats.deletesApplied + out.stats.dedupDrops +
      out.stats.staleDrops)
    val q = spark.read.parquet(s"$qDir/epoch=0")
    assert(q.count() == 6)
    val reasons = q.select("reason").as[String].collect().toSet
    assert(reasons == Set("op_known", "repo_nonnull", "path_nonnull",
      "seq_nonnegative", "content_present_unless_delete"))
    // quarantined rows must NOT reach the table
    assert(t.read(spark).filter(col("repo").isNull).count() == 0)
  }

  test("policy-discarded rows are counted even WITHOUT a quarantine sink") {
    // quarantineDir=None (the MultiTableIngest default): dropped rows must
    // still appear in rowsQuarantined/rowsExtracted — a silent uncounted
    // drop would hide the discard from reconciliation entirely. The count
    // rides the winners aggregate as an Observation (no extra pass).
    val t = IceTable.create(tmpDir("qnone"), numBuckets = 4)
    val out = MergeEngine.applyEpoch(spark, t, saltedLog.toDS(), epochId = 0,
      nLogPartitions = 4, quarantineDir = None)
    assert(out.stats.rowsQuarantined == 6,
      s"discards must be counted with no sink: ${out.stats}")
    assert(out.stats.rowsExtracted == 106)
    assert(out.stats.rowsExtracted == out.stats.rowsQuarantined +
      out.stats.rowsApplied + out.stats.deletesApplied + out.stats.dedupDrops +
      out.stats.staleDrops)
  }

  test("Fail-severity task policy aborts the epoch: no snapshot committed") {
    val t = IceTable.create(tmpDir("qtab2"), numBuckets = 4)
    val strict = Seq(TaskPolicies.RowCountReconciliation(),
      TaskPolicies.QuarantineRatePolicy(maxRatio = 0.01))
    intercept[TaskPolicies.EpochAbortedException] {
      MergeEngine.applyEpoch(spark, t, saltedLog.toDS(), epochId = 0,
        nLogPartitions = 4, quarantineDir = Some(tmpDir("q2")),
        taskPolicies = strict)
    }
    assert(t.currentVersion() == -1L, "aborted epoch must not commit")
    // relaxed bound → same epoch commits cleanly (replay after fix)
    val out = MergeEngine.applyEpoch(spark, t, saltedLog.toDS(), epochId = 0,
      nLogPartitions = 4, quarantineDir = Some(tmpDir("q3")),
      taskPolicies = Seq(TaskPolicies.RowCountReconciliation(),
        TaskPolicies.QuarantineRatePolicy(maxRatio = 0.10)))
    assert(!out.skipped && t.currentVersion() == 0L)
  }

  test("Optional-severity policy records failure without aborting") {
    val t = IceTable.create(tmpDir("qtab3"), numBuckets = 4)
    val out = MergeEngine.applyEpoch(spark, t, saltedLog.toDS(), epochId = 0,
      nLogPartitions = 4,
      taskPolicies = Seq(TaskPolicies.MinRowsPolicy(minRows = 1000000)))
    assert(t.currentVersion() == 0L, "optional policy must not block commit")
    assert(!out.skipped)
  }
}
