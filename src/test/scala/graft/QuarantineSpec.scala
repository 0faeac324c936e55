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

  test("reprocess round-trip: poison rows -> fix policy -> survivors land; " +
      "counters reconcile; still-bad rows stay pending") {
    import graft.pipeline.{QuarantineReprocess, RowPolicies}
    import graft.merge.Intervals
    val t = IceTable.create(tmpDir("qrt"), numBuckets = 4)
    val qDir = tmpDir("qrq")
    def reconciles(st: graft.model.EpochStats) =
      st.rowsExtracted == st.rowsQuarantined + st.rowsApplied +
        st.deletesApplied + st.dedupDrops + st.staleDrops

    // epoch 0 under an OVERLY-STRICT policy: content must be >= 3 chars.
    // good rows pass; 5 "short" rows and 1 truly-bad (null op) quarantine.
    val strict = RowPolicies.defaults :+
      RowPolicies.Policy("content_min3", length(col("content")) >= 3)
    val events =
      (0 until 10).map(i => ChangeEvent("u", i.toLong, "r0", s"g$i",
        f"c$i%040d", "scala", s"val$i")) ++
      (10 until 15).map(i => ChangeEvent("u", i.toLong, "r0", s"p$i",
        f"c$i%040d", "scala", "x")) :+
      ChangeEvent(null, 15L, "r0", "pX", "c" * 40, "scala", "val")
    val out0 = MergeEngine.applyEpoch(spark, t, events.toDS(), epochId = 0,
      nLogPartitions = 2, quarantineDir = Some(qDir), rowPolicies = strict,
      claimedRange = Some((-1L, 15L)))
    assert(out0.stats.rowsQuarantined == 6 && out0.stats.rowsApplied == 10)
    assert(t.read(spark).count() == 10)

    // meanwhile p10's key moves on: a NEWER committed update (seq 20)
    MergeEngine.applyEpoch(spark, t, Seq(ChangeEvent("u", 20L, "r0", "p10",
      "d" * 40, "scala", "newer")).toDS(), epochId = 1, nLogPartitions = 2,
      claimedRange = Some((15L, 20L)))

    // fix = drop the strict policy; reprocess everything pending
    val rep = QuarantineReprocess.run(spark, t, qDir, epochId = 100,
      nLogPartitions = 2)
    assert(rep.consumedEpochs == Seq(0L) && rep.rowsRead == 6)
    assert(rep.applied == 4, "p11..p14 survive the fixed policy and land")
    assert(rep.staleDrops == 1,
      "p10's quarantined seq=10 loses LWW to the committed seq=20")
    assert(rep.requarantined == 1, "the null-op row fails defaults too")
    assert(reconciles(rep.outcome.get.stats))
    val state = t.read(spark).select("path", "content").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert((11 until 15).forall(i => state(s"p$i") == "x"))
    assert(state("p10") == "newer", "reprocess must not resurrect stale data")
    assert(!state.contains("pX"))
    // offset claims were already covered by the original epochs: unchanged
    val ivs = MergeEngine.committedIntervals(t.currentManifest())
    assert(ivs.values.forall(s => Intervals.covers(s, 15L) &&
      Intervals.covers(s, 20L)))

    // still-bad rows are re-quarantined under the NEW epoch and stay
    // pending; the consumed input was archived (repeat run = no-op on state)
    assert(QuarantineReprocess.pendingEpochs(spark, qDir) == Seq(100L))
    val v = t.currentVersion()
    val rep2 = QuarantineReprocess.run(spark, t, qDir, epochId = 101,
      nLogPartitions = 2)
    assert(rep2.rowsRead == 1 && rep2.applied == 0 &&
      rep2.requarantined == 1)
    assert(rep2.outcome.get.skipped, "nothing fresh: no new snapshot")
    assert(t.currentVersion() == v)
    assert(QuarantineReprocess.pendingEpochs(spark, qDir) == Seq(101L))
    // and with NOTHING pending, run() is a true no-op
    val rep3 = QuarantineReprocess.run(spark, t, tmpDir("qempty"),
      epochId = 102)
    assert(rep3.outcome.isEmpty && rep3.rowsRead == 0)
  }

  test("reprocess is a no-op over file-less quarantine dirs (the normal " +
      "all-clean-epoch state)") {
    import graft.pipeline.QuarantineReprocess
    val t = IceTable.create(tmpDir("qnofiles"), numBuckets = 2)
    val q = tmpDir("qrootnf")
    // an all-clean epoch's overwrite-mode quarantine write can leave a dir
    // holding only _SUCCESS — schema inference would throw; reprocess must
    // treat it as zero pending rows and archive it
    assert(new java.io.File(s"$q/epoch=0").mkdirs())
    assert(new java.io.File(s"$q/epoch=0/_SUCCESS").createNewFile())
    val rep = QuarantineReprocess.run(spark, t, q, epochId = 10,
      nLogPartitions = 2)
    assert(rep.consumedEpochs == Seq(0L) && rep.rowsRead == 0)
    assert(rep.outcome.exists(_.skipped) && rep.applied == 0)
    // the consumed dir is archived; only the run's OWN (empty) quarantine
    // output remains pending — bounded at one dir per run, never growth
    assert(QuarantineReprocess.pendingEpochs(spark, q) == Seq(10L),
      "the consumed dir must be archived, not re-scanned forever")
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
