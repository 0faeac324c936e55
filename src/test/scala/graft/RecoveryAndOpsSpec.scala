package graft

import graft.driver.ReplayJob
import graft.log.{ChangeLogGen, LogSpec, OracleFold}
import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.pipeline.RowPolicies
import graft.table.IceTable

/** Round-2 engine features: offset out-of-range recovery policies,
  * completeness watermark, late-data row policy, per-epoch metrics export,
  * catalog (view) registration on commit. */
class RecoveryAndOpsSpec extends SparkSpec {
  import spark.implicits._

  private val spec = LogSpec(seed = 77L, nEvents = 1000, nRepos = 4,
    nPathsPerRepo = 8, pDelete = 0.1)

  private def sha(t: IceTable): Map[(String, String), String] =
    t.read(spark).select("repo", "path", "contentSha").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  /** log slice as a Dataset; local copies so closures don't capture the
    * (non-serializable) suite */
  private def slice(lo: Long, hi: Long): org.apache.spark.sql.Dataset[ChangeEvent] = {
    val sp = spec
    val cdf = ChangeLogGen.zipfCdf(sp.nRepos, sp.zipfExponent)
    spark.range(lo + 1, hi + 1).map(s => ChangeLogGen.eventAt(sp, cdf, s))
  }

  /** ingest only seqs <= 499, then "retention" purges seqs < 700 */
  private def truncatedScenario(): IceTable = {
    val t = IceTable.create(tmpDir("oor"), numBuckets = 2)
    MergeEngine.applyEpoch(spark, t, slice(-1, 499), 0, nLogPartitions = 2,
      claimedRange = Some((-1L, 499L)))
    t
  }

  private def retainedTail(): org.apache.spark.sql.Dataset[ChangeEvent] =
    slice(699, 999)

  test("reset earliest: purged gap is claimed, retained tail ingests") {
    val t = truncatedScenario()
    assert(ReplayJob.resetOutOfRange(t, ReplayJob.ResetEarliest,
      logEarliest = 700L, logLatest = 999L, nLogPartitions = 2))
    // the lost range (499, 699] is fenced; completeness can advance past it
    val m = t.currentManifest().get
    assert(m.offsets.forall(r => r.lowSeq == -1L && r.highSeq == 699L))
    MergeEngine.applyEpoch(spark, t, retainedTail(), 1, nLogPartitions = 2,
      claimedRange = Some((699L, 999L)))
    val want = OracleFold.fold(ChangeLogGen.generateLocal(spec)
      .filter(e => e.seq <= 499 || e.seq >= 700))
      .map { case (k, v) => k -> v.contentSha }
    assert(sha(t) == want, "head + retained tail must both be applied")
    assert(t.currentManifest().get.completeUntilSeq == 999L)
  }

  test("reset latest: history skipped, replaying retained tail is fenced") {
    val t = truncatedScenario()
    assert(ReplayJob.resetOutOfRange(t, ReplayJob.ResetLatest,
      logEarliest = 700L, logLatest = 999L, nLogPartitions = 2))
    val before = sha(t)
    val out = MergeEngine.applyEpoch(spark, t, retainedTail(), 1,
      nLogPartitions = 2, claimedRange = Some((699L, 999L)))
    assert(out.skipped, "everything up to the tail is fenced under Latest")
    assert(sha(t) == before)
  }

  test("reset nearest snaps below-range to earliest; in-range is a no-op") {
    val t = truncatedScenario()
    assert(ReplayJob.resetOutOfRange(t, ReplayJob.ResetNearest,
      logEarliest = 700L, logLatest = 999L, nLogPartitions = 2))
    val m = t.currentManifest().get
    assert(m.offsets.forall(_.highSeq == 699L))
    // second invocation: nothing out of range anymore
    assert(!ReplayJob.resetOutOfRange(t, ReplayJob.ResetNearest,
      logEarliest = 700L, logLatest = 999L, nLogPartitions = 2))
    // and a table whose watermark is in range never resets
    val t2 = truncatedScenario()
    assert(!ReplayJob.resetOutOfRange(t2, ReplayJob.ResetEarliest,
      logEarliest = 300L, logLatest = 999L, nLogPartitions = 2))
  }

  test("reset fences purged MID-LOG gaps, not just the top watermark") {
    // out-of-order segment arrival: committed [(-1,100], (300,499]] on each
    // partition; retention then purges below seq 350. Seqs 101..299 can
    // never arrive — earliest must fence them (else the completeness/purge
    // horizon stalls forever), even though maxHigh(499) is past the head.
    val t = IceTable.create(tmpDir("midgap"), numBuckets = 2)
    MergeEngine.applyEpoch(spark, t, slice(-1, 100), 0, nLogPartitions = 2,
      claimedRange = Some((-1L, 100L)))
    MergeEngine.applyEpoch(spark, t, slice(300, 499), 1, nLogPartitions = 2,
      claimedRange = Some((300L, 499L)))
    assert(t.currentManifest().get.completeUntilSeq == 100L)
    assert(ReplayJob.resetOutOfRange(t, ReplayJob.ResetEarliest,
      logEarliest = 350L, logLatest = 999L, nLogPartitions = 2))
    val m = t.currentManifest().get
    assert(m.offsets.forall(r => r.lowSeq == -1L && r.highSeq == 499L),
      s"gap must merge into one fenced prefix: ${m.offsets}")
    assert(m.completeUntilSeq == 499L,
      "completeness must advance past the purged hole")
  }

  test("reset with a smaller partition count never drops a foreign fence") {
    val t = truncatedScenario() // committed on partitions 0..1
    // operator reconfigures down to 1 log partition; partition 1's committed
    // intervals must survive in the manifest (they still fence replays)
    assert(ReplayJob.resetOutOfRange(t, ReplayJob.ResetEarliest,
      logEarliest = 700L, logLatest = 999L, nLogPartitions = 1))
    val parts = t.currentManifest().get.offsets.map(_.partitionId).toSet
    assert(parts == Set(0, 1), s"foreign partition fence dropped: $parts")
  }

  test("segment claims cover quarantined seqs: horizon never stalls on them") {
    // a quarantined row's seq is terminal (it will never apply) — the claim
    // must include it, or completeness/purge would stall on a permanent gap
    val t = IceTable.create(tmpDir("qclaim"), numBuckets = 2)
    val events = (0 until 100).map { i =>
      // seq 50 is malformed (null content on an update) -> quarantined
      ChangeEvent("u", i.toLong, "r", s"p${i % 7}", f"c$i%040d", "scala",
        if (i == 50) null else s"v$i")
    }
    val out = MergeEngine.applyEpoch(spark, t, events.toDS(), 0,
      nLogPartitions = 2, quarantineDir = Some(tmpDir("qc")))
    assert(out.stats.rowsQuarantined == 1)
    val m = t.currentManifest().get
    assert(m.offsets.forall(r => r.lowSeq == -1L && r.highSeq == 99L),
      s"one contiguous claim incl. the quarantined seq: ${m.offsets}")
    assert(m.completeUntilSeq == 99L)

    // an ALL-quarantined segment batch still commits its claims, with
    // reconciling counters, through the task-policy gate
    val bad = (100 until 110).map(i =>
      ChangeEvent("u", i.toLong, "r", s"p$i", f"c$i%040d", "scala", null))
    val out2 = MergeEngine.applyEpoch(spark, t, bad.toDS(), 1,
      nLogPartitions = 2, quarantineDir = Some(tmpDir("qc2")))
    assert(out2.skipped && out2.stats.rowsExtracted == 10 &&
      out2.stats.rowsQuarantined == 10)
    assert(t.currentManifest().get.completeUntilSeq == 109L,
      "quarantined-only batch must still advance the fence")
  }

  test("gappy unknown-provenance batch claims only observed runs") {
    // in-memory batch with seqs {0..4, 100..104}: the gap 5..99 must NOT be
    // fenced — its events arrive later and must apply
    val t = IceTable.create(tmpDir("gappy"), numBuckets = 2)
    val batch = slice(-1, 4).union(slice(99, 104))
    MergeEngine.applyEpoch(spark, t, batch, 0, nLogPartitions = 2)
    val ivs = t.currentManifest().get.offsets
      .filter(_.partitionId == 0).map(r => (r.lowSeq, r.highSeq))
    assert(ivs == Seq((-1L, 4L), (99L, 104L)),
      s"exact observed runs only, gap unclaimed: $ivs")
    // the gap's events arrive later and are applied, not dropped
    val out = MergeEngine.applyEpoch(spark, t, slice(4, 99), 1,
      nLogPartitions = 2)
    assert(!out.skipped && out.stats.rowsApplied + out.stats.deletesApplied +
      out.stats.dedupDrops + out.stats.staleDrops == 95)
    val want = OracleFold.fold(ChangeLogGen.generateLocal(spec)
      .filter(_.seq <= 104)).map { case (k, v) => k -> v.contentSha }
    assert(sha(t) == want)
    assert(t.currentManifest().get.completeUntilSeq == 104L)
  }

  test("partition-universe GROWTH widens the fence; shrinking fails fast") {
    // shrinking strands claims → still a fail-fast
    val t0 = truncatedScenario() // committed with nLogPartitions = 2
    intercept[IllegalArgumentException] {
      MergeEngine.applyEpoch(spark, t0, slice(499, 510), 1, nLogPartitions = 1)
    }

    // growing mid-replay: new partitions enter with the intersection fence,
    // so completeness keeps advancing and replays stay fully fenced
    val t = truncatedScenario() // (-1, 499] committed on partitions {0, 1}
    MergeEngine.applyEpoch(spark, t, slice(499, 999), 1, nLogPartitions = 4,
      claimedRange = Some((499L, 999L)))
    val m = t.currentManifest().get
    assert(m.offsets.map(_.partitionId).toSet == Set(0, 1, 2, 3),
      "the widened universe must persist with the commit")
    assert(m.offsets.forall(r => r.lowSeq == -1L && r.highSeq == 999L),
      "new partitions must inherit the intersection (origin-anchored) fence")
    assert(m.completeUntilSeq == 999L,
      "growth must not freeze the completeness horizon")
    // a FULL replay under the grown universe is fully fenced
    val replay = MergeEngine.applyEpoch(spark, t, slice(-1, 999), 2,
      nLogPartitions = 4)
    assert(replay.skipped, "replay after growth must be fenced to a no-op")
    val want = OracleFold.fold(ChangeLogGen.generateLocal(spec))
      .map { case (k, v) => k -> v.contentSha }
    assert(sha(t) == want, "grown-universe ingest must match the oracle fold")
  }

  test("completeness watermark: gap blocks it, filling the gap advances it") {
    val t = IceTable.create(tmpDir("cw"), numBuckets = 2)
    // out-of-order: epoch (499, 999] first — origin prefix missing
    MergeEngine.applyEpoch(spark, t, slice(499, 999), 1, nLogPartitions = 2,
      claimedRange = Some((499L, 999L)))
    assert(t.currentManifest().get.completeUntilSeq == Long.MinValue,
      "watermark must NOT advance past the (−1,499] gap")
    // the gap fills — watermark jumps to the full contiguous prefix
    MergeEngine.applyEpoch(spark, t, slice(-1, 499), 0, nLogPartitions = 2,
      claimedRange = Some((-1L, 499L)))
    assert(t.currentManifest().get.completeUntilSeq == 999L)
  }

  test("late-data row policy quarantines below-bound events") {
    val t = IceTable.create(tmpDir("late"), numBuckets = 2)
    val events = Seq(
      ChangeEvent("i", 100L, "r", "p1", "c1", "scala", "v1"),
      ChangeEvent("i", 5L, "r", "p2", "c2", "scala", "v2"), // too old
      ChangeEvent("i", 200L, "r", "p3", "c3", "scala", "v3"))
    val qDir = tmpDir("lateq")
    val out = MergeEngine.applyEpoch(spark, t, events.toDS(), 0,
      nLogPartitions = 2, quarantineDir = Some(qDir),
      rowPolicies =
        RowPolicies.defaults :+ RowPolicies.timestampLowerBound("seq", 50L))
    assert(out.stats.rowsQuarantined == 1)
    assert(out.stats.rowsApplied == 2)
    val q = spark.read.parquet(s"$qDir/epoch=0")
    assert(q.select("reason").as[String].collect().toSeq ==
      Seq("seq_lower_bound"))
    assert(sha(t).keySet == Set(("r", "p1"), ("r", "p3")))
  }

  test("metrics rows land per epoch beside lineage") {
    val state = tmpDir("mstate")
    val t = IceTable.create(tmpDir("mtab"), numBuckets = 2)
    ReplayJob.replayGenerated(spark, t, spec, nEpochs = 2,
      nLogPartitions = 2, stateDir = Some(state))
    (0 until 2).foreach { e =>
      val m = spark.read.parquet(s"$state/metrics/epoch=$e")
      assert(m.count() == 1)
      val row = m.head()
      assert(row.getAs[Double]("eventsPerSec") > 0)
      assert(row.getAs[Double]("quarantineRate") == 0.0)
      assert(row.getAs[Long]("rowsApplied") > 0)
    }
    // completeness watermark surfaces in the ops metrics
    val last = spark.read.parquet(s"$state/metrics/epoch=1").head()
    assert(last.getAs[Long]("completeUntilSeq") == spec.nEvents - 1)
  }

  test("produce-rate tracker + budgeted epoch admission") {
    import graft.driver.RateControl
    val tr = new RateControl.ProduceRateTracker(alpha = 0.5)
    tr.update(0, events = 1000, secs = 1.0)  // 1000 ev/s
    tr.update(0, events = 3000, secs = 1.0)  // EWMA: 0.5*3000 + 0.5*1000
    assert(tr.rate(0) == 2000.0)
    tr.update(1, events = 500, secs = 0.5)   // 1000 ev/s first obs
    assert(tr.totalRate == 3000.0)
    // admission: 60s budget at 3000 ev/s => 180k events per epoch
    val eps = RateControl.planEpochsByBudget(-1L, 399999L,
      targetSecsPerEpoch = 60.0, eventsPerSec = tr.totalRate)
    assert(eps.size == 3)
    assert(eps.forall { case (_, lo, hi) => hi - lo <= 180000L })
    assert(eps.head._2 == -1L && eps.last._3 == 399999L)
    // unknown rate: one epoch, no starvation
    assert(RateControl.planEpochsByBudget(-1L, 99L, 60.0, 0.0).size == 1)
  }

  test("ingestion health check flags backlog, rising lag, quarantine") {
    import graft.driver.RateControl._
    def h(e: Long, eps: Double, lag: Long, q: Double = 0.0) =
      EpochHealth(e, eps, lag, q)
    // healthy: keeping up
    assert(check(Seq(h(0, 5000, 10), h(1, 5200, 8), h(2, 5100, 9)),
      produceRate = 4000).healthy)
    // backlog: consumption below produce rate for the whole window
    val backlog = check(Seq(h(0, 3000, 10), h(1, 3100, 12), h(2, 2900, 11)),
      produceRate = 4000)
    assert(!backlog.healthy && backlog.reasons.exists(_.contains("backlog")))
    // rising lag spread across the window
    val lagging = check(Seq(h(0, 9000, 10), h(1, 9000, 20), h(2, 9000, 40)),
      produceRate = 4000)
    assert(!lagging.healthy && lagging.reasons.exists(_.contains("lag")))
    // persistent quarantine rate
    val dirty = check(Seq(h(0, 9000, 5, 0.2), h(1, 9000, 4, 0.3),
      h(2, 9000, 5, 0.4)), produceRate = 4000)
    assert(!dirty.healthy && dirty.reasons.exists(_.contains("quarantine")))
    // not enough history: healthy by default
    assert(check(Seq(h(0, 1, 1)), produceRate = 4000).healthy)
  }

  test("bi-level packing balances slots while preserving group affinity") {
    import graft.sources.IncrementalFileSource
    import graft.sources.IncrementalFileSource.FileEntry
    val src = new IncrementalFileSource(tmpDir("blp"))
    val files = (0 until 4).flatMap { g =>
      (0 until 12).map(i => FileEntry(s"/logs/topic$g/part-$i.parquet",
        size = 100L + 37L * ((g * 12 + i) % 7)))
    }
    val bins = src.binPackBiLevel(files, nBins = 4)
    assert(bins.flatten.sortBy(_.path) == files.sortBy(_.path),
      "every file packed exactly once")
    val sizes = bins.map(_.map(_.size).sum)
    assert(sizes.max <= 2 * (sizes.sum / sizes.length),
      s"slots must stay balanced: $sizes")
    // affinity: a topic's files touch few slots (sub-bins ride intact)
    val topicSpread = (0 until 4).map { g =>
      bins.count(_.exists(_.path.contains(s"topic$g/")))
    }
    assert(topicSpread.forall(_ <= 3),
      s"bi-level packing should keep topics on few slots: $topicSpread")
  }

  test("rollbackTo re-points at an old snapshot byte-for-byte under a " +
      "fresh version; mirrors of a rolled-back upstream fail loudly") {
    val t = IceTable.create(tmpDir("rollb"), numBuckets = 2)
    MergeEngine.applyEpoch(spark, t, slice(-1, 499), 0, nLogPartitions = 2,
      claimedRange = Some((-1L, 499L)))
    val vTarget = t.currentVersion()
    val rawAtTarget = t.readRaw(spark).collect().map(_.toString).sorted.toSeq
    val offAtTarget = MergeEngine.committedIntervals(t.currentManifest())
    // a mirror synced to the PRE-rollback state
    val mir = IceTable.create(tmpDir("rollb-m"), numBuckets = 2)
    graft.driver.MirrorJob.sync(spark, t, mir, nLogPartitions = 2)
    MergeEngine.applyEpoch(spark, t, slice(499, 999), 1, nLogPartitions = 2,
      claimedRange = Some((499L, 999L)))
    graft.driver.MirrorJob.sync(spark, t, mir, nLogPartitions = 2)
    val vCur = t.currentVersion()
    assert(vCur > vTarget)
    // hard rollback: state equals the target snapshot BYTE-FOR-BYTE (raw
    // view: same rows, same lastSeqs, same tombstones), fresh version
    val rolled = t.rollbackTo(vTarget)
    assert(rolled.version == vCur + 1)
    assert(t.readRaw(spark).collect().map(_.toString).sorted.toSeq ==
      rawAtTarget, "rolled-back state must equal the target snapshot")
    assert(MergeEngine.committedIntervals(t.currentManifest()) ==
      offAtTarget, "offsets revert with the state")
    assert(t.history().last.epochId == 1300000000L + vTarget,
      "the rollback commit is tagged in history")
    // idempotent shortcut + bad targets
    assert(t.rollbackTo(t.currentVersion()).version == t.currentVersion())
    intercept[IllegalArgumentException] { t.rollbackTo(9999L) }
    // the mirror saw offsets REGRESS — mechanical sync must fail loudly,
    // never silently stamp a diverged replica
    val e = intercept[IllegalStateException] {
      graft.driver.MirrorJob.sync(spark, t, mir, nLogPartitions = 2)
    }
    assert(e.getMessage.contains("regressed"), e.getMessage)
  }

  test("revertTo restores an old snapshot's USER state as a compensating " +
      "epoch: offsets keep advancing and mirrors follow normally") {
    val t = IceTable.create(tmpDir("revt"), numBuckets = 2)
    MergeEngine.applyEpoch(spark, t, slice(-1, 499), 0, nLogPartitions = 2,
      claimedRange = Some((-1L, 499L)))
    val vTarget = t.currentVersion()
    val userAtTarget = t.read(spark).collect().map(_.toString).sorted.toSeq
    val mir = IceTable.create(tmpDir("revt-m"), numBuckets = 2)
    graft.driver.MirrorJob.sync(spark, t, mir, nLogPartitions = 2)
    MergeEngine.applyEpoch(spark, t, slice(499, 999), 1, nLogPartitions = 2,
      claimedRange = Some((499L, 999L)))
    graft.driver.MirrorJob.sync(spark, t, mir, nLogPartitions = 2)
    val offBefore = MergeEngine.committedIntervals(t.currentManifest())
    val out = graft.maintenance.Revert.revertTo(spark, t, vTarget,
      nLogPartitions = 2)
    assert(!out.skipped && out.stats.rowsApplied + out.stats.deletesApplied > 0)
    // user-visible state equals the target; committed offsets only GREW
    // (the compensating block claims in the reserved namespace)
    assert(t.read(spark).collect().map(_.toString).sorted.toSeq ==
      userAtTarget, "reverted user state must equal the target snapshot")
    val offAfter = MergeEngine.committedIntervals(t.currentManifest())
    offBefore.foreach { case (p, ivs) =>
      assert(graft.merge.Intervals.subtract(ivs,
        offAfter.getOrElse(p, Nil)).isEmpty,
        "revert must never regress committed offsets")
    }
    // a mirror follows the revert through its NORMAL incremental sync
    graft.driver.MirrorJob.sync(spark, t, mir, nLogPartitions = 2)
    assert(mir.read(spark).collect().map(_.toString).sorted.toSeq ==
      userAtTarget, "mirrors converge across a revert")
    // revert and hard rollback must be DISTINGUISHABLE in history(): the
    // compensating revert tags 1.4e9+, the hard re-point tags 1.3e9+
    val revertTag = t.history().last.epochId
    assert(revertTag >= 1400000000L && revertTag < 1500000000L,
      s"revert commits tag in the 1.4e9 ops range, got $revertTag")
    // reverting to the current version is a no-op
    assert(graft.maintenance.Revert.revertTo(spark, t,
      t.currentVersion(), nLogPartitions = 2).skipped)
  }

  test("view registration: SQL name tracks the latest snapshot per commit") {
    val t = IceTable.create(tmpDir("vtab"), numBuckets = 2)
    val ranges = Seq((0L, -1L, 499L), (1L, 499L, 999L))
    ReplayJob.run(spark, t, id => { val (_, lo, hi) = ranges(id.toInt)
      slice(lo, hi) }, ranges.take(1), nLogPartitions = 2,
      viewName = Some("graft_repo_files"))
    val afterFirst = spark.sql(
      "SELECT count(*) AS n FROM graft_repo_files").head().getLong(0)
    assert(afterFirst == t.readAt(spark, 0L).count())
    ReplayJob.run(spark, t, id => { val (_, lo, hi) = ranges(id.toInt)
      slice(lo, hi) }, ranges, nLogPartitions = 2,
      viewName = Some("graft_repo_files"))
    val afterSecond = spark.sql(
      "SELECT count(*) AS n FROM graft_repo_files").head().getLong(0)
    assert(afterSecond == t.read(spark).count())
    val want = OracleFold.fold(ChangeLogGen.generateLocal(spec)).size
    assert(afterSecond == want, "view must reflect the LATEST snapshot")
    // a PURE replay (every epoch fenced) must still register the view
    spark.catalog.dropTempView("graft_repo_files")
    ReplayJob.run(spark, t, id => { val (_, lo, hi) = ranges(id.toInt)
      slice(lo, hi) }, ranges, nLogPartitions = 2,
      viewName = Some("graft_repo_files"))
    assert(spark.sql("SELECT count(*) AS n FROM graft_repo_files")
      .head().getLong(0) == want,
      "fenced replay must still make committed state queryable by name")

    // publish-time DURABLE registration: with a catalog handed in, the run
    // also registers the table for cross-session discovery (idempotent —
    // three runs above + this one burn one catalog version)
    val cat = graft.table.GraftCatalog.create(tmpDir("vcat"))
    ReplayJob.run(spark, t, id => { val (_, lo, hi) = ranges(id.toInt)
      slice(lo, hi) }, ranges, nLogPartitions = 2,
      viewName = Some("graft_repo_files"), catalog = Some(cat))
    val v0 = cat.currentVersion()
    ReplayJob.run(spark, t, id => { val (_, lo, hi) = ranges(id.toInt)
      slice(lo, hi) }, ranges, nLogPartitions = 2,
      viewName = Some("graft_repo_files"), catalog = Some(cat))
    assert(cat.currentVersion() == v0, "re-registration is idempotent")
    val s2 = spark.newSession()
    assert(cat.loadView(s2, "graft_repo_files").read(s2).count() == want,
      "a fresh session discovers the published table by name")
  }
}
