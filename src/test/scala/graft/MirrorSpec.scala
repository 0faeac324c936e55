package graft

import graft.driver.MirrorJob
import graft.maintenance.Compaction
import graft.merge.{Intervals, MergeEngine}
import graft.model.ChangeEvent
import graft.table.IceTable
import org.apache.spark.sql.functions._

/**
 * Table mirroring over the change feed (MirrorJob.sync): state and OFFSET
 * convergence, per-partition claim deltas under divergent upstream
 * watermarks, purged-tombstone deletes, recovery resync after the sync
 * point is clobbered, and schema-evolution tracking.
 */
class MirrorSpec extends SparkSpec {
  import spark.implicits._

  private val N = 2 // log partitions in these fixtures

  private def ev(op: String, seq: Long, repo: String, path: String,
                 content: String): ChangeEvent =
    ChangeEvent(op, seq, repo, path, "c" * 40, "scala", content)

  private def apply(t: IceTable, epoch: Long, lo: Long, hi: Long,
                    evs: ChangeEvent*): Unit = {
    MergeEngine.applyEpoch(spark, t, evs.toDS(), epoch, nLogPartitions = N,
      claimedRange = Some((lo, hi)))
    ()
  }

  private def applySet(t: IceTable, epoch: Long,
                       claims: Map[Int, Seq[(Long, Long)]],
                       evs: ChangeEvent*): Unit = {
    MergeEngine.applyEpoch(spark, t, evs.toDS(), epoch, nLogPartitions = N,
      claimedSet = Some(claims))
    ()
  }

  private def sync(up: IceTable, mir: IceTable): MirrorJob.MirrorOutcome =
    MirrorJob.sync(spark, up, mir, nLogPartitions = N)

  /** canonical raw state: payload + lastSeq + tombstone flag per key */
  private def state(t: IceTable): Set[(String, String, String, Long, Boolean)] =
    t.readRaw(spark)
      .select(col("repo"), col("path"),
        coalesce(col("content"), lit("")).as("content"),
        col("lastSeq"), coalesce(col("deleted"), lit(false)).as("deleted"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4))).toSet

  private def offsets(t: IceTable): Map[Int, Seq[(Long, Long)]] =
    MergeEngine.committedIntervals(t.currentManifest())
      .map { case (p, ivs) => p -> Intervals.normalize(ivs) }
      .filter(_._2.nonEmpty)

  private def assertConverged(up: IceTable, mir: IceTable): Unit = {
    assert(state(mir) == state(up), "mirror state must equal upstream")
    assert(offsets(mir) == offsets(up),
      "mirror committed offsets must equal upstream")
    assert(mir.currentManifest().get.epochId == up.currentVersion(),
      "mirror must record the upstream sync point")
  }

  /** a path that hashes to log partition `p` (same hash the engine uses) */
  private def pathFor(repo: String, p: Int): String =
    Iterator.from(0).map(i => s"f$i.scala").find { path =>
      spark.range(1).select(pmod(xxhash64(lit(repo), lit(path)), lit(N))
        .cast("int")).head().getInt(0) == p
    }.get

  test("followStream: a Structured-Streaming follower applies feed " +
      "batches incrementally, resumes from its checkpoint across " +
      "restarts, and handles purged-in-window deletes") {
    val catDir = tmpDir("mirs-cat")
    val ckpt = tmpDir("mirs-ckpt")
    val up = IceTable.create(tmpDir("mirs-up"), numBuckets = 2)
    val mir = IceTable.create(tmpDir("mirs-m"), numBuckets = 2)
    // origin-anchored claims so the later tombstone purge actually fires
    apply(up, 0, -1, 3,
      ev("i", 1, "r0", "a", "A1"),
      ev("i", 2, "r0", "b", "B1"),
      ev("i", 3, "r1", "c", "C1"))
    apply(up, 1, 3, 5,
      ev("u", 4, "r0", "a", "A2"),
      ev("i", 5, "r2", "d", "D1"))
    graft.table.GraftCatalog.create(catDir).register("commits", up.dir)
    spark.conf.set("spark.sql.catalog.mirs", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.mirs.dir", catDir)
    try {
      def userView(t: IceTable) = t.read(spark).collect().toSet
      def drain(opts: Map[String, String]): Unit = {
        val q = MirrorJob.followStream(spark, "mirs.commits.changes", up,
          mir, ckpt, nLogPartitions = N, options = opts)
        q.awaitTermination()
      }
      // backlog drains under admission control (one version per batch);
      // each batch is the normal claim-delta merge
      drain(Map("maxVersionsPerTrigger" -> "1"))
      assert(userView(mir) == userView(up))
      assert(offsets(mir) == offsets(up))
      assert(mir.currentManifest().get.epochId == up.currentVersion(),
        "last data batch stamps the upstream version as the sync point")
      // upstream moves while the follower is DOWN: a delete whose
      // tombstone is then compaction-purged — the restart's single batch
      // spans both commits, so the feed SYNTHESIZES the delete (NULL seq)
      // and the merge substitutes the claim-delta top
      apply(up, 2, 5, 6, ev("d", 6, "r0", "b", ""))
      Compaction.compact(spark, up)
      assert(up.currentManifest().get.purgedBelowSeq >= 6L,
        "fixture must actually purge the tombstone")
      drain(Map.empty)
      assert(userView(mir) == userView(up),
        "purged-in-window delete must land on the streaming mirror")
      assert(offsets(mir) == offsets(up))
      assert(mir.currentManifest().get.epochId == up.currentVersion())
      // CHECKPOINT LOSS: the whole feed redelivers from the origin, and
      // the ENGINE's fence (not the checkpoint) provides exactly-once —
      // every redelivered row is fenced, the mirror commits nothing new
      val vMirBefore = mir.currentVersion()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
      drain(Map.empty)
      assert(mir.currentVersion() == vMirBefore,
        "a full feed redelivery after checkpoint loss must be fenced " +
          "(no new mirror commits)")
      assert(userView(mir) == userView(up))
      // live follower: mid-stream upstream commits land incrementally
      val q = MirrorJob.followStream(spark, "mirs.commits.changes", up,
        mir, ckpt, nLogPartitions = N,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      try {
        apply(up, 3, 6, 7, ev("u", 7, "r1", "c", "C2"))
        q.processAllAvailable()
        assert(userView(mir) == userView(up))
        assert(offsets(mir) == offsets(up))
        apply(up, 4, 7, 8, ev("i", 8, "r3", "e", "E1"))
        q.processAllAvailable()
        assert(userView(mir) == userView(up))
        assert(mir.currentManifest().get.epochId == up.currentVersion())
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.mirs")
      spark.conf.unset("spark.sql.catalog.mirs.dir")
    }
  }

  test("stream batch refuses a mirror whose state diverged from its " +
      "recorded sync point (restored backup / reused checkpoint)") {
    import graft.table.ChangeFeed
    val up = IceTable.create(tmpDir("fbv-up"), numBuckets = 2)
    val mir = IceTable.create(tmpDir("fbv-m"), numBuckets = 2)
    apply(up, 0, -1, 2, ev("i", 1, "r0", "a", "A1"), ev("i", 2, "r0", "b", "B1"))
    sync(up, mir) // mirror honestly at upstream version 0
    apply(up, 1, 2, 4, ev("u", 3, "r0", "a", "A2"), ev("i", 4, "r1", "c", "C1"))
    def feedBatch(vTo: Long, rows: (String, Long, String, String, String)*) =
      rows.toSeq.toDF("op", "seq", "repo", "path", "content")
        .withColumn("commit", lit("c" * 40)).withColumn("lang", lit("scala"))
        .withColumn("contentSha", lit(null).cast("string"))
        .withColumn(ChangeFeed.CommitVersionCol, lit(vTo))
        .withColumn(ChangeFeed.SchemaIdCol,
          lit(graft.table.SchemaRegistry.baseSchemaId))
    // SIMULATED RESTORE-FROM-BACKUP under a reused checkpoint: the mirror
    // manifest claims sync point v1 while its STATE (offsets) is still v0's
    // — the batch only carries v1's rows, so the claim delta would cover
    // seqs the batch never observed. Must fail loudly, not diverge.
    val pm = mir.currentManifest().get
    mir.commit(pm.copy(version = pm.version + 1, parentVersion = pm.version,
      epochId = up.currentVersion()))
    val e = intercept[IllegalStateException] {
      MirrorJob.applyFeedBatch(spark, up, mir,
        feedBatch(up.currentVersion(), ("u", 3L, "r0", "a", "A2"),
          ("i", 4L, "r1", "c", "C1")), nLogPartitions = N)
    }
    assert(e.getMessage.contains("sync point"))
    assert(state(mir).map(t => (t._1, t._2, t._3)) ==
      Set(("r0", "a", "A1"), ("r0", "b", "B1")),
      "the refused batch must not have touched the mirror")
    // repair the sync point; a REDELIVERED batch at/below it is a no-op
    val pm2 = mir.currentManifest().get
    mir.commit(pm2.copy(version = pm2.version + 1,
      parentVersion = pm2.version, epochId = 0L))
    val stale = MirrorJob.applyFeedBatch(spark, up, mir,
      feedBatch(0L, ("i", 1L, "r0", "a", "A1")), nLogPartitions = N)
    assert(stale.exists(_.stats.isEmpty),
      "a batch at/below the trusted sync point is a no-op")
    // and the valid next batch still applies normally
    val ok = MirrorJob.applyFeedBatch(spark, up, mir,
      feedBatch(up.currentVersion(), ("u", 3L, "r0", "a", "A2"),
        ("i", 4L, "r1", "c", "C1")), nLogPartitions = N)
    assert(ok.exists(_.stats.exists(_.rowsApplied == 2)))
    assertConverged(up, mir)
  }

  test("bootstrap + incremental sync converge state, offsets, and sync " +
      "point; re-sync is a no-op") {
    val up = IceTable.create(tmpDir("mir1-up"), numBuckets = 4)
    val mir = IceTable.create(tmpDir("mir1-m"), numBuckets = 4)
    apply(up, 0, 0, 3,
      ev("i", 1, "r0", "a", "A1"),
      ev("i", 2, "r0", "b", "B1"),
      ev("i", 3, "r1", "c", "C1"))
    val o1 = sync(up, mir)
    assert(o1.fullSync, "first sync bootstraps")
    assertConverged(up, mir)

    apply(up, 1, 3, 6,
      ev("u", 4, "r0", "a", "A2"),
      ev("d", 5, "r0", "b", ""),
      ev("i", 6, "r2", "d", "D1"))
    val o2 = sync(up, mir)
    assert(!o2.fullSync, "second sync must be incremental")
    // incremental: only the three changed keys flow, not the whole table
    assert(o2.stats.get.rowsExtracted == 3,
      s"expected 3 feed rows, got ${o2.stats}")
    assertConverged(up, mir)

    val before = mir.currentVersion()
    val o3 = sync(up, mir)
    assert(o3.stats.isEmpty && mir.currentVersion() == before,
      "at-target sync must be a no-op")
  }

  test("per-partition claim delta: a lagging partition's gap is NOT " +
      "fenced on the mirror when the upstream later fills it") {
    val up = IceTable.create(tmpDir("mir2-up"), numBuckets = 4)
    val mir = IceTable.create(tmpDir("mir2-m"), numBuckets = 4)
    val p0a = pathFor("r0", 0)
    val p1a = pathFor("r1", 1)
    val p1b = pathFor("r2", 1)
    // epoch 0: partition 0 fully observed to 10, partition 1 lagging at 4
    applySet(up, 0, Map(0 -> Seq((0L, 10L)), 1 -> Seq((0L, 4L))),
      ev("i", 7, "r0", p0a, "P0A"),
      ev("i", 3, "r1", p1a, "P1A"))
    sync(up, mir)
    assert(offsets(mir) == Map(0 -> Seq((0L, 10L)), 1 -> Seq((0L, 4L))),
      s"mirror must claim per-partition deltas, got ${offsets(mir)}")
    // epoch 1: partition 1 catches up with events INSIDE the union of the
    // earlier claims — a union-claiming mirror would have fenced seq 8
    applySet(up, 1, Map(1 -> Seq((4L, 10L))),
      ev("i", 8, "r2", p1b, "P1B"))
    sync(up, mir)
    assertConverged(up, mir)
    assert(state(mir).exists(_._3 == "P1B"),
      "late partition-1 event must reach the mirror (not fenced)")
  }

  test("delete whose tombstone purged inside the sync window still " +
      "deletes on the mirror (substituted seq from the claim delta)") {
    val up = IceTable.create(tmpDir("mir3-up"), numBuckets = 2)
    val mir = IceTable.create(tmpDir("mir3-m"), numBuckets = 2)
    apply(up, 0, -1, 2, // origin-anchored claim: the purge horizon advances
      ev("i", 1, "k0", "a", "A"),
      ev("i", 2, "k1", "b", "B"))
    sync(up, mir)
    // delete inside a contiguous claim, then compact: tombstone purges
    // below the safe horizon — the diff window sees (live, absent)
    apply(up, 1, 2, 4,
      ev("d", 3, "k0", "a", ""),
      ev("u", 4, "k1", "b", "B2"))
    Compaction.compact(spark, up)
    assert(!state(up).exists(r => r._1 == "k0" && r._5),
      "precondition: upstream tombstone must be purged by compaction")
    val o = sync(up, mir)
    assert(!o.fullSync, "purged tombstone must not force a full resync")
    // the mirror applies the delete as a TOMBSTONE (it purges on the
    // mirror's own horizon at its next compaction); the USER view converges
    def live(t: IceTable): Set[(String, String, String)] =
      t.read(spark).select("repo", "path", "content").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(!live(mir).exists(_._1 == "k0"),
      "mirror must delete the key whose tombstone purged in-window")
    assert(live(mir) == live(up), "user-visible state must converge")
    assert(state(mir).exists(r => r._1 == "k0" && r._5),
      "the delete lands as a mirror tombstone (purged by mirror " +
        "compaction, not upstream's)")
    assert(offsets(mir) == offsets(up))
    // and the mirror's own compaction purges it (substituted seq 4 ≤
    // horizon 4), after which raw states match too
    Compaction.compact(spark, mir)
    assert(state(mir) == state(up), "raw states match after mirror purge")
  }

  test("clobbered sync point (mirror compaction) falls back to full " +
      "resync, heals, and returns to incremental syncs") {
    val up = IceTable.create(tmpDir("mir4-up"), numBuckets = 2)
    val mir = IceTable.create(tmpDir("mir4-m"), numBuckets = 2)
    apply(up, 0, 0, 2,
      ev("i", 1, "r0", "a", "A"),
      ev("i", 2, "r1", "b", "B"))
    sync(up, mir)
    Compaction.compact(spark, mir) // overwrites the mirror's epochId
    apply(up, 1, 2, 4,
      ev("u", 3, "r0", "a", "A2"),
      ev("d", 4, "r1", "b", ""))
    val o = sync(up, mir)
    assert(o.fullSync, "clobbered sync point must trigger a full resync")
    assertConverged(up, mir)
    apply(up, 2, 4, 5, ev("i", 5, "r2", "c", "C"))
    val o2 = sync(up, mir)
    assert(!o2.fullSync, "after healing, syncs are incremental again")
    assertConverged(up, mir)
  }

  test("mirror chain: a mirror is a first-class upstream — A→B→C " +
      "converges through two hops, incrementally") {
    val a = IceTable.create(tmpDir("mir6-a"), numBuckets = 2)
    val b = IceTable.create(tmpDir("mir6-b"), numBuckets = 2)
    val c = IceTable.create(tmpDir("mir6-c"), numBuckets = 2)
    apply(a, 0, 0, 2,
      ev("i", 1, "r0", "a", "A"),
      ev("i", 2, "r1", "b", "B"))
    sync(a, b)
    sync(b, c)
    assertConverged(a, b)
    assertConverged(b, c)
    apply(a, 1, 2, 4,
      ev("u", 3, "r0", "a", "A2"),
      ev("d", 4, "r1", "b", ""))
    assert(!sync(a, b).fullSync)
    val o = sync(b, c)
    assert(!o.fullSync, "second hop must stay incremental")
    assertConverged(b, c)
    assert(state(c) == state(a), "two-hop replica equals the origin")
    assert(offsets(c) == offsets(a),
      "offset state propagates through the chain unchanged")
  }

  test("follow: catches up on backlog, goes idle, and resumes when the " +
      "upstream moves — including under a concurrent upstream writer") {
    val up = IceTable.create(tmpDir("mir7-up"), numBuckets = 2)
    val mir = IceTable.create(tmpDir("mir7-m"), numBuckets = 2)
    // empty upstream: pure idle polls, no syncs, no mirror commits
    assert(MirrorJob.follow(spark, up, mir, nLogPartitions = N,
      pollMs = 1L, maxIdlePolls = 2).isEmpty)
    assert(mir.currentVersion() == -1L)
    // backlog of two epochs: one catch-up sync (single delta), then idle
    apply(up, 0, 0, 2, ev("i", 1, "r0", "a", "A"))
    apply(up, 1, 2, 4, ev("u", 3, "r0", "a", "A2"),
      ev("i", 4, "r1", "b", "B"))
    val outs1 = MirrorJob.follow(spark, up, mir, nLogPartitions = N,
      pollMs = 1L, maxIdlePolls = 2)
    assert(outs1.size == 1 && outs1.head.fullSync, "backlog = one bootstrap")
    assertConverged(up, mir)
    // concurrent writer: epochs land WHILE the follower polls; every one
    // must be picked up incrementally before the idle budget runs out
    val writer = new Thread(() => {
      (2 to 4).foreach { e =>
        Thread.sleep(150L)
        apply(up, e, 2L * e, 2L * e + 2,
          ev("i", 2L * e + 1, s"r$e", "f", s"C$e"))
      }
    })
    writer.start()
    try {
      // idle budget 5 s (100 × 50 ms): must outlast the writer's commit
      // latency so the follower never gives up between concurrent epochs
      val outs2 = MirrorJob.follow(spark, up, mir, nLogPartitions = N,
        pollMs = 50L, maxIdlePolls = 100)
      assert(outs2.nonEmpty && outs2.forall(!_.fullSync),
        s"concurrent epochs must sync incrementally, got $outs2")
    } finally writer.join()
    assertConverged(up, mir)
    assert(state(mir).count(_._3.startsWith("C")) == 3,
      "all concurrently written epochs must reach the mirror")
  }

  test("upstream retention expiring the recorded sync point forces a " +
      "full resync (one header probe, no history listing)") {
    val up = IceTable.create(tmpDir("mir9-up"), numBuckets = 2)
    val mir = IceTable.create(tmpDir("mir9-m"), numBuckets = 2)
    apply(up, 0, 0, 2, ev("i", 1, "r0", "a", "A"))
    sync(up, mir)
    apply(up, 1, 2, 3, ev("u", 3, "r0", "a", "A2"))
    apply(up, 2, 3, 4, ev("i", 4, "r1", "b", "B"))
    up.expireSnapshots(keepLast = 1)
    val o = sync(up, mir)
    assert(o.fullSync,
      "expired sync-point version must fall back to a full resync")
    assertConverged(up, mir)
    // healed: the stamped point is the retained current version
    apply(up, 3, 4, 5, ev("i", 5, "r2", "c", "C"))
    assert(!sync(up, mir).fullSync, "resync heals back to incremental")
    assertConverged(up, mir)
  }

  test("selective replica: keyFilter mirrors only matching keys while " +
      "offsets converge to the upstream's (stable partial replication)") {
    val up = IceTable.create(tmpDir("mir8-up"), numBuckets = 2)
    val mir = IceTable.create(tmpDir("mir8-m"), numBuckets = 2)
    val f = Some(col("repo") === "r0")
    def filteredUp = state(up).filter(_._1 == "r0")
    apply(up, 0, 0, 3,
      ev("i", 1, "r0", "a", "A"),
      ev("i", 2, "r1", "b", "B"),
      ev("i", 3, "r0", "c", "C"))
    val o1 = MirrorJob.sync(spark, up, mir, nLogPartitions = N, keyFilter = f)
    assert(o1.fullSync)
    assert(state(mir) == filteredUp, "bootstrap replicates only r0 keys")
    assert(offsets(mir) == offsets(up),
      "claims stay FULL per partition on a selective replica")
    // incremental window: matching update, matching delete, non-matching
    // insert — only the first two may reach the replica
    apply(up, 1, 3, 6,
      ev("u", 4, "r0", "a", "A2"),
      ev("d", 5, "r0", "c", ""),
      ev("i", 6, "r1", "d", "D"))
    val o2 = MirrorJob.sync(spark, up, mir, nLogPartitions = N, keyFilter = f)
    assert(!o2.fullSync, "selective syncs stay incremental")
    assert(state(mir) == filteredUp)
    assert(offsets(mir) == offsets(up))
    // a window whose every change is filtered out still claims the delta
    // and stamps the sync point (the NEXT sync diffs from here)
    apply(up, 2, 6, 7, ev("i", 7, "r1", "e", "E"))
    val o3 = MirrorJob.sync(spark, up, mir, nLogPartitions = N, keyFilter = f)
    assert(!o3.fullSync)
    assert(mir.currentManifest().get.epochId == up.currentVersion(),
      "filtered-to-empty window must still advance the sync point")
    assert(offsets(mir) == offsets(up))
    assert(state(mir) == filteredUp)
  }

  test("upstream schema evolution tracks onto the mirror; metadata-only " +
      "upstream movement stamps the sync point without reading data") {
    val up = IceTable.create(tmpDir("mir5-up"), numBuckets = 2)
    val mir = IceTable.create(tmpDir("mir5-m"), numBuckets = 2)
    apply(up, 0, 0, 2,
      ev("i", 1, "r0", "a", "A"),
      ev("i", 2, "r1", "b", "B"))
    sync(up, mir)
    // evolve 1→3 (add sizeBytes, rename lang→language), then new data
    up.evolveSchema(2)
    up.evolveSchema(3)
    apply(up, 1, 2, 3, ev("u", 3, "r0", "a", "A2"))
    sync(up, mir)
    assert(mir.currentManifest().get.schemaId == 3,
      "mirror schema must track the upstream's")
    assert(mir.read(spark).columns.contains("language"))
    assertConverged(up, mir)
    // metadata-only movement: compaction commit with zero state change
    Compaction.compact(spark, up)
    val o = sync(up, mir)
    assert(o.stats.isEmpty, "metadata-only movement applies no rows")
    assertConverged(up, mir)
  }
}
