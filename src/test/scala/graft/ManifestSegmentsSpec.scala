package graft

import graft.driver.ReplayJob
import graft.log.{ChangeLogGen, LogSpec, OracleFold}
import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.table.IceTable
import java.nio.file.{Files, Paths}

/** Two-level manifest metadata (the Iceberg snapshot→manifest-list→manifest
  * layering): large file lists live in content-addressed bucket-range
  * segment files; a commit writes only segments whose chunk changed, so
  * metadata IO stays O(touched buckets) at million-file scale. */
class ManifestSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private val spec = LogSpec(seed = 13L, nEvents = 2000, nRepos = 6,
    nPathsPerRepo = 15, pDelete = 0.1)

  private def sha(t: IceTable): Map[(String, String), String] =
    t.read(spark).select("repo", "path", "contentSha").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  private def snapJson(dir: String, v: Long): String =
    new String(Files.readAllBytes(
      Paths.get(f"$dir/meta/snap-$v%08d.json")), "UTF-8")

  private def segFiles(dir: String): Set[String] =
    Option(new java.io.File(s"$dir/meta").listFiles())
      .getOrElse(Array.empty)
      .collect { case f if f.getName.startsWith("fseg-") => f.getName }
      .toSet

  test("segmented manifests round-trip, share unchanged chunks, stay small") {
    val dir = tmpDir("mseg")
    // threshold 0 => every non-empty file list segments; 2-bucket chunks
    val t = IceTable.create(dir, numBuckets = 8, inlineFileThreshold = 0,
      segChunkBuckets = 2)
    ReplayJob.replayGenerated(spark, t, spec, nEpochs = 2, nLogPartitions = 4)
    val m1 = t.currentManifest().get
    assert(m1.fileSegs.nonEmpty, "past the threshold the list must segment")
    assert(m1.files.nonEmpty, "readManifest must RESOLVE segments to files")
    assert(!snapJson(dir, m1.version).contains("e0-"),
      "the snapshot json itself must not inline the data-file list")
    assert(sha(t) == OracleFold.fold(ChangeLogGen.generateLocal(spec))
      .map { case (k, v) => k -> v.contentSha },
      "oracle parity through segmented metadata")

    // a single-key epoch touches ONE bucket => every chunk that bucket is
    // NOT in keeps its content hash, i.e. the new snapshot REFERENCES the
    // parent's segment files instead of rewriting them
    val hit = t.read(spark).select("repo", "path").head()
    val ev = Seq(ChangeEvent("u", spec.nEvents.toLong, hit.getString(0),
      hit.getString(1), "c" * 40, "scala", "NEW"))
    MergeEngine.applyEpoch(spark, t, ev.toDS(), 99, nLogPartitions = 4,
      claimedRange = Some((spec.nEvents - 1L, spec.nEvents.toLong)))
    val m2 = t.currentManifest().get
    val shared = m1.fileSegs.toSet & m2.fileSegs.toSet
    assert(shared.nonEmpty,
      s"unchanged chunks must be SHARED by reference: v1=${m1.fileSegs.size} " +
        s"v2=${m2.fileSegs.size} shared=${shared.size}")
    assert(m2.fileSegs.toSet != m1.fileSegs.toSet,
      "the touched bucket's chunk must have produced a new segment")

    // full replay still fenced through segmented manifests
    val reports = ReplayJob.replayGenerated(spark, t, spec, nEpochs = 2,
      nLogPartitions = 4)
    assert(reports.forall(_.skipped))

    // retention refcounts segments: expiring old snapshots removes only
    // segments no retained snapshot references
    val before = segFiles(dir)
    assert(before.nonEmpty)
    val (snaps, _) = t.expireSnapshots(keepLast = 1)
    assert(snaps > 0)
    val after = segFiles(dir)
    val live = t.currentManifest().get.fileSegs
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(live.subsetOf(after), "live segments must survive expiry")
    assert(after.size < before.size,
      "segments referenced only by expired snapshots must be deleted")
    assert(sha(t).get((hit.getString(0), hit.getString(1)))
      .contains(OracleFold.sha256Hex("NEW")))
  }

  test("CAS-losing commit's stranded segments are swept by retention") {
    val dir = tmpDir("msegorphan")
    val t = IceTable.create(dir, numBuckets = 8, inlineFileThreshold = 0,
      segChunkBuckets = 2)
    ReplayJob.replayGenerated(spark, t, spec, nEpochs = 2, nLogPartitions = 4)
    val parent = t.currentManifest().get
    val before = segFiles(dir)
    // deterministic CAS race: the loser (a DIFFERENT file list, so it
    // publishes fresh segments) gets interleaved by a winner commit INSIDE
    // its race window — after segment publish, before the snapshot rename —
    // exactly the losing path that strands fseg files
    val winnerHandle = new IceTable(dir, defaultNumBuckets = 8,
      inlineFileThreshold = 0, segChunkBuckets = 2)
    t.onBeforeSnapshotCas = () => {
      winnerHandle.commit(parent.copy(version = parent.version + 1,
        epochId = 900L, parentVersion = parent.version))
      t.onBeforeSnapshotCas = () => () // fire once
    }
    val loser = parent.copy(version = parent.version + 1, epochId = 901L,
      parentVersion = parent.version, files = parent.files.drop(1))
    intercept[IllegalArgumentException] { t.commit(loser) }
    val stranded = segFiles(dir) -- before
    assert(stranded.nonEmpty,
      "the losing commit must have published at least one unreferenced segment")
    // grace=0 so the sweep ignores mtime recency in-test; nothing expires
    // (keepLast covers everything) — the ORPHAN sweep alone must fire
    t.expireSnapshots(keepLast = 100, orphanSegGraceMillis = 0L)
    val after = segFiles(dir)
    assert((stranded & after).isEmpty, s"stranded segments must be swept: " +
      s"${stranded & after}")
    val live = t.currentManifest().get.fileSegs
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(live.subsetOf(after), "retained-referenced segments must survive")
    // a FRESH orphan inside the grace window survives (in-flight protection)
    val fresh = new java.io.File(s"$dir/meta/fseg-${"0" * 64}.json")
    Files.write(fresh.toPath, "[]".getBytes("UTF-8"))
    t.expireSnapshots(keepLast = 100, orphanSegGraceMillis = 3600000L)
    assert(fresh.exists, "an orphan younger than the grace window must survive")
    assert(sha(t).nonEmpty) // table still fully readable
  }

  test("retention heals a table wedged by missing expired-snapshot segments") {
    val dir = tmpDir("msegwedge")
    val t = IceTable.create(dir, numBuckets = 8, inlineFileThreshold = 0,
      segChunkBuckets = 2)
    ReplayJob.replayGenerated(spark, t, spec, nEpochs = 2, nLogPartitions = 4)
    val old = t.readManifestHeader(t.currentVersion() - 1)
    val cur = t.currentManifest().get
    // simulate the pre-r5 crash: an EXPIRED-to-be version whose segments
    // were deleted before its snapshot json (segments unique to it gone)
    val unique = old.fileSegs.toSet -- cur.fileSegs.toSet
    assert(unique.nonEmpty, "need a segment only the old snapshot references")
    unique.foreach(p => Files.delete(Paths.get(new java.net.URI("file:" + p).getPath)))
    // history/versionAsOf are header-only — they must not trip on the hole
    assert(t.history().size == 2)
    // retention must TOLERATE the expired version's missing segments,
    // delete its json, and leave the current snapshot fully readable
    val (snaps, _) = t.expireSnapshots(keepLast = 1)
    assert(snaps == 1)
    assert(t.history().size == 1)
    assert(sha(t) == OracleFold.fold(ChangeLogGen.generateLocal(spec))
      .map { case (k, v) => k -> v.contentSha })
  }

  test("history/versionAsOf are header-only; numBuckets is cached (countfs)") {
    spark.sparkContext.hadoopConfiguration.set("fs.countfs.impl",
      classOf[CountingGraftFileSystem].getName)
    val dir = s"countfs:${tmpDir("msegcount")}/table"
    val t = IceTable.create(dir, numBuckets = 8, inlineFileThreshold = 0,
      segChunkBuckets = 2)
    ReplayJob.replayGenerated(spark, t, spec, nEpochs = 2, nLogPartitions = 4)
    assert(t.currentManifest().get.fileSegs.nonEmpty)
    CountingGraftFileSystem.segOpens.set(0L)
    assert(t.versionAsOf(Long.MaxValue).contains(t.currentVersion()))
    assert(t.history().size == 2)
    assert(CountingGraftFileSystem.segOpens.get() == 0L,
      "metadata questions must read ZERO segment files")
    t.readManifest(t.currentVersion())
    assert(CountingGraftFileSystem.segOpens.get() > 0L,
      "sanity: the counter does observe real segment resolution")
    // history carries file counts/bytes from the stamped header
    val h = t.history().last
    assert(h.files == t.currentManifest().get.files.size && h.bytes > 0L)
    // numBuckets: warmed by the commits above — repeated calls do ZERO
    // metadata IO; a cold handle pays exactly one listing+header read
    CountingGraftFileSystem.metaLists.set(0L)
    (1 to 3).foreach(_ => assert(t.numBuckets == 8))
    assert(CountingGraftFileSystem.metaLists.get() == 0L,
      "cached numBuckets must not re-list meta/ per call")
    val cold = new IceTable(dir, defaultNumBuckets = 4,
      inlineFileThreshold = 0, segChunkBuckets = 2)
    assert(cold.numBuckets == 8) // resolved from the manifest, not the default
    CountingGraftFileSystem.metaLists.set(0L)
    (1 to 3).foreach(_ => assert(cold.numBuckets == 8))
    assert(CountingGraftFileSystem.metaLists.get() == 0L)
  }

  test("versionAsOf never serves a legacy unstamped snapshot out of era") {
    val dir = tmpDir("msegtt")
    val t = IceTable.create(dir, numBuckets = 4)
    ReplayJob.replayGenerated(spark, t, spec.copy(nEvents = 400), nEpochs = 2,
      nLogPartitions = 2)
    val v1Stamp = t.readManifestHeader(1L).commitTimeMillis
    assert(v1Stamp > 0)
    // forge v0 into a LEGACY manifest (no commit stamp)
    def unstamp(v: Long): Unit = {
      val p = Paths.get(f"$dir/meta/snap-$v%08d.json")
      val m = graft.table.ManifestJson.parse(
        new String(Files.readAllBytes(p), "UTF-8"))
      Files.write(p, graft.table.ManifestJson
        .write(m.copy(commitTimeMillis = -1L)).getBytes("UTF-8"))
    }
    unstamp(0L)
    // v0's commit time is bounded by its stamped successor: eligible only
    // from v1Stamp onward — the old "infinitely old" rule would have served
    // v0 for ANY timestamp, including ones predating the whole table
    assert(t.versionAsOf(v1Stamp - 1).isEmpty,
      "a legacy snapshot must not be served before its successor's stamp")
    assert(t.versionAsOf(v1Stamp).contains(1L))
    // fully-legacy table: timestamp travel refuses (version travel still ok)
    unstamp(1L)
    assert(t.versionAsOf(System.currentTimeMillis()).isEmpty)
    assert(t.readAt(spark, 1L).count() > 0)
  }

  test("commit re-publishes a referenced segment deleted mid-window " +
      "(orphan-sweep race); adopted segments get fresh mtimes") {
    val dir = tmpDir("msegrace")
    val t = IceTable.create(dir, numBuckets = 4, inlineFileThreshold = 0,
      segChunkBuckets = 2)
    ReplayJob.replayGenerated(spark, t, spec.copy(nEvents = 500),
      nEpochs = 1, nLogPartitions = 2)
    val before = sha(t)
    // next commit: a "sweep" deletes EVERY just-published/adopted segment
    // inside the window between segment publish and the snapshot CAS — the
    // post-CAS re-verify must re-publish them all
    t.onBeforeSnapshotCas = () => {
      t.onBeforeSnapshotCas = () => ()
      segFiles(dir).foreach(n =>
        Files.delete(Paths.get(s"$dir/meta/$n")))
    }
    val hit = t.read(spark).select("repo", "path").head()
    MergeEngine.applyEpoch(spark, t, Seq(ChangeEvent("u", 500L,
      hit.getString(0), hit.getString(1), "c" * 40, "scala", "HEAL")).toDS(),
      7, nLogPartitions = 2, claimedRange = Some((499L, 500L)))
    val m = t.currentManifest().get
    assert(m.fileSegs.nonEmpty)
    m.fileSegs.foreach(p => assert(Files.exists(Paths.get(
      new org.apache.hadoop.fs.Path(p).toUri.getPath)),
      s"referenced segment must be re-published after the sweep race: $p"))
    // the table reads cleanly and reflects the commit
    val after = sha(t)
    assert(after((hit.getString(0), hit.getString(1))) !=
      before((hit.getString(0), hit.getString(1))))
    // adoption path: a NO-CHANGE chunk reused by the next commit gets its
    // mtime refreshed, so a sweep's grace window restarts
    val segName = m.fileSegs.map(p => new org.apache.hadoop.fs.Path(p))
      .head.toUri.getPath
    val old = 1000000L // epoch-1970 + 1000s: ancient
    Files.setLastModifiedTime(Paths.get(segName),
      java.nio.file.attribute.FileTime.fromMillis(old))
    MergeEngine.applyEpoch(spark, t, Seq(ChangeEvent("u", 501L,
      hit.getString(0), hit.getString(1), "c" * 40, "scala", "HEAL2")).toDS(),
      8, nLogPartitions = 2, claimedRange = Some((500L, 501L)))
    val m2 = t.currentManifest().get
    val adopted = m2.fileSegs.map(p =>
      new org.apache.hadoop.fs.Path(p).toUri.getPath).filter(_ == segName)
    adopted.foreach { p =>
      assert(Files.getLastModifiedTime(Paths.get(p)).toMillis > old,
        "adopted segment must carry a refreshed mtime")
    }
  }

  test("history reports true counts for LEGACY segmented manifests " +
      "(fileCount unstamped)") {
    val dir = tmpDir("mlegacyhist")
    val t = IceTable.create(dir, numBuckets = 4, inlineFileThreshold = 0,
      segChunkBuckets = 2)
    ReplayJob.replayGenerated(spark, t, spec.copy(nEvents = 500),
      nEpochs = 1, nLogPartitions = 2)
    val m = t.currentManifest().get
    val trueFiles = m.files.size
    assert(trueFiles > 0)
    // strip the r5 header summary (simulate a pre-r5 segmented manifest)
    val p = Paths.get(f"$dir/meta/snap-${m.version}%08d.json")
    val legacy = new String(Files.readAllBytes(p), "UTF-8")
      .replaceAll(""""fileCount"\s*:\s*\d+""", "\"fileCount\" : -1")
      .replaceAll(""""dataBytes"\s*:\s*\d+""", "\"dataBytes\" : -1")
    Files.delete(p); Files.write(p, legacy.getBytes("UTF-8"))
    val h = t.history().last
    assert(h.files == trueFiles,
      s"legacy segmented history must resolve, not report 0: $h")
    assert(h.bytes > 0)
  }

  test("small tables stay inline (no segment indirection)") {
    val dir = tmpDir("minline")
    val t = IceTable.create(dir, numBuckets = 4) // default threshold 1024
    ReplayJob.replayGenerated(spark, t, spec.copy(nEvents = 500),
      nEpochs = 1, nLogPartitions = 2)
    val m = t.currentManifest().get
    assert(m.fileSegs.isEmpty && m.files.nonEmpty)
    assert(segFiles(dir).isEmpty, "no segment files below the threshold")
  }
}
