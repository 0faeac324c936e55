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
