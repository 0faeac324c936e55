package graft

import graft.log.OracleFold
import graft.merge.MergeEngine
import graft.model._
import graft.table.{FileStats, IceTable, ManifestJson}
import org.apache.spark.sql.functions._

/** Per-file column stats in the manifest + file-level data skipping
  * (Iceberg-metrics-style scan pruning), incremental `readChangesSince`,
  * time-based retention, and the bounded footer-read pool. */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def commit40 = "c" * 40

  private def rows(t: IceTable, keys: Seq[String], seqBase: Long,
                   value: String => String = k => s"v$k") =
    keys.map(k => ("r", k, commit40, "scala", value(k),
        OracleFold.sha256Hex(value(k))))
      .toDF("repo", "path", "commit", "lang", "content", "contentSha")
      .withColumn("bucket", t.bucketCol(col("repo"), col("path")))
      .withColumn("lastSeq", lit(seqBase))
      .withColumn("deleted", lit(false))

  private def offsets2(hi: Long): Seq[OffsetRange] =
    (0 until 2).map(p => OffsetRange(p, -1L, hi))

  private def shaState(t: IceTable): Map[String, String] =
    t.read(spark).select("path", "contentSha").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("manifest entries carry footer stats (rows, key and seq bounds)") {
    val t = IceTable.create(tmpDir("stats"), numBuckets = 4)
    val fs = t.writeEpochFiles(rows(t, (0 until 40).map(i => f"p$i%02d"), 7L), 0)
    assert(fs.nonEmpty)
    fs.foreach { f =>
      assert(f.rows > 0, s"rows must be footer-filled: $f")
      assert(f.minSeq.contains(7L) && f.maxSeq.contains(7L))
      assert(f.minKey.isDefined && f.maxKey.isDefined)
      assert(FileStats.keyCompare(f.minKey.get, f.maxKey.get) <= 0)
      assert(f.minKey.get.startsWith("r" + FileStats.KeySep))
    }
    assert(fs.map(_.rows).sum == 40L)
  }

  test("salted files record exact residue classes; a later epoch skips them") {
    val t = IceTable.create(tmpDir("salt"), numBuckets = 1)
    val keys = (0 until 100).map(i => f"p$i%02d")
    val salted = t.writeEpochFiles(rows(t, keys, 50L), 0, saltPerBucket = 4)
    assert(salted.map(_.saltRes).toSet == Set(0, 1, 2, 3),
      "each residue class must land in its own file(s)")
    assert(salted.forall(_.saltMod == 4))
    // residue classes are EXACT: every file's rows satisfy its recorded class
    salted.foreach { f =>
      val bad = spark.read.parquet(f.path)
        .filter(pmod(xxhash64(col("path")), lit(4)).cast("int") =!= f.saltRes)
        .count()
      assert(bad == 0, s"file ${f.path} holds rows outside residue ${f.saltRes}")
    }
    t.commit(EpochManifest(0, 0, 1, salted, offsets2(50L),
      EpochStats(100, 0, 0, 100, 0, 0), -1L, completeUntilSeq = 50L,
      numBuckets = 1))
    val before = shaState(t)

    // one-key epoch: only the key's residue file may be rewritten
    val hitKey = "p07"
    val res = spark.range(1)
      .select(pmod(xxhash64(lit(hitKey)), lit(4)).cast("int")).head().getInt(0)
    val ev = Seq(ChangeEvent("u", 51L, "r", hitKey, commit40, "scala", "NEW"))
    val out = MergeEngine.applyEpoch(spark, t, ev.toDS(), 1,
      nLogPartitions = 2, claimedRange = Some((50L, 51L)))
    assert(!out.skipped && out.stats.rowsApplied == 1)

    val m = t.currentManifest().get
    val carried = salted.filter(_.saltRes != res).map(_.path).toSet
    assert(carried.subsetOf(m.files.map(_.path).toSet),
      "files of other residue classes must carry forward BY REFERENCE")
    assert(salted.filter(_.saltRes == res)
      .forall(f => !m.files.map(_.path).contains(f.path)),
      "the hit residue's file must be rewritten")
    assert(shaState(t) == before.updated(hitKey, OracleFold.sha256Hex("NEW")),
      "skipping must not change the table's contents")
  }

  test("key-range-disjoint files in a touched bucket carry forward") {
    val t = IceTable.create(tmpDir("krange"), numBuckets = 1)
    val aKeys = (0 until 50).map(i => f"a$i%02d")
    val zKeys = (0 until 50).map(i => f"z$i%02d")
    val fa = t.writeEpochFiles(rows(t, aKeys, 10L), 0)
    val fz = t.writeEpochFiles(rows(t, zKeys, 10L), 1)
    t.commit(EpochManifest(0, 1, 1, (fa ++ fz).sortBy(_.path), offsets2(10L),
      EpochStats(100, 0, 0, 100, 0, 0), -1L, completeUntilSeq = 10L,
      numBuckets = 1))
    val before = shaState(t)

    val ev = Seq(ChangeEvent("u", 11L, "r", "a05", commit40, "scala", "NEW"))
    MergeEngine.applyEpoch(spark, t, ev.toDS(), 2,
      nLogPartitions = 2, claimedRange = Some((10L, 11L)))
    val m = t.currentManifest().get
    assert(fz.map(_.path).toSet.subsetOf(m.files.map(_.path).toSet),
      "the z-range file's key bounds exclude the winner: carry by reference")
    assert(fa.forall(f => !m.files.map(_.path).contains(f.path)),
      "the a-range file must be rewritten")
    assert(shaState(t) == before.updated("a05", OracleFold.sha256Hex("NEW")))
  }

  test("readChangesSince prunes files by seq stats and returns the delta") {
    val t = IceTable.create(tmpDir("since"), numBuckets = 4)
    val evs = (0 until 40).map(i =>
      ChangeEvent("i", i + 1L, "r", f"k$i%02d", commit40, "scala", s"v$i"))
    MergeEngine.applyEpoch(spark, t, evs.toDS(), 0, nLogPartitions = 2,
      claimedRange = Some((0L, 40L)))
    val ev2 = Seq(ChangeEvent("u", 41L, "r", "k03", commit40, "scala", "NEW"))
    MergeEngine.applyEpoch(spark, t, ev2.toDS(), 1, nLogPartitions = 2,
      claimedRange = Some((40L, 41L)))

    val m = t.currentManifest().get
    val touched = t.filesTouchedSince(m.files, 40L)
    assert(touched.size < m.files.size,
      s"stats pruning must drop epoch-0 buckets (kept ${touched.size} of " +
        s"${m.files.size})")
    val delta = t.readChangesSince(spark, 40L).collect()
    assert(delta.length == 1)
    val r = delta.head
    assert(r.getAs[String]("path") == "k03" &&
      r.getAs[Long]("lastSeq") == 41L &&
      r.getAs[String]("content") == "NEW")
  }

  test("point lookup: one bucket, stats-admitted files only, exact row") {
    val t = IceTable.create(tmpDir("lkp"), numBuckets = 8)
    val keys = (0 until 200).map(i => f"p$i%03d")
    val fs = t.writeEpochFiles(rows(t, keys, 5L), 0, saltPerBucket = 4)
    t.commit(EpochManifest(0, 0, 1, fs, offsets2(5L),
      EpochStats(200, 0, 0, 200, 0, 0), -1L, completeUntilSeq = 5L,
      numBuckets = 8))
    val m = t.currentManifest().get

    // driver-side bucketOf must replicate Spark's xxhash64 bucketing exactly
    val viaSpark = rows(t, keys, 5L)
      .select(col("path"), t.bucketCol(col("repo"), col("path")).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    keys.foreach(k => assert(t.bucketOf("r", k) == viaSpark(k),
      s"bucketOf diverges from Spark xxhash64 for $k"))

    keys.take(25).foreach { k =>
      val cand = t.lookupCandidateFiles(m, "r", k)
      val bucketFiles = m.files.count(_.bucket == t.bucketOf("r", k))
      assert(cand.nonEmpty && cand.size < bucketFiles,
        s"$k: residue pruning must drop sibling salt files " +
          s"(${cand.size} of $bucketFiles)")
      val row = t.lookup(spark, "r", k).collect()
      assert(row.length == 1 && row.head.getAs[String]("content") == s"v$k")
    }
    assert(t.lookup(spark, "r", "missing").isEmpty)
  }

  test("per-file key blooms cut range-overlapping lookup candidates to ~1; " +
      "absent keys prove absent with zero data reads") {
    // two epochs write INTERLEAVED key sets into the same bucket: their
    // [minKey, maxKey] ranges overlap almost fully, so range pruning admits
    // both files — only the native parquet blooms can tell them apart
    val t = IceTable.create(tmpDir("blm"), numBuckets = 1)
    val even = (0 until 200 by 2).map(i => f"k$i%03d")
    val odd = (1 until 200 by 2).map(i => f"k$i%03d")
    val f0 = t.writeEpochFiles(rows(t, even, 5L), 0)
    val f1 = t.writeEpochFiles(rows(t, odd, 6L), 1)
    t.commit(EpochManifest(0, 1, 1, f0 ++ f1, offsets2(6L),
      EpochStats(200, 0, 0, 200, 0, 0), -1L, completeUntilSeq = 6L,
      numBuckets = 1))
    val m = t.currentManifest().get

    // blooms live in the FILES: the manifest carries nothing bloom-shaped
    assert(!ManifestJson.write(m).toLowerCase.contains("bloom"))

    Seq("k004" -> "v", "k007" -> "v").foreach { case (k, _) =>
      val cand = t.lookupCandidateFiles(m, "r", k)
      assert(cand.size == 2, s"$k: range pruning cannot separate the files")
      val admitted = t.lookupFiles(spark, m, "r", k)
      assert(admitted.size == 1, s"$k: bloom must cut candidates to 1")
      val row = t.lookup(spark, "r", k).collect()
      assert(row.length == 1 && row.head.getAs[String]("content") == s"v$k")
    }
    // absent key INSIDE both ranges: blooms reject every candidate — the
    // lookup answers "no such key" from metadata alone
    assert(t.lookupCandidateFiles(m, "r", "k100a").size == 2)
    assert(t.lookupFiles(spark, m, "r", "k100a").isEmpty)
    assert(t.lookup(spark, "r", "k100a").isEmpty)

    // escape hatch: disabled blooms fall back to the stats-admitted set
    spark.conf.set("spark.graft.keyBlooms", "false")
    try assert(t.lookupFiles(spark, m, "r", "k004").size == 2)
    finally spark.conf.unset("spark.graft.keyBlooms")

    // files written with blooms OFF are admitted (never wrongly skipped)
    spark.conf.set("spark.graft.keyBlooms", "false")
    val fNb = try t.writeEpochFiles(rows(t, Seq("zz1", "zz2"), 7L), 2)
      finally spark.conf.unset("spark.graft.keyBlooms")
    t.commit(m.copy(version = 1, parentVersion = 0, epochId = 2,
      files = m.files ++ fNb))
    val m2 = t.currentManifest().get
    val adm = t.lookupFiles(spark, m2, "r", "zz1")
    assert(adm.exists(f => fNb.exists(_.path == f.path)),
      "a bloom-less file must stay in the candidate set")
    assert(t.lookup(spark, "r", "zz1").count() == 1)
  }

  test("age-based retention expires old snapshots, keeps readers unaffected") {
    val t = IceTable.create(tmpDir("ret"), numBuckets = 2)
    def commitGen(v: Long, keys: Seq[String], seq: Long): Unit = {
      val fs = t.writeEpochFiles(rows(t, keys, seq), v)
      val parent = t.currentManifest()
      t.commit(EpochManifest(v, v, 1, fs, offsets2(seq),
        EpochStats(keys.size, 0, 0, keys.size, 0, 0),
        parent.map(_.version).getOrElse(-1L), completeUntilSeq = seq,
        numBuckets = 2))
    }
    commitGen(0, Seq("a"), 1L)
    commitGen(1, Seq("a", "b"), 2L)
    Thread.sleep(80)
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    commitGen(2, Seq("a", "b", "c"), 3L)

    // history + time travel by WALL CLOCK off the stamped commit times
    val hist = t.history()
    assert(hist.map(_.version) == Seq(0L, 1L, 2L))
    assert(hist.map(_.commitTimeMillis) == hist.map(_.commitTimeMillis).sorted
      && hist.forall(_.commitTimeMillis > 0))
    assert(t.versionAsOf(cut).contains(1L))
    assert(t.readAsOfTime(spark, cut).select("path").collect()
      .map(_.getString(0)).toSet == Set("a", "b"))
    intercept[IllegalArgumentException] {
      t.readAsOfTime(spark, hist.head.commitTimeMillis - 1)
    }

    // age alone is not enough when keepLast retains the version
    assert(t.expireSnapshots(keepLast = 3, olderThanMillis = cut) == ((0, 0)))
    // combined: v0 and v1 are both old AND beyond keepLast=1
    val (snaps, files) = t.expireSnapshots(keepLast = 1, olderThanMillis = cut)
    assert(snaps == 2, s"v0+v1 must expire (got $snaps)")
    assert(files > 0, "unreferenced data files of expired snapshots go too")
    assert(t.currentVersion() == 2L)
    assert(shaState(t).keySet == Set("a", "b", "c"))
    intercept[Exception] { t.readAt(spark, 0L) } // manifest gone
  }

  test("footer pool bounds a hung metadata read: degrade or fail fast") {
    val conf = spark.sessionState.newHadoopConf()
    conf.set("fs.slowfs.impl", classOf[SlowGraftFileSystem].getName)
    val entry = DataFileEntry("slowfs:///nowhere/x.parquet", 0, -1L, 1)
    // ingest path (default): the entry degrades to stats-less, promptly —
    // a transient metadata blip must not abort a merge epoch
    val t0 = System.nanoTime()
    val degraded = FileStats.fillAll(conf, Seq(entry), timeoutSec = 1L)
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "must not hang")
    assert(degraded.head.rows == -1L && degraded.head.minKey.isEmpty,
      "hung footer must leave the entry stats-less, not fail the write")
    // verifier path (failFast): abort loudly, naming the stuck file
    val e = intercept[IllegalStateException] {
      FileStats.fillAll(conf, Seq(entry), timeoutSec = 1L, failFast = true)
    }
    assert(e.getMessage.contains("timed out") &&
      e.getMessage.contains("x.parquet"),
      s"error must name the stuck file: ${e.getMessage}")
  }

  test("distributed footer pass: stats identical to the pooled pass, " +
      "degrade/fail-fast semantics preserved") {
    val t = IceTable.create(tmpDir("dstats"), numBuckets = 4)
    // force the distributed path for this small fixture
    spark.conf.set("spark.graft.distributedStatsMinFiles", "1")
    try {
      val fs = t.writeEpochFiles(
        rows(t, (0 until 40).map(i => f"p$i%02d"), 7L), 0)
      val bare = fs.map(_.copy(rows = -1L, minKey = None, maxKey = None,
        minSeq = None, maxSeq = None))
      val pooled = FileStats.fillAll(spark.sessionState.newHadoopConf(), bare)
      val dist = FileStats.fillAllDistributed(spark, bare)
      assert(dist == pooled, "distributed stats must be byte-identical to " +
        "the pooled driver pass (same files, same order)")
      assert(dist.map(_.rows).sum == 40L && dist.forall(_.minKey.isDefined))
    } finally spark.conf.unset("spark.graft.distributedStatsMinFiles")
    // hung object-store read inside an executor task: shared deadline
    // degrades the entry (default) or aborts loudly (failFast)
    spark.sparkContext.hadoopConfiguration.set("fs.slowfs.impl",
      classOf[SlowGraftFileSystem].getName)
    val entry = DataFileEntry("slowfs:///nowhere/x.parquet", 0, -1L, 1)
    val t0 = System.nanoTime()
    val degraded = FileStats.fillAllDistributed(spark, Seq(entry),
      timeoutSec = 1L)
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "must not hang")
    assert(degraded.head.rows == -1L && degraded.head.minKey.isEmpty)
    val e = intercept[org.apache.spark.SparkException] {
      FileStats.fillAllDistributed(spark, Seq(entry), timeoutSec = 1L,
        failFast = true)
    }
    assert(e.getMessage.contains("x.parquet") ||
      Option(e.getCause).exists(_.getMessage.contains("x.parquet")),
      s"error must name the stuck file: ${e.getMessage}")
  }

  test("legacy manifests without the new fields parse with safe defaults") {
    val legacy =
      """{"version":3,"epochId":3,"schemaId":1,
         "files":[{"path":"/d/f.parquet","bucket":2,"rows":-1,"schemaId":1,
                   "bytes":123}],
         "offsets":[{"partitionId":0,"lowSeq":-1,"highSeq":9}],
         "stats":{"rowsExtracted":1,"rowsQuarantined":0,"dedupDrops":0,
                  "rowsApplied":1,"deletesApplied":0,"staleDrops":0},
         "parentVersion":2}"""
    val m = ManifestJson.parse(legacy)
    assert(m.numBuckets == -1 && m.commitTimeMillis == -1L &&
      m.completeUntilSeq == Long.MinValue)
    val f = m.files.head
    assert(f.minKey.isEmpty && f.maxKey.isEmpty && f.minSeq.isEmpty &&
      f.maxSeq.isEmpty && f.saltMod == 1 && f.saltRes == -1)
  }
}
