package graft

import graft.merge.MergeEngine
import graft.metrics.Metrics
import graft.model.ChangeEvent
import graft.table.IceTable
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Pluggable tracking-event emission (gobblin-metrics analog): post-commit
  * events, reporter failure isolation, counter parity with EpochStats. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._
  private implicit val formats: Formats = DefaultFormats

  private def ev(op: String, seq: Long, p: String, v: String) =
    ChangeEvent(op, seq, "r", p, "c" * 40, "scala", v)

  private def readEvents(dir: String): Seq[(String, String, Map[String, String])] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".jsonl"))
    files.flatMap { f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().map { line =>
        val j = JsonMethods.parse(line)
        ((j \ "namespace").extract[String], (j \ "name").extract[String],
          (j \ "metadata").extract[Map[String, String]])
      }.toSeq
    }.toSeq
  }

  test("post-commit events land in the jsonl reporter; counters match " +
      "EpochStats; fenced replays emit nothing new") {
    val mDir = tmpDir("mrep")
    Metrics.clearReporters()
    Metrics.addReporter(new Metrics.JsonLinesFileReporter(mDir,
      spark.sessionState.newHadoopConf()))
    try {
      val t = IceTable.create(tmpDir("mtab"), numBuckets = 4)
      val out0 = MergeEngine.applyEpoch(spark, t,
        (0 until 50).map(i => ev("i", i.toLong, s"p$i", s"v$i")).toDS(), 0,
        nLogPartitions = 2, claimedRange = Some((-1L, 49L)))
      // pure fenced replay: no commit, no event
      val outR = MergeEngine.applyEpoch(spark, t,
        (0 until 50).map(i => ev("i", i.toLong, s"p$i", s"v$i")).toDS(), 0,
        nLogPartitions = 2, claimedRange = Some((-1L, 49L)))
      assert(outR.skipped)
      // declared-empty slice: metadata-only COMMIT -> event with the flag
      val outE = MergeEngine.applyEpoch(spark, t,
        spark.emptyDataset[ChangeEvent], 1, nLogPartitions = 2,
        claimedRange = Some((49L, 60L)))
      assert(outE.skipped && outE.manifest.version == out0.manifest.version + 1)
      graft.maintenance.Compaction.compact(spark, t)
      t.expireSnapshots(keepLast = 1)

      // local ChecksumFileSystem buffers until close: close reporters
      // (= the consumer contract on file://) before reading the lines
      Metrics.clearReporters()
      val events = readEvents(mDir)
      val commits = events.filter(_._2 == "EpochCommitted")
      assert(commits.size == 2, s"one real + one metadata-only: $events")
      val real = commits.find(_._3("metadataOnly") == "false").get._3
      assert(real("table") == t.dir && real("epochId") == "0")
      assert(real("rowsApplied") == out0.stats.rowsApplied.toString &&
        real("rowsExtracted") == out0.stats.rowsExtracted.toString)
      val mo = commits.find(_._3("metadataOnly") == "true").get._3
      assert(mo("epochId") == "1" && mo("completeUntilSeq") == "60")
      assert(events.exists(e => e._1 == "graft.maintenance" &&
        e._2 == "CompactionFinished" && e._3("table") == t.dir))
      assert(events.exists(e => e._1 == "graft.maintenance" &&
        e._2 == "SnapshotsExpired"))
    } finally Metrics.clearReporters()
  }

  test("a throwing reporter never fails the pipeline; later reporters " +
      "still receive the event") {
    val mDir = tmpDir("mrep2")
    Metrics.clearReporters()
    // registered LAST = consulted first (list prepend): the failure must
    // not shadow the healthy reporter behind it
    Metrics.addReporter(new Metrics.JsonLinesFileReporter(mDir,
      spark.sessionState.newHadoopConf()))
    Metrics.addReporter(new Metrics.MetricsReporter {
      def report(e: Metrics.MetricEvent): Unit =
        throw new RuntimeException("reporter down")
    })
    try {
      val t = IceTable.create(tmpDir("mtab2"), numBuckets = 2)
      val out = MergeEngine.applyEpoch(spark, t,
        Seq(ev("i", 1L, "p1", "v")).toDS(), 0, nLogPartitions = 2,
        claimedRange = Some((0L, 1L)))
      assert(!out.skipped, "ingest must survive a broken reporter")
      Metrics.clearReporters() // flush-on-close for the local scheme
      assert(readEvents(mDir).exists(_._2 == "EpochCommitted"),
        "healthy reporter still gets the event")
    } finally Metrics.clearReporters()
  }
}
