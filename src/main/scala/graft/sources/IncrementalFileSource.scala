package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/**
 * Snapshot-diff incremental file source (SURVEY.md §2.1): the reference's
 * FileBasedSource lists the current filesystem snapshot, subtracts the
 * files previous runs already pulled, and distributes `filesToPull` across
 * WorkUnits (gobblin-core/.../filebased/FileBasedSource.java:58,88,136-169).
 *
 * Spark-native version: an APPEND-ONLY processed-files ledger plus
 * worst-fit-decreasing bin packing of the new files into N balanced read
 * groups — the KafkaWorkUnitPacker's algorithm
 * (gobblin-modules/.../packer/KafkaSingleLevelWorkUnitPacker.java; SURVEY.md
 * §2.8). Each group becomes one `spark.read.parquet(groupFiles: _*)` unit,
 * so a heterogeneous file population still yields balanced tasks.
 *
 * Ledger scale design (the reference's per-run state append,
 * gobblin-metastore/.../FsStateStore.java:156-178): each `markProcessed`
 * writes ONE new segment file holding only that epoch's paths — O(new
 * files) IO, never a rewrite of history. The snapshot diff runs as a Spark
 * ANTI-JOIN of the listed snapshot against a distributed text read of the
 * segments, so the full processed set is never materialized as a driver
 * Set; only the (small) new-file result is collected for bin packing. When
 * segments accumulate past `maxSegments`, they are merged into one — an
 * O(total) pass amortized over `maxSegments` epochs.
 *
 * All IO goes through Hadoop `FileSystem`, so both the watched directory and
 * the ledger can live on any durable store (`hdfs://`, `s3a://`, ...).
 */
object IncrementalFileSource {
  final case class FileEntry(path: String, size: Long)
  final case class Plan(bins: Seq[Seq[FileEntry]]) {
    def files: Seq[FileEntry] = bins.flatten
  }
}

final class IncrementalFileSource(stateDir: String, maxSegments: Int = 64) {
  import IncrementalFileSource.{FileEntry, Plan}

  private def hconf: Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
  private val stateRoot = new HPath(stateDir)
  private def stateFs: FileSystem = stateRoot.getFileSystem(hconf)
  private def ledgerDir = new HPath(stateRoot, "ledger")
  /** pre-segment ledger file (older state dirs); read-only back-compat */
  private def legacyLedgerPath = new HPath(stateRoot, "processed_files.txt")
  stateFs.mkdirs(ledgerDir)

  /** Segment names order by WALL-CLOCK millis (zero-padded, so the order
    * survives JVM restarts — nanoTime has an arbitrary per-JVM origin) with
    * a random suffix against same-tick collisions (coarse clocks /
    * concurrent writers sharing a state dir). Ordering only needs to be
    * approximate: the diff has set semantics; it matters solely so a
    * crash-interrupted compaction's merged segment sorts at/after its
    * inputs (duplicates, never loss) — compactLedger passes an explicit
    * `millis` bumped past its newest input to make that STRICT. */
  private def segmentName(millis: Long = System.currentTimeMillis()): String =
    f"seg-$millis%016d-${
      java.util.UUID.randomUUID().toString.take(8)}.txt"

  /** committed ledger segments, oldest first (name-ordered) */
  private def segments(): Seq[HPath] = {
    val f = stateFs
    val segs =
      if (!f.exists(ledgerDir)) Seq.empty
      else f.listStatus(ledgerDir).iterator
        .filter(s => s.isFile && s.getPath.getName.startsWith("seg-") &&
          s.getPath.getName.endsWith(".txt"))
        .map(_.getPath).toSeq.sortBy(_.getName)
    if (f.exists(legacyLedgerPath)) legacyLedgerPath +: segs else segs
  }

  /** Full processed set ON THE DRIVER — test/inspection surface only; the
    * planning path diffs distributedly and never calls this. */
  def processed(): Set[String] = {
    val f = stateFs
    segments().iterator.flatMap { p =>
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    }.toSet
  }

  /** number of live ledger segments (compaction observability) */
  def segmentCount(): Int = segments().size

  /** list current snapshot (recursive), subtract the ledger, pack into
    * `nBins`. Paths with any hidden component (`_`/`.` prefix — e.g. a
    * concurrent Spark writer's `_temporary` attempt files) are excluded,
    * mirroring Spark's own FileIndex rule: pulling an in-flight temp file
    * would double-ingest it under its final name after the writer commits. */
  def plan(dir: String, nBins: Int,
           pattern: String => Boolean = _.endsWith(".parquet")): Plan = {
    val root = new HPath(dir)
    val f = root.getFileSystem(hconf)
    // Only components strictly BELOW the watched root are checked: listed
    // statuses come back fully qualified (file:/...), so the root must be
    // qualified the same way or the upward walk never terminates at it and
    // ends up inspecting the root's own name and every ancestor — a watched
    // dir anywhere under a '.'/'_' component (e.g. /root/.cache/in) would
    // silently plan zero files.
    val qroot = f.makeQualified(root)
    def visibleUnderRoot(p: HPath): Boolean = {
      var cur = p
      while (cur != null && cur != qroot) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        cur = cur.getParent
      }
      cur != null // defensive: a path NOT under root is not visible
    }
    val it = f.listFiles(root, true)
    val now = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(s => s.isFile && pattern(s.getPath.toString) &&
        visibleUnderRoot(s.getPath))
      .map(s => FileEntry(s.getPath.toString, s.getLen))
      .toSeq
    Plan(binPack(diffAgainstLedger(now), nBins))
  }

  /** LAZY planning — the `WorkUnitStreamSource` analog (SURVEY.md §2.1 #2:
    * work-unit STREAMS, so a source with a huge file population can start
    * ingesting before, and without ever, materializing the complete
    * work-unit list). Returns an iterator of Plans, each holding at most
    * `maxFilesPerPlan` NEW files: the directory listing is consumed
    * incrementally (Hadoop's RemoteIterator is itself lazy/paged on real
    * stores), the ledger diff runs per CHUNK of the listing, and the
    * driver never holds more than one chunk — neither the full snapshot
    * nor the full new-file list ever exists in driver memory. Each emitted
    * plan is bin-packed like `plan`'s output; callers `markProcessed` each
    * plan after ingesting it, exactly as with eager planning (crash
    * between plans = re-plan from the ledger, idempotent via the fence). */
  def planLazy(dir: String, nBins: Int, maxFilesPerPlan: Int,
               pattern: String => Boolean = _.endsWith(".parquet"))
      : Iterator[Plan] = {
    require(maxFilesPerPlan > 0)
    val root = new HPath(dir)
    val f = root.getFileSystem(hconf)
    val qroot = f.makeQualified(root)
    def visibleUnderRoot(p: HPath): Boolean = {
      var cur = p
      while (cur != null && cur != qroot) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        cur = cur.getParent
      }
      cur != null
    }
    val it = f.listFiles(root, true)
    val listed = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(s => s.isFile && pattern(s.getPath.toString) &&
        visibleUnderRoot(s.getPath))
      .map(s => FileEntry(s.getPath.toString, s.getLen))
    // diff chunk-by-chunk; a chunk larger than the plan cap keeps the
    // per-chunk anti-join worthwhile while bounding driver memory
    listed.grouped(math.max(maxFilesPerPlan * 4, 1024))
      .flatMap(chunk => diffAgainstLedger(chunk.toSeq))
      .grouped(maxFilesPerPlan)
      .map(fs => Plan(binPack(fs.toSeq, nBins)))
  }

  /** snapshot minus ledger. With an active SparkSession the diff is a
    * distributed LEFT ANTI join (listing rows against a text read of the
    * ledger segments) — the processed set never lands on the driver and
    * only the new files come back. Driver-set fallback without a session. */
  private def diffAgainstLedger(now: Seq[FileEntry]): Seq[FileEntry] = {
    val segs = segments()
    if (segs.isEmpty) return now
    SparkSession.getActiveSession match {
      case Some(spark) =>
        import spark.implicits._
        val done = spark.read.textFile(segs.map(_.toString): _*)
          .filter(_.nonEmpty).toDF("path")
        now.toDF("path", "size")
          .join(done, Seq("path"), "left_anti")
          .as[(String, Long)].collect()
          .map { case (p, s) => FileEntry(p, s) }.toSeq
          .sortBy(_.path)
      case None =>
        val done = processed()
        now.filterNot(e => done.contains(e.path))
    }
  }

  /** worst-fit decreasing: sort by size desc, place each into the currently
    * lightest bin. */
  def binPack(files: Seq[FileEntry], nBins: Int): Seq[Seq[FileEntry]] = {
    if (files.isEmpty) return Seq.empty
    val bins = Array.fill(math.max(1, nBins))(
      (List.empty[FileEntry], 0L))
    files.sortBy(f => (-f.size, f.path)).foreach { f =>
      val i = bins.indices.minBy(j => bins(j)._2)
      bins(i) = (f :: bins(i)._1, bins(i)._2 + f.size)
    }
    bins.toSeq.filter(_._1.nonEmpty).map(_._1.reverse)
  }

  /** Bi-level packing (KafkaBiLevelWorkUnitPacker.java:102-130): level 1
    * pre-groups files by affinity key (their parent directory — the "topic")
    * into ~3·nBins sub-bins so files of one group tend to ride together
    * (shared dictionary/footer locality, one listing per group at read
    * time); level 2 worst-fit-decreasing packs those sub-bins into the
    * final `nBins` slots. The 3× fan-out is the reference's empirical
    * choice (gobblin-docs/case-studies/Kafka-HDFS-Ingestion.md:199-205):
    * enough sub-bins that level 2 can still balance, few enough that
    * affinity is mostly preserved. */
  def binPackBiLevel(files: Seq[FileEntry], nBins: Int): Seq[Seq[FileEntry]] = {
    if (files.isEmpty) return Seq.empty
    val groups = files.groupBy(f =>
      f.path.substring(0, math.max(0, f.path.lastIndexOf('/'))))
    val level1Bins = math.max(1, 3 * nBins)
    // split each affinity group into sub-bins no larger than its fair share
    val avg = math.max(1L, files.map(_.size).sum / level1Bins)
    val subBins: Seq[Seq[FileEntry]] = groups.toSeq.sortBy(_._1).flatMap {
      case (_, fs) =>
        fs.sortBy(f => (-f.size, f.path))
          .foldLeft(List.empty[(List[FileEntry], Long)]) {
            case ((bin, sz) :: rest, f) if sz + f.size <= avg || bin.isEmpty =>
              (f :: bin, sz + f.size) :: rest
            case (acc, f) => (f :: Nil, f.size) :: acc
          }.map(_._1.reverse)
    }
    // level 2: worst-fit decreasing over sub-bins (kept intact)
    val slots = Array.fill(math.max(1, nBins))((List.empty[Seq[FileEntry]], 0L))
    subBins.sortBy(b => (-b.map(_.size).sum, b.head.path)).foreach { b =>
      val i = slots.indices.minBy(j => slots(j)._2)
      slots(i) = (b :: slots(i)._1, slots(i)._2 + b.map(_.size).sum)
    }
    slots.toSeq.filter(_._1.nonEmpty).map(_._1.reverse.flatten)
  }

  /** FileBasedExtractor analog (gobblin-core/.../filebased/
    * FileBasedExtractor.java + CsvFileDownloader / GZIPFileDownloader):
    * materialize a plan's files as one DataFrame. Spark's own split
    * planning replaces the reference's per-WorkUnit downloader loop — the
    * bins remain the unit of ledger bookkeeping, while the scan plans
    * splits itself (for non-splittable inputs like `.gz`, one task per
    * file, which is exactly the downloader's granularity; Hadoop codecs
    * decompress transparently for the text family: csv/json/text).
    * `withSourceFile` adds the originating path for lineage. */
  def extract(spark: SparkSession, plan: IncrementalFileSource.Plan,
              format: String = "parquet",
              options: Map[String, String] = Map.empty,
              schema: Option[org.apache.spark.sql.types.StructType] = None,
              withSourceFile: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(plan.files.nonEmpty, "cannot extract an empty plan")
    var r = spark.read.format(format).options(options)
    schema.foreach(s => r = r.schema(s))
    val df = r.load(plan.files.map(_.path): _*)
    if (withSourceFile)
      df.withColumn("source_file",
        org.apache.spark.sql.functions.input_file_name())
    else df
  }

  /** Record pulled files: write ONE new ledger segment holding only `files`
    * (atomic tmp+rename publish) — O(new files), the ledger is never
    * rewritten. A crash before the rename leaves an invisible tmp; the worst
    * case is a re-pull, which the fence and LWW merge make idempotent. Auto-
    * compacts when segments exceed `maxSegments` (amortized maintenance). */
  def markProcessed(files: Seq[FileEntry]): Unit = {
    if (files.isEmpty) return
    val f = stateFs
    val seg = new HPath(ledgerDir, segmentName())
    val tmp = new HPath(ledgerDir, s".${seg.getName}.tmp")
    val out = f.create(tmp, false)
    try out.write(
      files.map(_.path).sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, seg))
      throw new IllegalStateException(s"ledger segment publish failed: $seg")
    if (segmentCount() > maxSegments) compactLedger()
  }

  /** Merge all ledger segments (legacy file included) into one. Crash-safe:
    * the merged segment is published by rename BEFORE the inputs are
    * deleted, and its name is derived to sort STRICTLY after every input
    * (max input millis + 1 when the clock hasn't passed it), so a crash
    * mid-delete only leaves duplicate entries — harmless to a set-semantics
    * diff. With an active SparkSession the merge is a DISTRIBUTED text
    * rewrite (read all segments → one output file): the full ledger —
    * potentially tens of millions of paths — never streams through the
    * driver; the single-threaded driver loop remains only as the
    * no-session fallback. */
  def compactLedger(): Unit = {
    val f = stateFs
    val segs = segments()
    if (segs.size <= 1) return
    val maxInputMillis = segs.map(_.getName).collect {
      case n if n.startsWith("seg-") =>
        n.stripPrefix("seg-").take(16).toLong
    }.foldLeft(0L)(math.max)
    val merged = new HPath(ledgerDir,
      segmentName(math.max(System.currentTimeMillis(), maxInputMillis + 1)))
    SparkSession.getActiveSession match {
      case Some(spark) =>
        val outDir = new HPath(ledgerDir, s".compact-${merged.getName}")
        // repartition(1), NOT coalesce(1): coalesce would collapse the
        // upstream text scan into the single output task, serializing the
        // whole ledger read; repartition keeps the read parallel and only
        // funnels the shuffle into one writer
        spark.read.textFile(segs.map(_.toString): _*)
          .filter((l: String) => l.nonEmpty)
          .repartition(1)
          .write.mode("overwrite").text(outDir.toString)
        val part = f.listStatus(outDir).iterator
          .find(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .getOrElse(throw new IllegalStateException(
            s"ledger compaction produced no output under $outDir"))
        if (!f.rename(part.getPath, merged))
          throw new IllegalStateException(
            s"ledger compaction publish failed: $merged")
        f.delete(outDir, true)
      case None =>
        val tmp = new HPath(ledgerDir, s".${merged.getName}.tmp")
        val out = f.create(tmp, false)
        try {
          // stream segment-by-segment: never the whole ledger in memory
          segs.foreach { p =>
            val in = f.open(p)
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
              .filter(_.nonEmpty)
              .foreach(l => out.write((l + "\n").getBytes("UTF-8")))
            finally in.close()
          }
        } finally out.close()
        if (!f.rename(tmp, merged))
          throw new IllegalStateException(
            s"ledger compaction publish failed: $merged")
    }
    segs.foreach(p => f.delete(p, false))
  }
}
