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
 * Spark-native version: a processed-files ledger (atomic tmp+rename like
 * FsStateStore.put) plus worst-fit-decreasing bin packing of the new files
 * into N balanced read groups — the KafkaWorkUnitPacker's algorithm
 * (gobblin-modules/.../packer/KafkaSingleLevelWorkUnitPacker.java; SURVEY.md
 * §2.8). Each group becomes one `spark.read.parquet(groupFiles: _*)` unit,
 * so a heterogeneous file population still yields balanced tasks.
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

final class IncrementalFileSource(stateDir: String) {
  import IncrementalFileSource.{FileEntry, Plan}

  private def hconf: Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
  private val stateRoot = new HPath(stateDir)
  private def stateFs: FileSystem = stateRoot.getFileSystem(hconf)
  private def ledgerPath = new HPath(stateRoot, "processed_files.txt")
  stateFs.mkdirs(stateRoot)

  def processed(): Set[String] = {
    val f = stateFs
    if (!f.exists(ledgerPath)) Set.empty
    else {
      val in = f.open(ledgerPath)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** list current snapshot (recursive), subtract the ledger, pack into
    * `nBins`. Paths with any hidden component (`_`/`.` prefix — e.g. a
    * concurrent Spark writer's `_temporary` attempt files) are excluded,
    * mirroring Spark's own FileIndex rule: pulling an in-flight temp file
    * would double-ingest it under its final name after the writer commits. */
  def plan(dir: String, nBins: Int,
           pattern: String => Boolean = _.endsWith(".parquet")): Plan = {
    val done = processed()
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
      .filterNot(e => done.contains(e.path))
      .toSeq
    Plan(binPack(now, nBins))
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

  /** append pulled files to the ledger (atomic rename, re-run safe). */
  def markProcessed(files: Seq[FileEntry]): Unit = {
    val f = stateFs
    val all = processed() ++ files.map(_.path)
    val tmp = new HPath(stateRoot,
      s".processed_files-${System.nanoTime()}.txt.tmp")
    val out = f.create(tmp, false)
    try out.write(all.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // rename-with-replace: delete-then-rename is fine for the ledger (the
    // worst case of a crash between the two is a re-pull, which the fence
    // and LWW merge already make idempotent)
    f.delete(ledgerPath, false)
    if (!f.rename(tmp, ledgerPath))
      throw new IllegalStateException(s"ledger publish failed: $ledgerPath")
  }
}
