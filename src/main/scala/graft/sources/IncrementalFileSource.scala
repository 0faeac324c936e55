package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

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
 */
object IncrementalFileSource {
  final case class FileEntry(path: String, size: Long)
  final case class Plan(bins: Seq[Seq[FileEntry]]) {
    def files: Seq[FileEntry] = bins.flatten
  }
}

final class IncrementalFileSource(stateDir: String) {
  import IncrementalFileSource.{FileEntry, Plan}

  private val ledgerPath: Path = Paths.get(stateDir, "processed_files.txt")
  Files.createDirectories(Paths.get(stateDir))

  def processed(): Set[String] =
    if (!Files.exists(ledgerPath)) Set.empty
    else Files.readAllLines(ledgerPath).asScala.filter(_.nonEmpty).toSet

  /** list current snapshot, subtract the ledger, pack into `nBins`. */
  def plan(dir: String, nBins: Int,
           pattern: String => Boolean = _.endsWith(".parquet")): Plan = {
    val done = processed()
    val now = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && pattern(p.toString))
      .map(p => FileEntry(p.toString, Files.size(p)))
      .filterNot(f => done.contains(f.path))
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

  /** append pulled files to the ledger (atomic rename, re-run safe). */
  def markProcessed(files: Seq[FileEntry]): Unit = {
    val all = processed() ++ files.map(_.path)
    val tmp = Paths.get(stateDir, ".processed_files.txt.tmp")
    Files.write(tmp, all.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, ledgerPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
