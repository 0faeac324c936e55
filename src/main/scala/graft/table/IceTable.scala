package graft.table

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Minimal snapshot/manifest table layer ("IceTable") over Parquet.
 *
 * No Iceberg/Delta jar exists in this environment (SURVEY.md §7.0), so the
 * engine re-creates, from scratch and Spark-first, exactly the semantics the
 * reference builds on Iceberg (IcebergMetadataWriter.flush,
 * gobblin-iceberg/.../writer/IcebergMetadataWriter.java:834-905):
 *
 *  - A table is a directory; readable state is defined ONLY by the manifest
 *    the pointer file references. Data files not listed in the current
 *    manifest are invisible — so a crash after data-file write but before
 *    manifest commit leaves orphans that are simply ignored on replay.
 *  - Commit = write `snap-<version>.json` (tmp + rename), then atomically
 *    swing `_current` (tmp + ATOMIC_MOVE rename) — the same tmp+rename trick
 *    as the reference's FsStateStore.put
 *    (gobblin-metastore/.../FsStateStore.java:156-178).
 *  - The manifest carries committed per-partition offset ranges — the replay
 *    fence that makes epoch application idempotent (the `mergeOffsets`
 *    pattern, IcebergMetadataWriter.java:385-435).
 *  - Rows are hash-bucketed by key `(repo, path)`. Copy-on-write MERGE
 *    rewrites only the buckets an epoch touches; untouched buckets' files are
 *    carried forward by reference. At cluster scale the bucket count bounds
 *    both merge-join width and rewrite amplification.
 *
 * Layout:
 * {{{
 *   <dir>/data/e<epochId>/bucket=<b>/part-*.parquet
 *   <dir>/meta/snap-<version>.json
 *   <dir>/meta/_current                 // contains the current version
 * }}}
 *
 * Single-writer (like a Gobblin job owning its dataset); commits CAS on the
 * parent version so a concurrent second writer fails instead of corrupting.
 */
final class IceTable(val dir: String, val numBuckets: Int) {
  private val metaDir: Path = Paths.get(dir, "meta")
  private val dataDir: Path = Paths.get(dir, "data")

  def init(): this.type = {
    Files.createDirectories(metaDir)
    Files.createDirectories(dataDir)
    this
  }

  // ---- pointer / manifest IO -------------------------------------------

  def currentVersion(): Long = {
    val p = metaDir.resolve("_current")
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong
    else -1L
  }

  def currentManifest(): Option[EpochManifest] = {
    val v = currentVersion()
    if (v < 0) None else Some(readManifest(v))
  }

  def readManifest(version: Long): EpochManifest =
    ManifestJson.read(metaDir.resolve(f"snap-$version%08d.json"))

  /** Atomically commit `m` as the new current snapshot. CAS on parent. */
  def commit(m: EpochManifest): Unit = {
    val cur = currentVersion()
    require(m.parentVersion == cur,
      s"concurrent writer detected: parent=${m.parentVersion} current=$cur")
    require(m.version == cur + 1, s"version must be ${cur + 1}, got ${m.version}")
    val snap = metaDir.resolve(f"snap-${m.version}%08d.json")
    val snapTmp = metaDir.resolve(f".snap-${m.version}%08d.json.tmp")
    Files.write(snapTmp, ManifestJson.write(m).getBytes("UTF-8"))
    Files.move(snapTmp, snap, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val ptrTmp = metaDir.resolve("._current.tmp")
    Files.write(ptrTmp, m.version.toString.getBytes("UTF-8"))
    Files.move(ptrTmp, metaDir.resolve("_current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- reads ------------------------------------------------------------

  /** Current table state as the USER view: tombstones filtered, physical
    * columns (bucket, lastSeq, deleted) dropped, projected to the snapshot's
    * current schema. Only manifest-listed files are read; files written
    * under an older schema are evolved at read time by column-id projection
    * (no rewrite). */
  def read(spark: SparkSession): DataFrame =
    readRaw(spark)
      .filter(!coalesce(col("deleted"), lit(false)))
      .drop("bucket", "lastSeq", "deleted")

  /** Raw view incl. physical columns and tombstones (merge/maintenance). */
  def readRaw(spark: SparkSession): DataFrame = currentManifest() match {
    case None => emptyDf(spark)
    case Some(m) => readFiles(spark, m.files, m.schemaId)
  }

  /** Time travel: the user view AS OF an older snapshot version. Snapshot
    * isolation falls out of immutability — a manifest's file list never
    * changes, so concurrent readers of any version are unaffected by
    * ongoing commits. */
  def readAt(spark: SparkSession, version: Long): DataFrame = {
    val m = readManifest(version)
    readFiles(spark, m.files, m.schemaId)
      .filter(!coalesce(col("deleted"), lit(false)))
      .drop("bucket", "lastSeq", "deleted")
  }

  /** Retention (SURVEY.md §2.9 cleaner analog): expire snapshots older than
    * the last `keepLast`, then delete data files referenced by NO retained
    * snapshot. Readers of retained versions are unaffected (their manifests
    * and files survive). Returns (#manifests, #dataFiles) removed. */
  def expireSnapshots(keepLast: Int): (Int, Int) = {
    require(keepLast >= 1)
    val cur = currentVersion()
    if (cur < 0) return (0, 0)
    val cutoff = cur - keepLast + 1
    val expired = (0L until cutoff).filter(v =>
      Files.exists(metaDir.resolve(f"snap-$v%08d.json")))
    if (expired.isEmpty) return (0, 0)
    val retainedFiles: Set[String] = (cutoff to cur)
      .filter(v => Files.exists(metaDir.resolve(f"snap-$v%08d.json")))
      .flatMap(v => readManifest(v).files.map(_.path)).toSet
    val expiredFiles: Set[String] = expired
      .flatMap(v => readManifest(v).files.map(_.path)).toSet
    val removable = expiredFiles -- retainedFiles
    removable.foreach(p => Files.deleteIfExists(Paths.get(p)))
    expired.foreach(v =>
      Files.deleteIfExists(metaDir.resolve(f"snap-$v%08d.json")))
    (expired.size, removable.size)
  }

  def readFiles(spark: SparkSession, files: Seq[DataFileEntry],
                targetSchemaId: Int = SchemaRegistry.baseSchemaId): DataFrame =
    if (files.isEmpty)
      SchemaRegistry.evolve(emptyDf(spark), SchemaRegistry.baseSchemaId,
        targetSchemaId)
    else {
      // group files by written schema, evolve each group, union by name
      files.groupBy(_.schemaId).toSeq.sortBy(_._1).map { case (sid, fs) =>
        val df = spark.read
          .option("basePath", dataDir.toString)
          .parquet(fs.map(_.path): _*)
        SchemaRegistry.evolve(df, sid, targetSchemaId)
      }.reduce(_.unionByName(_))
    }

  private def emptyDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[FileRow]
      .withColumn("bucket", lit(0))
      .withColumn("lastSeq", lit(null).cast("long"))
      .withColumn("deleted", lit(false))
  }

  // ---- writes -----------------------------------------------------------

  def bucketCol(repo: org.apache.spark.sql.Column,
                path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(repo, path), lit(numBuckets)).cast("int")

  /** Write the given rows (must contain FileRow columns + `bucket`) as data
    * files for `epochId`; returns the manifest entries for the new files.
    * One shuffle keyed by bucket so each bucket lands in exactly one task →
    * one file per bucket (bounded small-file count, co-located future merges). */
  /** Write rows as data files for `epochId`, one shuffle keyed by bucket.
    * `saltPerBucket > 1` splits each bucket across that many writer tasks
    * (the north-star "salted repartitioning before the merge-apply stage"):
    * a Zipf-hot bucket then produces several files in parallel instead of
    * one straggler task; readers are unaffected (manifests list all files). */
  def writeEpochFiles(df: DataFrame, epochId: Long,
      schemaId: Int = SchemaRegistry.baseSchemaId,
      saltPerBucket: Int = 1): Seq[DataFileEntry] = {
    val epochDir = dataDir.resolve(s"e$epochId")
    val parted =
      if (saltPerBucket <= 1) df.repartition(numBuckets, col("bucket"))
      else df.repartition(numBuckets * saltPerBucket, col("bucket"),
        pmod(xxhash64(col("path")), lit(saltPerBucket)))
    parted
      .sortWithinPartitions("bucket", "repo", "path")
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(epochDir.toString)
    listEpochFiles(epochId, schemaId)
  }

  def listEpochFiles(epochId: Long,
      schemaId: Int = SchemaRegistry.baseSchemaId): Seq[DataFileEntry] = {
    val epochDir = dataDir.resolve(s"e$epochId")
    if (!Files.exists(epochDir)) return Seq.empty
    val files = Files.walk(epochDir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
    files.map { p =>
      val bucket = p.getParent.getFileName.toString.stripPrefix("bucket=").toInt
      DataFileEntry(p.toString, bucket, -1L, schemaId)
    }.sortBy(f => (f.bucket, f.path))
  }

  /** Commit a schema evolution: new snapshot, same files, new schemaId —
    * metadata-only, atomic with the pointer swing. */
  def evolveSchema(toSchemaId: Int): EpochManifest = {
    val parent = currentManifest().getOrElse(
      EpochManifest(-1L, -1L, SchemaRegistry.baseSchemaId, Nil, Nil,
        EpochStats(0, 0, 0, 0, 0), -2L))
    SchemaRegistry.validateEvolution(
      SchemaRegistry.schemaFor(parent.schemaId),
      SchemaRegistry.schemaFor(toSchemaId))
    val m = parent.copy(
      version = parent.version + 1,
      schemaId = toSchemaId,
      parentVersion = parent.version)
    commit(m)
    m
  }

  /** Remove data files for a given epoch that were never committed (crash
    * cleanup); safe because readers only see manifest-listed files. */
  def dropUncommittedEpochFiles(epochId: Long): Unit = {
    val committed: Set[String] = currentManifest()
      .map(_.files.map(_.path).toSet).getOrElse(Set.empty)
    val epochDir = dataDir.resolve(s"e$epochId")
    if (Files.exists(epochDir)) {
      val all = Files.walk(epochDir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
      if (!all.exists(p => committed.contains(p.toString)))
        all.foreach(Files.deleteIfExists(_))
    }
  }
}

object IceTable {
  def create(dir: String, numBuckets: Int = 32): IceTable =
    new IceTable(dir, numBuckets).init()
}
