package graft.table

import java.util

import graft.merge.Intervals
import graft.model.{DataFileEntry, EpochManifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, EqualNullSafe, Expression, If, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * The table's commit log AS A TABLE: `<catalog>.<table>.changes` — the
 * streaming half of the engine's CDC-distribution role (the reference
 * publishes change streams for downstream consumers; here a downstream
 * Spark job simply does
 * `spark.readStream.table("graft.commits.changes")` and tails every
 * committed snapshot). Batch reads of the same identifier return the feed
 * from the table origin to the current snapshot.
 *
 * Feed rows are CHANGE-EVENT SHAPED — `op` ('u' upsert / 'd' delete),
 * `seq`, then the user columns (the applied image; tombstones carry the
 * delete image the engine stored) — exactly the envelope `MergeEngine
 * .applyEpoch` ingests, so a downstream graft table can MIRROR the
 * upstream by feeding the stream straight back through the engine
 * (idempotent by the same LWW/fence semantics).
 *
 * Incremental mechanics (scale shape — never O(table) per batch):
 *  - stream offsets are SNAPSHOT VERSIONS; a micro-batch (v1 → v2] reads
 *    only files listed in v2's manifest and not in v1's (immutable,
 *    content-addressed files present in both cannot hold new changes);
 *  - within those files, rows whose `lastSeq` falls inside v1's committed
 *    offset intervals are dropped by the readers (they were carried, not
 *    changed — e.g. untouched keys inside a rewritten bucket file), and a
 *    file whose whole [minSeq, maxSeq] span is fenced is pruned WITHOUT
 *    being opened (manifest stats);
 *  - `latestOffset` is one metadata listing; empty-progress batches plan
 *    zero partitions.
 *
 * Contracts and caveats (the standard table-format CDC ones):
 *  - retention must retain the stream's horizon: a consumer whose start
 *    version has been expired fails loudly on its next batch (configure
 *    `expireSnapshots` keepLast/age above the max consumer lag);
 *  - tombstones purged below the safe horizon emit nothing (the purge
 *    horizon only passes seqs every partition committed, so a consumer
 *    following the feed has already seen the delete unless it starts from
 *    a version predating it);
 *  - rows admitted via quarantine REPROCESS carry their original
 *    (already-claimed) seqs and are fenced out of the incremental feed —
 *    use [[IceTable.changesBetween]] for an exact version diff;
 *  - the feed schema pins the LOAD-TIME table schema; restart the stream
 *    to pick up later schema evolution (newer-vintage files are projected
 *    back by colId meanwhile).
 */
object ChangeFeed {

  /** `op`, `seq`, then the user columns of `schemaId` */
  def feedSchema(schemaId: Int): StructType = {
    val user = BucketScan.canonicalSchema(schemaId).fields.dropRight(3)
    StructType(
      StructField("op", StringType, nullable = false) +:
        StructField("seq", LongType, nullable = true) +: user)
  }

  /** all partitions' committed `(lo, hi]` intervals merged into one
    * normalized global set (seqs are globally unique, so membership in ANY
    * partition's set means "already committed at that version") */
  def mergedFence(m: Option[EpochManifest]): Array[(Long, Long)] =
    m.map(mf => Intervals.normalize(
      mf.offsets.map(o => (o.lowSeq, o.highSeq))).toArray)
      .getOrElse(Array.empty)

  /** files of `mEnd` not listed in `mStart`, minus files whose whole seq
    * span is fenced (fully-carried rewrites — skipped unopened) */
  def planFiles(mStart: Option[EpochManifest],
                mEnd: EpochManifest): Seq[DataFileEntry] = {
    val startPaths =
      mStart.map(_.files.map(_.path).toSet).getOrElse(Set.empty[String])
    val fence = mergedFence(mStart)
    def fullyFenced(f: DataFileEntry): Boolean =
      (f.minSeq, f.maxSeq) match {
        case (Some(lo), Some(hi)) =>
          fence.exists { case (flo, fhi) => flo < lo && hi <= fhi }
        case _ => false // stats-less files are always read
      }
    mEnd.files.filterNot(f => startPaths(f.path)).filterNot(fullyFenced)
  }
}

/** DSv2 table for the `.changes` identifier. `t` re-resolves manifests per
  * streaming batch; the feed schema is pinned at load. */
private[table] final class ChangeFeedTable(tableName: String, t: IceTable)
    extends Table with SupportsRead {

  private val schemaId = t.currentManifest()
    .map(_.schemaId).getOrElse(SchemaRegistry.baseSchemaId)

  override def name(): String = tableName
  override def schema(): StructType = ChangeFeed.feedSchema(schemaId)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ChangeFeedScan(tableName, t, schemaId,
        Option(opts.get("startingversion")).map(_.toLong).getOrElse(-1L))
    }
}

private final class ChangeFeedScan(tableName: String, t: IceTable,
    schemaId: Int, startingVersion: Long) extends Scan {

  override def readSchema(): StructType = ChangeFeed.feedSchema(schemaId)
  override def description(): String = s"graft-change-feed[$tableName]"

  /** batch = the feed from `startingVersion` (default: table origin) to
    * the snapshot current at scan construction */
  override def toBatch: Batch = new Batch {
    private val end = t.currentVersion()
    private lazy val planned = ChangeFeedScan.plan(t, schemaId,
      startingVersion, end)
    override def planInputPartitions(): Array[InputPartition] = planned._1
    override def createReaderFactory(): PartitionReaderFactory = planned._2
  }

  override def toMicroBatchStream(checkpointLoc: String): MicroBatchStream =
    new ChangeFeedStream(t, schemaId, startingVersion)
}

private object ChangeFeedScan {
  /** shared batch planner: (partitions, factory) for versions (from, to] */
  def plan(t: IceTable, schemaId: Int, fromVersion: Long, toVersion: Long)
      : (Array[InputPartition], PartitionReaderFactory) = {
    val spark = SparkSession.active
    val mStart =
      if (fromVersion < 0) None else Some(t.readManifest(fromVersion))
    val mEnd =
      if (toVersion < 0) None else Some(t.readManifest(toVersion))
    val files = mEnd.map(ChangeFeed.planFiles(mStart, _)).getOrElse(Nil)
    if (files.isEmpty)
      return (Array.empty[InputPartition], EmptyFeedFactory)
    val buckets = files.map(_.bucket).distinct.sorted
    val (parts, inner) =
      BucketScan.scanParts(spark, files, buckets, schemaId)
    (parts, new FeedFactory(inner, BucketScan.canonicalSchema(schemaId),
      ChangeFeed.mergedFence(mStart)))
  }
}

/** Streaming source over the snapshot log: offsets are versions. */
private final class ChangeFeedStream(t: IceTable, schemaId: Int,
    startingVersion: Long) extends MicroBatchStream {

  override def initialOffset(): Offset =
    VersionOffset(math.max(-1L, startingVersion))
  override def latestOffset(): Offset = VersionOffset(t.currentVersion())
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)

  // the (start,end) plan is deterministic from immutable manifests, but
  // Spark may ask for the same range more than once (retries, WAL replay)
  @volatile private var cached: ((Long, Long),
      (Array[InputPartition], PartitionReaderFactory)) = _

  private def planned(start: Long, end: Long) = {
    val c = cached
    if (c != null && c._1 == (start, end)) c._2
    else {
      val p = ChangeFeedScan.plan(t, schemaId, start, end)
      cached = ((start, end), p)
      p
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    if (e <= s) Array.empty else planned(s, e)._1
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val c = cached
    if (c == null) EmptyFeedFactory else c._2._2
  }

  override def commit(offset: Offset): Unit = () // checkpoint is the truth
  override def stop(): Unit = ()
}

private final case class VersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private object EmptyFeedFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    throw new IllegalStateException("empty feed plans no partitions")
}

/** Wraps canonical-row readers `[user..., bucket, lastSeq, deleted]` into
  * feed rows `[op, seq, user...]`, dropping rows whose seq the START
  * version already committed (carried, not changed). Fence test is a
  * binary search over the merged interval array; the projection is a
  * codegen'd UnsafeProjection built on the executor. */
private final class FeedFactory(inner: PartitionReaderFactory,
    canonical: StructType, fence: Array[(Long, Long)])
    extends PartitionReaderFactory {

  private val nUser = canonical.length - 3
  private val lastSeqIdx = canonical.length - 2
  private val deletedIdx = canonical.length - 1

  private def fenced(seq: Long): Boolean = {
    var lo = 0; var hi = fence.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val (flo, fhi) = fence(mid)
      if (seq <= flo) hi = mid - 1
      else if (seq > fhi) lo = mid + 1
      else return true // flo < seq <= fhi
    }
    false
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val in = inner.createReader(p)
    new PartitionReader[InternalRow] {
      private val proj = {
        def ref(i: Int): Expression =
          BoundReference(i, canonical(i).dataType, nullable = true)
        val op = If(
          EqualNullSafe(ref(deletedIdx), Literal(true)),
          Literal(UTF8String.fromString("d"), StringType),
          Literal(UTF8String.fromString("u"), StringType))
        UnsafeProjection.create(
          (op +: ref(lastSeqIdx) +: (0 until nUser).map(ref)).toArray)
      }
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (in.next()) {
          val r = in.get()
          val carried = !r.isNullAt(lastSeqIdx) && fenced(r.getLong(lastSeqIdx))
          if (!carried) { cur = proj(r); return true }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = in.close()
    }
  }
}
