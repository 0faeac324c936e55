package graft.merge

import graft.model._
import graft.pipeline.RowPolicies
import graft.table.{IceTable, SchemaRegistry}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import java.nio.file.{Files, Paths}

/**
 * Epoch apply: quality-check → per-partition offset fence → key dedup →
 * copy-on-write MERGE into the IceTable → atomic manifest commit.
 *
 * This is the Spark-native re-expression of the reference's task dataflow
 * (extractor → converters → row-quality → writer → publisher,
 * gobblin-runtime/.../StreamModelTaskRunner.java:79-170) collapsed into one
 * declarative plan per epoch, with Gobblin's commit machinery
 * (FineGrainedWatermarkTracker + IcebergMetadataWriter.flush) replaced by a
 * single atomic snapshot commit whose manifest carries the per-partition
 * offset ranges (the replay fence).
 *
 * Scale notes (designed for 1000 executors / 100 TB):
 *  - Dedup is `groupBy(repo, path).agg(max_by(...))` — a hash aggregate with
 *    map-side partial combine, NOT a window sort. A hot key (many updates to
 *    one file in one epoch) collapses map-side before the shuffle, so Zipf
 *    skew on repos costs one combined row per task, not a skewed reducer.
 *  - The MERGE join runs only over buckets the epoch touches (bucket pruning
 *    via the manifest file list); untouched buckets' files carry forward by
 *    reference — rewrite amplification is bounded by bucket width.
 *  - All counters come from a single pass over the persisted upsert set
 *    (small: post-dedup) plus `observe`-style aggregates; no driver loops.
 */
object MergeEngine {

  private val timing = sys.env.get("SPARK_GRAFT_TIMING").contains("1")
  private def timed[T](name: String)(f: => T): T =
    if (!timing) f else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[timing] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  final case class EpochOutcome(
      manifest: EpochManifest,
      skipped: Boolean,          // fully fenced (replayed epoch)
      stats: EpochStats)

  /** Per-log-partition id — keyed like a Kafka partition: stable hash of the
    * record key, so per-partition watermarks are meaningful under re-reads. */
  def logPartitionCol(nLogPartitions: Int): Column =
    pmod(xxhash64(col("repo"), col("path")), lit(nLogPartitions)).cast("int")

  /**
   * Apply one epoch of change events to `table`. Idempotent: events at or
   * below the committed per-partition high watermark are filtered out (the
   * "skip records below next watermark" dedup of KafkaExtractor.java:179-183);
   * an epoch whose events are all fenced commits no new snapshot.
   */
  def applyEpoch(
      spark: SparkSession,
      table: IceTable,
      rawEvents: Dataset[ChangeEvent],
      epochId: Long,
      nLogPartitions: Int = 32,
      quarantineDir: Option[String] = None): EpochOutcome = {
    import spark.implicits._

    val parent = table.currentManifest()
    val parentVersion = parent.map(_.version).getOrElse(-1L)
    val committed: Map[Int, Long] = parent
      .map(_.offsets.map(o => o.partitionId -> o.highSeq).toMap)
      .getOrElse(Map.empty)

    // --- 1. quality gate (RowLevelPolicy analog) -------------------------
    val withPart = rawEvents.toDF()
      .withColumn("logPart", logPartitionCol(nLogPartitions))
    val good = withPart.filter(RowPolicies.passAll())
    val bad = withPart.filter(!RowPolicies.passAll())
      .withColumn("reason", RowPolicies.failReason())

    val quarantined: Long = quarantineDir match {
      case Some(dir) =>
        val out = s"$dir/epoch=$epochId"
        val badP = bad.persist(StorageLevel.MEMORY_AND_DISK)
        val n = badP.count()
        if (n > 0) badP.drop("logPart").write.mode("overwrite").parquet(out)
        badP.unpersist()
        n
      case None => 0L
    }

    // --- 2. offset fence (exactly-once replay dedup) ---------------------
    val fence: Column = if (committed.isEmpty) lit(true) else {
      val fenceMap = map(committed.toSeq.sortBy(_._1)
        .flatMap { case (p, h) => Seq(lit(p), lit(h)) }: _*)
      col("seq") > coalesce(fenceMap(col("logPart")), lit(Long.MinValue))
    }
    val fresh = good.filter(fence)

    // --- 3. dedup: last-writer-wins by seq per key -----------------------
    // max_by(struct, seq): hash aggregate w/ partial combine (skew-immune).
    // Single shuffle over the epoch's events. The winner's seq per key IS
    // the key's max seq, so per-log-partition high watermarks are derivable
    // from the deduped output — no second full scan of the input.
    val deduped = fresh
      .groupBy($"repo", $"path")
      .agg(
        max_by(struct($"op", $"seq", $"commit", $"lang", $"content"), $"seq")
          .as("e"),
        count(lit(1)).as("nEvents"),
        first($"logPart").as("logPart"))
      .select($"repo", $"path", $"e.op".as("op"), $"e.seq".as("seq"),
        $"e.commit".as("commit"), $"e.lang".as("lang"),
        $"e.content".as("content"), $"nEvents", $"logPart")
      .withColumn("bucket", table.bucketCol($"repo", $"path"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // one small collect: counters, watermarks, bucket pruning, all at once
    val perGroup = timed("dedup+stats")(deduped.groupBy($"bucket", $"logPart")
      .agg(count(lit(1)).as("nKeys"), sum($"nEvents").as("nEv"),
        sum(when($"op" === "d", 1L).otherwise(0L)).as("nDel"),
        max($"seq").as("hi"))
      .collect())
    val freshCount = perGroup.map(_.getAs[Long]("nEv")).sum
    val newHighs: Map[Int, Long] = perGroup
      .groupBy(_.getAs[Int]("logPart"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("hi")).max }

    if (freshCount == 0) {
      // fully fenced epoch (pure replay) — commit nothing, state unchanged.
      deduped.unpersist()
      val m = parent.getOrElse(
        EpochManifest(-1L, epochId, SchemaRegistry.baseSchemaId, Nil, Nil,
          EpochStats(0, quarantined, 0, 0, 0), -1L))
      return EpochOutcome(m, skipped = true,
        EpochStats(0, quarantined, 0, 0, 0))
    }

    val upsertCount = perGroup.map(_.getAs[Long]("nKeys")).sum
    val dedupDrops = freshCount - upsertCount
    val deleteCount = perGroup.map(_.getAs[Long]("nDel")).sum

    // --- 4. copy-on-write MERGE over affected buckets --------------------
    val updates = deduped
    val affectedBuckets: Set[Int] =
      perGroup.map(_.getAs[Int]("bucket")).toSet

    val schemaIdNow = parent.map(_.schemaId).getOrElse(SchemaRegistry.baseSchemaId)
    val targetSchema = SchemaRegistry.schemaFor(schemaIdNow)

    val parentFiles = parent.map(_.files).getOrElse(Seq.empty)
    val (touchedFiles, keptFiles) =
      parentFiles.partition(f => affectedBuckets.contains(f.bucket))

    val current = table.readFiles(spark, touchedFiles, schemaIdNow)

    // Resolution per target-schema column, by stable colId: update-side
    // payload wins when the update is newer; columns the ChangeEvent payload
    // doesn't carry (post-evolution additions) keep the current-row value.
    val updateColByColId = Map(1 -> "repo", 2 -> "path", 3 -> "commit",
      4 -> "lang", 5 -> "content")
    val u = updates.as("u")
    val c = current.as("c")
    val resolved: Seq[Column] = targetSchema.columns.map { tc =>
      tc.colId match {
        case 1 => col("repo")
        case 2 => col("path")
        case 6 => when($"u.seq".isNotNull, sha2($"u.content", 256))
          .otherwise(col(s"c.${tc.name}")).as(tc.name)
        case cid if updateColByColId.contains(cid) =>
          coalesce(col(s"u.${updateColByColId(cid)}"), col(s"c.${tc.name}"))
            .as(tc.name)
        case _ => col(s"c.${tc.name}").as(tc.name)
      }
    } :+ coalesce($"u.bucket", $"c.bucket").as("bucket")

    val merged = c.join(u, Seq("repo", "path"), "full_outer")
      .filter(coalesce($"u.op", lit("")) =!= "d")
      .select(resolved: _*)

    val newFiles = timed("merge+write")(
      table.writeEpochFiles(merged, epochId, schemaIdNow))
    deduped.unpersist()

    // --- 5. manifest: carry-forward + new files + merged offsets ---------
    val mergedOffsets: Seq[OffsetRange] =
      (committed.keySet ++ newHighs.keySet).toSeq.sorted.map { p =>
        val lo = committed.getOrElse(p, -1L)
        val hi = math.max(newHighs.getOrElse(p, Long.MinValue),
          committed.getOrElse(p, Long.MinValue))
        OffsetRange(p, lo, hi)
      }

    val stats = EpochStats(
      rowsExtracted = freshCount + quarantined,
      rowsQuarantined = quarantined,
      dedupDrops = dedupDrops,
      rowsApplied = upsertCount - deleteCount,
      deletesApplied = deleteCount)

    val manifest = EpochManifest(
      version = parentVersion + 1,
      epochId = epochId,
      schemaId = parent.map(_.schemaId).getOrElse(SchemaRegistry.baseSchemaId),
      files = (keptFiles ++ newFiles).sortBy(f => (f.bucket, f.path)),
      offsets = mergedOffsets,
      stats = stats,
      parentVersion = parentVersion)

    timed("commit")(table.commit(manifest))
    EpochOutcome(manifest, skipped = false, stats)
  }

  /** Append per-partition lineage rows for a committed epoch. */
  def writeLineage(spark: SparkSession, stateDir: String, epochId: Long,
                   prev: Map[Int, Long], cur: Seq[OffsetRange],
                   stats: EpochStats): Unit = {
    import spark.implicits._
    val globalHigh = cur.map(_.highSeq).foldLeft(Long.MinValue)(math.max)
    val rows = cur.map { o =>
      LineageRow(epochId, o.partitionId,
        prev.getOrElse(o.partitionId, -1L), o.highSeq,
        stats.rowsApplied, stats.dedupDrops,
        watermarkLag = globalHigh - o.highSeq)
    }
    Files.createDirectories(Paths.get(stateDir))
    rows.toDS().coalesce(1).write.mode("overwrite")
      .parquet(s"$stateDir/lineage/epoch=$epochId")
  }
}
