package graft.driver

import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.table.IceTable
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Multi-dataset ingest: one change stream fanning out into several target
 * tables, each with its OWN manifests, offsets and commit lifecycle — the
 * reference's per-dataset commit model (JobContext.commit groups task states
 * by dataset URN → SafeDatasetCommit per dataset,
 * gobblin-runtime/.../JobContext.java:448-518, SafeDatasetCommit.java:84-199)
 * combined with the fork operator's branch routing (§2.3).
 *
 * Failure isolation matches the reference: a failing dataset (e.g. its
 * task-level policy aborts) leaves that table uncommitted and replayable
 * while the other datasets' commits stand (COMMIT_SUCCESSFUL_TASKS at the
 * dataset granularity; within one dataset, all-or-nothing per epoch).
 */
object MultiTableIngest {

  final case class DatasetRoute(
      name: String,
      predicate: org.apache.spark.sql.Column,
      table: IceTable)

  final case class DatasetOutcome(name: String,
      outcome: Either[Throwable, MergeEngine.EpochOutcome])

  /** Apply one epoch to every routed dataset. The batch is persisted once;
    * each dataset filters its slice (fork semantics) and runs the full
    * fence→dedup→merge→commit pipeline against its own table. */
  def applyEpoch(
      spark: SparkSession,
      routes: Seq[DatasetRoute],
      events: Dataset[ChangeEvent],
      epochId: Long,
      nLogPartitions: Int = 32,
      claimedRange: Option[(Long, Long)] = None): Seq[DatasetOutcome] = {
    import spark.implicits._
    val cached = events.persist(StorageLevel.MEMORY_AND_DISK)
    try routes.map { r =>
      val slice = cached.filter(r.predicate).as[ChangeEvent]
      val out =
        try Right(MergeEngine.applyEpoch(spark, r.table, slice, epochId,
          nLogPartitions, claimedRange = claimedRange))
        catch { case scala.util.control.NonFatal(e) => Left(e) }
      DatasetOutcome(r.name, out)
    }
    finally { cached.unpersist(); () }
  }

  /** Dynamic dataset discovery — the reference's runtime-workunit-change
    * model (`InfiniteSource`, and KafkaSource's `topic.pattern` discovery
    * of topics that appear while the job runs): the dataset set is derived
    * from the BATCH ITSELF by `datasetOf`, and a dataset never seen before
    * gets its table created on the fly under `rootDir/<name>` and joins the
    * commit cycle from this epoch on. Returns the outcomes plus the
    * (possibly grown) table map to thread into the next epoch. Dataset
    * names become directory names — `datasetOf` must yield fs-safe values.
    */
  def applyEpochDynamic(
      spark: SparkSession,
      rootDir: String,
      known: Map[String, IceTable],
      datasetOf: org.apache.spark.sql.Column,
      events: Dataset[ChangeEvent],
      epochId: Long,
      nLogPartitions: Int = 32,
      claimedRange: Option[(Long, Long)] = None,
      numBuckets: Int = 32)
      : (Seq[DatasetOutcome], Map[String, IceTable]) = {
    import spark.implicits._
    val cached = events.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val ds = datasetOf.cast("string")
      val rawNames = cached.toDF().select(ds.as("d"))
        .distinct().collect()
        .map(r => if (r.isNullAt(0)) null else r.getString(0))
      // a NULL dataset name is a routing bug, not a dataset: fail fast with
      // a clear message instead of an NPE mid-sort (and instead of silently
      // dropping the rows — `ds === null` matches nothing)
      require(!rawNames.contains(null),
        "datasetOf evaluated to NULL for some events; route or filter them " +
          "explicitly before dynamic discovery")
      val names = rawNames.toSeq.sorted
      val tables = names.map(n =>
        n -> known.getOrElse(n, IceTable.create(s"$rootDir/$n", numBuckets)))
        .toMap
      val outcomes = names.map { n =>
        val slice = cached.toDF().filter(ds === n).as[ChangeEvent]
        val out =
          try Right(MergeEngine.applyEpoch(spark, tables(n), slice, epochId,
            nLogPartitions, claimedRange = claimedRange))
          catch { case scala.util.control.NonFatal(e) => Left(e) }
        DatasetOutcome(n, out)
      }
      (outcomes, known ++ tables)
    } finally { cached.unpersist(); () }
  }
}
