package graft.table

import graft.merge.MergeEngine
import graft.model.ChangeEvent
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/**
 * SQL WRITE PATH: `INSERT INTO graft.t ...` / `df.writeTo("graft.t")
 * .append()` routed through the ENGINE's epoch machinery — the front door
 * the reference gives every user as config-driven job submission
 * (gobblin-example/.../wikipedia.pull; launch path
 * gobblin-runtime/.../AbstractJobLauncher.java:433), here as plain Spark
 * SQL against the DSv2 catalog. The append IS a normal engine epoch:
 * `MergeEngine.applyEpoch` with op='i' rows, engine-allocated seqs, the
 * standard dedup/LWW merge, counter reconciliation, and the atomic
 * snapshot commit (with rebase-or-retry under concurrent writers) — NOT a
 * side-channel file write, so every engine invariant (readable state =
 * manifest-listed files, counters reconcile, offsets fence replays) holds
 * for SQL-written rows exactly as for ingested ones.
 *
 * SEQ ALLOCATION — the part that makes an append coexist with log ingest:
 *  - SQL-append seqs live in a RESERVED UPPER NAMESPACE
 *    (`SeqNamespaceBase` = 2^62 and up), disjoint from any realistic
 *    source-log seq, so allocated seqs can never collide with (or fence
 *    out) future log events;
 *  - each statement allocates the CONTIGUOUS block
 *    `(base, base + n]`, where `base` is the max of the namespace floor
 *    and every committed high — read from the same committed offsets the
 *    fence uses — and `n` is the statement's row count; the block is
 *    claimed on every log partition exactly like a declared replay slice,
 *    so the next allocation (from any writer) starts above it;
 *  - the per-row seq is assigned by a deterministic zipWithIndex over the
 *    PERSISTED input (two cheap jobs; the one place the engine drops to
 *    an RDD, because a gap-free dense rank is exactly per-partition
 *    imperative logic — a window over an empty partitionBy would
 *    single-task the statement).
 *  - claims in the upper namespace leave the completeness and
 *    tombstone-purge horizons untouched (both are contiguous-from-origin
 *    prefixes), so maintenance semantics don't change.
 *
 * SEMANTICS (documented contract, enforced where cheap):
 *  - an INSERT is an UPSERT of its keys (the table is an LWW register per
 *    key): re-running the same statement re-allocates higher seqs but
 *    converges to the same state — statement-idempotent;
 *  - SQL-written rows SUPERSEDE log ingest for their keys (their seqs are
 *    above any log seq): use SQL appends for reference/override data, not
 *    for rows the source log will keep updating;
 *  - constraint-style validation FAILS the statement (instead of
 *    quarantining silently): null/empty keys, null content, or non-null
 *    values in post-base evolved columns (the change-event payload cannot
 *    carry them — accepting them would silently drop data) all reject the
 *    whole append before anything commits. `contentSha` is DERIVED by the
 *    merge (sha256 of content); the inserted value is ignored;
 *  - `INSERT OVERWRITE` is rejected (append-only surface; truncation is
 *    an engine/maintenance decision).
 *
 * Concurrency: racing appends (or an append racing an ingest epoch)
 * resolve through the commit CAS — disjoint-bucket conflicts rebase
 * inside `applyEpoch`; overlapping-claim conflicts re-run the whole
 * allocation against the new parent (fresh base above the winner's
 * claims), bounded retries. Scale shape: one validation aggregate, two
 * zipWithIndex jobs, then the normal epoch plan — the merge reads only
 * the buckets the inserted keys hash to.
 */
object SqlAppend {

  /** floor of the engine-allocated SQL-append seq namespace (2^62) */
  val SeqNamespaceBase: Long = 1L << 62

  /** epochId tag range for SQL appends (compaction uses 1e9 + version) */
  private val EpochIdBase = 1200000000L

  /** Dense gap-free seqs `(base, base+n]` zipped onto a PERSISTED
    * DataFrame (deterministic: the persist pins the partition layout).
    * Shared by the SQL append and the compensating-revert epoch — the two
    * engine-allocated-seq writers. */
  private[graft] def withDenseSeqs(spark: SparkSession, persisted: DataFrame,
                                   base: Long): DataFrame =
    spark.createDataFrame(
      persisted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (base + 1L + i))
      }, persisted.schema.add("seq", LongType, nullable = false))

  /** floor for a fresh engine allocation: above the namespace base and
    * every committed high of `m` */
  private[graft] def allocBase(
      committed: Map[Int, Seq[(Long, Long)]]): Long =
    committed.values.flatten.map(_._2).foldLeft(SeqNamespaceBase)(math.max)

  def append(spark: SparkSession, ice: IceTable, input: DataFrame,
             nLogPartitionsOpt: Option[Int], maxRetries: Int = 3): Unit = {
    import spark.implicits._
    val schemaId = ice.currentManifest().map(_.schemaId)
      .getOrElse(SchemaRegistry.baseSchemaId)
    val sch = SchemaRegistry.schemaFor(schemaId)
    def name(colId: Int): String = sch.byColId(colId).name
    val evolved = sch.columns.filter(_.colId > 6)

    // ONE validation pass over the raw input: row count, constraint
    // violations, and evolved-column payloads together
    val bad = !(col(name(1)).isNotNull && length(col(name(1))) > 0 &&
      col(name(2)).isNotNull && length(col(name(2))) > 0 &&
      col(name(5)).isNotNull)
    val aggs = Seq(count(lit(1)).as("n"),
      sum(when(bad, 1L).otherwise(0L)).as("bad")) ++
      evolved.map(c => count(col(c.name)).as(s"ev_${c.name}"))
    val ev0 = input.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val v = ev0.agg(aggs.head, aggs.tail: _*).head()
      val n = v.getAs[Long]("n")
      if (n == 0) return // empty INSERT: nothing to commit
      val badN = Option(v.getAs[Any]("bad")).map(_.asInstanceOf[Long])
        .getOrElse(0L)
      require(badN == 0, s"INSERT rejected: $badN row(s) violate the " +
        s"engine constraints (non-null non-empty ${name(1)}/${name(2)}, " +
        s"non-null ${name(5)}); nothing was written")
      evolved.foreach { c =>
        val nn = v.getAs[Long](s"ev_${c.name}")
        require(nn == 0, s"INSERT rejected: column '${c.name}' (post-base " +
          s"schema evolution) carries $nn non-null value(s) the " +
          "change-event payload cannot represent — write NULL there (the " +
          "engine null-fills evolved columns); nothing was written")
      }

      // project to the payload envelope once; seqs are assigned per retry
      val payload = ev0.select(
        col(name(1)).as("repo"), col(name(2)).as("path"),
        coalesce(col(name(3)), lit("")).as("commit"),
        coalesce(col(name(4)), lit("")).as("lang"),
        col(name(5)).as("content"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        var left = maxRetries
        var done = false
        while (!done) {
          val parent = ice.currentManifest()
          val committed = MergeEngine.committedIntervals(parent)
          val nLog = nLogPartitionsOpt.getOrElse(
            if (committed.nonEmpty) committed.keys.max + 1 else 32)
          val base = allocBase(committed)
          val withSeq = withDenseSeqs(spark, payload, base)
          val events = withSeq.select(
            lit("i").as("op"), col("seq"), col("repo"), col("path"),
            col("commit"), col("lang"), col("content")).as[ChangeEvent]
          try {
            MergeEngine.applyEpoch(spark, ice, events,
              epochId = EpochIdBase +
                parent.map(_.version).getOrElse(-1L) + 1L,
              nLogPartitions = nLog,
              claimedRange = Some((base, base + n)))
            done = true
          } catch {
            case e: IllegalArgumentException
                if e.getMessage != null &&
                  e.getMessage.contains("concurrent writer") && left > 0 =>
              left -= 1
              System.err.println(s"[graft] SQL append lost the commit " +
                s"race on ${ice.dir}; re-allocating above the winner's " +
                s"claims and retrying ($left left)")
          }
        }
      } finally { payload.unpersist(); () }
    } finally { ev0.unpersist(); () }
  }
}
