package graft.table

import graft.model.DataFileEntry
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.io.api.Binary

/**
 * Per-file column statistics from parquet FOOTERS (metadata-only IO — no row
 * data is read). This is the engine's analog of the per-column metrics the
 * reference preserves into Iceberg data-file entries at commit time
 * (gobblin-iceberg/.../writer/IcebergMetadataWriter.java:349-383,664-672 —
 * appendFiles with metrics), which is what enables file-level data skipping
 * within a partition: the merge and read paths can drop files whose stats
 * preclude a match without opening them.
 *
 * Recorded per file:
 *  - `rows`   — footer record count (also feeds the compaction verifier),
 *  - `minKey`/`maxKey` — conservative bounds on the composed row key
 *    `repo \0 path` (NUL-composed so byte order equals (repo, path) struct
 *    order: NUL sorts below every other byte). Built from the per-COLUMN
 *    footer min/max as (min repo, min path) / (max repo, max path) — a
 *    superset of the true composed-key range, which is exactly what a
 *    conservative skip test needs,
 *  - `minSeq`/`maxSeq` — bounds on `lastSeq` (incremental "changes since"
 *    reads skip files whose whole seq range predates the request).
 *
 * All footers are read through a bounded thread pool with a per-file
 * timeout: one hung object-store metadata read must not stall the job
 * forever (the pool aborts with `shutdownNow` and surfaces the failing
 * path). Missing/truncated footer stats degrade to None — a file without
 * stats is simply never skipped.
 */
object FileStats {

  final case class Stats(
      rows: Long,
      minKey: Option[String], maxKey: Option[String],
      minSeq: Option[Long], maxSeq: Option[Long])

  /** key composition: NUL-separated, so unsigned byte order of the composed
    * string equals lexicographic (repo, path) order */
  val KeySep = "\u0000"

  /** unsigned lexicographic UTF-8 byte comparison — the same order Spark's
    * executors and modern parquet UTF8 stats use (driver-side comparisons
    * must match the executor-side min/max or a skip could be wrong for
    * non-ASCII keys, where UTF-16 `String.compareTo` diverges). Delegates
    * to UTF8String itself so the order can never drift from Spark's. */
  def keyCompare(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  private def utf8Min(s: Statistics[_]): Option[String] = s match {
    case _ if s.isEmpty || !s.hasNonNullValue => None
    case bs: Statistics[_] => bs.genericGetMin match {
      case b: Binary => Some(b.toStringUsingUTF8)
      case _ => None
    }
  }
  private def utf8Max(s: Statistics[_]): Option[String] =
    if (s.isEmpty || !s.hasNonNullValue) None
    else s.genericGetMax match {
      case b: Binary => Some(b.toStringUsingUTF8)
      case _ => None
    }
  private def longMin(s: Statistics[_]): Option[Long] =
    if (s.isEmpty || !s.hasNonNullValue) None
    else s.genericGetMin match { case l: java.lang.Long => Some(l); case _ => None }
  private def longMax(s: Statistics[_]): Option[Long] =
    if (s.isEmpty || !s.hasNonNullValue) None
    else s.genericGetMax match { case l: java.lang.Long => Some(l); case _ => None }

  /** footer stats of one file (record count + repo/path/lastSeq min-max,
    * folded across row groups). Any column chunk without usable stats makes
    * that column's bound None. */
  def read(conf: Configuration, path: String): Stats = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks
      var rows = 0L
      // per-column folds; a single chunk without stats poisons the column
      var repoMin, repoMax, pathMin, pathMax: Option[String] = None
      var seqMin, seqMax: Option[Long] = None
      var repoOk, pathOk, seqOk = true
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val cit = b.getColumns.iterator()
        while (cit.hasNext) {
          val c = cit.next()
          val st = c.getStatistics
          c.getPath.toDotString match {
            case "repo" =>
              (utf8Min(st), utf8Max(st)) match {
                case (Some(lo), Some(hi)) if repoOk =>
                  repoMin = Some(repoMin.fold(lo)(m =>
                    if (keyCompare(lo, m) < 0) lo else m))
                  repoMax = Some(repoMax.fold(hi)(m =>
                    if (keyCompare(hi, m) > 0) hi else m))
                case _ => repoOk = false; repoMin = None; repoMax = None
              }
            case "path" =>
              (utf8Min(st), utf8Max(st)) match {
                case (Some(lo), Some(hi)) if pathOk =>
                  pathMin = Some(pathMin.fold(lo)(m =>
                    if (keyCompare(lo, m) < 0) lo else m))
                  pathMax = Some(pathMax.fold(hi)(m =>
                    if (keyCompare(hi, m) > 0) hi else m))
                case _ => pathOk = false; pathMin = None; pathMax = None
              }
            case "lastSeq" =>
              (longMin(st), longMax(st)) match {
                case (Some(lo), Some(hi)) if seqOk =>
                  seqMin = Some(seqMin.fold(lo)(math.min(_, lo)))
                  seqMax = Some(seqMax.fold(hi)(math.max(_, hi)))
                case _ => seqOk = false; seqMin = None; seqMax = None
              }
            case _ => ()
          }
        }
      }
      val minKey = for (r0 <- repoMin; p0 <- pathMin) yield r0 + KeySep + p0
      val maxKey = for (r0 <- repoMax; p0 <- pathMax) yield r0 + KeySep + p0
      Stats(rows, minKey, maxKey, seqMin, seqMax)
    } finally r.close()
  }

  /** Bloom test for one exact (repo, path) key against a parquet file's
    * NATIVE column bloom filters (written by the epoch writer when
    * `spark.graft.keyBlooms` is on). Returns false only when EVERY row
    * group carries blooms for both columns and NONE can contain both
    * values — absent/unreadable blooms admit the file (blooms, like all
    * stats here, are strictly an optimization).
    *
    * The blooms live in the FILES, not the manifest, by design: a bloom
    * with a useful false-positive rate over a ~10^6-row file is ~1 MiB —
    * embedding that per entry would multiply manifest size by orders of
    * magnitude (the exact metadata-scale hazard two-level manifests
    * removed). Parquet-native blooms size themselves with the file, cost
    * one small metadata read, and are only consulted for the handful of
    * candidates that survive bucket + key-range + salt-residue pruning. */
  def mightContainKey(conf: Configuration, file: String,
                      repo: String, path: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(file)
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = r.getFooter.getBlocks
        val it = blocks.iterator()
        var any = false
        while (it.hasNext && !any) {
          val b = it.next()
          val bfr = r.getBloomFilterDataReader(b)
          def admit(colName: String, value: String): Boolean = {
            val cit = b.getColumns.iterator()
            var res = true // no such column / no bloom -> admit
            while (cit.hasNext) {
              val c = cit.next()
              if (c.getPath.toDotString == colName) {
                val bloom = bfr.readBloomFilter(c)
                if (bloom != null)
                  res = bloom.findHash(
                    bloom.hash(Binary.fromString(value)))
              }
            }
            res
          }
          any = admit("repo", repo) && admit("path", path)
        }
        any // a zero-row-group file holds nothing: reject is exact
      } finally r.close()
    } catch {
      case e: Exception =>
        System.err.println(s"[graft] bloom read failed: $file ($e); " +
          "file admitted")
        true
    }

  /** Fill `rows` + stats bounds into each entry via one pooled footer pass.
    * Bounded: at most 16 concurrent metadata reads under ONE shared
    * `timeoutSec` deadline for the whole batch, and the pool is
    * `shutdownNow`n on exit — a hung object-store read (or a full outage
    * hanging every read) can never stall the job past the deadline.
    *
    * Failure policy follows the stats' role. By default (`failFast=false`,
    * the ingest write path) a per-file timeout/error DEGRADES that entry to
    * stats-less (rows stays -1, bounds stay None) and the epoch proceeds —
    * stats are an optimization, and "a file without stats is simply never
    * skipped" must hold on the write side too; a transient metadata blip
    * must not abort a merge whose data files are already published.
    * Callers for whom the counts are a CORRECTNESS gate (compaction /
    * rebucket verifiers) check `rows >= 0` afterwards and abort their
    * commit loudly, or pass `failFast=true` to throw here with the stuck
    * path named. */
  def fillAll(conf: Configuration, files: Seq[DataFileEntry],
              timeoutSec: Long = 120L,
              failFast: Boolean = false): Seq[DataFileEntry] = {
    if (files.isEmpty) return files
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.size))
    try {
      val futs = files.map(f => f -> pool.submit(
        new java.util.concurrent.Callable[Stats] {
          def call(): Stats = read(conf, f.path)
        }))
      // ONE shared deadline across the whole batch — per-future timeouts
      // would stack (a store outage over N hung files would stall
      // N × timeoutSec before the degrade completed)
      val deadline = System.nanoTime() + timeoutSec * 1000000000L
      futs.map { case (f, fut) =>
        val remainingMs =
          math.max(1L, (deadline - System.nanoTime()) / 1000000L)
        val s: Option[Stats] =
          try Some(fut.get(remainingMs,
            java.util.concurrent.TimeUnit.MILLISECONDS))
          catch {
            case e: java.util.concurrent.TimeoutException =>
              if (failFast) throw new IllegalStateException(
                s"footer read timed out after ${timeoutSec}s: ${f.path}", e)
              System.err.println(s"[graft] footer read timed out " +
                s"(${timeoutSec}s): ${f.path}; entry left stats-less")
              None
            case e: java.util.concurrent.ExecutionException =>
              if (failFast) throw new IllegalStateException(
                s"footer read failed: ${f.path}", e.getCause)
              System.err.println(s"[graft] footer read failed: ${f.path} " +
                s"(${e.getCause}); entry left stats-less")
              None
          }
        s.fold(f)(st => f.copy(rows = st.rows, minKey = st.minKey,
          maxKey = st.maxKey, minSeq = st.minSeq, maxSeq = st.maxSeq))
      }
    } finally { pool.shutdownNow(); () }
  }

  /** Distributed variant of [[fillAll]]: the footer pass runs as ONE small
    * Spark job over the entry list instead of the ≤16-thread driver pool —
    * an epoch publishing thousands of object-store files would otherwise
    * serialize N/16 round-trips of footer latency on the COMMIT CRITICAL
    * PATH through the driver; as a job, the pass scales with the cluster
    * (the same shape compaction's verifier recount uses). Semantics match
    * [[fillAll]] exactly: ONE shared wall-clock deadline for the whole
    * batch (executor clocks — skew is immaterial for a degrade
    * optimization), a per-file failure/timeout DEGRADES that entry to
    * stats-less under the default policy or throws under `failFast`, and
    * input order is preserved. Each task reads through a cached-thread
    * executor so one hung read cannot block the partition's remaining
    * files past the deadline. */
  def fillAllDistributed(spark: org.apache.spark.sql.SparkSession,
      files: Seq[DataFileEntry], timeoutSec: Long = 120L,
      failFast: Boolean = false): Seq[DataFileEntry] = {
    if (files.isEmpty) return files
    import scala.jdk.CollectionConverters._
    val confKV: Seq[(String, String)] = spark.sessionState.newHadoopConf()
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toSeq
    val bc = spark.sparkContext.broadcast(confKV)
    val deadlineMs = System.currentTimeMillis() + timeoutSec * 1000L
    val ff = failFast
    val slices = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism * 2))
    try {
      spark.sparkContext.parallelize(files, slices).mapPartitions { it =>
        val conf = new Configuration(false)
        bc.value.foreach { case (k, v) => conf.set(k, v) }
        val exec = java.util.concurrent.Executors.newCachedThreadPool()
        // finally: the failFast throw below must not leak the pool (its
        // non-daemon threads would pin the executor JVM)
        val out = try {
          it.map { f =>
            val remain = deadlineMs - System.currentTimeMillis()
            val fut = exec.submit(new java.util.concurrent.Callable[Stats] {
              def call(): Stats = read(conf, f.path)
            })
            try {
              val st = fut.get(math.max(1L, remain),
                java.util.concurrent.TimeUnit.MILLISECONDS)
              f.copy(rows = st.rows, minKey = st.minKey, maxKey = st.maxKey,
                minSeq = st.minSeq, maxSeq = st.maxSeq)
            } catch {
              case e: java.util.concurrent.TimeoutException =>
                fut.cancel(true)
                if (ff) throw new IllegalStateException(
                  s"footer read timed out after ${timeoutSec}s: ${f.path}", e)
                System.err.println(s"[graft] footer read timed out " +
                  s"(${timeoutSec}s): ${f.path}; entry left stats-less")
                f
              case e: java.util.concurrent.ExecutionException =>
                if (ff) throw new IllegalStateException(
                  s"footer read failed: ${f.path}", e.getCause)
                System.err.println(s"[graft] footer read failed: ${f.path} " +
                  s"(${e.getCause}); entry left stats-less")
                f
            }
          }.toVector // materialize before shutting the executor down
        } finally exec.shutdownNow()
        out.iterator
      }.collect().toSeq // collect preserves slice order = input order
    } finally bc.destroy()
  }
}
