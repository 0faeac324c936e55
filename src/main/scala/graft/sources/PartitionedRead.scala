package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.{LocalDateTime, LocalDate}
import java.time.format.DateTimeFormatter

/**
 * Readers for partitioned file layouts (SURVEY.md §2.1, the reference's
 * date/regex-partitioned sources):
 *
 *  - [[timeRange]] — the DatePartitionedAvroFileSource pattern
 *    (gobblin-core/.../source/DatePartitionedAvroFileSource.java +
 *    TimestampBasedCopyableDataset): pull only the partition directories
 *    whose date lies inside the watermark range. Pruning happens at
 *    PLANNING time (candidate dirs are generated from the range and
 *    existence-checked — the scan never lists, let alone reads, anything
 *    outside the range), which is what makes a multi-year 100 TB layout
 *    readable for a one-day increment.
 *  - [[regexPartitioned]] — the RegexBasedPartitionedRetriever pattern
 *    (gobblin-data-management/.../RegexBasedPartitionedRetriever.java):
 *    derive partition/watermark columns from each file's PATH by regex
 *    capture groups (pure Column exprs over `input_file_name()`; no UDF).
 *
 * Both read through `spark.read`, so format handling, schema merge and
 * column pruning stay Spark-native. Layouts match `sinks.Writers`
 * (`yyyy=YYYY/mm=MM/dd=DD[/hh=HH]`).
 */
object PartitionedRead {

  private val dayFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val hourFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH")

  private def parse(s: String): LocalDateTime =
    if (s.length > 10) LocalDateTime.parse(s, hourFmt)
    else LocalDate.parse(s, dayFmt).atStartOfDay()

  /** partition sub-directory for one instant at the given granularity */
  private def partDir(t: LocalDateTime, granularity: String): String = {
    val ymd = f"yyyy=${t.getYear}%04d/mm=${t.getMonthValue}%02d"
    granularity match {
      case "month" => ymd
      case "day" => f"$ymd/dd=${t.getDayOfMonth}%02d"
      case "hour" => f"$ymd/dd=${t.getDayOfMonth}%02d/hh=${t.getHour}%02d"
      case g => throw new IllegalArgumentException(s"granularity $g")
    }
  }

  /** all partition dirs intersecting [from, to] (inclusive), in order.
    * The iteration starts from `from` TRUNCATED to the granularity boundary:
    * stepping from an unaligned instant (e.g. month granularity from
    * "2024-01-31") would land past `to` before emitting the final in-range
    * partition and silently drop its directory. */
  def candidateDirs(from: String, to: String,
                    granularity: String = "day"): Seq[String] = {
    val (lo, hi) = (parse(from), parse(to))
    require(!hi.isBefore(lo), s"empty range ($from, $to)")
    val (floor, step): (LocalDateTime => LocalDateTime,
                        LocalDateTime => LocalDateTime) = granularity match {
      case "month" => (t => t.withDayOfMonth(1).toLocalDate.atStartOfDay(),
        _.plusMonths(1))
      case "day" => (t => t.toLocalDate.atStartOfDay(), _.plusDays(1))
      case "hour" => (t => t.withMinute(0).withSecond(0).withNano(0),
        _.plusHours(1))
      case g => throw new IllegalArgumentException(s"granularity $g")
    }
    Iterator.iterate(floor(lo))(step).takeWhile(!_.isAfter(hi))
      .map(partDir(_, granularity)).distinct.toSeq
  }

  /** Read only the partition directories of `dir` whose date lies in
    * [from, to] (format "yyyy-MM-dd" or "yyyy-MM-dd HH"). Directories that
    * do not exist are skipped; partition columns (yyyy/mm/dd/hh) infer via
    * `basePath`. Returns None when NO candidate directory exists (the
    * empty-increment case — the caller decides whether that is an error). */
  def timeRange(spark: SparkSession, dir: String, from: String, to: String,
                granularity: String = "day",
                format: String = "parquet"): Option[DataFrame] = {
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val existing = candidateDirs(from, to, granularity)
      .map(d => new HPath(root, d))
      .filter(fs.exists)
    if (existing.isEmpty) None
    else Some(spark.read
      .option("basePath", dir)
      .format(format)
      .load(existing.map(_.toString): _*))
  }

  /** Read `dir` with extra columns derived from each file's path by regex
    * capture groups: `colNames(i)` = group i+1 of `pattern` applied to the
    * full file path. Rows from a non-matching path get empty strings
    * (regexp_extract semantics) — filter or fail on them as policy. */
  def regexPartitioned(spark: SparkSession, dir: String, pattern: String,
                       colNames: Seq[String],
                       format: String = "parquet"): DataFrame = {
    require(colNames.nonEmpty)
    val base = spark.read.format(format).load(dir)
    colNames.zipWithIndex.foldLeft(base) { case (df, (n, i)) =>
      df.withColumn(n, regexp_extract(input_file_name(), pattern, i + 1))
    }
  }
}
