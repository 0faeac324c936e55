package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Writer/sink surface (SURVEY.md §2.5). The reference's writers are
 * record-at-a-time classes with staging→output commit; in Spark, formats and
 * the commit protocol are built in, so what remains is the PARTITIONER
 * surface — how records demultiplex into directory layouts:
 *
 *  - TimeBasedWriterPartitioner (yyyy/MM/dd buckets of a record timestamp,
 *    gobblin-core/.../writer/partitioner/TimeBasedWriterPartitioner.java:59)
 *    → [[Writers.timePartitioned]]
 *  - SchemaBased / WorkUnitState partitioners → [[Writers.byColumns]]
 *  - SimpleDataWriter / console → [[Writers.console]]
 *  - target-file-size small-file control (the packer goal, §2.8) →
 *    `coalescePartitions` hint on all writers
 */
object Writers {

  val supportedFormats = Seq("parquet", "orc", "json", "csv", "text")

  /** time-bucketed layout: dir/yyyy=2024/mm=01/dd=03/part-*.ext */
  def timePartitioned(df: DataFrame, tsCol: String, dir: String,
                      format: String = "parquet",
                      granularity: String = "day",
                      coalescePartitions: Option[Int] = None): Unit = {
    val base = df
      .withColumn("yyyy", date_format(col(tsCol), "yyyy"))
      .withColumn("mm", date_format(col(tsCol), "MM"))
    val (parts, withCols) = granularity match {
      case "month" => (Seq("yyyy", "mm"), base)
      case "day" => (Seq("yyyy", "mm", "dd"),
        base.withColumn("dd", date_format(col(tsCol), "dd")))
      case "hour" => (Seq("yyyy", "mm", "dd", "hh"),
        base.withColumn("dd", date_format(col(tsCol), "dd"))
          .withColumn("hh", date_format(col(tsCol), "HH")))
      case g => throw new IllegalArgumentException(s"granularity $g")
    }
    val sized = coalescePartitions.map(withCols.coalesce).getOrElse(withCols)
    sized.write.mode("append").partitionBy(parts: _*).format(format).save(dir)
  }

  /** partition by arbitrary columns (schema-id, branch, source, ...) */
  def byColumns(df: DataFrame, dir: String, partitionCols: Seq[String],
                format: String = "parquet",
                coalescePartitions: Option[Int] = None): Unit = {
    require(supportedFormats.contains(format), s"format $format")
    val sized = coalescePartitions.map(df.coalesce).getOrElse(df)
    sized.write.mode("append").partitionBy(partitionCols: _*)
      .format(format).save(dir)
  }

  /** ConsoleWriter analog */
  def console(df: DataFrame, n: Int = 20): Unit =
    df.show(n, truncate = false)
}
