package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Murmur3HashFunction}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Bridge into `private[sql]` Spark internals — the standard technique Spark
  * extension libraries use on Spark 4's split API. Three escapes:
  *   - Column↔Expression conversion (custom Catalyst expressions as Columns)
  *   - building a DataFrame over an RDD[InternalRow] WITH a declared output
  *     partitioning (`LogicalRDD`, the same internal Dataset.checkpoint
  *     uses) — lets a source whose physical layout already satisfies a
  *     distribution (one file group per hash bucket) report it to Catalyst
  *     so downstream joins skip the Exchange entirely
  *   - the exact murmur3 partition-id Catalyst computes for
  *     `HashPartitioning` on an int column (needed to lay file groups out
  *     on the partition index the claim promises) */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over `rdd` claiming `partitioning(outputAttrs)`. The claim
    * MUST be physically true (caller lays out partitions accordingly);
    * Catalyst then treats the scan as pre-partitioned. */
  def dataFrameWithPartitioning(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType,
      partitioning: Seq[Attribute] => Partitioning): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val attrs = DataTypeUtils.toAttributes(schema)
    classic.Dataset.ofRows(cs,
      execution.LogicalRDD(attrs, rdd, partitioning(attrs))(cs))
  }

  /** Non-blocking Observation read: Some(metrics) if an action already
    * completed on the observed plan, None otherwise (`getOrEmpty` is
    * private[spark]) — lets callers fall back instead of hanging on
    * `Observation.get` when no action ran. */
  def observationResult(o: Observation): Option[Map[String, Any]] =
    // getOrEmpty NPEs (not empty-maps) when no action fired the observation
    scala.util.Try(o.getOrEmpty).toOption.filter(_.nonEmpty)

  /** partition index HashPartitioning(intCol, numPartitions) assigns to
    * `value`: pmod(murmur3_32(value, seed=42), numPartitions). */
  def murmur3PartitionId(value: Int, numPartitions: Int): Int = {
    val h = Murmur3HashFunction.hash(value, IntegerType, 42L).toInt
    val m = h % numPartitions
    if (m < 0) m + numPartitions else m
  }
}
