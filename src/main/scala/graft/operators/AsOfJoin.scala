package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * AS-OF join: for each left row, attach the latest right row with the same
 * key whose timestamp is ≤ the left row's timestamp (optionally within a
 * tolerance window).
 *
 * Spark lacks this operator; per the extension preference order we COMPOSE
 * built-ins rather than write a custom SparkPlan: union-tag both sides,
 * single sort per key, and a `last(ignoreNulls)` running window carries the
 * most recent right payload forward onto left rows. One shuffle + one sort —
 * the same cost shape as a sort-merge join, scalable via the window's hash
 * partitioning on the key (no broadcast/cross product).
 *
 * Equal timestamps: the right row sorts BEFORE the left row (tag order), so
 * a right row at exactly t matches a left row at t (inclusive as-of).
 */
object AsOfJoin {

  /**
   * @param left        left rows (kept 1:1 in the output)
   * @param right       right rows providing the as-of payload
   * @param keyL / keyR join key columns
   * @param tsL / tsR   event-time columns (same comparable type)
   * @param payload     right columns to attach (null when no match)
   * @param tolerance   optional max lag: right must satisfy
   *                    tsL - tolerance <= tsR <= tsL (in the ts type's unit
   *                    as a Column expression, e.g. `expr("INTERVAL 1 HOUR")`)
   */
  def join(left: DataFrame, right: DataFrame,
           keyL: String, keyR: String,
           tsL: String, tsR: String,
           payload: Seq[String],
           tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag: right rows first at equal (key, ts)
    val taggedLeft = left
      .withColumn("_k", col(keyL)).withColumn("_ts", col(tsL))
      .withColumn("_side", lit(1))
    val taggedRight = right
      .select((Seq(col(keyR).as("_k"), col(tsR).as("_ts"), lit(0).as("_side"))
        ++ payload.map(p => col(p).as(s"_p_$p"))): _*)
    val unioned = taggedLeft.unionByName(taggedRight,
      allowMissingColumns = true)

    val w = Window.partitionBy("_k").orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"_c_$p", last(col(s"_p_$p"), ignoreNulls = true).over(w))
    }
    // tolerance: also carry the matched right ts and null out stale matches
    val withMatchTs = carried.withColumn("_c_ts",
      last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))
    val fresh: Column = tolerance match {
      case Some(tol) => col("_c_ts").isNotNull && col("_c_ts") >= col("_ts") - tol
      case None => col("_c_ts").isNotNull
    }
    withMatchTs
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => when(fresh, col(s"_c_$p")).otherwise(lit(null))
          .as(p)): _*)
  }
}
