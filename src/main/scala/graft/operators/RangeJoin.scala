package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Band/interval join: pairs (l, r) with |l.ts - r.ts| within a band, plus an
 * equi-key. A naive theta-join degenerates to a per-key cross product;
 * Spark's optimizer cannot avoid that for pure inequality predicates.
 *
 * Scale-aware plan: quantize time into band-sized bins and equi-join on
 * (key, bin) with each left row EXPLODED to its bin and both neighbors —
 * every within-band pair shares one of the three bins, so the join is a
 * plain hash join on (key, bin); the exact band predicate then filters the
 * small candidate set. Cost: 3× left-side expansion instead of |key-group|²
 * comparisons — the standard bucketed band-join.
 */
object RangeJoin {

  /**
   * @param band  max |tsL - tsR| in the ts column's numeric units (inclusive)
   * @return left columns + right payload columns, one row per matching pair
   */
  def bandJoin(left: DataFrame, right: DataFrame,
               keyL: String, keyR: String,
               tsL: String, tsR: String,
               payload: Seq[String], band: Long): DataFrame = {
    require(band > 0)
    val expandedLeft = left
      .withColumn("_bin", explode(array(
        (floor(col(tsL) / band) - 1).cast("long"),
        floor(col(tsL) / band).cast("long"),
        (floor(col(tsL) / band) + 1).cast("long"))))
    val binnedRight = right
      .select((Seq(col(keyR).as("_rk"), col(tsR).as("_rts"),
        floor(col(tsR) / band).cast("long").as("_bin"))
        ++ payload.map(p => col(p).as(s"_p_$p"))): _*)
    expandedLeft
      .join(binnedRight,
        expandedLeft(keyL) === binnedRight("_rk") &&
          expandedLeft("_bin") === binnedRight("_bin"))
      .filter(abs(col(tsL) - col("_rts")) <= band)
      // output honors the contract exactly: left columns + payload, no
      // internal columns leaking (a caller-owned name like "matched_ts"
      // must never collide with join bookkeeping)
      .select(left.columns.map(col).toSeq ++
        payload.map(p => col(s"_p_$p").as(p)): _*)
  }
}
