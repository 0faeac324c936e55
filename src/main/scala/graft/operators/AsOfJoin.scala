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
    // tag: right rows first at equal (key, ts). The payload travels as ONE
    // never-null struct so `last(ignoreNulls)` tracks the latest right ROW
    // as a whole — carrying fields independently would skip a legitimate
    // NULL payload value and surface a STALE (or, with several payload
    // columns, torn) match instead of the true latest row's null.
    val taggedLeft = left
      .withColumn("_k", col(keyL)).withColumn("_ts", col(tsL))
      .withColumn("_side", lit(1))
    val taggedRight = right
      .select(col(keyR).as("_k"), col(tsR).as("_ts"), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_pay"))
    val unioned = taggedLeft.unionByName(taggedRight,
      allowMissingColumns = true)

    val w = Window.partitionBy("_k").orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_c_pay", last(col("_pay"), ignoreNulls = true).over(w))
      // tolerance: also carry the matched right ts to null out stale matches
      .withColumn("_c_ts",
        last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))
    val fresh: Column = tolerance match {
      case Some(tol) => col("_c_ts").isNotNull && col("_c_ts") >= col("_ts") - tol
      case None => col("_c_ts").isNotNull
    }
    carried
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => when(fresh, col("_c_pay").getField(p))
          .otherwise(lit(null)).as(p)): _*)
  }

  /**
   * Skew-safe AS-OF join: identical semantics to [[join]], but the running
   * window partitions by (key, TIME BIN) instead of key alone, so a hot key
   * spreads across its bins instead of funneling into one window partition
   * (the 100 TB shape for Zipf-hot keys).
   *
   * Matches that cross a bin boundary are served by a CARRY-IN table: the
   * latest right row per (key, bin) — one row per (key, bin), tiny — is
   * propagated forward over a bin-LEVEL window (bounded by #bins per key,
   * not #rows), then left-joined back on (key, bin). Within a bin the usual
   * union-tag running window answers; the carry-in fills bins whose match
   * lies in an earlier bin.
   *
   * @param bin monotone binning of the ts column (e.g.
   *            `t => floor(t.cast("timestamp").cast("long") / 3600)`)
   */
  def joinBinned(left: DataFrame, right: DataFrame,
                 keyL: String, keyR: String,
                 tsL: String, tsR: String,
                 payload: Seq[String],
                 bin: Column => Column,
                 tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val lb = left
      .withColumn("_k", col(keyL)).withColumn("_ts", col(tsL))
      .withColumn("_bin", bin(col(tsL))).withColumn("_side", lit(1))
    val rb = right.select(col(keyR).as("_k"), col(tsR).as("_ts"),
        struct(payload.map(col): _*).as("_pay"))
      .withColumn("_bin", bin(col("_ts")))

    // same-bin as-of: union-tag window over (key, bin)
    val u = lb.unionByName(rb.withColumn("_side", lit(0)),
      allowMissingColumns = true)
    val w = Window.partitionBy("_k", "_bin")
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sameBin = u
      .withColumn("_c_pay", last(col("_pay"), ignoreNulls = true).over(w))
      .withColumn("_c_ts",
        last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    // carry-in: latest right row of any STRICTLY earlier bin, per probe bin.
    // Probe rows (_o=0) sort before right bin-summaries (_o=1) within a bin,
    // so the running last at a probe row sees only earlier bins' rows.
    val rLast = rb.groupBy("_k", "_bin")
      .agg(max_by(struct(col("_pay").as("p"), col("_ts").as("t")),
        col("_ts")).as("_lastr"))
    val lastrType = rLast.schema("_lastr").dataType
    val carrySrc = rLast.select(col("_k"), col("_bin"), lit(1).as("_o"),
        col("_lastr"))
      .unionByName(lb.select("_k", "_bin").distinct()
        .select(col("_k"), col("_bin"), lit(0).as("_o"),
          lit(null).cast(lastrType).as("_lastr")))
    val wb = Window.partitionBy("_k").orderBy(col("_bin").asc, col("_o").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = carrySrc
      .withColumn("_carry", last(col("_lastr"), ignoreNulls = true).over(wb))
      .filter(col("_o") === 0)
      .select(col("_k"), col("_bin"), col("_carry"))

    val joined = sameBin.join(carry, Seq("_k", "_bin"), "left")
    val matchTs = coalesce(col("_c_ts"), col("_carry").getField("t"))
    val matchPay = when(col("_c_ts").isNotNull, col("_c_pay"))
      .otherwise(col("_carry").getField("p"))
    val fresh: Column = tolerance match {
      case Some(tol) => matchTs.isNotNull && matchTs >= col("_ts") - tol
      case None => matchTs.isNotNull
    }
    joined.select(leftCols.map(col) ++
      payload.map(p => when(fresh, matchPay.getField(p)).otherwise(lit(null))
        .as(p)): _*)
  }
}
