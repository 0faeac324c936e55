package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Two-phase salted aggregation for skewed keys (the north-star "hot-repo
 * salting" and the packer's balancing goal, SURVEY.md §2.8).
 *
 * When is it needed? NOT for algebraic aggregates under `groupBy` — Spark's
 * partial aggregation already collapses hot keys map-side. It matters when
 * the aggregation state per key is large or non-combinable map-side
 * (collect_list/collect_set, exact distinct counts), or before a repartition
 * by a skewed key: then a Zipf-hot key funnels into one reducer. Salting
 * splits each key into `nSalts` sub-keys (phase 1), then merges the per-salt
 * partials (phase 2) — the hot reducer becomes `nSalts` balanced ones.
 */
object SaltedAggregation {

  /** salted two-phase count-distinct style aggregation:
    * phase 1 groups by (key, salt) computing `partial`, phase 2 groups by
    * key merging with `merge`. `salt` derives from a secondary column so the
    * same value always lands in the same salt bucket (exactness preserved
    * for distinct-style partials). */
  def aggregate(df: DataFrame, keyCols: Seq[String], saltFrom: Column,
                nSalts: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(saltFrom), lit(nSalts)).cast("int"))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** exact distinct count per (possibly hot) key via salting: distinct
    * values are partitioned by their own hash across salts, so per-salt
    * distinct counts sum exactly. */
  def distinctCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                    nSalts: Int = 16, as: String = "n_distinct"): DataFrame =
    aggregate(df, keyCols, col(valueCol), nSalts,
      partial = Seq(countDistinct(col(valueCol)).as("_pd")),
      merge = Seq(sum(col("_pd")).as(as)))

  /** Per-key row counts, for feeding a skew-aware repartition before a
    * heavy per-key stage. No salting NEEDED here: count is algebraic, so
    * Spark's partial hash aggregation already collapses a hot key map-side
    * (one combined row per task) — salting buys nothing for counts; it is
    * for the non-algebraic aggregates `aggregate`/`distinctCount` handle. */
  def keyWeights(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("weight"))
}
