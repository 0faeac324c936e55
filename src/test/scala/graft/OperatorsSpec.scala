package graft

import graft.operators.{AsOfJoin, SaltedAggregation}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join matches a brute-force reference (incl. no-match nulls)") {
    val left = Seq((1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (3, 7, "d"))
      .toDF("k", "ts", "lv")
    val right = Seq((1, 10, "r10"), (1, 15, "r15"), (2, 6, "r6"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.join(left, right, "k", "k", "ts", "ts", Seq("rv"))
      .select("k", "ts", "lv", "rv").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), Option(r.getString(3))))
      .toSet
    // brute force: latest right with rts <= lts per key
    val expected = Set(
      (1, 10, "a", Some("r10")),   // equal ts matches (inclusive)
      (1, 20, "b", Some("r15")),
      (2, 5, "c", None),           // right is later → no match
      (3, 7, "d", None))           // key absent on right
    assert(got == expected)
  }

  test("as-of join respects tolerance") {
    val left = Seq((1, 100, "a"), (1, 200, "b")).toDF("k", "ts", "lv")
    val right = Seq((1, 90, "r90")).toDF("k", "ts", "rv")
    val got = AsOfJoin.join(left, right, "k", "k", "ts", "ts", Seq("rv"),
      tolerance = Some(lit(20)))
      .select("ts", "rv").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(got == Map(100 -> Some("r90"), 200 -> None)) // 200-90 > 20: stale
  }

  test("salted distinct count is exact and equals the unsalted answer") {
    val df = spark.range(100000)
      .select((col("id") % 5).cast("string").as("k"),   // 5 hot keys
        (col("id") % 9973).as("v"))
    val salted = SaltedAggregation.distinctCount(df, Seq("k"), "v", nSalts = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain.values.forall(_ > 1900)) // sanity: genuinely hot keys
  }
}
