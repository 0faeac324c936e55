package graft

import graft.functions.{GraftFunctions, SimHash64}
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "completely different text about spark catalyst expressions"),
    (3L, ""),
    (4L, "single")
  ).toDF("doc_id", "text")

  /** reference formulation: pure Column expression tree */
  private def referenceSimhash = {
    val toks = split(trim(col("text")), "\\s+")
    val votes = aggregate(
      transform(toks, t => xxhash64(t)),
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(i =>
          when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1)): _*),
        (a, b) => a + b))
    votes
  }

  test("native expression matches the pure-Column formulation") {
    val toks = split(trim(col("text")), "\\s+")
    val native = docs.select($"doc_id",
      SimHash64.simhash64(toks).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = docs
      .select($"doc_id", referenceSimhash.as("votes"))
      .select($"doc_id",
        (0 until 64).map(i =>
          when(element_at($"votes", i + 1) > 0, lit(1L << i)).otherwise(0L))
          .reduce((a, b) => a.bitwiseOR(b)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == ref)
  }

  test("near-duplicates have small Hamming distance; unrelated docs do not") {
    val toks = split(trim(col("text")), "\\s+")
    val h = docs.select($"doc_id", SimHash64.simhash64(toks).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(1L)) < 16, "one-word-diff docs should be close")
    assert(ham(h(0L), h(2L)) > ham(h(0L), h(1L)),
      "unrelated doc should be farther than the near-dup")
  }

  test("SQL registration works (graft_simhash64)") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash64(split(trim(text), '\\s+')) AS h
         FROM sh_docs""").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = docs.select($"doc_id",
      SimHash64.simhash64(split(trim($"text"), "\\s+")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("null array yields null, not a crash") {
    val withNull = Seq((0L, Some("a b c")), (1L, None))
      .toDF("doc_id", "text")
    val out = withNull.select(
      SimHash64.simhash64(split($"text", " ")).as("h")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }
}
