package graft

/** Every SparkEntry query must run at sf0.001 and be deterministic across
  * two invocations (the driver reruns them; nondeterminism would break the
  * oracle hash compare). DuckDB value parity is checked by the driver at
  * sf0.01 and in the dev loop (35/35 as of r1). */
class QueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and is deterministic at sf0.001") {
      val a = fn(spark, dir).collect()
      val b = fn(spark, dir).collect()
      assert(a.toSeq == b.toSeq, s"$name nondeterministic")
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a value oracle (q24 gained a two-step bounds oracle)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"oracle-less queries: $noOracle")
  }
}
