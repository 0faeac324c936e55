package graft

import graft.log.{ChangeLogGen, LogSpec}

/** The Column-expression generator must be BIT-IDENTICAL to the
  * row-at-a-time reference (eventAt) — the whole correctness story rests on
  * every component generating the same log. */
class GeneratorParitySpec extends SparkSpec {
  import spark.implicits._

  private def parity(spec: LogSpec): Unit = {
    val expr = ChangeLogGen.generate(spark, spec).collect()
      .map(e => e.seq -> e).toMap
    val local = ChangeLogGen.generateLocal(spec).toVector
    assert(expr.size == local.size)
    local.foreach { e =>
      assert(expr(e.seq) == e, s"mismatch at seq=${e.seq}:\n  expr=${expr(e.seq)}\n  ref =$e")
    }
  }

  test("expression generator is bit-identical to eventAt (default spec shape)") {
    parity(LogSpec(seed = 42L, nEvents = 5000, nRepos = 100,
      nPathsPerRepo = 200))
  }

  test("parity holds across seeds, sizes, skew, delete rates") {
    parity(LogSpec(seed = 7L, nEvents = 2000, nRepos = 5, nPathsPerRepo = 8,
      zipfExponent = 1.4, pDelete = 0.3, contentWords = 11))
    parity(LogSpec(seed = -1234567L, nEvents = 1000, nRepos = 500,
      nPathsPerRepo = 400, zipfExponent = 1.0, pDelete = 0.0,
      contentWords = 1))
  }
}
