package graft

import graft.log.{ChangeLogGen, LogSpec, OracleFold}
import graft.model.ChangeEvent
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => SCTest}

class OracleFoldSpec extends AnyFunSuite {

  test("generator is a pure function of (seed, seq)") {
    val spec = LogSpec(seed = 42L, nEvents = 1000)
    val a = ChangeLogGen.generateLocal(spec).toVector
    val b = ChangeLogGen.generateLocal(spec).toVector
    assert(a == b)
    assert(a.map(_.seq) == (0L until 1000L).toVector)
    // ops are only i/u/d; deletes have empty content
    assert(a.forall(e => Set("i", "u", "d")(e.op)))
    assert(a.filter(_.op == "d").forall(_.content.isEmpty))
  }

  test("zipf skew produces a hot repo") {
    val spec = LogSpec(seed = 42L, nEvents = 20000, nRepos = 100,
      zipfExponent = 1.2)
    val byRepo = ChangeLogGen.generateLocal(spec).toVector.groupBy(_.repo)
      .view.mapValues(_.size).toMap
    val hottest = byRepo.values.max
    // Zipf(1.2) over 100 repos: rank-1 weight ≈ 19%
    assert(hottest > spec.nEvents / 10, s"hottest repo only $hottest events")
  }

  test("fold: last-writer-wins and delete semantics") {
    def ev(op: String, seq: Long, repo: String, path: String, c: String) =
      ChangeEvent(op, seq, repo, path, f"c$seq%040d".takeRight(40), "scala", c)
    val events = Seq(
      ev("i", 0, "r1", "a", "v0"),
      ev("u", 2, "r1", "a", "v2"),
      ev("u", 1, "r1", "a", "v1"),   // stale, loses to seq=2
      ev("i", 3, "r1", "b", "vb"),
      ev("d", 4, "r1", "b", ""))     // delete wins
    val m = OracleFold.fold(events)
    assert(m.keySet == Set(("r1", "a")))
    assert(m(("r1", "a")).content == "v2")
    assert(m(("r1", "a")).contentSha == OracleFold.sha256Hex("v2"))
  }

  test("property: fold is permutation-invariant (seq totally orders keys)") {
    val spec = LogSpec(seed = 7L, nEvents = 500, nRepos = 5, nPathsPerRepo = 8)
    val base = ChangeLogGen.generateLocal(spec).toVector
    val expected = OracleFold.fold(base)
    val prop = Prop.forAll { (shufSeed: Long) =>
      val r = new scala.util.Random(shufSeed)
      OracleFold.fold(r.shuffle(base)) == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("sha256Hex matches a known vector") {
    assert(OracleFold.sha256Hex("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }
}
