package graft

import graft.driver.ReplayJob
import graft.log.{ChangeLogGen, LogSpec, OracleFold}
import graft.maintenance.Compaction
import graft.table.IceTable
import org.apache.spark.sql.functions._

/** Kitchen-sink lifecycle: ingest → schema evolution mid-log → more ingest →
  * compaction → snapshot expiry → crash-replay → final sha256 parity.
  * Every feature interacting in one run, end to end. */
class FullLifecycleSpec extends SparkSpec {

  test("full lifecycle preserves the oracle invariant at every stage") {
    val spec = LogSpec(seed = 99L, nEvents = 8000, nRepos = 10,
      nPathsPerRepo = 30, pDelete = 0.12)
    val oracle = OracleFold.fold(ChangeLogGen.generateLocal(spec))
      .map { case (k, v) => k -> v.contentSha }
    def state(t: IceTable) =
      t.read(spark).select("repo", "path", "contentSha").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

    val t = IceTable.create(tmpDir("life"), numBuckets = 8)
    val stateDir = tmpDir("life-state")

    // 1) first half of the log in 2 epochs, with quarantine+lineage wired
    ReplayJob.replayGenerated(spark, t, spec.copy(nEvents = 4000),
      nEpochs = 2, nLogPartitions = 8, stateDir = Some(stateDir))

    // 2) mid-log schema evolution to v4 (add + rename + widen)
    t.evolveSchema(2); t.evolveSchema(3); t.evolveSchema(4)

    // 3) second half under the evolved schema (fresh ranges, same log)
    val sp = spec
    val cdf = ChangeLogGen.zipfCdf(sp.nRepos, sp.zipfExponent)
    import spark.implicits._
    ReplayJob.run(spark, t,
      e => {
        val lo = 3999L + (e - 2) * 2000L
        val hi = lo + 2000L
        spark.range(lo + 1, hi + 1).map(s => ChangeLogGen.eventAt(sp, cdf, s))
      },
      Seq((2L, 3999L, 5999L), (3L, 5999L, 7999L)),
      nLogPartitions = 8, stateDir = Some(stateDir))
    assert(state(t) == oracle, "post-evolution ingest must match oracle")

    // 4) compaction: purge tombstones, bound files
    val report = Compaction.compact(spark, t)
    assert(report.purgedTombstones > 0)
    assert(state(t) == oracle, "compaction must not change the user table")

    // 5) retention: keep last 2 snapshots
    val (expired, removed) = t.expireSnapshots(keepLast = 2)
    assert(expired > 0 && removed > 0)
    assert(state(t) == oracle, "expiry must not change the current table")

    // 6) crash-replay the ENTIRE log — everything fenced, nothing changes
    val v = t.currentVersion()
    val reports = ReplayJob.replayGenerated(spark, t, spec, nEpochs = 4,
      nLogPartitions = 8)
    assert(reports.forall(_.skipped))
    assert(t.currentVersion() == v)
    assert(state(t) == oracle, "post-replay state must still match oracle")

    // 7) lineage rows exist for all four data epochs
    (0 to 3).foreach { e =>
      assert(spark.read.parquet(s"$stateDir/lineage/epoch=$e").count() == 8)
    }

    // 8) the evolved columns are present and old data projected
    val cols = t.read(spark).columns.toSet
    assert(cols.contains("language") && cols.contains("sizeBytes"))
    assert(t.read(spark).filter(col("language").isNull).count() == 0)
  }

  test("config-driven job spec (.pull analog) runs end-to-end: " +
      "source → transforms → policies → table → catalog discovery; " +
      "re-running the spec is a fenced no-op") {
    val spec = LogSpec(seed = 7L, nEvents = 2000, nRepos = 4,
      nPathsPerRepo = 8, pDelete = 0.1)
    val oracle = graft.log.OracleFold
      .fold(ChangeLogGen.generateLocal(spec))
      .map { case (k, v) => k -> v.contentSha }
    val tdir = tmpDir("jobtab")
    val cdir = tmpDir("jobcat")
    def specJson(tableDir: String, src: String): String =
      s"""{
         |  "name": "demo-ingest",
         |  "source": $src,
         |  "epochs": 2,
         |  "policies": {"defaults": true},
         |  "quarantine": true,
         |  "table": {"dir": "$tableDir", "numBuckets": 8},
         |  "nLogPartitions": 4,
         |  "catalog": {"dir": "$cdir", "name": "commits"}
         |}""".stripMargin
    val gen = """{"kind": "generator", "nEvents": 2000, "seed": 7,
                 |"nRepos": 4, "nPathsPerRepo": 8,
                 |"pDelete": 0.1}""".stripMargin
    val specPath = s"${tmpDir("jobspec")}/job.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(specPath),
      specJson(tdir, gen).getBytes("UTF-8"))

    val rep = graft.driver.JobSpecRunner.runFile(spark, specPath)
    assert(rep.name == "demo-ingest" && rep.epochs.size == 2)
    assert(rep.epochs.forall(r => !r.skipped))
    val t = IceTable.create(tdir, 8)
    def state(tt: IceTable) =
      tt.read(spark).select("repo", "path", "contentSha").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(state(t) == oracle, "spec-run job must match the fold oracle")
    // publish-time catalog registration: discoverable BY NAME
    val byName = graft.table.GraftCatalog.create(cdir).load("commits")
    assert(byName.read(spark).count() == rep.finalRows)
    // a spec is an idempotent description: re-running it is fully fenced
    val rep2 = graft.driver.JobSpecRunner.runFile(spark, specPath)
    assert(rep2.epochs.forall(_.skipped) && rep2.version == rep.version)

    // parquet source variant (segment claims): same log via files →
    // identical final state
    val logDir = tmpDir("joblog")
    ChangeLogGen.writeLog(spark, spec, logDir)
    val t2dir = tmpDir("jobtab2")
    val specPath2 = s"${tmpDir("jobspec2")}/job.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(specPath2),
      specJson(t2dir, s"""{"kind": "parquet", "dir": "$logDir"}""")
        .getBytes("UTF-8"))
    graft.driver.JobSpecRunner.run(spark,
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(specPath2)), "UTF-8"))
    assert(state(IceTable.create(t2dir, 8)) == oracle,
      "parquet-source spec must converge to the same state")

    // converter-chain stage: a deterministic sample keeps a strict,
    // REPEATABLE subset (same spec ⇒ same rows on every run)
    val t3dir = tmpDir("jobtab3")
    val spec3 = specJson(t3dir, gen).replace(
      "\"epochs\": 2",
      """"epochs": 2,
        |"transforms": [{"name": "sample", "keyField": "path",
        |                "fraction": 0.5}]""".stripMargin)
    graft.driver.JobSpecRunner.run(spark, spec3)
    val n3 = IceTable.create(t3dir, 8).read(spark).count()
    assert(n3 > 0 && n3 < rep.finalRows,
      s"sampled job must land a strict subset ($n3 of ${rep.finalRows})")
    val t4dir = tmpDir("jobtab4")
    graft.driver.JobSpecRunner.run(spark,
      spec3.replace(t3dir, t4dir))
    assert(IceTable.create(t4dir, 8).read(spark).count() == n3,
      "deterministic sampling: identical spec ⇒ identical subset")
  }
}
