package graft

import graft.driver.MultiTableIngest
import graft.driver.MultiTableIngest.DatasetRoute
import graft.log.{ChangeLogGen, LogSpec, OracleFold}
import graft.merge.MergeEngine
import graft.pipeline.TaskPolicies
import graft.table.IceTable
import org.apache.spark.sql.functions._

class MultiTableSpec extends SparkSpec {
  import spark.implicits._

  val spec = LogSpec(seed = 55L, nEvents = 6000, nRepos = 9,
    nPathsPerRepo = 20, pDelete = 0.08)

  private def shaState(t: IceTable) =
    t.read(spark).select("repo", "path", "contentSha").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  test("per-dataset routing: union of tables equals the oracle; isolation holds") {
    val routes = (0 until 3).map(i =>
      DatasetRoute(s"org$i", col("repo").startsWith(s"org$i") ||
        col("repo").startsWith(s"org${i + 3}") ||
        col("repo").startsWith(s"org${i + 6}"),
        IceTable.create(tmpDir(s"mt$i"), numBuckets = 4)))
    val sp = spec
    val cdf = ChangeLogGen.zipfCdf(sp.nRepos, sp.zipfExponent)
    val per = sp.nEvents / 3
    (0 until 3).foreach { e =>
      val lo = e * per - 1
      val hi = if (e == 2) sp.nEvents - 1 else (e + 1) * per - 1
      val slice = spark.range(lo + 1, hi + 1)
        .map(s => ChangeLogGen.eventAt(sp, cdf, s))
      val outs = MultiTableIngest.applyEpoch(spark, routes, slice, e,
        nLogPartitions = 4, claimedRange = Some((lo, hi)))
      assert(outs.forall(_.outcome.isRight))
    }
    val union = routes.map(r => shaState(r.table)).reduce(_ ++ _)
    val oracle = OracleFold.fold(ChangeLogGen.generateLocal(sp))
      .map { case (k, v) => k -> v.contentSha }
    assert(union == oracle)
    // disjoint routing: no key lands in two tables
    val sizes = routes.map(r => shaState(r.table).size)
    assert(sizes.sum == oracle.size)
    assert(sizes.forall(_ > 0))
  }

  test("a failing dataset aborts alone; others commit (SafeDatasetCommit)") {
    val good = DatasetRoute("good", col("repo").startsWith("org"),
      IceTable.create(tmpDir("mtg"), numBuckets = 4))
    // a route whose task policy can never pass → per-dataset abort
    val badTable = IceTable.create(tmpDir("mtb"), numBuckets = 4)
    val events = (0 until 100).map(i =>
      graft.model.ChangeEvent("u", i.toLong, s"org${i % 3}", s"p$i",
        f"c$i%040d", "scala", s"v$i")).toDS()
    val goodOut = MergeEngine.applyEpoch(spark, good.table, events, 0,
      nLogPartitions = 4)
    assert(!goodOut.skipped)
    intercept[TaskPolicies.EpochAbortedException] {
      MergeEngine.applyEpoch(spark, badTable, events, 0, nLogPartitions = 4,
        taskPolicies = Seq(TaskPolicies.MinRowsPolicy(minRows = 1000000,
          severity = TaskPolicies.Fail)))
    }
    assert(good.table.currentVersion() == 0L)
    assert(badTable.currentVersion() == -1L, "failed dataset must not commit")
  }
}
