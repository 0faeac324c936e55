package graft

import graft.maintenance.Compaction
import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.table.{ChangeFeed, GraftCatalog, IceTable}

/**
 * Streaming/batch change feed as a SQL-addressable table
 * (`<catalog>.<table>.changes`, graft.table.ChangeFeedTable): feed shape,
 * startingVersion slicing, carried-row fencing (rewrites emit nothing),
 * unopened pruning of fully-fenced files, micro-batch tailing of the
 * snapshot log with checkpointed restart, and the mirror property (feeding
 * the feed back through the engine reproduces the upstream user view).
 */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def ev(op: String, seq: Long, repo: String, path: String,
                 content: String): ChangeEvent =
    ChangeEvent(op, seq, repo, path, "c" * 40, "scala", content)

  private def apply(t: IceTable, epoch: Long, lo: Long, hi: Long,
                    evs: ChangeEvent*): Unit = {
    MergeEngine.applyEpoch(spark, t, evs.toDS(), epoch, nLogPartitions = 2,
      claimedRange = Some((lo, hi)))
    ()
  }

  private def withCatalog(catName: String, catDir: String)(
      body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$catName",
      "graft.table.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$catName.dir", catDir)
    try body
    finally {
      spark.conf.unset(s"spark.sql.catalog.$catName")
      spark.conf.unset(s"spark.sql.catalog.$catName.dir")
    }
  }

  test("batch feed from origin: change-event shape, tombstones as 'd', " +
      "physical columns hidden") {
    val catDir = tmpDir("cfeed1cat")
    val t = IceTable.create(tmpDir("cfeed1tab"), numBuckets = 4)
    apply(t, 0, 0, 3,
      ev("i", 1, "r0", "a", "A1"),
      ev("i", 2, "r0", "b", "B1"),
      ev("i", 3, "r1", "c", "C1"))
    apply(t, 1, 3, 5,
      ev("u", 4, "r0", "a", "A2"),
      ev("d", 5, "r0", "b", ""))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("cf1", catDir) {
      val df = spark.sql("SELECT * FROM cf1.commits.changes")
      assert(df.columns.toSeq == Seq("op", "seq", "repo", "path", "commit",
        "lang", "content", "contentSha"),
        s"feed columns must be op, seq, then the user view: " +
          s"${df.columns.toSeq}")
      val rows = df.collect().map(r => (r.getAs[String]("op"),
        r.getAs[Long]("seq"), r.getAs[String]("repo"),
        r.getAs[String]("path"))).toSet
      // origin feed = current physical state: live rows as 'u', the
      // tombstone as 'd' (r0/b's insert at seq 2 was superseded)
      assert(rows == Set(
        ("u", 4L, "r0", "a"),
        ("d", 5L, "r0", "b"),
        ("u", 3L, "r1", "c")), s"got $rows")
      // dotted-default spelling resolves the same feed
      assert(spark.sql("SELECT count(*) FROM cf1.default.commits.changes")
        .head().getLong(0) == 3L)
      // a registration literally named "changes" still reads as DATA
      GraftCatalog.create(catDir).register("changes", t.dir)
      assert(spark.sql("SELECT * FROM cf1.changes").columns.toSeq
        .startsWith(Seq("repo")), "top-level name 'changes' is a data table")
    }
  }

  test("startingVersion slices the feed; carried rows in rewritten files " +
      "are fenced out; state-preserving compaction emits nothing") {
    val catDir = tmpDir("cfeed2cat")
    val t = IceTable.create(tmpDir("cfeed2tab"), numBuckets = 1)
    // one bucket: any later epoch REWRITES the file holding untouched keys
    apply(t, 0, 0, 2,
      ev("i", 1, "r0", "a", "A1"),
      ev("i", 2, "r0", "b", "B1"))
    val vA = t.currentVersion()
    apply(t, 1, 2, 3, ev("u", 3, "r0", "a", "A2"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("cf2", catDir) {
      val sliced = spark.read.option("startingVersion", vA.toString)
        .table("cf2.commits.changes").collect()
        .map(r => (r.getAs[String]("op"), r.getAs[String]("path"),
          r.getAs[String]("content"))).toSet
      // r0/b lives in the rewritten bucket file but its seq (2) is inside
      // vA's committed intervals — carried, not changed, so fenced out
      assert(sliced == Set(("u", "a", "A2")), s"got $sliced")
    }
    // compaction rewrites files without changing state: feed must be empty
    val vB = t.currentVersion()
    Compaction.compact(spark, t)
    val vC = t.currentVersion()
    assert(vC > vB, "compaction must have committed a rewrite")
    withCatalog("cf2b", catDir) {
      assert(spark.read.option("startingVersion", vB.toString)
        .table("cf2b.commits.changes").count() == 0L,
        "a state-preserving rewrite emits no change events")
    }
  }

  test("fully-fenced files are pruned from the plan without being opened") {
    val t = IceTable.create(tmpDir("cfeed3tab"), numBuckets = 2)
    apply(t, 0, 0, 4,
      ev("i", 1, "r0", "a", "A"), ev("i", 2, "r1", "b", "B"),
      ev("i", 3, "r2", "c", "C"), ev("i", 4, "r3", "d", "D"))
    val vA = t.currentVersion()
    val mA = Some(t.readManifest(vA))
    // compaction rewrites every file; all row seqs are fenced by vA
    Compaction.compact(spark, t)
    val mB = t.readManifest(t.currentVersion())
    assert(mB.files.map(_.path).toSet
      .intersect(mA.get.files.map(_.path).toSet).isEmpty,
      "the rewrite must have produced all-new file paths")
    assert(mB.files.forall(f => f.minSeq.isDefined && f.maxSeq.isDefined),
      "rewritten files must carry seq stats for fence pruning")
    assert(ChangeFeed.planFiles(mA, mB).isEmpty,
      "files whose whole seq span is fenced are dropped at PLANNING time")
    // a stats-less file can never be pruned (must be read and row-fenced)
    val statless = mB.files.map(_.copy(minSeq = None, maxSeq = None))
    assert(ChangeFeed.planFiles(mA, mB.copy(files = statless)).nonEmpty,
      "stats-less files are always planned")
  }

  test("streaming tail: micro-batches follow commits; checkpointed " +
      "restart resumes at the committed version") {
    val catDir = tmpDir("cfeed4cat")
    val ckpt = tmpDir("cfeed4ckpt")
    val t = IceTable.create(tmpDir("cfeed4tab"), numBuckets = 2)
    apply(t, 0, 0, 2, ev("i", 1, "r0", "a", "A1"), ev("i", 2, "r1", "b", "B1"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("cf4", catDir) {
      def tail(): Set[(String, Long, String)] = {
        val got = new java.util.concurrent.ConcurrentLinkedQueue[
          (String, Long, String)]()
        val q = spark.readStream.table("cf4.commits.changes")
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.collect().foreach(r => got.add((r.getAs[String]("op"),
              r.getAs[Long]("seq"), r.getAs[String]("path"))))
          }
          .option("checkpointLocation", ckpt).start()
        try {
          q.processAllAvailable()
          import scala.jdk.CollectionConverters._
          got.asScala.toSet
        } finally q.stop()
      }
      val first = tail()
      assert(first == Set(("u", 1L, "a"), ("u", 2L, "b")), s"got $first")
      // two more commits while the stream is DOWN; restart must emit
      // exactly the delta (offsets are checkpointed snapshot versions)
      apply(t, 1, 2, 3, ev("u", 3, "r0", "a", "A2"))
      apply(t, 2, 3, 4, ev("d", 4, "r1", "b", ""))
      val second = tail()
      assert(second == Set(("u", 3L, "a"), ("d", 4L, "b")),
        s"restart must resume from the checkpointed version, got $second")
    }
  }

  test("mirror: feeding the batch feed back through the engine " +
      "reproduces the upstream user view") {
    val catDir = tmpDir("cfeed5cat")
    val t = IceTable.create(tmpDir("cfeed5tab"), numBuckets = 4)
    apply(t, 0, 0, 3,
      ev("i", 1, "r0", "a", "A1"),
      ev("i", 2, "r0", "b", "B1"),
      ev("i", 3, "r1", "c", "C1"))
    apply(t, 1, 3, 6,
      ev("u", 4, "r0", "a", "A2"),
      ev("d", 5, "r0", "b", ""),
      ev("i", 6, "r2", "d", "D1"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("cf5", catDir) {
      val feed = spark.sql("SELECT * FROM cf5.commits.changes")
      val evs = feed.collect().map(r => ChangeEvent(
        if (r.getAs[String]("op") == "d") "d" else "u",
        r.getAs[Long]("seq"), r.getAs[String]("repo"),
        r.getAs[String]("path"), r.getAs[String]("commit"),
        r.getAs[String]("lang"), r.getAs[String]("content"))).toSeq
      val mirror = IceTable.create(tmpDir("cfeed5mir"), numBuckets = 4)
      MergeEngine.applyEpoch(spark, mirror, evs.toDS(), epochId = 0,
        nLogPartitions = 2, claimedRange = Some((0L, 6L)))
      val up = t.read(spark).collect().toSet
      val down = mirror.read(spark).collect().toSet
      assert(down == up, s"mirror view must equal upstream:\n$down\nvs $up")
    }
  }
}
