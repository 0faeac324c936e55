package graft

import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.table.{GraftCatalog, IceTable}

/**
 * SQL-catalog surface (graft.table.GraftSparkCatalog): name-based SQL
 * access to published tables — SELECT / SHOW TABLES / VERSION AS OF /
 * TIMESTAMP AS OF / DROP TABLE — backed by the durable GraftCatalog, with
 * the user view (tombstones filtered, physical columns hidden).
 */
class CatalogSqlSpec extends SparkSpec {
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

  test("SELECT by name serves the user view: tombstones filtered, " +
      "physical columns hidden; SHOW TABLES lists registrations") {
    val catDir = tmpDir("gcatsql1")
    val t = IceTable.create(tmpDir("gcattab1"), numBuckets = 4)
    apply(t, 0, 0, 4,
      ev("i", 1, "r0", "a", "A"),
      ev("i", 2, "r0", "b", "B"),
      ev("i", 3, "r1", "c", "C"),
      ev("d", 4, "r0", "b", "")) // tombstone: must not surface in SQL
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("gcat1", catDir) {
      val rows = spark.sql("SELECT repo, path, content FROM gcat1.commits")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
      assert(rows == Set(("r0", "a", "A"), ("r1", "c", "C")))
      val cols = spark.sql("SELECT * FROM gcat1.commits").columns.toSeq
      assert(cols == Seq("repo", "path", "commit", "lang", "content",
        "contentSha"), s"physical columns must stay hidden: $cols")
      // the dotted `default` namespace spelling resolves too
      assert(spark.sql("SELECT count(*) FROM gcat1.default.commits")
        .head().getLong(0) == 2L)
      val listed = spark.sql("SHOW TABLES IN gcat1").collect()
        .map(_.getAs[String]("tableName")).toSet
      assert(listed == Set("commits"))
      // matches the programmatic read exactly
      assert(spark.sql("SELECT * FROM gcat1.commits").collect().toSet ==
        t.read(spark).collect().toSet)
    }
  }

  test("VERSION AS OF and TIMESTAMP AS OF read older snapshots") {
    val catDir = tmpDir("gcatsql2")
    val t = IceTable.create(tmpDir("gcattab2"), numBuckets = 2)
    apply(t, 0, 0, 2, ev("i", 1, "r0", "a", "A1"), ev("i", 2, "r0", "b", "B"))
    val v0 = t.currentVersion()
    Thread.sleep(20) // distinct commit stamps for the timestamp travel
    apply(t, 1, 2, 3, ev("u", 3, "r0", "a", "A2"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("gcat2", catDir) {
      val now = spark.sql("SELECT content FROM gcat2.commits WHERE path='a'")
        .head().getString(0)
      assert(now == "A2")
      val old = spark.sql(
        s"SELECT content FROM gcat2.commits VERSION AS OF $v0 " +
          "WHERE path='a'").head().getString(0)
      assert(old == "A1", "VERSION AS OF must read the older snapshot")
      // timestamp of v0's commit resolves to v0 (session tz is UTC)
      val ts0 = t.history().find(_.version == v0).get.commitTimeMillis
      val tsLit = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ts0))
      val asOf = spark.sql(
        s"SELECT content FROM gcat2.commits TIMESTAMP AS OF '$tsLit' " +
          "WHERE path='a'").head().getString(0)
      assert(asOf == "A1", "TIMESTAMP AS OF must resolve via commit stamps")
    }
  }

  test("DROP TABLE unregisters the name only; data and snapshots stay") {
    val catDir = tmpDir("gcatsql3")
    val t = IceTable.create(tmpDir("gcattab3"), numBuckets = 2)
    apply(t, 0, 0, 1, ev("i", 1, "r0", "a", "A"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("gcat3", catDir) {
      assert(spark.sql("SELECT count(*) FROM gcat3.commits")
        .head().getLong(0) == 1L)
      spark.sql("DROP TABLE gcat3.commits")
      assert(GraftCatalog.create(catDir).entry("commits").isEmpty,
        "the registration must be gone")
      assert(t.read(spark).count() == 1L,
        "external-table semantics: data survives the drop")
      val err = intercept[Exception] {
        spark.sql("SELECT count(*) FROM gcat3.commits").head()
      }
      assert(err.getMessage.toLowerCase.contains("table"))
    }
  }

  test("column pruning and filter pushdown reach the catalog scan") {
    val catDir = tmpDir("gcatsql5")
    val t = IceTable.create(tmpDir("gcattab5"), numBuckets = 4)
    apply(t, 0, 0, 3,
      ev("i", 1, "r0", "a", "A"),
      ev("i", 2, "r0", "b", "B"),
      ev("i", 3, "r1", "c", "C"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("gcat5", catDir) {
      val df = spark.sql(
        "SELECT path FROM gcat5.commits WHERE repo = 'r0'")
      assert(df.collect().map(_.getString(0)).toSet == Set("a", "b"))
      val plan = df.queryExecution.executedPlan.toString
      // the scan decodes only the referenced columns (projection + filter)
      assert(plan.contains("cols=repo,path"),
        s"scan must be pruned to the referenced columns:\n$plan")
      assert(plan.contains("pushed=") && plan.contains("repo"),
        s"the filter must reach the parquet readers as an IO hint:\n$plan")
      // count(*) prunes to ZERO user columns and still counts live rows
      assert(spark.sql("SELECT count(*) FROM gcat5.commits")
        .head().getLong(0) == 3L)
    }
  }

  test("snapshot isolation: a table loaded by SQL is pinned to the " +
      "manifest at load; a concurrent commit does not tear the query") {
    val catDir = tmpDir("gcatsql4")
    val t = IceTable.create(tmpDir("gcattab4"), numBuckets = 2)
    apply(t, 0, 0, 1, ev("i", 1, "r0", "a", "A1"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("gcat4", catDir) {
      val df = spark.sql("SELECT content FROM gcat4.commits WHERE path='a'")
      // commit AFTER the plan resolved the manifest
      apply(t, 1, 1, 2, ev("u", 2, "r0", "a", "A2"))
      assert(df.head().getString(0) == "A1",
        "the resolved plan reads the load-time snapshot")
      assert(spark.sql("SELECT content FROM gcat4.commits WHERE path='a'")
        .head().getString(0) == "A2",
        "a fresh query sees the new snapshot")
    }
  }
}
