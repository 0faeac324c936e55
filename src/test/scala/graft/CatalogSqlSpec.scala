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

  test("INSERT INTO routes through the engine: upsert semantics, derived " +
      "contentSha, reserved-namespace claims; constraint violations and " +
      "OVERWRITE reject; writeTo().append() works") {
    val catDir = tmpDir("gcatsqlw")
    val t = IceTable.create(tmpDir("gcattabw"), numBuckets = 4)
    apply(t, 0, 0, 2,
      ev("i", 1, "r0", "a", "A1"),
      ev("i", 2, "r0", "b", "B1"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("gcatw", catDir) {
      val v0 = t.currentVersion()
      // upsert an existing key + insert a new one; contentSha is derived,
      // the supplied NULL is ignored
      spark.sql("INSERT INTO gcatw.commits VALUES " +
        "('r0','a','h','scala','A2',NULL), ('r2','c','h','scala','C1',NULL)")
      assert(t.currentVersion() == v0 + 1, "one engine epoch per statement")
      val got = spark.sql(
        "SELECT path, content, contentSha FROM gcatw.commits")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2))).toSet
      def sha(s: String): String = java.security.MessageDigest
        .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(got == Set(("a", "A2", sha("A2")), ("b", "B1", sha("B1")),
        ("c", "C1", sha("C1"))), s"got $got")
      // claims landed in the reserved upper namespace on every partition;
      // completeness/purge horizons untouched
      val ivs = MergeEngine.committedIntervals(t.currentManifest())
      assert(ivs.keySet == Set(0, 1))
      ivs.values.foreach { iv =>
        assert(iv.exists { case (lo, hi) =>
          lo == graft.table.SqlAppend.SeqNamespaceBase && hi == lo + 2 },
          s"expected the (2^62, 2^62+2] claim, got $iv")
      }
      // statement idempotence: same INSERT again → higher seqs, same state
      spark.sql("INSERT INTO gcatw.commits VALUES " +
        "('r0','a','h','scala','A2',NULL), ('r2','c','h','scala','C1',NULL)")
      assert(spark.sql("SELECT path, content, contentSha FROM gcatw.commits")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2))).toSet == got, "re-running an INSERT converges")
      // SQL rows supersede log ingest for their keys (documented LWW rule)
      apply(t, 1, 2, 3, ev("u", 3, "r0", "a", "A3"))
      assert(spark.sql(
        "SELECT content FROM gcatw.commits WHERE path='a'")
        .head().getString(0) == "A2",
        "a log event below the SQL seq namespace loses LWW")
      // constraint violations reject the STATEMENT, nothing commits
      val vBefore = t.currentVersion()
      val e1 = intercept[Exception] {
        spark.sql("INSERT INTO gcatw.commits VALUES " +
          "('r9','x','h','scala',NULL,NULL)") // null content
      }
      assert(e1.getMessage.contains("INSERT rejected"), e1.getMessage)
      assert(t.currentVersion() == vBefore, "rejected INSERT commits nothing")
      intercept[Exception] {
        spark.sql("INSERT OVERWRITE gcatw.commits VALUES " +
          "('r9','x','h','scala','X',NULL)")
      }
      assert(t.currentVersion() == vBefore)
      // the DataFrameWriterV2 spelling
      Seq(("r3", "d", "h", "scala", "D1", null: String))
        .toDF("repo", "path", "commit", "lang", "content", "contentSha")
        .writeTo("gcatw.commits").append()
      assert(spark.sql("SELECT content FROM gcatw.commits WHERE path='d'")
        .head().getString(0) == "D1")
    }
  }

  test("INSERT on an evolved table: non-null values in post-base columns " +
      "reject the statement (payload cannot carry them); NULLs land with " +
      "the engine null-filling") {
    val catDir = tmpDir("gcatsqle")
    val t = IceTable.create(tmpDir("gcattabe"), numBuckets = 2)
    apply(t, 0, 0, 1, ev("i", 1, "r0", "a", "A1"))
    t.evolveSchema(2) // + sizeBytes (colId 7)
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("gcate", catDir) {
      val vBefore = t.currentVersion()
      // a non-null evolved value would be silently dropped by the
      // change-event payload — the statement must fail instead
      val e = intercept[Exception] {
        spark.sql("INSERT INTO gcate.commits VALUES " +
          "('r1','b','h','scala','B1',NULL,123)")
      }
      assert(e.getMessage.contains("sizeBytes"), e.getMessage)
      assert(t.currentVersion() == vBefore, "rejected INSERT commits nothing")
      // NULL in the evolved column is the documented spelling — lands
      spark.sql("INSERT INTO gcate.commits VALUES " +
        "('r1','b','h','scala','B1',NULL,NULL)")
      val got = spark.sql(
        "SELECT path, content, sizeBytes FROM gcate.commits ORDER BY path")
        .collect().map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
      assert(got == Seq(("a", "A1", -1), ("b", "B1", -1)), s"got $got")
    }
  }

  test("concurrent INSERTs race through the commit CAS: the loser " +
      "re-allocates above the winner's claims and both statements land") {
    val catDir = tmpDir("gcatsqlr")
    val t = IceTable.create(tmpDir("gcattabr"), numBuckets = 4)
    apply(t, 0, 0, 1, ev("i", 1, "r0", "a", "A1"))
    GraftCatalog.create(catDir).register("commits", t.dir)
    withCatalog("gcatr", catDir) {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = (0 until 2).map { i =>
        Future {
          spark.sql(s"INSERT INTO gcatr.commits VALUES " +
            s"('rc$i','p$i','h','scala','C$i',NULL)")
        }
      }
      fs.foreach(Await.result(_, 120.seconds))
      val got = spark.sql("SELECT path, content FROM gcatr.commits")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("a", "A1"), ("p0", "C0"), ("p1", "C1")),
        s"both racing INSERTs must land: $got")
      // allocations stacked: two disjoint unit blocks above 2^62
      val base = graft.table.SqlAppend.SeqNamespaceBase
      val ivs = MergeEngine.committedIntervals(t.currentManifest())
      ivs.values.foreach { iv =>
        assert(iv.exists { case (lo, hi) => lo == base && hi == base + 2 },
          s"racing claims must stack contiguously above 2^62: $iv")
      }
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
