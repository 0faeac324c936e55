package graft

import graft.driver.ReplayJob
import graft.sources.IncrementalFileSource
import graft.sinks.Writers
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("incremental file source: snapshot diff + ledger (FileBasedSource)") {
    val data = tmpDir("incsrc-data")
    val state = tmpDir("incsrc-state")
    def addFile(name: String, rows: Int): Unit =
      spark.range(rows).toDF("v").coalesce(1)
        .write.parquet(s"$data/$name")
    addFile("batch1", 100)
    addFile("batch2", 200)

    val src = new IncrementalFileSource(state)
    val p1 = src.plan(data, nBins = 2)
    assert(p1.files.nonEmpty)
    val n1 = spark.read.parquet(p1.files.map(_.path): _*).count()
    assert(n1 == 300)
    src.markProcessed(p1.files)

    // nothing new → empty plan (re-run safe)
    assert(src.plan(data, 2).files.isEmpty)

    // new files appear → only they are planned
    addFile("batch3", 50)
    val p2 = src.plan(data, 2)
    assert(spark.read.parquet(p2.files.map(_.path): _*).count() == 50)
    src.markProcessed(p2.files)
    assert(src.plan(data, 2).files.isEmpty)
  }

  test("extractor reads gzip csv through the snapshot-diff plan") {
    // FileBasedExtractor analog: CSV + GZIP downloaders collapse to one
    // spark.read over the planned files (codec decompression transparent;
    // .gz is non-splittable so each file is one task — the downloader's own
    // granularity); source_file lineage column from input_file_name().
    val data = tmpDir("gz-data")
    val state = tmpDir("gz-state")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "event_type")
    events.coalesce(2).write
      .option("header", "true").option("compression", "gzip")
      .csv(s"$data/drop1")
    val src = new IncrementalFileSource(state)
    val plan = src.plan(data, nBins = 2, pattern = _.endsWith(".csv.gz"))
    assert(plan.files.nonEmpty && plan.files.forall(_.path.endsWith(".csv.gz")))
    val got = src.extract(spark, plan, format = "csv",
      options = Map("header" -> "true", "inferSchema" -> "true"),
      withSourceFile = true)
    assert(got.count() == events.count())
    assert(got.columns.contains("source_file") &&
      got.select("source_file").distinct().count() == plan.files.size)
    src.markProcessed(plan.files)
    assert(src.plan(data, 2, _.endsWith(".csv.gz")).files.isEmpty)
  }

  test("ledger is append-only segments; auto-compaction bounds segment count") {
    // scale contract: markProcessed writes ONE new segment per call (O(new
    // files) — never a rewrite of ledger history); segments merge only when
    // they exceed maxSegments (amortized maintenance).
    val src = new IncrementalFileSource(tmpDir("seg-state"), maxSegments = 4)
    def fe(i: Int) = IncrementalFileSource.FileEntry(s"file:/x/f$i.parquet", 10L)
    (0 until 4).foreach(e => src.markProcessed(Seq(fe(2 * e), fe(2 * e + 1))))
    assert(src.segmentCount() == 4, "one segment per markProcessed call")
    assert(src.processed() == (0 until 8).map(i => s"file:/x/f$i.parquet").toSet)
    src.markProcessed(Seq(fe(8))) // 5th segment exceeds the cap
    assert(src.segmentCount() == 1, "auto-compaction must merge segments")
    assert(src.processed() == (0 to 8).map(i => s"file:/x/f$i.parquet").toSet,
      "compaction must lose nothing")
  }

  test("lazy planning streams bounded plans without the full file list") {
    // WorkUnitStreamSource analog (SURVEY §2.1 #2): planLazy emits plans of
    // at most maxFilesPerPlan NEW files, consuming the listing and the
    // ledger diff incrementally — ingestion can start (and the ledger can
    // advance) before the snapshot is fully enumerated.
    val dataDir = tmpDir("lazy-data")
    (0 until 37).foreach { i =>
      Files.write(Paths.get(s"$dataDir/f$i%02d.parquet".format(i)),
        Array.fill(i + 1)('x'.toByte))
    }
    val src = new IncrementalFileSource(tmpDir("lazy-state"))
    // mark a third processed up front: only the remainder may be planned
    val all = new java.io.File(dataDir).listFiles().map(f =>
      IncrementalFileSource.FileEntry(s"file:$dataDir/${f.getName}",
        f.length())).sortBy(_.path)
    src.markProcessed(all.take(12))

    val plans = src.planLazy(dataDir, nBins = 3, maxFilesPerPlan = 10).toSeq
    assert(plans.forall(_.files.size <= 10),
      "every emitted plan must respect the cap")
    val planned = plans.flatMap(_.files.map(_.path))
    assert(planned.distinct.size == planned.size, "no file planned twice")
    assert(planned.toSet == all.drop(12).map(_.path).toSet,
      "lazy plans must cover exactly the unprocessed remainder")
    assert(plans.size == 3, s"25 new files at cap 10 -> 3 plans, got ${plans.size}")

    // consuming plan-by-plan with ledger updates: nothing replans
    plans.foreach(p => src.markProcessed(p.files))
    assert(src.planLazy(dataDir, 3, 10).isEmpty,
      "after marking all plans processed, the stream must be empty")
  }

  test("legacy single-file ledger is honored and folded in on compaction") {
    val state = tmpDir("legacy-state")
    Files.createDirectories(Paths.get(state))
    Files.write(Paths.get(s"$state/processed_files.txt"),
      "file:/x/old.parquet\n".getBytes("UTF-8"))
    val src = new IncrementalFileSource(state)
    assert(src.processed() == Set("file:/x/old.parquet"))
    src.markProcessed(
      Seq(IncrementalFileSource.FileEntry("file:/x/new.parquet", 1L)))
    assert(src.processed() ==
      Set("file:/x/old.parquet", "file:/x/new.parquet"))
    src.compactLedger()
    assert(src.segmentCount() == 1)
    assert(!Files.exists(Paths.get(s"$state/processed_files.txt")),
      "legacy ledger file must fold into the merged segment")
    assert(src.processed() ==
      Set("file:/x/old.parquet", "file:/x/new.parquet"))
  }

  test("file source skips hidden/_temporary paths (in-flight writer files)") {
    val dir = tmpDir("hidden")
    val src = new IncrementalFileSource(tmpDir("hidden-state"))
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(s"$dir/_temporary/0/task_1"))
    Files.createDirectories(Paths.get(s"$dir/.staging"))
    Files.write(Paths.get(s"$dir/ok.parquet"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(s"$dir/_temporary/0/task_1/part-0.parquet"),
      Array[Byte](1))
    Files.write(Paths.get(s"$dir/.staging/part-1.parquet"), Array[Byte](1))
    val plan = src.plan(dir, nBins = 2)
    assert(plan.files.map(_.path.split('/').last) == Seq("ok.parquet"),
      s"in-flight temp/hidden files must not be pulled: ${plan.files}")
  }

  test("file source ingests a watched root that itself sits under a " +
      "dot/underscore-prefixed directory (only components BELOW root checked)") {
    // regression: the hidden-name walk must stop at the (qualified) root —
    // comparing against the unqualified root never matched the listed
    // file:/ paths, so a watched dir like /tmp/.cache/in silently planned
    // zero files (ADVICE r2, medium).
    val base = tmpDir("dotroot")
    val watched = s"$base/.cache/_data/in"
    Files.createDirectories(Paths.get(watched))
    Files.write(Paths.get(s"$watched/ok.parquet"), Array[Byte](1, 2, 3))
    Files.createDirectories(Paths.get(s"$watched/.hidden"))
    Files.write(Paths.get(s"$watched/.hidden/no.parquet"), Array[Byte](1))
    val src = new IncrementalFileSource(tmpDir("dotroot-state"))
    val plan = src.plan(watched, nBins = 2)
    assert(plan.files.map(_.path.split('/').last) == Seq("ok.parquet"),
      s"a dot-component ABOVE the root must not hide its contents: ${plan.files}")
  }

  test("worst-fit-decreasing bin packing balances heterogeneous files") {
    val src = new IncrementalFileSource(tmpDir("pack-state"))
    val files = Seq(900L, 100L, 400L, 300L, 350L, 250L, 80L, 820L)
      .zipWithIndex.map { case (sz, i) => IncrementalFileSource.FileEntry(s"f$i", sz) }
    val bins = src.binPack(files, 4)
    assert(bins.flatten.toSet == files.toSet, "every file placed once")
    val weights = bins.map(_.map(_.size).sum)
    assert(weights.max <= 2 * weights.min,
      s"bins should be balanced, got $weights")
  }

  test("time-partitioned writer lays out yyyy/mm/dd dirs and round-trips") {
    val out = tmpDir("tsink")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
    Writers.timePartitioned(events, "ts", out, granularity = "day",
      coalescePartitions = Some(2))
    val dirs = Files.list(Paths.get(out)).iterator()
    assert(dirs.hasNext)
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    assert(back.columns.contains("yyyy") && back.columns.contains("dd"))
    // partition pruning: a yyyy/mm filter prunes directories
    val pruned = back.filter(col("yyyy") === "2024" && col("mm") === "01")
    assert(pruned.count() > 0)
  }

  test("time-range reader prunes to the requested dirs (date-partitioned src)") {
    import graft.sources.PartitionedRead
    val out = tmpDir("tread")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    Writers.timePartitioned(events, "ts", out, granularity = "day",
      coalescePartitions = Some(2))
    val days = events
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy("d").as[String].collect()
    val (from, to) = (days(0), days(math.min(2, days.length - 1)))
    val got = PartitionedRead.timeRange(spark, out, from, to)
      .getOrElse(fail("range must exist"))
    val expected = events
      .filter(date_format(col("ts"), "yyyy-MM-dd").between(from, to)).count()
    assert(got.count() == expected, s"range [$from,$to]")
    // PLANNING-time pruning: every scanned file lies under an in-range dir —
    // nothing outside the range is even listed
    val dirs = PartitionedRead.candidateDirs(from, to).toSet
    assert(got.inputFiles.nonEmpty &&
      got.inputFiles.forall(f => dirs.exists(d => f.contains(d))),
      s"scan must touch only in-range dirs: ${got.inputFiles.take(3).toSeq}")
    // empty increment: no candidate dir exists
    assert(PartitionedRead.timeRange(spark, out, "1999-01-01", "1999-01-02")
      .isEmpty)
    // unaligned range starts must not drop the final in-range partition
    // (stepping month-wise from Jan 31 would skip mm=03)
    assert(PartitionedRead.candidateDirs("2024-01-31", "2024-03-01", "month")
      == Seq("yyyy=2024/mm=01", "yyyy=2024/mm=02", "yyyy=2024/mm=03"))
    assert(PartitionedRead.candidateDirs("2024-01-01 23", "2024-01-03 01",
      "day").last == "yyyy=2024/mm=01/dd=03")
  }

  test("regex-partitioned reader derives watermark columns from file paths") {
    import graft.sources.PartitionedRead
    val out = tmpDir("rread")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    Writers.timePartitioned(events, "ts", out, granularity = "day",
      coalescePartitions = Some(1))
    val df = PartitionedRead.regexPartitioned(spark, out,
      ".*/yyyy=(\\d{4})/mm=(\\d{2})/dd=(\\d{2})/.*",
      Seq("p_yyyy", "p_mm", "p_dd"))
    // path-derived columns agree with the layout's inferred partition cols
    assert(df.filter(col("p_yyyy") =!= col("yyyy") ||
      col("p_mm") =!= col("mm") || col("p_dd") =!= col("dd")).count() == 0)
    assert(df.count() == events.count())
  }

  test("byColumns writer partitions by arbitrary columns; json format works") {
    val out = tmpDir("csink")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
    Writers.byColumns(events, out, Seq("event_type"), format = "json",
      coalescePartitions = Some(1))
    val back = spark.read.json(out)
    assert(back.count() == events.count())
  }

  test("admission control slices epochs at the event cap") {
    val plan = ReplayJob.planEpochs(-1L, 9999L, maxEventsPerEpoch = 3000)
    assert(plan.size == 4)
    assert(plan.forall { case (_, lo, hi) => hi - lo <= 3000 })
    assert(plan.head._2 == -1L && plan.last._3 == 9999L)
    // contiguous, non-overlapping
    plan.sliding(2).foreach {
      case Seq((_, _, h1), (_, l2, _)) => assert(h1 == l2)
      case _ => ()
    }
  }
}
