package graft.driver

import graft.log.{ChangeLogGen, LogSpec}
import graft.merge.MergeEngine
import graft.model.ChangeEvent
import graft.pipeline.{RowPolicies, Transform}
import graft.table.{GraftCatalog, IceTable}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Config-driven job assembly — the `.pull`-file analog: one declarative
 * JSON spec wires source → converter chain → row policies → table →
 * catalog registration, executed by `IngestMain job <spec.json>`. The
 * reference's entire user surface is this shape (a job spec naming
 * source/converters/policies/publisher, e.g.
 * gobblin-example/src/main/resources/wikipedia.pull, launched by
 * AbstractJobLauncher.launchJob,
 * gobblin-runtime/.../AbstractJobLauncher.java:433); here the spec
 * resolves to the SAME engine calls code would make, so a spec-run job
 * has identical semantics, counters, and invariants.
 *
 * {{{
 * {
 *   "name": "demo-ingest",
 *   "source": {"kind": "generator", "nEvents": 2000, "seed": 7},
 *   "epochs": 2,
 *   "transforms": [
 *     {"name": "regexFilter", "field": "path", "pattern": "\\.scala$"},
 *     {"name": "sample", "keyField": "path", "fraction": 0.5}
 *   ],
 *   "policies": {"defaults": true,
 *                "timestampLowerBound": {"column": "seq", "min": -1}},
 *   "quarantine": true,
 *   "table": {"dir": "/data/commits", "numBuckets": 32},
 *   "nLogPartitions": 32,
 *   "catalog": {"dir": "/data/catalog", "name": "commits"}
 * }
 * }}}
 *
 * Sources:
 *  - `generator` — the deterministic synthetic change log (LogSpec params);
 *    epochs get DECLARED claim ranges (the generator covers its slice).
 *  - `parquet` — a change-log directory in ChangeEvent shape; the log's
 *    seq span splits into `epochs` slices, each claimed by SEGMENT claims
 *    (observed runs — an arbitrary log file's gaps must not be fenced).
 *
 * Transforms (converter-chain stages by name — each maps to a
 * [[Transform]] constructor): `project`, `drop`, `filterBy`,
 * `regexFilter`, `sample`, `markDeletes`, `withCasts`.
 *
 * Policies: `defaults` (the standard envelope checks) plus the optional
 * `timestampLowerBound` late-data bound; `quarantine: true` routes
 * rejects to `<table.dir>/state/quarantine` (reprocessable via
 * `IngestMain reprocess`).
 */
object JobSpecRunner {

  final case class Report(name: String, epochs: Seq[ReplayJob.EpochReport],
                          finalRows: Long, version: Long)

  def runFile(spark: SparkSession, specPath: String): Report = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(specPath)
    run(spark, graft.table.FsIO.readUtf8(p.getFileSystem(conf), p))
  }

  def run(spark: SparkSession, specJson: String): Report = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(specJson)
    val name = (j \ "name").extractOrElse[String]("job")
    val nLog = (j \ "nLogPartitions").extractOrElse[Int](32)
    val epochs = (j \ "epochs").extractOrElse[Int](1)

    val tableDir = (j \ "table" \ "dir").extract[String]
    val numBuckets = (j \ "table" \ "numBuckets").extractOrElse[Int](32)
    val table = IceTable.create(tableDir, numBuckets)

    val pipeline = Transform.chain(
      (j \ "transforms").extractOrElse[Seq[JValue]](Nil).map(transform): _*)
    val policies = {
      val base =
        if ((j \ "policies" \ "defaults").extractOrElse[Boolean](true))
          RowPolicies.defaults
        else Nil
      base ++ (j \ "policies" \ "timestampLowerBound" match {
        case JNothing | JNull => Nil
        case tb => Seq(RowPolicies.timestampLowerBound(
          (tb \ "column").extract[String], (tb \ "min").extract[Long]))
      })
    }
    val quarantine =
      if ((j \ "quarantine").extractOrElse[Boolean](false))
        Some(s"$tableDir/state/quarantine")
      else None
    val stateDir = s"$tableDir/state"

    // source → per-epoch (loader, declared claim range or None=segment)
    import spark.implicits._
    val slices: Seq[(Long, Dataset[ChangeEvent], Option[(Long, Long)])] =
      (j \ "source" \ "kind").extract[String] match {
        case "generator" =>
          val spec = LogSpec(
            seed = (j \ "source" \ "seed").extractOrElse[Long](42L),
            nEvents = (j \ "source" \ "nEvents").extract[Long],
            nRepos = (j \ "source" \ "nRepos").extractOrElse[Int](100),
            nPathsPerRepo =
              (j \ "source" \ "nPathsPerRepo").extractOrElse[Int](50),
            pDelete = (j \ "source" \ "pDelete").extractOrElse[Double](0.05))
          val cdf = ChangeLogGen.zipfCdf(spec.nRepos, spec.zipfExponent)
          val per = math.max(1L, spec.nEvents / epochs)
          val top = spec.nEvents - 1
          (0 until epochs).map { e =>
            val lo = math.min(e * per - 1, top)
            val hi = if (e == epochs - 1) top
                     else math.min((e + 1) * per - 1, top)
            (e.toLong,
              spark.range(lo + 1, hi + 1)
                .map(s => ChangeLogGen.eventAt(spec, cdf, s)),
              Some((lo, hi)))
          }.filter { case (_, _, Some((lo, hi))) => lo < hi; case _ => true }
        case "parquet" =>
          val dir = (j \ "source" \ "dir").extract[String]
          val log = spark.read.parquet(dir).as[ChangeEvent]
          val b = log.agg(org.apache.spark.sql.functions.min($"seq"),
            org.apache.spark.sql.functions.max($"seq")).head()
          val (lo0, hi0) = (b.getLong(0), b.getLong(1))
          val per = math.max(1L, (hi0 - lo0 + 1) / epochs)
          (0 until epochs).map { e =>
            val lo = lo0 + e * per - 1
            val hi = if (e == epochs - 1) hi0 else lo0 + (e + 1) * per - 1
            // segment claims: only runs the slice actually observed
            (e.toLong, log.filter($"seq" > lo && $"seq" <= hi), None)
          }
        case other => throw new IllegalArgumentException(
          s"unknown source kind '$other' (generator|parquet)")
      }

    val reports = slices.map { case (epochId, events, claim) =>
      val prev = MergeEngine.committedHighs(table.currentManifest())
      val out = MergeEngine.applyEpoch(spark, table, events, epochId, nLog,
        quarantineDir = quarantine, pipeline = pipeline,
        rowPolicies = policies, claimedRange = claim)
      if (!out.skipped)
        MergeEngine.writeLineage(spark, stateDir, epochId, prev,
          out.manifest.offsets, out.stats)
      ReplayJob.EpochReport(epochId,
        claim.map(_._1).getOrElse(-1L), claim.map(_._2).getOrElse(-1L),
        out.skipped, out.stats)
    }

    // publish-time catalog registration (HiveRegistrationPublisher analog)
    (j \ "catalog") match {
      case JNothing | JNull => ()
      case c =>
        GraftCatalog.create((c \ "dir").extract[String])
          .register((c \ "name").extractOrElse[String](name), table.dir,
            numBuckets)
        ()
    }
    Report(name, reports, table.read(spark).count(), table.currentVersion())
  }

  private def transform(t: JValue)(implicit fmt: Formats): Transform.T =
    (t \ "name").extract[String] match {
      case "project" =>
        Transform.project((t \ "fields").extract[Seq[String]]: _*)
      case "drop" =>
        Transform.dropFields((t \ "fields").extract[Seq[String]]: _*)
      case "filterBy" =>
        Transform.filterBy((t \ "field").extract[String],
          (t \ "value").extract[String])
      case "regexFilter" =>
        Transform.regexFilter((t \ "field").extract[String],
          (t \ "pattern").extract[String],
          (t \ "keepMatches").extractOrElse[Boolean](true))
      case "sample" =>
        Transform.sample((t \ "keyField").extract[String],
          (t \ "fraction").extract[Double],
          (t \ "salt").extractOrElse[Long](0L))
      case "markDeletes" =>
        Transform.markDeletes(
          org.apache.spark.sql.functions.expr((t \ "condition").extract[String]))
      case "withCasts" =>
        Transform.withCasts((t \ "casts").extract[Map[String, String]]
          .toSeq: _*)
      case other => throw new IllegalArgumentException(
        s"unknown transform '$other' (project|drop|filterBy|regexFilter|" +
          "sample|markDeletes|withCasts)")
    }
}
