package graft.metrics

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/**
 * Pluggable metrics/event emission — the engine's analog of the reference's
 * gobblin-metrics: `GobblinTrackingEvent` (a named event + namespace +
 * string metadata, gobblin-metrics-libs/gobblin-metrics-base/.../event/
 * GobblinTrackingEvent.avsc) fanned out to pluggable reporters
 * (gobblin-metrics-libs/.../kafka/, .../graphite/ — Kafka/Graphite/console
 * reporters; gobblin-docs/metrics/).
 *
 * Events here are DRIVER-side lifecycle facts (epoch committed, compaction
 * ran, snapshot expired): counters are already aggregated by the engine's
 * Observation-based accounting, so emission is a handful of tiny records
 * per epoch — never a per-row path. Reporter design rules:
 *
 *  - emission must never break ingest: a throwing reporter is caught,
 *    logged, and the commit proceeds (metrics are observability, not
 *    correctness — the counters of record live in the MANIFEST, which is
 *    the reconciliation-gated source of truth);
 *  - zero registered reporters = zero cost (no event objects built);
 *  - reporters receive events AFTER the fact they describe is durable
 *    (post-commit), so an external consumer can never observe an event for
 *    a snapshot that does not exist.
 *
 * In-sandbox reporters: JSON-lines file (durable, any Hadoop scheme — the
 * external-system integration point: a log shipper / Kafka Connect file
 * source picks the lines up) and console. Kafka/Graphite network reporters
 * are the same `MetricsReporter` interface; no such endpoint exists in this
 * environment.
 */
object Metrics {

  /** One tracking event: name + namespace + flat string metadata (the
    * GobblinTrackingEvent shape). `timestampMillis` is stamped at emit. */
  final case class MetricEvent(
      namespace: String, name: String, timestampMillis: Long,
      metadata: Map[String, String])

  trait MetricsReporter extends AutoCloseable {
    def report(e: MetricEvent): Unit
    override def close(): Unit = ()
  }

  @volatile private var reporters: List[MetricsReporter] = Nil

  def addReporter(r: MetricsReporter): Unit =
    synchronized { reporters = r :: reporters }

  /** remove + close every reporter (tests; shutdown) */
  def clearReporters(): Unit = synchronized {
    reporters.foreach(r =>
      try r.close()
      catch { case e: Exception =>
        System.err.println(s"[graft] metrics reporter close failed: $e") })
    reporters = Nil
  }

  /** Emit to every registered reporter; reporter failures are logged and
    * swallowed — observability must never fail the pipeline. `metadata` is
    * by-name so a no-reporter emit builds nothing. */
  def emit(namespace: String, name: String,
           metadata: => Map[String, String]): Unit = {
    val rs = reporters
    if (rs.nonEmpty) {
      val e = MetricEvent(namespace, name, System.currentTimeMillis(), metadata)
      rs.foreach { r =>
        try r.report(e)
        catch { case ex: Exception =>
          System.err.println(s"[graft] metrics reporter failed on " +
            s"$namespace/$name: $ex (event dropped by this reporter only)")
        }
      }
    }
  }

  /** Console reporter (the reference's OutputStreamReporter analog). */
  final class ConsoleReporter extends MetricsReporter {
    def report(e: MetricEvent): Unit =
      println(s"[graft-metrics] ${e.timestampMillis} ${e.namespace}/" +
        s"${e.name} ${e.metadata.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")}")
  }

  /** JSON-lines file reporter: appends one json object per event to
    * `<dir>/events-<startMillis>.jsonl` through Hadoop FileSystem (any
    * scheme). One file per reporter lifetime — append-only, so a tailing
    * consumer sees complete lines. `hflush` per event makes lines visible
    * to readers on stores that support it (HDFS); the local
    * ChecksumFileSystem buffers until close(), so on `file://` the lines
    * are guaranteed on disk only after `clearReporters()`/`close()`. */
  final class JsonLinesFileReporter(dir: String, conf: Configuration)
      extends MetricsReporter {
    private val root = new HPath(dir)
    private val fs: FileSystem = root.getFileSystem(conf)
    fs.mkdirs(root)
    private val path =
      new HPath(root, s"events-${System.currentTimeMillis()}.jsonl")
    private val out = fs.create(path, false)

    private def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    def report(e: MetricEvent): Unit = synchronized {
      val md = e.metadata.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
        .mkString("{", ",", "}")
      val line = s"""{"namespace":"${esc(e.namespace)}","name":"${esc(
        e.name)}","timestamp":${e.timestampMillis},"metadata":$md}""" + "\n"
      out.write(line.getBytes("UTF-8"))
      out.hflush()
    }

    override def close(): Unit = synchronized { out.close() }
  }
}
