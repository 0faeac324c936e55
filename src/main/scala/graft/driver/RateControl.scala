package graft.driver

/**
 * Produce-rate tracking + rate-aware epoch admission + ingestion health —
 * the operational control loop the reference runs around its Kafka path:
 *
 *  - [[ProduceRateTracker]]: per-partition EWMA of observed events/sec
 *    (KafkaProduceRateTracker, gobblin-modules/gobblin-kafka-common/.../
 *    kafka/KafkaProduceRateTracker.java — hour-of-day produce-rate estimates
 *    feeding the packer; here a simple EWMA per log partition).
 *  - [[RateControl.planEpochsByBudget]]: slice a seq range so each epoch's
 *    expected wall time fits a budget — the `containerCapacity`-style
 *    capacity planning of KafkaTopicGroupingWorkUnitPacker.java:79-89 turned
 *    into epoch admission (epochs ≈ flush intervals, so the budget is the
 *    flush interval).
 *  - [[IngestionHealthCheck]]: sliding-window health evaluation
 *    (KafkaIngestionHealthCheck.java — unhealthy when consumption falls
 *    behind production or lag keeps increasing), evaluated from the per-
 *    epoch metrics rows ReplayJob writes.
 */
object RateControl {

  /** EWMA events/sec per partition; `update` after each committed epoch. */
  final class ProduceRateTracker(alpha: Double = 0.3) {
    require(alpha > 0 && alpha <= 1)
    private var rates: Map[Int, Double] = Map.empty

    def update(partitionId: Int, events: Long, secs: Double): Unit = {
      if (secs <= 0) return
      val obs = events / secs
      rates = rates.updated(partitionId,
        rates.get(partitionId).fold(obs)(prev => alpha * obs + (1 - alpha) * prev))
    }

    def rate(partitionId: Int): Double = rates.getOrElse(partitionId, 0.0)
    def totalRate: Double = rates.values.sum
    def observedPartitions: Set[Int] = rates.keySet
  }

  /** Slice `(loSeq, hiSeq]` into epochs sized so that, at `eventsPerSec`,
    * each epoch's expected duration ≈ `targetSecsPerEpoch` (min 1 event).
    * Falls back to one epoch when no rate is known yet. */
  def planEpochsByBudget(loSeq: Long, hiSeq: Long,
                         targetSecsPerEpoch: Double,
                         eventsPerSec: Double): Seq[(Long, Long, Long)] = {
    require(targetSecsPerEpoch > 0)
    val n = hiSeq - loSeq
    if (n <= 0) return Seq.empty
    val per =
      if (eventsPerSec <= 0) n
      else math.max(1L, (eventsPerSec * targetSecsPerEpoch).toLong)
    ReplayJob.planEpochs(loSeq, hiSeq, per)
  }

  /** One epoch's health inputs — the columns of ReplayJob's metrics rows. */
  final case class EpochHealth(
      epochId: Long,
      eventsPerSec: Double,
      watermarkLagSpread: Long,
      quarantineRate: Double)

  final case class HealthReport(healthy: Boolean, reasons: Seq[String])

  /**
   * Sliding-window health check (KafkaIngestionHealthCheck semantics):
   * unhealthy when, over the last `window` epochs,
   *  - consumption rate stayed below the produce rate (growing backlog), or
   *  - the watermark-lag spread increased monotonically (a partition is
   *    falling behind its peers), or
   *  - the quarantine rate exceeded `maxQuarantineRate` every epoch.
   * Fewer than `window` observations ⇒ healthy (not enough signal).
   */
  def check(history: Seq[EpochHealth], produceRate: Double,
            window: Int = 3,
            maxQuarantineRate: Double = 0.05): HealthReport = {
    // window <= 0 would skip the not-enough-signal guard and make every
    // forall vacuously true over an empty slice: unhealthy from zero data
    require(window > 0, s"health window must be positive, got $window")
    if (history.size < window) return HealthReport(healthy = true, Nil)
    val recent = history.sortBy(_.epochId).takeRight(window)
    val reasons = Seq.newBuilder[String]
    if (produceRate > 0 && recent.forall(_.eventsPerSec < produceRate))
      reasons += f"consumption below produce rate $produceRate%.0f ev/s " +
        f"for $window%d epochs (backlog growing)"
    if (recent.sliding(2).forall {
        case Seq(a, b) => b.watermarkLagSpread > a.watermarkLagSpread
        case _ => false
      })
      reasons += s"watermark lag spread increasing across $window epochs"
    if (recent.forall(_.quarantineRate > maxQuarantineRate))
      reasons += f"quarantine rate above $maxQuarantineRate%.2f " +
        f"for $window%d epochs"
    val rs = reasons.result()
    HealthReport(rs.isEmpty, rs)
  }
}
