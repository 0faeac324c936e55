package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for a training-data pipeline: image/audio/video
 * payloads ride as opaque `binary` columns with typed metadata; decode /
 * feature-extraction runs as a BATCHED per-partition stage so a real decoder
 * (JNI image lib, ONNX runtime, ffmpeg) amortizes per-batch setup.
 *
 * The decode step itself is STUBBED with a deterministic fake (no image/
 * audio libraries exist in this container — marked clearly below); the
 * Spark-side contract is real and tested: schema, binary transport,
 * partition sizing, batch shape, and the feature output layout are exactly
 * what a production decoder would plug into. This is the Scala/Dataset
 * equivalent of a Pandas-UDF `mapInPandas` decode stage.
 */
object MultimodalPipeline {

  /** input: opaque payload + typed metadata */
  final case class MediaRow(
      id: Long,
      mediaType: String,        // "image" | "audio" | "video"
      payload: Array[Byte],     // opaque encoded bytes
      width: Int, height: Int)  // example typed metadata

  /** output: fixed-size feature vector + decode diagnostics */
  final case class MediaFeatures(
      id: Long,
      mediaType: String,
      nBytes: Int,
      ok: Boolean,
      features: Array[Float])   // FEATURE_DIM floats

  val FeatureDim = 16
  val DecodeBatchSize = 64

  /**
   * ==== STUB DECODER ====
   * Deterministic fake standing in for the real image/audio decode +
   * feature extraction (`???` in spirit): features are a folded histogram
   * of payload bytes, normalized. Replace `decodeBatch` with the real
   * library call; everything around it (batching, schema, partitioning)
   * is production-shaped and unit-tested.
   */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      if (r.payload == null || r.payload.isEmpty)
        MediaFeatures(r.id, r.mediaType, 0, ok = false,
          Array.fill(FeatureDim)(0f))
      else {
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xff) % FeatureDim) += 1f
          i += 1
        }
        val n = r.payload.length.toFloat
        MediaFeatures(r.id, r.mediaType, r.payload.length, ok = true,
          hist.map(_ / n))
      }
    }

  /** the mapInPandas-equivalent stage: per-partition batched decode. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decodeBatch(batch.toSeq))
    }
  }

  /** end-to-end: a DataFrame with a binary column → features DataFrame,
    * with partition sizing for decoder parallelism (decode is CPU-heavy;
    * repartition so each task holds ~`rowsPerTask` payloads). */
  def pipeline(df: DataFrame, rowsPerTask: Int = 4096): DataFrame = {
    import df.sparkSession.implicits._
    if (df.isStreaming) return extractFeatures(df.as[MediaRow]).toDF()
    // the sizing count would otherwise recompute the (possibly expensive)
    // upstream plan a second time for the decode pass — localCheckpoint
    // materializes it once (blocks are GC-cleaned when unreferenced)
    val mat = df.localCheckpoint(true)
    // ceil division: floor would let a task hold up to ~2x rowsPerTask
    // payloads just below the boundary, halving decoder parallelism
    val n = math.max(1L,
      (mat.count() + rowsPerTask - 1) / rowsPerTask).toInt
    extractFeatures(mat.repartition(n).as[MediaRow]).toDF()
  }

  /** build MediaRow inputs from any table with a string payload (testing:
    * documents.text as fake encoded bytes). */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String,
               textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("mediaType"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(64).as("width"), lit(64).as("height"))
      .as[MediaRow]
  }
}
