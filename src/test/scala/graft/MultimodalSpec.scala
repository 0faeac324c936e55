package graft

import graft.multimodal.MultimodalPipeline
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload pipeline: schema, batching, deterministic features") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = MultimodalPipeline.fromText(spark, docs, "doc_id", "text")
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)

    val feats = MultimodalPipeline.pipeline(media.toDF(), rowsPerTask = 100)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(rows.forall(_.getAs[Seq[Float]]("features").length ==
      MultimodalPipeline.FeatureDim))
    // features are a normalized histogram: sums to ~1
    val s = rows.head.getAs[Seq[Float]]("features").sum
    assert(math.abs(s - 1.0f) < 1e-3)

    // deterministic across partitionings (batch boundaries must not matter)
    val feats2 = MultimodalPipeline.pipeline(
      media.toDF().repartition(7), rowsPerTask = 13)
    val a = feats.select("id", "features").as[(Long, Seq[Float])]
      .collect().toMap
    val b = feats2.select("id", "features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(a == b)
  }

  test("empty / null payloads are flagged, not crashed") {
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, "image", Array[Byte](1, 2, 3), 8, 8),
      MultimodalPipeline.MediaRow(2L, "image", Array.empty[Byte], 8, 8),
      MultimodalPipeline.MediaRow(3L, "audio", null, 0, 0)).toDS()
    val out = MultimodalPipeline.extractFeatures(media)
      .collect().map(f => f.id -> f.ok).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }
}
