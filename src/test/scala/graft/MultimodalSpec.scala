package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.syntheticAssets(spark, sf001)

  test("content stats + storage path are deterministic and hash-addressed") {
    val stats = Multimodal.withContentStats(assets.toDF())
    val r = stats.orderBy("asset_id").head()
    assert(r.getAs[String]("content_hash").length == 64)
    assert(r.getAs[Int]("byte_size") > 0)
  }

  test("resize bounds dimensions and re-hashes content") {
    val resized = Multimodal.resizeImages(assets, maxW = 320, maxH = 240)
    assert(resized.count() > 0)
    assert(resized.filter(col("out_w") > 320 || col("out_h") > 240).count() == 0)
    // scaled-down images must carry a different content hash than the original
    val joined = resized.join(
      Multimodal.withContentStats(assets.toDF())
        .select(col("asset_id"), col("content_hash").as("orig_hash"),
          col("byte_size").as("orig_size")),
      "asset_id")
    assert(joined.filter(col("content_hash") =!= col("orig_hash"))
      .count() == joined.filter(col("orig_size") > length(col("content"))).count())
  }

  test("frame sampling yields stride-spaced frames per video asset") {
    val frames = Multimodal.sampleFrames(assets, stride = 2)
    assert(frames.count() > 0)
    val perAsset = frames.groupByKey(_.asset_id).count().collect().toMap
    assert(perAsset.values.forall(n => n >= 1 && n <= 2)) // ≤4 frames, stride 2
    assert(frames.filter(_.frame_no % 2 != 0).count() == 0)
  }
}
