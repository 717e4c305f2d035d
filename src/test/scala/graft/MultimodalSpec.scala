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

  test("real PNG assets resize through javax.imageio to actual pixel boxes") {
    import spark.implicits._
    // render real PNGs of known sizes — (800, 600) must scale to fit
    // (320, 240); (100, 80) is inside the box and keeps its size
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(java.awt.Color.ORANGE); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val real = Seq(
      Multimodal.Asset(1L, "c1", "mem://a/1", "image", png(800, 600)),
      Multimodal.Asset(2L, "c1", "mem://a/2", "image", png(100, 80))).toDS()
    val out = Multimodal.resizeImages(real, maxW = 320, maxH = 240)
      .select("asset_id", "out_w", "out_h", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 320 && out(1L).getInt(2) == 240)
    assert(out(2L).getInt(1) == 100 && out(2L).getInt(2) == 80)
    // re-encoded bytes are REAL images: decode and check pixel dims
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).getAs[Array[Byte]](3)))
    assert(dec.getWidth == 320 && dec.getHeight == 240)
  }

  test("frame sampling yields stride-spaced frames per video asset") {
    val frames = Multimodal.sampleFrames(assets, stride = 2)
    assert(frames.count() > 0)
    val perAsset = frames.groupByKey(_.asset_id).count().collect().toMap
    assert(perAsset.values.forall(n => n >= 1 && n <= 2)) // ≤4 frames, stride 2
    assert(frames.filter(_.frame_no % 2 != 0).count() == 0)
  }
}
