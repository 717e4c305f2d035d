package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling — the engine-side
  * plumbing for the reference's binary pipelines (ETL_IMAGES WebP
  * re-encode + vision tagging, image_base_provider.py:39-109,
  * image_ai_tagger.py:72-174; ETL_DOCS OCR, processor.py:33-110).
  *
  * Design for 100 TB of binaries:
  *  - assets ride as opaque BINARY columns + typed metadata struct;
  *    content identity = sha2(content) so every downstream step is
  *    idempotent and dedupable (the reference's hashed object-store
  *    layout, image_base_provider.py:82);
  *  - partition by client_id (every reference query filters on it);
  *  - per-record decode/feature-extraction runs via `mapPartitions`
  *    so codec state is initialized once per partition, not per row;
  *  - the actual codec calls are STUBBED behind [[MediaCodec]]
  *    (deterministic fakes — no image/audio libraries in this
  *    environment); the Spark-side schema, batching, and partitioning
  *    are real and tested.
  */
object Multimodal {

  case class Asset(asset_id: Long, client_id: String, uri: String,
                   media_type: String, content: Array[Byte])

  case class DecodedMeta(asset_id: Long, client_id: String, media_type: String,
                         byte_size: Int, width: Int, height: Int,
                         n_frames: Int, format: String)

  /** STUB codec — deterministic functions of the bytes standing in for
    * libjpeg/ffmpeg/etc. Replace `decodeDims`/`embed` with real codec
    * calls in production; signatures and batching stay identical. */
  object MediaCodec {
    def decodeDims(content: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(content)
      val w = 160 + math.abs(h % 8) * 80
      val ht = 120 + math.abs((h / 8) % 8) * 60
      val frames = 1 + math.abs((h / 64) % 4)
      (w, ht, frames)
    }
    def sniffFormat(mediaType: String): String = mediaType match {
      case "image" => "webp"
      case "audio" => "pcm16"
      case "video" => "h264"
      case _       => "bin"
    }
    /** Deterministic fixed-dim embedding of content bytes (stand-in
      * for a vision/audio encoder). */
    def embed(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < content.length) {
        out(i % dim) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** REAL image resize via the JDK's javax.imageio (no external
      * deps): decode → scale into the (maxW, maxH) box preserving
      * aspect → re-encode PNG (the JDK ships no WebP writer; the
      * reference's WebP q80 re-encode maps to this call with the codec
      * swapped, image_base_provider.py:70-109). Returns None when the
      * bytes aren't a decodable image — callers fall back to the
      * deterministic stub so synthetic test assets keep working. */
    def resizeEncode(content: Array[Byte], maxW: Int, maxH: Int): Option[(Int, Int, Array[Byte])] = {
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
        catch {
          // ImageIO plugins throw RuntimeExceptions (IAE, CMMException,
          // IndexOutOfBounds…) on malformed input, not just IOException
          case scala.util.control.NonFatal(_) => None
        }
      img.map { src =>
        val scale = math.min(1.0,
          math.min(maxW.toDouble / src.getWidth, maxH.toDouble / src.getHeight))
        val w = math.max(1, (src.getWidth * scale).toInt)
        val h = math.max(1, (src.getHeight * scale).toInt)
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        (w, h, bos.toByteArray)
      }
    }
  }

  /** Content addressing + byte stats as pure column exprs (codegen'd —
    * no stub involved, this part is production-real). */
  def withContentStats(assets: DataFrame): DataFrame =
    assets
      .withColumn("content_hash", sha2(col("content"), 256))
      .withColumn("byte_size", length(col("content")))

  /** Decode/metadata extraction: one codec init per partition, typed
    * output — the frame every real decode UDF fits into. */
  def decodeMeta(assets: Dataset[Asset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // codec/session initialization would happen HERE, once per task
      it.map { a =>
        val (w, h, f) = MediaCodec.decodeDims(a.content)
        DecodedMeta(a.asset_id, a.client_id, a.media_type,
          a.content.length, w, h,
          if (a.media_type == "video") f else 1,
          MediaCodec.sniffFormat(a.media_type))
      }
    }
  }

  /** Feature extraction to an embedding column (batched per
    * partition; mirrors F19's batched LLM calls without the network). */
  def extractEmbeddings(assets: Dataset[Asset], dim: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map(a => (a.asset_id, a.client_id, MediaCodec.embed(a.content, dim)))
    }.toDF("asset_id", "client_id", "embedding")
  }

  case class Frame(asset_id: Long, client_id: String, frame_no: Int,
                   frame_bytes: Array[Byte])

  /** Resize/re-encode (the WebP q80 re-encode,
    * image_base_provider.py:70-109). Decodable images go through the
    * REAL javax.imageio scale+re-encode; non-image bytes (the
    * synthetic text-backed test assets) fall back to the deterministic
    * stub so the pipeline shape stays testable without codecs. Output
    * schema carries the target box + new content hash. */
  def resizeImages(assets: Dataset[Asset], maxW: Int, maxH: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "image").mapPartitions { it =>
      it.map { a =>
        MediaCodec.resizeEncode(a.content, maxW, maxH) match {
          case Some((w, h, bytes)) =>
            (a.asset_id, a.client_id, w, h, bytes)
          case None =>
            val (w, h, _) = MediaCodec.decodeDims(a.content)
            val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
            val outW = math.max(1, (w * scale).toInt)
            val outH = math.max(1, (h * scale).toInt)
            // STUB encoder: deterministic size reduction ∝ area
            val outLen = math.max(1,
              (a.content.length.toDouble * (outW.toLong * outH) / (w.toLong * h)).toInt)
            (a.asset_id, a.client_id, outW, outH, a.content.take(outLen))
        }
      }
    }.toDF("asset_id", "client_id", "out_w", "out_h", "content")
      .withColumn("content_hash", org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.col("content"), 256))
  }

  /** Frame sampling for video assets: every `stride`-th frame becomes
    * a row (decode STUBBED as fixed-size byte slices; the explode-to-
    * rows shape is what a real ffmpeg-backed extractor produces). */
  def sampleFrames(assets: Dataset[Asset], stride: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val (_, _, nFrames) = MediaCodec.decodeDims(a.content)
      val chunk = math.max(1, a.content.length / math.max(1, nFrames))
      (0 until nFrames by stride).map { f =>
        Frame(a.asset_id, a.client_id, f,
          a.content.slice(f * chunk, math.min((f + 1) * chunk, a.content.length)))
      }
    }
  }

  /** Deterministic object-store pathing (K5): the reference's
    * images/{client}/properties/{prop}/{sha}.webp layout as an expr. */
  def storagePath(clientId: org.apache.spark.sql.Column,
                  propertyId: org.apache.spark.sql.Column,
                  contentHash: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws("/", lit("images"), clientId, lit("properties"), propertyId,
      concat(contentHash, lit(".webp")))

  /** Build a synthetic asset table from the documents test table
    * (bytes = utf8 text) — used by tests and the bench harness. */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.util.Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("asset_id"),
        concat(lit("client_"), (col("doc_id") % 5).cast(StringType)).as("client_id"),
        concat(lit("mem://doc/"), col("doc_id")).as("uri"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("media_type"),
        encode(col("text"), "UTF-8").as("content"))
      .as[Asset]
  }
}
