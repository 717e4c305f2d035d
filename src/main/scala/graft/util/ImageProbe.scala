package graft.util

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Image-dedup scale probe: replicate the 12-asset lossless-PNG
  * fixture N× with distinct ids (every replica a GENUINE dHash-0
  * duplicate of its source) and time the two stages of
  * [[graft.operators.ImageDedup]] apart —
  *
  *  1. decode + dHash: embarrassingly parallel scan-side work, one
  *     long out per image;
  *  2. the Hamming band join over the PERSISTED fingerprints: with
  *     N replicas each decodable asset forms an N-member identity
  *     group, so every bucket crosses `Dedup.starCappedPairs`' cap
  *     and must degrade to star topology — pair output stays LINEAR
  *     in the corpus (≈ one pair per member) instead of the ~N²
  *     all-pairs an unguarded bucket join would emit.
  *
  * `runMain graft.util.ImageProbe [replicas]` — prints one summary
  * line recorded in SCALING.md (round-9's 5,000× probe was run
  * ad hoc; this main makes the number reproducible).
  */
object ImageProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 5000
    val spark = Tables.session("imageprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val fixture = spark.read
      .parquet(RepoRoot.fixture("image_assets.parquet"))
      .select(col("asset_id").cast("long").as("asset_id"), col("content"))
    val perAsset = fixture.count()
    // distinct ids: fixture ids are < 100
    val assets = fixture
      .crossJoin(spark.range(replicas.toLong).select(col("id").as("rep")))
      .select((col("asset_id") + col("rep") * 100L).as("asset_id"),
        col("content"))
    val fps = graft.operators.ImageDedup
      .withDhash(assets, "asset_id", "content")
      .filter(col("dhash").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    val decoded = fps.count()
    val decodeS = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val pairs = graft.operators.ImageDedup.pairsFromFingerprints(
      fps.select(col("asset_id").as("id"), col("dhash").as("simhash"))).count()
    val pairS = (System.nanoTime() - t1) / 1e9
    println(f"images=${perAsset * replicas} decoded=$decoded " +
      f"decode_s=$decodeS%.1f (${decoded / decodeS}%.0f img/s) " +
      f"pairs=$pairs pair_join_s=$pairS%.1f")
    spark.stop()
  }
}
