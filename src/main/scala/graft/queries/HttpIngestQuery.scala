package graft.queries

import graft.operators.{CdcDelta, ExternalFetch}
import graft.util.FixtureHttpApi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q199_http_ingest — the S2/S3 HTTP ingest pipeline end-to-end over a
  * REAL loopback HTTP transport (reference:
  * src/ETL_PROPERTIES/providers/realhomes_provider.py:21-67 paging +
  * `_fields` projection; providers/base_provider.py:111-174
  * modified_gmt delta skip; per-record detail fetch with fault
  * isolation). Chain: paginateAll (S2, sequential page walk inside the
  * task) → CdcDelta 60 s-tolerance skip (J5/F11) → fetchPartitioned
  * (S3, rate-limited, retries, error rows). The fixture server and the
  * independently generated oracle parquet
  * (scripts/make_http_fixture.py) pin paging, projection, skip,
  * 429-retry, and 500-isolation semantics in one CORRECTNESS row.
  *
  * Scale posture: cursors (sites/shards) parallelize across tasks;
  * page walks are per-cursor iterators (never a driver loop); the
  * known-state join broadcasts a two-column registry; detail fetches
  * are rate-limited PER PARTITION so `repartition(n)` sizes the global
  * request budget. Nothing here collects to the driver.
  */
object HttpIngestQuery {

  final case class Link(wp_id: Long, slug: String, action: String)

  private val itemsSchema = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("link", StringType),
    StructField("slug", StringType), StructField("modified_gmt", StringType))))

  def run(s: SparkSession): DataFrame = FixtureHttpApi.withServer { base =>
    import s.implicits._
    // S2: one cursor per site; the walk asks for exactly the fields
    // the reference projects. Materialize the listing ONCE (the
    // production contract: one listing pass feeds both the skip
    // decision and the fetch set — never re-walk the API).
    val cursors = s.createDataset(Seq("site-a"))
    val links = ExternalFetch.paginateAll[String](cursors,
        (_, page) => FixtureHttpApi.get(
          s"$base/wp-json/props?page=$page&per_page=20&_fields=id,link,slug,modified_gmt"),
        isLast = p => p.contains("\"last\":true"),
        ratePerSec = 1e6, sleeper = _ => ())
      .toDF()
      .select(explode(from_json(get_json_object(col("payload"), "$.items"),
        itemsSchema)).as("it"))
      .select(col("it.id").as("wp_id"), col("it.slug").as("slug"),
        // local-clock timestamps on BOTH compare sides (here and in
        // `known` below) so the 60 s tolerance is session-TZ-invariant
        to_timestamp(translate(col("it.modified_gmt"), "T", " "))
          .as("modified_ts"))
      .localCheckpoint(true)
    // The known registry a production sync reads back from its status
    // store: ids ≡0 (mod 3) were synced 30 s after the source edit
    // (inside the 60 s tolerance ⇒ skipped), ids ≡1 are 300 s stale
    // (⇒ updated), ids ≡2 are unknown (⇒ new).
    val known = s.range(1001, 1051).filter(col("id") % 3 < 2)
      .withColumn("delta", ((col("id") - 1000) * 60 +
        when(col("id") % 3 === 0, 30).otherwise(-300)).cast(IntegerType))
      .select(col("id").as("wp_id"),
        expr("timestampadd(SECOND, delta, TIMESTAMP '2026-01-01 00:00:00')")
          .as("last_updated"))
    val delta = CdcDelta(links, known, Seq("wp_id"),
      "modified_ts", "last_updated", 60L)
    // S3: per-record detail fetch over the surviving set; a dead
    // record becomes an error row (1013's permanent 500), a transient
    // 429 retries with backoff (1022 ⇒ attempts = 2).
    val toFetch = delta.select(col("wp_id"), col("slug"),
      col("change_type").as("action")).as[Link]
    val fetched = ExternalFetch.fetchPartitioned[Link](toFetch,
        l => FixtureHttpApi.get(s"$base/detail?slug=${l.slug}"),
        ratePerSec = 1e6, sleeper = _ => ())
      .toDF()
      .select(col("input.wp_id").as("wp_id"), col("input.slug").as("slug"),
        col("input.action").as("action"),
        get_json_object(col("output"), "$.price").cast(LongType).as("price"),
        get_json_object(col("output"), "$.bedrooms").cast(LongType)
          .as("bedrooms"),
        col("attempts").cast(IntegerType).as("attempts"), col("error"))
    val skipped = links.join(delta.select("wp_id"), Seq("wp_id"), "left_anti")
      .select(col("wp_id"), col("slug"), lit("skipped").as("action"),
        lit(null).cast(LongType).as("price"),
        lit(null).cast(LongType).as("bedrooms"),
        lit(0).cast(IntegerType).as("attempts"),
        lit(null).cast(StringType).as("error"))
    // materialize while the loopback endpoint is live; the final sort
    // reads the checkpointed blocks after the server is gone
    fetched.unionByName(skipped).localCheckpoint(true).orderBy(col("wp_id"))
  }
}
