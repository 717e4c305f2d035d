package graft

import graft.pipelines.{PoiEnrich, PropertyIngest}
import graft.streaming.StatusMachine
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val envelope =
    """{"metadata":{"site":"s1","client_id":"c1","total_count":3,"timestamp":"t"},
      |"properties":[
      | {"external_id":"p1","title":"Casa linda","price":"1,200.50","currency":"USD",
      |  "sqm":"120","status":"publish","modified_gmt":"2024-01-02T10:00:00",
      |  "location":{"lat":"9.9","lng":"-84.1","address":"x"},
      |  "features":{"bedrooms":"3","bathrooms":"2.5"},"images":[]},
      | {"external_id":"p2","title":"Lote grande","price":"5000000","currency":"USD",
      |  "sqm":"800","status":"publish","modified_gmt":"2024-01-02T11:00:00",
      |  "location":{"lat":"0","lng":"0","address":"y"},
      |  "features":{},"images":[]},
      | {"external_id":"p3","title":"Draft","price":"1","currency":"USD",
      |  "sqm":"1","status":"draft","modified_gmt":"2024-01-02T12:00:00",
      |  "location":{"lat":"1","lng":"2","address":"z"},
      |  "features":{},"images":[]}]}""".stripMargin.replace("\n", "")

  test("property ingest: explode → clean → hash → merge end to end") {
    val raw = Seq(envelope).toDF("value")
    val cleaned = PropertyIngest.cleanAndHash(PropertyIngest.explodeEnvelopes(raw))
    val rows = cleaned.orderBy("external_prop_id").collect()
    assert(rows.length == 2) // draft filtered out
    val p1 = rows(0)
    assert(p1.getAs[Double]("price") == 1200.5)
    assert(p1.getAs[String]("currency_id") == "USD")
    assert(p1.getAs[Long]("bedrooms") == 3L)
    assert(p1.getAs[Int]("property_type_id") == 1)
    val p2 = rows(1)
    assert(p2.getAs[String]("currency_id") == "CRC")   // >1e6 heuristic
    assert(p2.isNullAt(p2.fieldIndex("location_lat"))) // "0" sentinel
    assert(p2.getAs[Int]("property_type_id") == 3)     // 'lote'

    // merge against a target where p1 exists unchanged-hash and a p0
    // exists only in the target → keep + soft delete + insert
    val target = cleaned.filter(col("external_prop_id") === "p1")
      .withColumn("updated_at", col("modified_gmt")).drop("modified_gmt")
      .unionByName(cleaned.filter(col("external_prop_id") === "p1")
        .withColumn("external_prop_id", lit("p0"))
        .withColumn("updated_at", col("modified_gmt")).drop("modified_gmt"))
    val merged = PropertyIngest.ingest(cleaned, target)
    val actions = merged.select("external_prop_id", "merge_action")
      .as[(String, String)].collect().toMap
    assert(actions("p0") == "delete" && actions("p1") == "keep" && actions("p2") == "insert")
    assert(merged.filter(col("external_prop_id") === "p0" && col("status") === "deleted")
      .count() == 1)
  }

  test("poi enrich: classify → score → unify → radius join → package") {
    val pois = Seq(
      (1L, "Escuela Central", null.asInstanceOf[String], 9.9001, -84.1001,
        Map("amenity" -> "school", "phone" -> "123")),
      (2L, "Escuela Central Anexo", null.asInstanceOf[String], 9.90012, -84.10012,
        Map("amenity" -> "school")), // ~3 m from 1 → unified away
      (3L, "Super Economico", "MegaSuper", 9.9050, -84.1050,
        Map("shop" -> "supermarket", "website" -> "w")),
      (4L, "cantina prohibida", null.asInstanceOf[String], 9.9002, -84.1002,
        Map[String, String]())  // vetoed
    ).toDF("osm_id", "name", "brand", "lat", "lon", "tags")
    val classified = PoiEnrich.classify(pois,
      keywordToCat = Map("escuela" -> "Education", "super" -> "Convenience"),
      tagToCat = Map("amenity" -> "Education", "shop" -> "Convenience"),
      vetoWords = Seq("cantina"))
    val scored = PoiEnrich.qualityScore(classified, idealBrands = Seq("MegaSuper"))
    val unified = PoiEnrich.unifyAndHash(scored)
    assert(unified.count() == 2) // veto removed 4; unify merged 1+2
    val winner = unified.filter(col("re_category") === "Education").head()
    assert(winner.getAs[String]("name") == "Escuela Central Anexo") // longest name
    val props = Seq(("prop1", 9.9000, -84.1000)).toDF("property_id", "prop_lat", "prop_lon")
    val enriched = PoiEnrich.enrich(props, unified, radiusKm = 3.0, k = 5,
      anchorBrands = Seq("MegaSuper"), priorityBrands = Nil)
    val row = enriched.head()
    assert(row.getAs[Long]("n_pois") == 2)
    val json = row.getAs[String]("poi_data")
    assert(json.contains("Education") && json.contains("Convenience"))
  }

  test("status machine transitions, batch and streaming agree") {
    import StatusMachine._
    val events = Seq(
      StatusEvent("d1", "start", 1), StatusEvent("d1", "ok", 2),
      StatusEvent("d2", "start", 1), StatusEvent("d2", "fail", 2),
      StatusEvent("d2", "retry", 3),
      StatusEvent("d3", "ok", 1) // illegal from PENDING → ignored
    ).toDS()
    val out = StatusMachine.run(events).collect()
      .map(r => r.content_id -> r.status).toMap
    assert(out == Map("d1" -> "SYNCED", "d2" -> "PENDING", "d3" -> "PENDING"))

    // append-mode transition log: only accepted transitions emitted
    val log = StatusMachine.transitions(events).collect()
      .map(t => (t.content_id, t.from_status, t.to_status)).toSet
    assert(log == Set(
      ("d1", "PENDING", "PROCESSING"), ("d1", "PROCESSING", "SYNCED"),
      ("d2", "PENDING", "PROCESSING"), ("d2", "PROCESSING", "FAILED"),
      ("d2", "FAILED", "PENDING")))
  }

  test("status machine idle TTL registers a timeout and evicts on expiry") {
    import StatusMachine._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val ttl = 60000L
    // live batch: state updated, timeout registered
    val st = TestGroupState.create[StatusRow](
      Optional.empty[StatusRow](), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), false)
    val out = StatusMachine.update(ttl)(
      "d1", Iterator(StatusEvent("d1", "start", 1L)), st)
    assert(out.status == "PROCESSING" && st.get.status == "PROCESSING")
    assert(st.getTimeoutTimestampMs.isPresent &&
      st.getTimeoutTimestampMs.get() == 1000L + ttl)
    // timed-out batch: state removed, final status re-emitted once
    val stTo = TestGroupState.create[StatusRow](
      Optional.of(out), GroupStateTimeout.ProcessingTimeTimeout,
      1000L + ttl + 1, Optional.empty[Long](), true)
    val evicted = StatusMachine.update(ttl)("d1", Iterator.empty, stTo)
    assert(evicted.status == "PROCESSING" && stTo.isRemoved)
  }
}
