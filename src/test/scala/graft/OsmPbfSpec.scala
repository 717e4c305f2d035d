package graft

import graft.sources.OsmPbf
import org.apache.spark.sql.functions._

/** Decodes fixtures/tiny.osm.pbf — hand-encoded at the protobuf wire
  * level by scripts/make_pbf_fixture.py (an INDEPENDENT encoder of the
  * published PBF spec), exercising zlib + raw blobs, dense + plain
  * nodes, delta coding with negative deltas, interleaved keys_vals,
  * non-default granularity and lat/lon offsets, ways and relations. */
class OsmPbfSpec extends SparkSpec {

  private val fixture = "fixtures/tiny.osm.pbf"

  test("block index sees exactly the OSMData blobs") {
    val idx = OsmPbf.blockIndex(spark, fixture)
    assert(idx.size == 2) // header blob excluded
    assert(idx.forall(_.length > 0))
  }

  test("dense nodes decode ids, coords, and interleaved tags exactly") {
    val ds = OsmPbf.read(spark, fixture)
    val nodes = ds.filter(_.layer == "node").collect().sortBy(_.id)
    assert(nodes.map(_.id).toSeq == Seq(10L, 11L, 12L, 77L, 500L))

    val byId = nodes.map(n => n.id -> n).toMap
    // default granularity 100, zero offsets: 1e-9 * 100 * stored
    assert(math.abs(byId(10L).lat.get - 41.4) < 1e-7)
    assert(math.abs(byId(10L).lon.get - 2.1) < 1e-7)
    assert(math.abs(byId(11L).lat.get - -33.45) < 1e-7) // negative delta path
    assert(math.abs(byId(11L).lon.get - -70.66) < 1e-7)
    assert(math.abs(byId(500L).lat.get - 2.5) < 1e-7)
    // interleaved keys_vals: n10 two tags, n12/n500 none, n11 one
    assert(byId(10L).tags == Map("amenity" -> "cafe", "name" -> "Bar Uno"))
    assert(byId(12L).tags.isEmpty && byId(500L).tags.isEmpty)
    assert(byId(11L).tags == Map("amenity" -> "restaurant"))
    // plain node in the raw blob: granularity 1000 + nonzero offsets
    assert(math.abs(byId(77L).lat.get - 10.0) < 1e-7)
    assert(math.abs(byId(77L).lon.get - 20.0) < 1e-7)
    assert(byId(77L).tags == Map("building" -> "yes"))
  }

  test("ways and relations decode refs, members, and roles") {
    val ds = OsmPbf.read(spark, fixture)
    val way = ds.filter(_.layer == "way").collect().head
    assert(way.id == 2001L)
    assert(way.refs == Seq(10L, 12L, 500L)) // delta-decoded
    assert(way.tags == Map("highway" -> "residential"))

    val rel = ds.filter(_.layer == "relation").collect().head
    assert(rel.id == 3001L)
    assert(rel.tags == Map("type" -> "multipolygon"))
    assert(rel.member_ids == Seq(2001L, 2001L)) // delta: 2001, +0
    assert(rel.member_types == Seq("way", "way"))
    assert(rel.member_roles == Seq("outer", "inner"))
  }

  test("DataSource V2 'osmpbf' format equals the RDD path exactly") {
    val v2 = spark.read.format("osmpbf").load(fixture)
    assert(v2.schema == graft.sources.OsmPbfTable.schema)
    // same 7 entities, same values — compare via a stable projection
    // (map column ordering is engine-internal, so compare sorted JSON)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("layer"), col("id"), col("lat"), col("lon"),
        to_json(map_from_entries(array_sort(map_entries(col("tags"))))).as("tags"),
        to_json(col("refs")).as("refs"),
        to_json(col("member_ids")).as("mi"),
        to_json(col("member_types")).as("mt"),
        to_json(col("member_roles")).as("mr"))
      .orderBy(col("layer"), col("id"))
      .collect().toSeq
    assert(canon(v2) == canon(graft.sources.OsmPbf.read(spark, fixture).toDF()))
    // the connector plans real input partitions (scheduler-owned split)
    assert(v2.rdd.getNumPartitions >= 1)
  }

  test("layered scan reproduces the reference's points/multipolygons union") {
    val layered = OsmPbf.layeredScan(spark, fixture)
    val counts = layered.groupBy("layer").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // points = TAGGED nodes only (3 of 5 nodes carry tags)
    assert(counts == Map("points" -> 3L, "multipolygons" -> 1L))
    // the layer column + tags survive for downstream classification
    val cafe = layered.filter(col("tags").getItem("amenity") === "cafe")
    assert(cafe.count() == 1)
  }
}
