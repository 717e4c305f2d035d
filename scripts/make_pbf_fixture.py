#!/usr/bin/env python3
"""Generate fixtures/tiny.osm.pbf — a minimal, spec-conformant OSM PBF
file, hand-encoded at the protobuf WIRE level (no protobuf library) so
the repo's native Scala decoder is tested against an INDEPENDENT
encoding of the published format (wiki.openstreetmap.org/wiki/PBF_Format:
fileformat.proto / osmformat.proto).

Layout exercised on purpose:
- blob 1 (OSMHeader, raw):       required_features incl. DenseNodes
- blob 2 (OSMData, zlib):        DenseNodes with delta-coded ids/coords
                                 (negative deltas included) and
                                 interleaved keys_vals tags; default
                                 granularity (field omitted)
- blob 3 (OSMData, raw):         non-default granularity=1000 +
                                 lat/lon offsets; a PLAIN Node; a Way
                                 with delta-coded refs; a Relation
                                 (type=multipolygon) with way members
                                 and outer/inner roles
- blob 4 (OSMData, zlib):        second DenseNodes batch with a
                                 NEGATIVE id (sint64 zigzag start), a
                                 Way with an id > 2^33 (multi-byte
                                 plain-int64 varint — Way/Relation ids
                                 are int64, Node ids sint64), and TWO
                                 relations (one multipolygon, one
                                 type=route that the layered scan must
                                 exclude)

Besides the .pbf it also writes fixtures/tiny_osm_expected.parquet:
the rows graft's layeredScan must produce (layer, id, lat, lon,
tags_json with sorted keys), so the driver's DuckDB oracle can grade
q96_pbf_scan with a plain SELECT over that parquet. lat/lon are
computed with the same integer->float64 arithmetic the decoder uses
(1e-9 * (offset + granularity * stored)), so equality is exact.

Run: python3 scripts/make_pbf_fixture.py   (writes both fixtures)
"""
import json
import os
import struct
import zlib


def varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag(n):
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def key(field, wire):
    return varint((field << 3) | wire)


def f_varint(field, n):
    return key(field, 0) + varint(n)


def f_bytes(field, b):
    return key(field, 2) + varint(len(b)) + b


def f_packed_svarint(field, ns):  # packed sint64 (zigzag)
    payload = b"".join(varint(zigzag(n)) for n in ns)
    return f_bytes(field, payload)


def f_packed_varint(field, ns):  # packed uint32/int32/enum
    payload = b"".join(varint(n) for n in ns)
    return f_bytes(field, payload)


def deltas(ns):
    prev = 0
    out = []
    for n in ns:
        out.append(n - prev)
        prev = n
    return out


def string_table(strings):
    return b"".join(f_bytes(1, s.encode("utf-8")) for s in strings)


def blob(kind, payload, compress):
    if compress:
        body = f_varint(2, len(payload)) + f_bytes(3, zlib.compress(payload))
    else:
        body = f_bytes(1, payload)
    header = f_bytes(1, kind.encode()) + f_varint(3, len(body))
    return struct.pack(">i", len(header)) + header + body


# --- OSMHeader ---------------------------------------------------------
header_block = (f_bytes(4, b"OsmSchema-V0.6") + f_bytes(4, b"DenseNodes"))

def stored(deg, gran, off=0):
    """lat = 1e-9 * (off + gran * stored)  =>  stored = (deg*1e9 - off)/gran"""
    return round((deg * 1e9 - off) / gran)


def decoded(s, gran, off=0):
    """EXACTLY the decoder's arithmetic: int64 -> float64 then * 1e-9."""
    return 1e-9 * (off + gran * s)


expected = []  # (layer, id, lat, lon, tags) rows layeredScan must emit


def expect_point(nid, lat_stored, lon_stored, gran, lat_off, lon_off, tags):
    expected.append(("points", nid,
                     decoded(lat_stored, gran, lat_off),
                     decoded(lon_stored, gran, lon_off), tags))


# --- OSMData 1: dense nodes, default granularity (100), zlib -----------
# strings: index 0 MUST be the empty delimiter string
st1 = ["", "amenity", "cafe", "name", "Bar Uno", "restaurant"]
node_ids = [10, 12, 11, 500]          # out of order → negative delta
lats = [stored(41.4, 100), stored(41.5, 100),
        stored(-33.45, 100), stored(2.5, 100)]
lons = [stored(2.1, 100), stored(2.2, 100),
        stored(-70.66, 100), stored(9.9, 100)]
# tags: n10 amenity=cafe name="Bar Uno"; n12 none; n11 amenity=restaurant; n500 none
keys_vals = [1, 2, 3, 4, 0,   0,   1, 5, 0,   0]
dense = (f_packed_svarint(1, deltas(node_ids)) +
         f_packed_svarint(8, deltas(lats)) +
         f_packed_svarint(9, deltas(lons)) +
         f_packed_varint(10, keys_vals))
group1 = f_bytes(2, dense)
pblock1 = f_bytes(1, string_table(st1)) + f_bytes(2, group1)
expect_point(10, lats[0], lons[0], 100, 0, 0,
             {"amenity": "cafe", "name": "Bar Uno"})
expect_point(11, lats[2], lons[2], 100, 0, 0, {"amenity": "restaurant"})

# --- OSMData 2: plain node + way + relation, granularity 1000, raw -----
st2 = ["", "highway", "residential", "type", "multipolygon", "outer",
       "inner", "building", "yes"]
GRAN2 = 1000
LAT_OFF2 = 5_000_000_000   # +5 degrees in nanodegrees
LON_OFF2 = -1_000_000_000  # -1 degree
plain_node = (key(1, 0) + varint(zigzag(77)) +        # id (sint64: Node only)
              f_packed_varint(2, [7]) +               # keys: building
              f_packed_varint(3, [8]) +               # vals: yes
              key(8, 0) + varint(zigzag(stored(10.0, GRAN2, LAT_OFF2))) +
              key(9, 0) + varint(zigzag(stored(20.0, GRAN2, LON_OFF2))))
way = (f_varint(1, 2001) +
       f_packed_varint(2, [1]) + f_packed_varint(3, [2]) +  # highway=residential
       f_packed_svarint(8, deltas([10, 12, 500])))          # refs, delta
rel = (f_varint(1, 3001) +
       f_packed_varint(2, [3]) + f_packed_varint(3, [4]) +  # type=multipolygon
       f_packed_varint(8, [5, 6]) +                         # roles: outer, inner
       f_packed_svarint(9, deltas([2001, 2001])) +          # memids, delta (dup ok)
       f_packed_varint(10, [1, 1]))                         # types: WAY, WAY
group2 = f_bytes(1, plain_node) + f_bytes(3, way) + f_bytes(4, rel)
pblock2 = (f_bytes(1, string_table(st2)) + f_bytes(2, group2) +
           f_varint(17, GRAN2) + f_varint(19, LAT_OFF2) +
           key(20, 0) + varint(LON_OFF2 & 0xFFFFFFFFFFFFFFFF))  # int64 two's complement
expect_point(77, stored(10.0, GRAN2, LAT_OFF2), stored(20.0, GRAN2, LON_OFF2),
             GRAN2, LAT_OFF2, LON_OFF2, {"building": "yes"})
expected.append(("multipolygons", 3001, None, None, {"type": "multipolygon"}))

# --- OSMData 3: second dense batch + big-id way + 2 relations, zlib ----
# Exercises: NEGATIVE dense-node id (sint64 zigzag of a negative start
# delta), a Way id above 2^33 (plain int64 varint, 5 encoded bytes —
# would decode wrong if zigzagged), and a relation the layered scan
# must EXCLUDE (type=route).
st3 = ["", "natural", "tree", "shop", "bakery", "type", "multipolygon",
       "route", "hiking", "waterway", "river", "outer"]
ids3 = [-5, 600, 601]
lats3 = [stored(48.85, 100), stored(48.86, 100), stored(48.87, 100)]
lons3 = [stored(2.35, 100), stored(2.36, 100), stored(-122.41, 100)]
# tags: n-5 natural=tree; n600 shop=bakery; n601 none
keys_vals3 = [1, 2, 0,   3, 4, 0,   0]
dense3 = (f_packed_svarint(1, deltas(ids3)) +
          f_packed_svarint(8, deltas(lats3)) +
          f_packed_svarint(9, deltas(lons3)) +
          f_packed_varint(10, keys_vals3))
BIG_WAY = (1 << 33) + 7  # 8589934599: Way.id is int64, NOT zigzag
way3 = (f_varint(1, BIG_WAY) +
        f_packed_varint(2, [9]) + f_packed_varint(3, [10]) +  # waterway=river
        f_packed_svarint(8, deltas([-5, 600, 601])))          # refs incl. negative
rel3a = (f_varint(1, 4001) +
         f_packed_varint(2, [5]) + f_packed_varint(3, [6]) +  # type=multipolygon
         f_packed_varint(8, [11]) +                           # role: outer
         f_packed_svarint(9, deltas([BIG_WAY])) +
         f_packed_varint(10, [1]))                            # type: WAY
rel3b = (f_varint(1, 4002) +
         f_packed_varint(2, [5, 7]) + f_packed_varint(3, [7, 8]))  # type=route route=hiking
group3 = (f_bytes(2, dense3) + f_bytes(3, way3) +
          f_bytes(4, rel3a) + f_bytes(4, rel3b))
pblock3 = f_bytes(1, string_table(st3)) + f_bytes(2, group3)
expect_point(-5, lats3[0], lons3[0], 100, 0, 0, {"natural": "tree"})
expect_point(600, lats3[1], lons3[1], 100, 0, 0, {"shop": "bakery"})
expected.append(("multipolygons", 4001, None, None, {"type": "multipolygon"}))

out = (blob("OSMHeader", header_block, compress=False) +
       blob("OSMData", pblock1, compress=True) +
       blob("OSMData", pblock2, compress=False) +
       blob("OSMData", pblock3, compress=True))

os.makedirs("fixtures", exist_ok=True)
with open("fixtures/tiny.osm.pbf", "wb") as f:
    f.write(out)
print(f"wrote fixtures/tiny.osm.pbf ({len(out)} bytes, 4 blobs)")

# --- expected layeredScan rows → parquet oracle ------------------------
# Same shape/order q96_pbf_scan emits: ORDER BY layer, id; tags_json is
# the map with keys sorted (the query canonicalizes via
# map_from_entries(array_sort(map_entries(tags)))) and Spark's to_json
# compact format (no spaces).
import pyarrow as pa
import pyarrow.parquet as pq

rows = sorted(expected, key=lambda r: (r[0], r[1]))
table = pa.table({
    "layer": pa.array([r[0] for r in rows], pa.string()),
    "id": pa.array([r[1] for r in rows], pa.int64()),
    "lat": pa.array([r[2] for r in rows], pa.float64()),
    "lon": pa.array([r[3] for r in rows], pa.float64()),
    "tags_json": pa.array(
        [json.dumps(r[4], separators=(",", ":"), sort_keys=True)
         for r in rows], pa.string()),
})
pq.write_table(table, "fixtures/tiny_osm_expected.parquet")
print(f"wrote fixtures/tiny_osm_expected.parquet ({table.num_rows} rows)")
