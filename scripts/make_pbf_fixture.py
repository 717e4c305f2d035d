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

Run: python3 scripts/make_pbf_fixture.py   (writes fixtures/tiny.osm.pbf)
"""
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

out = (blob("OSMHeader", header_block, compress=False) +
       blob("OSMData", pblock1, compress=True) +
       blob("OSMData", pblock2, compress=False))

os.makedirs("fixtures", exist_ok=True)
with open("fixtures/tiny.osm.pbf", "wb") as f:
    f.write(out)
print(f"wrote fixtures/tiny.osm.pbf ({len(out)} bytes, 3 blobs)")
