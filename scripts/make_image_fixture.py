#!/usr/bin/env python3
"""Fixture for the perceptual image near-dup operator (ImageDedup):

- fixtures/image_assets.parquet   — (asset_id, uri, media_type,
  content) where content is a REAL PNG (pure-stdlib encoder below;
  truecolor 8-bit, zlib IDAT) or deliberately-non-image bytes.
- fixtures/image_dhash_expected.parquet — (asset_id, dhash) computed
  INDEPENDENTLY here from the source pixel arrays with the exact
  integer pipeline the Scala operator documents:
    luma  = (299*r + 587*g + 114*b) // 1000           per pixel
    grid  = 8 rows x 9 cols box averages, cell (cx,cy) covering
            x in [cx*W//9, (cx+1)*W//9), y in [cy*H//8, (cy+1)*H//8),
            avg = sum(luma) // count
    bit b = cy*8 + cx set iff grid[cy][cx] > grid[cy][cx+1]
  PNG is lossless, so Java ImageIO decodes the identical RGB pixels
  and the Scala dhash must match these values bit-for-bit.

The asset set exercises the claims that make dHash worth having over
sha-256 (q21 exact dedup misses re-encodes):
  1  base gradient pattern, 90x80
  2  byte-identical copy of 1            -> hamming 0 (sha-256 catches)
  3  same pixels, different zlib level   -> hamming 0 (sha-256 MISSES)
  4  same pattern +16 global brightness  -> hamming 0 (gradient hash
                                            is shift-invariant)
  5  one localized block perturbed       -> small hamming vs 1
  6  same pattern re-rendered at 45x40   -> small hamming vs 1
                                            (resize invariance)
  7-11 five unrelated deterministic-noise images -> no pairs
  12 non-image bytes                     -> dhash NULL

Run: python3 scripts/make_image_fixture.py   (writes into fixtures/)
"""
import os
import struct
import zlib

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures")
os.makedirs(OUT, exist_ok=True)


def png_encode(pixels, level=6):
    """Minimal truecolor-8 PNG encoder: pixels = [[(r,g,b)...]...]."""
    h = len(pixels)
    w = len(pixels[0])

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in pixels)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw, level)) +
            chunk(b"IEND", b""))


def dhash(pixels):
    h = len(pixels)
    w = len(pixels[0])
    if w < 9 or h < 8:
        return None
    luma = [[(299 * r + 587 * g + 114 * b) // 1000 for (r, g, b) in row]
            for row in pixels]
    grid = [[0] * 9 for _ in range(8)]
    for cy in range(8):
        y0, y1 = cy * h // 8, (cy + 1) * h // 8
        for cx in range(9):
            x0, x1 = cx * w // 9, (cx + 1) * w // 9
            total = sum(luma[y][x] for y in range(y0, y1) for x in range(x0, x1))
            grid[cy][cx] = total // ((y1 - y0) * (x1 - x0))
    bits = 0
    for b in range(64):
        cy, cx = b // 8, b % 8
        if grid[cy][cx] > grid[cy][cx + 1]:
            bits |= 1 << b
    if bits >= 1 << 63:  # int64 carrier, same bit pattern both engines
        bits -= 1 << 64
    return bits


def gradient(w, h, shift=0, perturb=None):
    """Base pattern in [0, 200] so a +16 shift never clamps."""
    px = []
    for y in range(h):
        row = []
        for x in range(w):
            r = (x * 200) // max(1, w - 1)
            g = (y * 200) // max(1, h - 1)
            b = ((x + y) * 200) // max(1, w + h - 2)
            if perturb and perturb[0] <= x < perturb[1] and perturb[2] <= y < perturb[3]:
                r = min(255, r + perturb[4])
                g = min(255, g + perturb[4])
                b = min(255, b + perturb[4])
            row.append((min(255, r + shift), min(255, g + shift), min(255, b + shift)))
        px.append(row)
    return px


def noise(w, h, seed):
    px = []
    for y in range(h):
        row = []
        for x in range(w):
            r = (x * 2654435761 + y * 40503 + seed * 9176) % 256
            g = (x * 1103515245 + y * 12345 + seed * 424243) % 256
            b = (x * 69069 + y * 3571 + seed * 60493) % 256
            row.append((r, g, b))
        px.append(row)
    return px


base = gradient(90, 80)
assets = [
    (1, png_encode(base), dhash(base)),
    (2, png_encode(base), dhash(base)),                      # byte-dup
    (3, png_encode(base, level=1), dhash(base)),             # re-encode
]
bright = gradient(90, 80, shift=16)
assets.append((4, png_encode(bright), dhash(bright)))
tweaked = gradient(90, 80, perturb=(25, 35, 35, 45, 40))
assets.append((5, png_encode(tweaked), dhash(tweaked)))
small = gradient(45, 40)
assets.append((6, png_encode(small), dhash(small)))
for i, seed in enumerate([7, 13, 29, 47, 71]):
    nz = noise(90, 80, seed)
    assets.append((7 + i, png_encode(nz), dhash(nz)))
assets.append((12, b"definitely not a decodable image payload", None))

rows = [(aid, f"mem://img/{aid}", "image", content)
        for (aid, content, _) in assets]
pd.DataFrame(rows, columns=["asset_id", "uri", "media_type", "content"]) \
    .to_parquet(os.path.join(OUT, "image_assets.parquet"), index=False)

# pyarrow directly: pandas astype("Int64") on an object column (the
# None row) routes through float64 and silently rounds 64-bit hashes
# to 53-bit mantissas
import pyarrow as pa
import pyarrow.parquet as pq
pq.write_table(
    pa.table({
        "asset_id": pa.array([aid for (aid, _, _) in assets], pa.int64()),
        "dhash": pa.array([dh for (_, _, dh) in assets], pa.int64()),
    }),
    os.path.join(OUT, "image_dhash_expected.parquet"))

# sanity: show the pair structure this fixture is designed to produce
vals = {aid: dh for (aid, _, dh) in assets if dh is not None}
pairs = []
for a in sorted(vals):
    for b in sorted(vals):
        if a < b:
            hd = bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
            if hd <= 6:
                pairs.append((a, b, hd))
print(f"image_assets: {len(assets)} assets; near-dup pairs (h<=6): {pairs}")
near = {(a, b) for a, b, _ in pairs}
want_in = {(1, 2), (1, 3), (1, 4), (1, 5), (1, 6)}
assert want_in <= near, f"designed dup pairs missing: {want_in - near}"
assert all(a <= 6 and b <= 6 for a, b in near), \
    f"noise images collided into the near set: {near}"
