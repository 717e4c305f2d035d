#!/usr/bin/env python3
"""Generate expectation fixtures for the two queries whose semantics are
not expressible in DuckDB SQL, using INDEPENDENT implementations:

- fixtures/q43_expected.parquet — best fuzzy brand match per distinct
  dirty name, computed with CPython's real difflib.SequenceMatcher
  (the semantics the Scala port claims to reproduce). Keyed by
  dirty_name, so it is scale-factor independent.
- fixtures/q46_meta.parquet — stub-codec decode metadata + embedding
  norms, re-derived here from the published stub definitions
  (deterministic functions of the content bytes). Keyed by
  content_hash so one fixture covers every scale factor.

Run: python3 scripts/make_fixtures.py   (writes into repo fixtures/)
"""
import difflib
import hashlib
import os
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures")
os.makedirs(OUT, exist_ok=True)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def round_half_up(x: float, digits: int) -> float:
    # Spark round(double, d): shortest-repr decimal of the double,
    # scaled with HALF_UP — identical to Decimal(repr(x)).
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------- q43
WHITELIST = ["Brand#11", "Brand#22", "Brand#33", "Brand#44", "Brand#55"]
rows = []
for x in range(1, 6):
    for y in range(1, 6):
        dirty = f"Brand-{x}{y}"
        # tie-break: highest ratio, then brand ASC (Spark orders
        # ratio desc, brand asc)
        scored = sorted(
            ((difflib.SequenceMatcher(None, dirty, b).ratio(), b) for b in WHITELIST),
            key=lambda t: (-t[0], t[1]),
        )
        ratio, brand = scored[0]
        if ratio >= 0.85:
            rows.append((dirty, brand, round_half_up(ratio, 6)))
q43 = pd.DataFrame(rows, columns=["dirty_name", "matched_brand", "ratio"])
q43.to_parquet(os.path.join(OUT, "q43_expected.parquet"), index=False)
print(f"q43_expected: {len(q43)} rows")


# ---------------------------------------------------------------- q46
def java_arrays_hashcode(bs: bytes) -> int:
    """java.util.Arrays.hashCode(byte[]): h = 31*h + signed(b), int32."""
    h = 1
    for b in bs:
        sb = b - 256 if b >= 128 else b
        h = (31 * h + sb) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def decode_dims(bs: bytes):
    h = java_arrays_hashcode(bs)
    a = abs(h)  # matches Java abs() even at INT_MIN for these moduli
    w = 160 + (a % 8) * 80
    ht = 120 + ((a // 8) % 8) * 60
    frames = 1 + ((a // 64) % 4)
    return w, ht, frames


def embed_norm_sq(bs: bytes, dim: int = 16) -> float:
    # float32 sequential accumulation, then Σ halfUp(x·x·1e10) longs
    acc = np.zeros(dim, dtype=np.float32)
    scale = np.float32(255.0)
    for i, b in enumerate(bs):
        acc[i % dim] = np.float32(acc[i % dim] + np.float32(b) / scale)
    total = 0
    for v in acc:
        p = float(v) * float(v) * 1e10
        fl = np.floor(p)
        if p - fl == 0.5:
            r = int(fl) + 1 if p >= 0 else int(fl)
        else:
            r = int(np.rint(p))
        total += r
    return round_half_up(total / 1e10, 4)


seen = {}
for sf in SF_DIRS:
    docs = pd.read_parquet(os.path.join(sf, "documents.parquet"), columns=["text"])
    for text in docs["text"]:
        bs = text.encode("utf-8")
        hx = hashlib.sha256(bs).hexdigest()
        if hx in seen:
            continue
        w, ht, fr = decode_dims(bs)
        seen[hx] = (hx, w, ht, fr, embed_norm_sq(bs))
q46 = pd.DataFrame(
    list(seen.values()),
    columns=["content_hash", "width", "height", "n_frames", "embed_norm_sq"],
)
q46["width"] = q46["width"].astype("int32")
q46["height"] = q46["height"].astype("int32")
q46["n_frames"] = q46["n_frames"].astype("int32")
q46.to_parquet(os.path.join(OUT, "q46_meta.parquet"), index=False)
print(f"q46_meta: {len(q46)} rows")


# --------------------------------------------------------------- q101
# BPE tokenizer artifacts: train classic byte-pair-encoding (Sennrich
# et al. 2016) on the canonical corpus word-frequency table, then
# greedily encode every distinct word with the learned merge table.
# The TRAINED merges (fixtures/bpe_merges.parquet) are the tokenizer
# artifact the engine applies; the encodings
# (fixtures/q101_expected.parquet) are the independent oracle. Keyed
# by word — the synthetic vocabulary is identical at every scale
# factor, so one fixture covers all.
import re

N_MERGES = 16

vocab = {}
for sf in SF_DIRS:
    docs = pd.read_parquet(os.path.join(sf, "documents.parquet"), columns=["text"])
    for text in docs["text"]:
        for w in re.split(r"\s+", text.strip()):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
# train on the canonical sf0.1 frequencies only (re-read for clarity)
freq = {}
docs = pd.read_parquet(os.path.join(SF_DIRS[-1], "documents.parquet"), columns=["text"])
for text in docs["text"]:
    for w in re.split(r"\s+", text.strip()):
        if w:
            freq[w] = freq.get(w, 0) + 1

words = {w: [c for c in w] for w in freq}
merges = []
for _ in range(N_MERGES):
    pairs = {}
    for w, syms in words.items():
        f = freq[w]
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + f
    if not pairs:
        break
    # deterministic: max count, then lexicographic pair
    (left, right), _n = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    merges.append((left, right))
    for w, syms in words.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        words[w] = out

pd.DataFrame(
    [(r, l, rt) for r, (l, rt) in enumerate(merges)],
    columns=["rank", "left", "right"],
).to_parquet(os.path.join(OUT, "bpe_merges.parquet"), index=False)
print(f"bpe_merges: {len(merges)} rows")


def bpe_encode(word, ranks):
    syms = [c for c in word]
    while True:
        best, best_i = None, -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        left, right = merges[best]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


ranks = {pair: r for r, pair in enumerate(merges)}
q101 = pd.DataFrame(
    [(w, bpe_encode(w, ranks), len(bpe_encode(w, ranks))) for w in sorted(vocab)],
    columns=["word", "tokens", "n_tokens"],
)
q101["n_tokens"] = q101["n_tokens"].astype("int64")
q101.to_parquet(os.path.join(OUT, "q101_expected.parquet"), index=False)
print(f"q101_expected: {len(q101)} rows over {len(merges)} merges")
