"""Generate larger scale fixtures from sf0.1 with join-consistent key offsets
(r12) — the recipe of scripts/make_sf1.py (copies with strided keys, shared
region/nation dims), generalized to ANY copy count and rewritten to stream
one copy per row group through a ParquetWriter instead of concatenating all
copies in memory (100 copies of sf0.1 would otherwise hold ~10x sf1 in RAM).

Document-text copy markers are STRONGER than make_sf1's trailing " c{k}"
suffix: measured in the r12 scaling audit, a 2-token suffix on a ~54-word
doc leaves cross-copy 3-gram Jaccard ~0.94, so every doc near-dup-matches
every copy of itself — near-dup clusters grow with the copy count and pair
output grows QUADRATICALLY (sf10 minhash shuffled 7.5 GB and OOM'd a 24 GB
heap; that output is genuinely quadratic in cluster size — a fixture
artifact, not an algorithm property). This script instead inserts a
per-copy marker token after every MARK_EVERY words: ~3/(MARK_EVERY+1) of
each copy's 3-gram shingles become copy-specific, cross-copy Jaccard drops
far below the banding's candidate floor and simhash fingerprints split buckets,
so near-dup structure stays WITHIN copies and dedup output scales linearly
— the property the scaling audit needs so it measures ALGORITHM growth,
not output growth.

sf1 itself stays on make_sf1.py so its on-disk layout (and therefore every
round-over-round BENCH_sf1 number) is bit-stable; this script is for the
scaling-audit fixtures: 10 copies = sf1m (the audit's recipe-consistent
1.0 point), 30 = sf3, 100 = sf10.

Usage: python scripts/make_scale.py COPIES [src_dir] [out_dir]
       e.g. python scripts/make_scale.py 30 /root/testdata/sf0.1 /tmp/sf3
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000
MARK_EVERY = 3  # marker after every 3rd word: cross-copy J ~ 0.14, so the
# 4x4 LSH banding's candidate probability 4*J^4 is ~0.2% — without this,
# J ~ 0.46 (marker every 6) still made ~18% of cross-copy pairs CANDIDATES
# (shuffled and verified even though verification rejects them): quadratic

KEYS = {
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED_DIMS = ["region", "nation"]
SMALL_KEYS = {"c_nationkey", "s_nationkey"}  # reference shared dims — no offset


def mark_text(text: str, k: int) -> str:
    """Insert the copy-k marker token after every MARK_EVERY words."""
    words = text.split(" ")
    out: list[str] = []
    for i, w in enumerate(words, 1):
        out.append(w)
        if i % MARK_EVERY == 0:
            out.append(f"c{k}x")
    return " ".join(out)


def make_copy(base: pa.Table, name: str, k: int) -> pa.Table:
    t = base
    for col in KEYS[name]:
        if col in SMALL_KEYS:
            continue
        i = t.schema.get_field_index(col)
        t = t.set_column(i, col, pc.add(t[col], k * STRIDE))
    if name == "documents" and k > 0:
        i = t.schema.get_field_index("text")
        marked = pa.array(
            [None if v is None else mark_text(v, k)
             for v in t["text"].to_pylist()],
            type=pa.string(),
        )
        t = t.set_column(i, "text", marked)
    return t


def main() -> None:
    copies = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sfx{copies}"
    if copies < 1:
        raise SystemExit("copies must be a positive int")
    os.makedirs(out, exist_ok=True)

    for name in SHARED_DIMS:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{out}/{name}.parquet")

    for name in KEYS:
        base = pq.read_table(f"{src}/{name}.parquet")
        with pq.ParquetWriter(f"{out}/{name}.parquet", base.schema) as w:
            for k in range(copies):
                w.write_table(make_copy(base, name, k))
        print(f"{name}: {base.num_rows} -> {base.num_rows * copies}")


if __name__ == "__main__":
    main()
