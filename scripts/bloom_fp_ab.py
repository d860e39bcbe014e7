"""A/B: bloom prefilter false-positive rate, fixed 2^17 bits vs auto-sized (r11).

The r10 default (n_bits fixed at 2^17) is right for ~10^4 build keys and
SATURATES at ~10^5+: with 200k keys the filter passes ~everything and the
"prefilter" stops filtering. r11 auto-sizes from a build-side distinct
count (~16 bits/key => FP ~0.24% by design, floor 2^17, cap 2^26).

Setup isolates FP measurement: the probe's keys are DISJOINT from the
build's, so every surviving probe row is a false positive by construction.

Usage: python scripts/bloom_fp_ab.py — prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_iceberg_spark.operators.joins import bloom_prefilter, bloom_size_bits
from go_iceberg_spark.session import get_spark


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    n_probe = 2_000_000
    probe = spark.range(0, n_probe).select(F.col("id").alias("k"))

    out = {"metric": "bloom_fp_ab", "probe_rows": n_probe, "cases": {}}
    for n_keys in (2_000, 200_000):
        # build keys start at 10^7: zero overlap with the probe's 0..2M
        build = spark.range(10_000_000, 10_000_000 + n_keys).select(
            F.col("id").alias("k"))
        fixed = bloom_prefilter(probe, build, ["k"], n_bits=1 << 17).count()
        auto_bits = bloom_size_bits(n_keys)
        auto = bloom_prefilter(probe, build, ["k"]).count()
        out["cases"][str(n_keys)] = {
            "fp_rate_fixed_2e17": round(fixed / n_probe, 6),
            "fp_rate_auto": round(auto / n_probe, 6),
            "auto_n_bits": auto_bits,
            "auto_transport": "literal" if auto_bits // 64 <= 2048 else "broadcast",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
