"""K-means clustering over embedding columns — Lloyd's algorithm Spark-first.

A training-data pipeline clusters document embeddings for topic balancing,
domain discovery, and cluster-based dedup/sampling. The reference engine has
no clustering; this is the LLM-ops extension done with the same determinism
contract as the ANN family (operators/similarity.py): md5-ordered seeding and
fixed tie-breaks make the result bit-reproducible in any engine, so the
DuckDB oracle can unroll the identical iterations.

Shape per Lloyd iteration (scales to 100 TB):
- ASSIGN: the k centroids are driver literals (k x dim doubles — metadata
  scale); each row picks argmin-L2 in ONE shuffle-free projection via a
  sorted array of (distance, centroid-id) structs — the same pattern that
  replaced the IVF explode+window (similarity.py ivf_topk). No corpus
  shuffle, no join.
- UPDATE: one aggregation with key space (k x dim) — bounded regardless of
  corpus size, map-side partial aggregation does the heavy lifting.

Cross-engine float determinism: a distributed mean's summation ORDER is
nondeterministic, so averaging doubles directly would make centroid bits —
and near-tie assignments — engine-dependent. The update therefore sums
FIXED-POINT longs (floor(x * 2^20)): integer addition commutes exactly, and
the mean is reconstructed as (sum / count) / 2^20 in double — bit-identical
in Spark, Python, and DuckDB. Distances accumulate per-row in array order
(sequential fold), which both engines execute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIXED = 1 << 20  # fixed-point scale for the deterministic centroid mean


def _argmin_cluster_sql(cent_rows: list[tuple[int, list[float]]], vc: str) -> str:
    """Shuffle-free argmin-L2 against centroid literals: sorted array of
    (d2, cid) structs — lexicographic sort ≡ ORDER BY d2, cid (the oracle's
    tie-break) — then [0].cid."""
    entries = []
    for cid, v in cent_rows:
        lit = "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in v) + ")"
        d2 = (
            f"aggregate(zip_with({vc}, {lit}, (x, y) -> "
            f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        entries.append(f"named_struct('d2', {d2}, 'cid', CAST({cid} AS BIGINT))")
    return "sort_array(array(" + ",".join(entries) + "))[0]['cid']"


def kmeans_assign(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Cluster every row into one of ``k`` clusters after ``iters`` Lloyd
    iterations; returns (id_col, cluster). Seeds are the ``k`` rows whose
    md5(id) sorts lowest (hash-spread — reproducible in any engine). A
    cluster that loses all members is dropped, matching the SQL oracle's
    semantics (its re-averaged centroid set simply lacks the id)."""
    seeds = (
        df.orderBy(F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc())
        .limit(k)
        .select(vec_col)
        .collect()
    )
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seeds)]
    if not cents:
        return df.sparkSession.createDataFrame([], f"{id_col} long, cluster long")

    for it in range(iters):
        assigned = df.select(
            F.col(id_col),
            F.col(vec_col),
            F.expr(_argmin_cluster_sql(cents, vec_col)).alias("cluster"),
        )
        if it == iters - 1:
            return assigned.select(id_col, "cluster")
        # deterministic update: fixed-point sums per (cluster, dim) — the
        # key space is k x dim, independent of corpus size
        rows = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("_i", "_x"))
            .groupBy("cluster", "_i")
            .agg(
                F.sum(F.floor(F.col("_x").cast("double") * _FIXED).cast("long")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cluster"], {})[r["_i"]] = (r["_s"] / r["_n"]) / _FIXED
        cents = [
            (cid, [dims[i] for i in sorted(dims)]) for cid, dims in sorted(by_cid.items())
        ]
    raise AssertionError("unreachable")  # pragma: no cover
